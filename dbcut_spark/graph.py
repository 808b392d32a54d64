"""Extraction graph: FK relationships → pruned relation tree.

Reference parity (driver-side planning, SURVEY.md §2.11):
- relationships derive from FKs with two directions — MANYTOONE (scalar,
  child→parent) and ONETOMANY (collection, parent→child); many-to-many is
  two ONETOMANY/MANYTOONE hops through the association table
  (``/root/reference/dbcut/query.py:232-237``);
- breadth-first traversal from the root with separate ``join_depth``
  (many-to-one hops) and ``backref_depth`` (one-to-many hops) budgets,
  many-to-one edges first, edge weight doubles on ⁿ edges, each
  relationship traversed once (cycle guard) —
  ``/root/reference/dbcut/query.py:352-445``;
- ``exclude`` removes tables pre-traversal
  (``/root/reference/dbcut/query.py:150-159``); ``include`` keeps only the
  minimal-weight paths to the named targets
  (``/root/reference/dbcut/query.py:181-227``);
- ASCII tree rendering with ¹/ⁿ arity markers
  (``/root/reference/dbcut/query.py:295-318``).

This is pure metadata planning: nothing here touches a DataFrame.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from dbcut_spark.catalog import Catalog


class Direction(Enum):
    MANYTOONE = "manytoone"   # child table -> parent table (scalar, ¹)
    ONETOMANY = "onetomany"   # parent table -> child table (collection, ⁿ)


@dataclass(frozen=True)
class Relationship:
    """A traversable FK edge attached to ``source``."""

    source: str
    target: str
    direction: Direction
    source_cols: tuple[str, ...]   # join columns on source side
    target_cols: tuple[str, ...]   # join columns on target side
    fk_name: str                   # identity of the underlying FK
    # scalar relation name resolved against the source table's columns
    # (set by relationships_of; None → fall back to the target table)
    scalar_name: str | None = None

    @property
    def arity_mark(self) -> str:
        return "¹" if self.direction is Direction.MANYTOONE else "ⁿ"

    @property
    def name(self) -> str:
        # Reference naming (/root/reference/dbcut/database.py:350-367 and
        # the documented sample /root/reference/README.rst:320-361):
        # scalar (many-to-one) relations are named after the FK column
        # minus its "_id" suffix ("role_id" → "role") when that stem
        # isn't itself a column of the source table, else the referred
        # table's name; collections are "<child>_collection". (The
        # reference implements the stem with str.strip("_id") — a
        # character-class strip that over-trims names like "paid_id";
        # we use suffix semantics, identical on every sane FK name.)
        if self.direction is Direction.MANYTOONE:
            return self.scalar_name or self.target
        return f"{self.target}_collection"


def _scalar_relation_name(catalog: Catalog, table: str, fk) -> str | None:
    """FK-column-stem scalar naming ("role_id" → "role") with the
    reference's guard: the stem must not collide with a real column of
    the source table (then automap falls back to the referred class
    name). Only applies to single-column FKs ending in "_id", and only
    when the source table's columns are known."""
    if len(fk.child_cols) != 1 or not fk.child_cols[0].endswith("_id"):
        return None
    stem = fk.child_cols[0][: -len("_id")]
    cols = catalog.table(table).columns
    if not stem or (cols and stem in cols):
        return None
    return stem


def relationships_of(catalog: Catalog, table: str) -> list[Relationship]:
    rels: list[Relationship] = []
    for fk in catalog.fks_of(table):
        rels.append(
            Relationship(
                table,
                fk.parent,
                Direction.MANYTOONE,
                fk.child_cols,
                fk.parent_cols,
                fk.name,
                scalar_name=_scalar_relation_name(catalog, table, fk),
            )
        )
    for fk in catalog.fks_into(table):
        rels.append(
            Relationship(
                table, fk.child, Direction.ONETOMANY, fk.parent_cols, fk.child_cols, fk.name
            )
        )
    # deterministic order: many-to-one first, then by (target, fk)
    rels.sort(key=lambda r: (r.direction is not Direction.MANYTOONE, r.target, r.fk_name))
    return rels


@dataclass
class TreeNode:
    table: str
    relationship: Relationship | None  # edge that reached this node (None = root)
    depth: int
    weight: int
    children: list["TreeNode"] = field(default_factory=list)

    def walk(self):
        """Yield nodes breadth-first (execution order of the frontier loop)."""
        queue = [self]
        while queue:
            node = queue.pop(0)
            yield node
            queue.extend(node.children)

    def all_tables(self) -> list[str]:
        seen: list[str] = []
        for node in self.walk():
            if node.table not in seen:
                seen.append(node.table)
        return seen


@dataclass
class RelationTree:
    root: TreeNode

    def render(self) -> str:
        """ASCII tree with arity markers (reference sample:
        /root/reference/README.rst:124-134)."""
        lines: list[str] = []

        def rec(node: TreeNode, prefix: str, is_last: bool) -> None:
            if node.relationship is None:
                lines.append(node.table)
            else:
                branch = "└─" if is_last else "├─"
                lines.append(
                    f"{prefix}{branch}{node.relationship.arity_mark} {node.table}"
                )
            child_prefix = prefix + ("  " if is_last else "│ ") if node.relationship else ""
            for i, child in enumerate(node.children):
                rec(child, child_prefix, i == len(node.children) - 1)

        rec(self.root, "", True)
        n = len(self.root.all_tables())
        lines.append(f"{n} table{'s' if n != 1 else ''} loaded")
        return "\n".join(lines)


def build_relation_tree(
    catalog: Catalog,
    root_table: str,
    join_depth: int = 5,
    backref_depth: int = 5,
    exclude: list[str] | None = None,
    include: list[str] | None = None,
) -> RelationTree:
    """BFS the FK graph from ``root_table`` into a pruned spanning tree.

    Depth budgets decrement per hop of their kind; an edge (FK identity)
    is traversed at most once tree-wide, which both dedups diamonds and
    guards self-FK cycles (reference bookkeeping:
    ``/root/reference/dbcut/query.py:366-398``).
    """
    excluded = set(exclude or [])
    root = TreeNode(root_table, None, 0, 1)
    visited_edges: set[str] = set()
    browsed: set[str] = set()  # reference `already_browse_models`
    queue: list[tuple[TreeNode, int, int]] = [(root, join_depth, backref_depth)]
    while queue:
        node, jd, bd = queue.pop(0)
        # each table's relationships are expanded at most once tree-wide
        # (reference /root/reference/dbcut/query.py:367,399 — a table
        # reached twice, e.g. through a diamond, does not re-expand)
        if node.table in browsed:
            continue
        browsed.add(node.table)
        for rel in relationships_of(catalog, node.table):
            if rel.target in excluded:
                continue
            # an FK traversed in either direction blocks the reverse hop
            # (reference get_relationships_path includes reverse paths)
            if rel.fk_name in visited_edges:
                continue
            if rel.direction is Direction.MANYTOONE:
                if jd <= 0:
                    continue
                budget = (jd - 1, bd)
                weight = node.weight
            else:
                # collections never re-enter an already-expanded table
                # (reference: `target.name not in already_browse_models`)
                if bd <= 0 or rel.target in browsed:
                    continue
                budget = (jd, bd - 1)
                weight = node.weight * 2  # ⁿ edges double the weight
            visited_edges.add(rel.fk_name)
            child = TreeNode(rel.target, rel, node.depth + 1, weight)
            node.children.append(child)
            queue.append((child, *budget))
    tree = RelationTree(root)
    if include:
        _prune_to_includes(tree, list(include))
    return tree


def _prune_to_includes(tree: RelationTree, targets: list[str]) -> None:
    """Keep only nodes on a minimal-weight path root→target for each
    include target (reference ``get_direct_path`` / ``cut_relation_tree``,
    ``/root/reference/dbcut/query.py:183-221``)."""
    # collect (weight, path) per target table; pick lightest, tie-break on path
    best_paths: list[tuple[TreeNode, ...]] = []
    for target in targets:
        candidates: list[tuple[int, tuple[str, ...], tuple[TreeNode, ...]]] = []

        def rec(node: TreeNode, path: tuple[TreeNode, ...]) -> None:
            path = path + (node,)
            if node.table == target and node is not tree.root:
                candidates.append(
                    (node.weight, tuple(p.table for p in path), path)
                )
            for c in node.children:
                rec(c, path)

        rec(tree.root, ())
        if not candidates:
            raise ValueError(f"include target {target!r} not reachable from {tree.root.table!r}")
        candidates.sort(key=lambda t: (t[0], t[1]))
        best_paths.append(candidates[0][2])

    keep: set[int] = set()
    for path in best_paths:
        for node in path:
            keep.add(id(node))

    def prune(node: TreeNode) -> None:
        node.children = [c for c in node.children if id(c) in keep]
        for c in node.children:
            prune(c)

    prune(tree.root)
