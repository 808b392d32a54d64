"""Extraction plan IR: root query spec + pruned relation tree.

This is the explicit intermediate representation the reference never
materializes (it goes straight from YAML to SQLAlchemy loader options,
``/root/reference/dbcut/query.py:146-239``). Making it explicit lets the
Spark executor and the DuckDB oracle generator share one source of truth.
"""

from __future__ import annotations

from dataclasses import dataclass

from dbcut_spark.catalog import Catalog
from dbcut_spark.config import QuerySpec, normalize_query
from dbcut_spark.dsl import OrderKey, default_order, parse_order_by
from dbcut_spark.graph import RelationTree, TreeNode, build_relation_tree


@dataclass
class ExtractionPlan:
    catalog: Catalog
    spec: QuerySpec
    tree: RelationTree

    @property
    def root_table(self) -> str:
        return self.spec.from_table

    def root_pk(self) -> tuple[str, ...]:
        return self.catalog.table(self.root_table).pk

    def order_keys(self) -> list[OrderKey]:
        """User order-by, PK-desc default, and always a PK tie-break so
        ``limit`` is deterministic under any partitioning (BASELINE.md
        requires canonically-ordered output; divergence from the
        reference documented in SURVEY.md §7.3.2)."""
        keys = parse_order_by(self.spec.order_by)
        if not keys:
            keys = default_order(self.root_pk())
        else:
            present = {k.column for k in keys}
            keys += [k for k in default_order(self.root_pk()) if k.column not in present]
        return keys

    def find_path(self, target: str) -> list[TreeNode]:
        """Minimal-weight path root→target (nodes, excluding root).

        INVARIANT shared with graph._prune_to_includes: identical
        (weight, table-name-tuple) tie-break — a change to path-weight
        semantics (e.g. the ONETOMANY ×2 weighting) must update both,
        or include-pruning and cross-table-predicate joins disagree.
        Pinned by tests/test_graph.py::test_include_prunes."""
        candidates: list[tuple[int, tuple[str, ...], list[TreeNode]]] = []

        def rec(node: TreeNode, path: list[TreeNode]) -> None:
            path = path + [node]
            if node.table == target and node.relationship is not None:
                candidates.append((node.weight, tuple(p.table for p in path), path[1:]))
            for c in node.children:
                rec(c, path)

        rec(self.tree.root, [])
        if not candidates:
            raise ValueError(
                f"table {target!r} not reachable from {self.root_table!r} in the relation tree"
            )
        candidates.sort(key=lambda t: (t[0], t[1]))
        return candidates[0][2]


def build_plan(catalog: Catalog, raw_query: dict, config: dict | None = None) -> ExtractionPlan:
    spec = normalize_query(raw_query, config)
    if spec.from_table not in catalog.tables:
        raise KeyError(f"unknown root table {spec.from_table!r}")
    tree = build_relation_tree(
        catalog,
        spec.from_table,
        join_depth=spec.join_depth,
        backref_depth=spec.backref_depth,
        exclude=spec.exclude,
        include=spec.include,
    )
    return ExtractionPlan(catalog, spec, tree)
