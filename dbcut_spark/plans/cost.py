"""Static scan-cost estimator for extraction plans — no Spark jobs.

Answers "what would this extraction cost at the CURRENT source size,
and how would each frontier edge route?" before anything executes.
Walks the relation tree in the same breadth-first order as
``ClosureExecutor.execute_nodes`` (operators/closure.py:177) and
propagates the SAME static frontier bounds (root ≤ limit; a
many-to-one hop through the target's full PK keeps the parent bound;
a capped one-to-many hop multiplies by ``backref_limit``), so the
routing column of the report predicts what the executor will actually
do — broadcast the frontier keys, Bloom-prefilter the child, or defer
to a runtime count — without running a single job.

All sizes come from parquet footer metadata (pyarrow, O(files) driver
reads): exact row counts and compressed/uncompressed byte totals per
column. At 100 TB this is the difference between previewing a
500-table extraction in seconds and discovering mid-run that an
unbounded backref fans into a full-table shuffle.

Reference parity: dbcut prints estimated per-table counts before a
load when the engine exposes them
(``/root/reference/dbcut/database.py:329-338``); this extends that
surface with bytes and join-strategy prediction, which only matter on
a distributed engine.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from dbcut_spark.graph import Direction
from dbcut_spark.operators.closure import (
    BLOOM_MAX_BROADCAST_BYTES,
    BLOOM_MIN_KEYS,
)
from dbcut_spark.plans.extraction import ExtractionPlan

# estimator-side fallback for columns whose footer stats are missing
# (empty files, all-null chunks): matches the executor's 64 B
# variable-width guess in closure._estimated_key_bytes
_FALLBACK_COL_BYTES = 64


@dataclass
class TableStats:
    """Footer-derived stats for one source table."""

    rows: int
    compressed_bytes: int
    uncompressed_bytes: int
    # column -> total uncompressed bytes across all row groups/files
    col_uncompressed: dict[str, int] = field(default_factory=dict)

    def avg_col_row_bytes(self, cols: tuple[str, ...]) -> int:
        """Mean serialized bytes per row for ``cols``, from real data."""
        if self.rows <= 0:
            return _FALLBACK_COL_BYTES * max(len(cols), 1)
        total = sum(
            self.col_uncompressed.get(c, _FALLBACK_COL_BYTES * self.rows)
            for c in cols
        )
        return max(total // self.rows, 1)


def footer_stats(path: str) -> TableStats | None:
    """Read rows + per-column byte totals from parquet footers only.

    Returns None when the table is missing or unreadable — callers
    degrade to unknown-cost rows, mirroring how the executor's
    metadata tier falls back to a runtime count."""
    import pyarrow.parquet as pq

    files: list[str]
    if os.path.isdir(path):
        files = [
            os.path.join(root, f)
            for root, _dirs, names in os.walk(path)
            for f in names
            if f.endswith(".parquet")
        ]
    elif os.path.exists(path):
        files = [path]
    else:
        return None
    rows = 0
    comp = 0
    uncomp = 0
    col_u: dict[str, int] = {}
    try:
        for f in files:
            meta = pq.ParquetFile(f).metadata
            rows += meta.num_rows
            for rg in range(meta.num_row_groups):
                group = meta.row_group(rg)
                for ci in range(group.num_columns):
                    col = group.column(ci)
                    name = col.path_in_schema.split(".")[0]
                    comp += col.total_compressed_size
                    uncomp += col.total_uncompressed_size
                    col_u[name] = (
                        col_u.get(name, 0) + col.total_uncompressed_size
                    )
    except Exception:
        return None
    return TableStats(rows, comp, uncomp, col_u)


@dataclass
class EdgeEstimate:
    parent: str
    table: str
    direction: str  # "m2o" | "o2m"
    # upper bound on the PARENT frontier's key rows (None = unknown)
    frontier_bound: int | None
    # estimated serialized bytes per key row (footer-derived)
    key_row_bytes: int
    # broadcast row threshold this edge would use at runtime
    broadcast_max_rows: int
    # "broadcast" | "runtime" (executor counts, then broadcast-or-Bloom)
    route: str
    child_rows: int | None
    child_scan_bytes: int | None  # compressed bytes the child scan reads


@dataclass
class PlanEstimate:
    root_table: str
    root_rows: int | None
    root_scan_bytes: int | None
    edges: list[EdgeEstimate]
    stats_missing: list[str]

    @property
    def total_scan_bytes(self) -> int | None:
        """Compressed bytes read across all scans (None if any table
        had no footer stats — a partial total would read as exact)."""
        if self.root_scan_bytes is None or any(
            e.child_scan_bytes is None for e in self.edges
        ):
            return None
        return self.root_scan_bytes + sum(
            e.child_scan_bytes for e in self.edges
        )

    def render(self) -> str:
        def human(n: int | None) -> str:
            if n is None:
                return "?"
            for unit in ("B", "KB", "MB", "GB", "TB"):
                if n < 1024 or unit == "TB":
                    return f"{n:.1f}{unit}" if unit != "B" else f"{n}B"
                n /= 1024.0
            return f"{n}B"

        lines = [
            f"{self.root_table}: rows={self.root_rows if self.root_rows is not None else '?'}"
            f" scan={human(self.root_scan_bytes)}"
        ]
        for e in self.edges:
            bound = "?" if e.frontier_bound is None else f"≤{e.frontier_bound}"
            lines.append(
                f"  {e.parent} -[{e.direction}]-> {e.table}:"
                f" frontier{bound} route={e.route}"
                f" child_rows={e.child_rows if e.child_rows is not None else '?'}"
                f" scan={human(e.child_scan_bytes)}"
            )
        lines.append(f"total scan: {human(self.total_scan_bytes)}")
        if self.stats_missing:
            lines.append(
                "no footer stats (cost unknown): "
                + ", ".join(sorted(set(self.stats_missing)))
            )
        return "\n".join(lines)


def estimate_plan(
    plan: ExtractionPlan,
    sf_dir: str,
    stats_fn=None,
) -> PlanEstimate:
    """Price every scan the frontier loop would perform.

    Mirrors the executor's bound propagation (closure.py:209-331) so
    `route` is a faithful prediction:

    - spec bounded (limit AND backref_limit set) → every frontier
      broadcasts (the executor forces it);
    - unbounded, but the static bound OR the parent table's footer row
      count proves the frontier under the byte-derived broadcast
      threshold → "broadcast";
    - otherwise → "runtime": the executor pays one cached-frame count
      (shared across the node's edges) and picks broadcast vs Bloom.

    ``stats_fn(table) -> TableStats | None`` overrides the parquet
    footer reader — the hook for non-parquet metadata (a JDBC source's
    information_schema row estimates: ``TableStats(rows, 0, 0, {})``
    keeps the row-based routing prediction and honestly reports scan
    bytes as unknown).
    """
    stats_memo: dict[str, TableStats | None] = {}

    def stats(table: str) -> TableStats | None:
        if table not in stats_memo:
            if stats_fn is not None:
                stats_memo[table] = stats_fn(table)
            else:
                stats_memo[table] = footer_stats(
                    os.path.join(sf_dir, f"{table}.parquet")
                )
        return stats_memo[table]

    bounded = (
        plan.spec.limit is not None and plan.spec.backref_limit is not None
    )
    root_stats = stats(plan.root_table)
    missing: list[str] = [] if root_stats else [plan.root_table]

    bounds: dict[int, int | None] = {id(plan.tree.root): plan.spec.limit}
    edges: list[EdgeEstimate] = []
    for node in plan.tree.root.walk():
        node_stats = stats(node.table)
        for child in node.children:
            rel = child.relationship
            assert rel is not None
            child_stats = stats(rel.target)
            if child_stats is None:
                missing.append(rel.target)

            # key row width from the parent's real column stats — the
            # executor uses schema-typed widths; footer bytes are the
            # better static estimate and land within the same order
            key_row_bytes = (
                node_stats.avg_col_row_bytes(tuple(rel.source_cols))
                if node_stats
                else _FALLBACK_COL_BYTES * len(rel.source_cols)
            )
            max_rows = min(
                BLOOM_MIN_KEYS, BLOOM_MAX_BROADCAST_BYTES // key_row_bytes
            )

            n_bound = bounds.get(id(node))
            if bounded:
                # lockstep with closure.py (round-10): a bounded spec
                # force-broadcasts only while the propagated bound is
                # KNOWN and under the threshold; an unknown bound (m2o
                # hop through a non-PK column) routes adaptively at
                # runtime exactly like the unbounded path — predicting
                # "broadcast" there promised a free plan exactly where
                # the executor pays a metadata/count/Bloom decision
                route = (
                    "broadcast"
                    if n_bound is not None and n_bound <= max_rows
                    else "runtime"
                )
            else:
                if n_bound is None:
                    # metadata tier, exactly like the executor
                    # (closure.py:256-261): the frontier is a subset of
                    # its table, and the derived bound is WRITTEN BACK
                    # so child-bound propagation continues below it —
                    # without the write-back, every edge deeper than a
                    # metadata-proven node would mispredict "runtime"
                    src_rows = node_stats.rows if node_stats else None
                    if src_rows is not None and src_rows <= max_rows:
                        n_bound = src_rows
                        bounds[id(node)] = n_bound
                if n_bound is not None and n_bound <= max_rows:
                    route = "broadcast"
                else:
                    route = "runtime"

            is_o2m = rel.direction is Direction.ONETOMANY
            edges.append(
                EdgeEstimate(
                    parent=node.table,
                    table=rel.target,
                    direction="o2m" if is_o2m else "m2o",
                    frontier_bound=n_bound,
                    key_row_bytes=key_row_bytes,
                    broadcast_max_rows=max_rows,
                    route=route,
                    child_rows=child_stats.rows if child_stats else None,
                    # 0 compressed bytes = rows-only stats (JDBC
                    # estimates) — bytes unknown, not free
                    child_scan_bytes=(
                        child_stats.compressed_bytes
                        if child_stats and child_stats.compressed_bytes > 0
                        else None
                    ),
                )
            )

            # child-bound propagation — keep in lockstep with
            # closure.py:execute_nodes (pinned by
            # tests/test_cost.py::test_bounds_match_executor_rules)
            parent_bound = bounds.get(id(node))
            child_bound: int | None = None
            if rel.direction is Direction.MANYTOONE and tuple(
                plan.catalog.table(rel.target).pk
            ) == tuple(rel.target_cols):
                child_bound = parent_bound
            elif is_o2m and plan.spec.backref_limit is not None:
                if plan.spec.backref_limit_mode == "global":
                    child_bound = plan.spec.backref_limit
                elif parent_bound is not None:
                    child_bound = parent_bound * plan.spec.backref_limit
            bounds[id(child)] = child_bound

    return PlanEstimate(
        root_table=plan.root_table,
        root_rows=root_stats.rows if root_stats else None,
        root_scan_bytes=(
            root_stats.compressed_bytes
            if root_stats and root_stats.compressed_bytes > 0
            else None
        ),
        edges=edges,
        stats_missing=missing,
    )
