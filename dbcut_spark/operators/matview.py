"""Incrementally-maintained materialized rollup views over manifest
tables.

The 100 TB ingest pattern this serves: a fact table grows by manifest
``append`` commits (streaming dedup ingest, CDC batches), and a
dashboard-grade rollup (GROUP BY keys + additive measures) must stay
fresh WITHOUT re-scanning the whole base per refresh. The manifest
protocol already records exactly which immutable files each snapshot
added, so a refresh can read ONLY the files committed since its last
cursor, partially aggregate that delta, and merge it with the existing
view — O(view + delta) work instead of O(base).

Correctness contract:

- measures are restricted to the self-decomposable aggregates —
  ``sum`` / ``count`` / ``min`` / ``max``, plus ``approx_distinct``
  (a Datasketches HLL sketch column: partials are ``hll_sketch_agg``,
  the merge is ``hll_union_agg``, and :func:`finalize_rollup` renders
  estimates — merged partials estimate EXACTLY what one full-pass
  sketch would, pinned by tests) — whose merge is the same aggregate
  over partials (``avg`` derives from sum/count; exact
  ``count_distinct`` is NOT decomposable and is rejected loudly,
  pointing at approx_distinct);
- the incremental path is taken only when every base version since the
  cursor is an ``append`` whose file list is a superset of the
  cursor's. An overwrite/upsert in the window (rows may have VANISHED,
  and min/max cannot un-see them) falls back to a full recompute —
  silently-correct, never silently-stale;
- the refresh cursor (base version + the spec it was built for) rides
  the view's own manifest ``properties``, and the view publish pins
  ``expected_parent`` to the view version the merge was derived from,
  so two concurrent refreshes serialize: the loser raises
  VersionConflictError instead of double-counting a delta.

Reference parity: the reference's cache is an all-or-nothing
content-addressed result store (dbcut/query.py:68-131) — a stale key
means a FULL re-fetch. This module is that freshness contract upgraded
to delta maintenance for the aggregate case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

MEASURE_OPS = ("sum", "count", "min", "max", "approx_distinct")

# fixed output type for sums: Spark widens decimal sums per aggregation
# level (25,6 → 35,6 → …), so without a pin the view's schema would
# drift between a full refresh and the Nth incremental one
_SUM_TYPE = "decimal(38,6)"


def _normalize(keys: list[str], measures: dict) -> dict:
    """Canonical spec stored on the view's manifest; also the validity
    check for reusing a cursor (a refresh with a DIFFERENT spec must
    not merge into the old view's numbers)."""
    out = {}
    for alias, (op, col) in measures.items():
        if op not in MEASURE_OPS:
            raise ValueError(
                f"measure {alias!r}: op {op!r} is not decomposable; "
                f"supported: {MEASURE_OPS} (avg = sum/count; exact "
                "count_distinct cannot be merged from partials — use "
                "approx_distinct, an HLL sketch whose union is exact "
                "over partials)"
            )
        if op != "count" and not col:
            raise ValueError(f"measure {alias!r}: op {op!r} needs a column")
        out[alias] = [op, col if op != "count" else None]
    if not keys:
        raise ValueError("rollup needs at least one group key")
    if not out:
        raise ValueError("rollup needs at least one measure")
    clash = sorted(set(out) & set(keys))
    if clash:
        raise ValueError(
            f"measure aliases collide with group keys: {clash}"
        )
    return {"keys": list(keys), "measures": out}


def _partial_exprs(measures: dict) -> list:
    """Aggregates over RAW base rows."""
    exprs = []
    for alias, (op, col) in measures.items():
        if op == "sum":
            exprs.append(
                F.sum(F.col(col).cast(_SUM_TYPE)).cast(_SUM_TYPE).alias(alias)
            )
        elif op == "count":
            exprs.append(F.count(F.lit(1)).alias(alias))
        elif op == "min":
            exprs.append(F.min(col).alias(alias))
        elif op == "approx_distinct":
            exprs.append(F.hll_sketch_agg(col).alias(alias))
        else:
            exprs.append(F.max(col).alias(alias))
    return exprs


def _merge_exprs(measures: dict) -> list:
    """Aggregates over PARTIAL rows (view ∪ delta-partials): the merge
    of each decomposable op."""
    exprs = []
    for alias, (op, _col) in measures.items():
        if op in ("sum", "count"):
            merged = F.sum(alias)
            if op == "sum":
                merged = merged.cast(_SUM_TYPE)
            exprs.append(merged.alias(alias))
        elif op == "min":
            exprs.append(F.min(alias).alias(alias))
        elif op == "approx_distinct":
            exprs.append(F.hll_union_agg(alias).alias(alias))
        else:
            exprs.append(F.max(alias).alias(alias))
    return exprs


def finalize_rollup(df: DataFrame, measures: dict) -> DataFrame:
    """Render a view for consumption: HLL sketch columns become
    estimates (bigint, same alias); everything else passes through.
    The view TABLE keeps the sketches — they are the mergeable state;
    an estimate cannot be merged further."""
    cols = []
    spec = {a: op for a, (op, _c) in measures.items()}
    for name in df.columns:
        if spec.get(name) == "approx_distinct":
            cols.append(F.hll_sketch_estimate(name).alias(name))
        else:
            cols.append(F.col(name))
    return df.select(*cols)


def rollup(df: DataFrame, keys: list[str], measures: dict) -> DataFrame:
    """One-shot rollup of raw rows — the full-recompute path, and the
    definition the incremental path must reproduce bit-for-bit (pinned
    by the differential tests)."""
    spec = _normalize(keys, measures)
    return df.groupBy(*spec["keys"]).agg(*_partial_exprs(spec["measures"]))


def refresh_rollup(
    spark: SparkSession,
    base_path: str,
    view_path: str,
    keys: list[str],
    measures: dict,
    stats_cols: list[str] | None = None,
) -> dict:
    """Bring the view at ``view_path`` up to date with the base table's
    current snapshot. Returns ``{"mode": "full"|"incremental"|"noop",
    "base_version": ..., "view_version": ..., "delta_files": ...}``.

    ``measures`` maps output column → ``(op, column)`` with op in
    ``sum|count|min|max|approx_distinct`` (count ignores its column;
    approx_distinct stores a mergeable HLL sketch — render estimates
    with :func:`finalize_rollup`). The incremental path reads ONLY the
    data files appended since the cursor — the manifest diff IS the
    change capture; no log, no timestamps, no rescan."""
    from dbcut_spark.sinks.manifest import (
        VersionConflictError,
        _load_manifest,
        _read_files,
        append_delta,
        current_version,
        publish_snapshot,
        read_snapshot,
    )

    spec = _normalize(keys, measures)
    bv = current_version(base_path)
    if bv is None:
        raise FileNotFoundError(f"no published snapshot under {base_path}")
    view_v = current_version(view_path)
    cursor = None
    if view_v is not None:
        vm = _load_manifest(view_path, view_v)
        props = (vm or {}).get("properties") or {}
        mv = props.get("matview")
        if mv and mv.get("spec") == spec:
            cursor = mv.get("base_version")
    if cursor == bv:
        return {
            "mode": "noop",
            "base_version": bv,
            "view_version": view_v,
            "delta_files": 0,
        }

    incremental = False
    delta_rels: list[str] = []
    bm = None
    if cursor is not None and cursor < bv:
        # shared window rule (manifest.append_delta): incremental only
        # when every commit since the cursor is a pure row addition;
        # the returned head manifest is reused for the delta schema
        # (at the documented 1e5-file scale a stats-laden manifest is
        # tens of MB — parse once)
        got = append_delta(base_path, cursor, bv)
        if got is not None:
            delta_rels, bm = got
            incremental = True

    if incremental:
        schema = StructType.fromJson(bm["schema"])
        delta = _read_files(spark, base_path, delta_rels, schema, bv)
        partial = rollup(delta, keys, measures)
        view = read_snapshot(spark, view_path, view_v)
        merged = (
            view.unionByName(partial)
            .groupBy(*spec["keys"])
            .agg(*_merge_exprs(spec["measures"]))
        )
        mode = "incremental"
    else:
        merged = rollup(read_snapshot(spark, base_path, bv), keys, measures)
        mode = "full"

    try:
        new_v = publish_snapshot(
            merged,
            view_path,
            mode="overwrite",
            expected_parent=view_v,
            stats_cols=stats_cols,
            properties={"matview": {"base_version": bv, "spec": spec}},
        )
    except VersionConflictError:
        # a concurrent refresh won: its cursor is AT LEAST as fresh as
        # ours would have been — surface the race, never double-count
        raise
    return {
        "mode": mode,
        "base_version": bv,
        "view_version": new_v,
        "delta_files": len(delta_rels) if incremental else None,
    }
