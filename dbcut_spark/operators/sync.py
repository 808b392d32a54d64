"""Incremental cursor sync: keep a manifest table in step with a
growing source by re-reading only rows PAST a monotonic cursor column.

The production shape this serves is the recurring re-extraction the
reference handles by full reload (a stale cache key → re-fetch the
whole closure, ``/root/reference/dbcut/query.py:108-131``): an orders /
events table grows monotonically in some column (an auto-increment id,
a created_at timestamp), and each sync run should move O(delta) rows,
not O(table). The committed high-water mark rides the target's own
manifest ``properties`` — the same consistency-pointer family as the
streaming sink's ``stream_txn`` map and the matview refresh cursor —
so the data append and the cursor advance are ONE atomic manifest
publish: there is no window where rows landed without the cursor (a
re-run would double them) or the cursor advanced without the rows (a
re-run would skip them).

Boundary-ties contract (the classic incremental-extract bug): with a
strict ``cursor > high`` filter, a row that commits LATE with
``cursor == high`` (two rows sharing a timestamp, one arriving after
the sync that consumed the other) is silently lost forever. Passing
``pk`` switches the filter to ``cursor >= high`` and anti-joins the
boundary slice of the TARGET (only rows AT the old high-water mark —
one file-skipping-pruned read, not a table scan) so late ties land
exactly once. Without a pk the strict filter applies and the contract
is documented: the cursor must be strictly monotonic at the source.

Concurrency: the publish pins ``expected_parent`` to the head the
cursor was resolved from. A racing sync (or compaction/append) taking
that version fails the commit with VersionConflictError; the retry
re-resolves the cursor — if the racer was another sync of the same
source its committed high-water mark already covers some or all of our
delta, and the re-filter shrinks accordingly (possibly to a noop).
The delta frame is localCheckpointed BEFORE the publish, so a retry
re-filters cheap materialized rows rather than re-reading the source.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SYNC_KEY = "sync_cursor"


def _encode_cursor(v) -> list:
    """JSON-safe ``[tag, value]`` for a high-water mark — manifest
    properties are plain JSON, so temporal/decimal cursors round-trip
    through a tagged string form (same domain split as the manifest's
    footer-stat encoding, but LOSSLESS: the decoded value must compare
    exactly in the next run's filter, not just order correctly)."""
    import datetime
    from decimal import Decimal

    if isinstance(v, bool) or v is None:
        raise ValueError(f"unsupported cursor value {v!r}")
    if isinstance(v, (int, float, str)):
        return ["raw", v]
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return ["ts", v.isoformat()]
    if isinstance(v, datetime.date):
        return ["date", v.isoformat()]
    if isinstance(v, Decimal):
        return ["dec", str(v)]
    raise ValueError(
        f"unsupported cursor type {type(v).__name__}: use a numeric, "
        "string, date, timestamp or decimal cursor column"
    )


def _decode_cursor(enc):
    import datetime
    from decimal import Decimal

    if enc is None:
        return None
    tag, v = enc
    if tag == "raw":
        return v
    if tag == "ts":
        return datetime.datetime.fromisoformat(v)
    if tag == "date":
        return datetime.date.fromisoformat(v)
    if tag == "dec":
        return Decimal(v)
    raise ValueError(f"unknown cursor tag {tag!r}")


def _resolve_cursors(table_path: str, head: int | None) -> dict:
    """Newest committed high-water-mark MAP (source_id → mark) at or
    below ``head`` — the shared walk-back resolver
    (manifest.resolve_property_map). The WHOLE map is resolved: a sync
    of one source must republish every other source's mark too, or the
    next resolver would stop at its commit and re-bootstrap those
    sources (double rows on an append-only target)."""
    from dbcut_spark.sinks.manifest import resolve_property_map

    return resolve_property_map(table_path, SYNC_KEY, head)


def incremental_sync(
    spark: SparkSession,
    load_since: Callable[[object | None], DataFrame],
    target_path: str,
    cursor_col: str,
    source_id: str = "default",
    pk: list[str] | None = None,
    partition_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
    schema_evolution: str | None = None,
    retries: int = 4,
) -> dict:
    """One sync run: pull rows past the committed high-water mark from
    ``load_since`` and append them to the manifest table at
    ``target_path`` in one atomic commit that also advances the cursor.
    Returns ``{"mode": "bootstrap"|"append"|"noop", "rows": n,
    "cursor": new_high, "version": v}``.

    ``load_since(low)`` must return the source rows with
    ``cursor_col > low`` (or ``>= low`` when ``pk`` is set — ties are
    de-duplicated here against the target's boundary slice), and ALL
    rows when ``low`` is None (bootstrap). Pushing the bound into the
    callable lets a JDBC source compile it server-side
    (:func:`jdbc_incremental_sync`) instead of scanning the table and
    filtering in Spark; a parquet/manifest source just returns a
    filtered frame — Catalyst pushes the comparison into the scan
    either way.

    The cursor is the MAX of ``cursor_col`` over the appended delta —
    computed from the rows actually shipped, never from source-side
    clocks, so a lagging replica can only deliver rows late (handled by
    the pk path), never poison the mark. NULL cursors are rejected
    loudly: a NULL neither orders past the mark nor advances it, so a
    source that produces one would silently re-ship or silently drop
    that row on every later run."""
    from dbcut_spark.sinks.manifest import (
        VersionConflictError,
        current_version,
        publish_snapshot,
        read_snapshot,
    )

    if not cursor_col:
        raise ValueError("cursor_col is required")
    last_err: Exception | None = None
    for _attempt in range(retries + 1):
        head = current_version(target_path)
        cursors = _resolve_cursors(target_path, head)
        high = _decode_cursor(cursors.get(source_id))
        delta = load_since(high)
        if cursor_col not in delta.columns:
            raise ValueError(
                f"cursor column {cursor_col!r} missing from the source "
                f"frame (columns: {delta.columns})"
            )
        if high is not None:
            # belt-and-braces re-filter: the committed mark may be
            # FRESHER than the bound the caller's loader saw (CAS retry
            # after losing to a concurrent sync), and a loader that
            # ignores its bound must not double-ship
            delta = delta.filter(
                F.col(cursor_col) >= F.lit(high)
                if pk
                else F.col(cursor_col) > F.lit(high)
            )
            if pk:
                # late ties: drop delta rows already present AT the old
                # mark. Only the boundary slice of the target is read —
                # with stats_cols on the cursor column the manifest
                # prunes every file whose [min,max] excludes the mark
                boundary = read_snapshot(
                    spark, target_path, where=[(cursor_col, "=", high)]
                ).select(*pk)
                delta = delta.join(boundary, on=pk, how="left_anti")
        if pk:
            delta = delta.dropDuplicates(pk)
        # one materialization feeds the NULL guard, the max-cursor agg,
        # the row count and the staged write; a CAS retry re-filters
        # these rows instead of re-reading the source. Lazy: the agg
        # below scans EVERY partition, so the checkpoint materializes
        # inside that job — one job per run instead of two (round-11
        # optimization)
        delta = delta.localCheckpoint(eager=False)
        agg = delta.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(cursor_col).alias("high"),
            F.sum(
                F.col(cursor_col).isNull().cast("long")
            ).alias("nulls"),
        ).collect()[0]
        if agg["n"] == 0:
            return {
                "mode": "noop",
                "rows": 0,
                "cursor": high,
                "version": head,
            }
        if agg["nulls"]:
            raise ValueError(
                f"{agg['nulls']} source row(s) carry NULL {cursor_col!r}"
                " — a NULL cursor can neither be ordered past the "
                "high-water mark nor advance it; filter or backfill "
                "them at the source"
            )
        new_high = agg["high"]
        cursors[source_id] = _encode_cursor(new_high)
        try:
            v = publish_snapshot(
                delta,
                target_path,
                mode="append" if head is not None else "overwrite",
                partition_by=partition_by,
                stats_cols=stats_cols,
                # a source that grew a column syncs on with 'add' (the
                # target schema widens, old files read back NULL); the
                # default stays loud on drift, same as publish_snapshot
                schema_evolution=schema_evolution,
                expected_parent=head,
                properties={SYNC_KEY: cursors},
            )
        except VersionConflictError as e:
            last_err = e
            continue
        return {
            "mode": "append" if head is not None else "bootstrap",
            "rows": agg["n"],
            "cursor": new_high,
            "version": v,
        }
    raise last_err  # retries exhausted


REPLICA_KEY = "replica_src_version"


def _resolve_replica_map(table_path: str, head: int | None) -> dict:
    from dbcut_spark.sinks.manifest import resolve_property_map

    return resolve_property_map(table_path, REPLICA_KEY, head)


def replicate_manifest(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    source_id: str = "default",
    partition_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
    retries: int = 4,
) -> dict:
    """Pull one manifest table into another, incrementally: the
    consumed SOURCE VERSION rides the replica's manifest properties,
    each pull reads only the files the source appended since
    (:func:`dbcut_spark.sinks.manifest.read_changes` semantics), and
    rows + pointer advance in one atomic commit — the manifest-native
    fan-out primitive (replica per region, index-builder feed, a
    downstream team's copy). Returns ``{"mode": "bootstrap"|"append"|
    "rebuild"|"noop", "rows": n, "src_version": v, "version": dst_v}``.

    A non-append source window (overwrite/upsert/compaction) cannot be
    expressed as added rows, so the replica REBUILDS from the source
    snapshot — mode='overwrite' on a single-source replica (the
    replica's own history stays time-travelable), refused loudly on a
    fan-in replica (several source_ids feed one table: a rebuild of one
    source would clobber the others' rows; re-point fan-in replicas at
    compaction-free sources or rebuild the whole table).

    A source-version pointer AHEAD of the live source (the source table
    was deleted and re-created) also refuses loudly — silently
    re-pulling would double every row the replica already holds."""
    from dbcut_spark.sinks.manifest import (
        VersionConflictError,
        append_delta,
        _read_files,
        current_version,
        mor_window_delta,
        publish_mor_commit,
        publish_snapshot,
        read_snapshot,
    )
    from pyspark.sql.types import StructType

    last_err: Exception | None = None
    for _attempt in range(retries + 1):
        src_v = current_version(src_path)
        if src_v is None:
            raise FileNotFoundError(f"no published snapshot under {src_path}")
        dst_head = current_version(dst_path)
        seen_map = _resolve_replica_map(dst_path, dst_head)
        seen = seen_map.get(source_id)
        if seen == src_v:
            return {
                "mode": "noop",
                "rows": 0,
                "src_version": src_v,
                "version": dst_head,
            }
        if seen is not None and seen > src_v:
            raise RuntimeError(
                f"replica {dst_path} has consumed {src_path} up to "
                f"version {seen}, but the source's head is {src_v}: the "
                "source was re-created. Re-pulling would double rows — "
                "rebuild the replica (delete it, or use a new source_id)."
            )
        delta = (
            append_delta(src_path, seen, src_v) if seen is not None else None
        )
        if dst_head is None:
            df = read_snapshot(spark, src_path, src_v)
            mode, write_mode = "bootstrap", "overwrite"
        elif seen is None:
            # fan-in: FIRST pull of an additional source appends the
            # full source snapshot next to the other sources' rows
            df = read_snapshot(spark, src_path, src_v)
            mode, write_mode = "bootstrap", "append"
        elif delta is None:
            # merge-on-read windows (delete/merge commits) collapse to
            # ONE replica commit: the window's net surviving rows plus
            # its tombstone keys — O(delta) instead of a full rebuild.
            # Fan-in replicas are excluded: a source's tombstones would
            # also kill OTHER sources' replica rows with equal keys.
            mor = (
                mor_window_delta(spark, src_path, seen, src_v)
                if len(seen_map) == 1
                else None
            )
            if mor is not None and (mor[0] is not None or mor[1]):
                rows, tombs = mor
                seen_map[source_id] = src_v
                n = rows.count() if rows is not None else 0
                try:
                    v = publish_mor_commit(
                        spark,
                        dst_path,
                        rows,
                        tombs,
                        retries=0,
                        expected_parent=dst_head,
                        properties={REPLICA_KEY: seen_map},
                        what="replicate_manifest",
                    )
                except VersionConflictError as e:
                    last_err = e
                    continue
                return {
                    "mode": "mor-delta",
                    "rows": n,
                    "src_version": src_v,
                    "version": v,
                }
            if len(seen_map) > 1:
                raise RuntimeError(
                    f"source {src_path} had a non-append commit in "
                    f"({seen}, {src_v}] and {dst_path} is a fan-in "
                    f"replica of {sorted(seen_map)} — a rebuild would "
                    "clobber the other sources' rows; rebuild the whole "
                    "replica instead"
                )
            df = read_snapshot(spark, src_path, src_v)
            mode, write_mode = "rebuild", "overwrite"
        else:
            rels, hm = delta
            df = _read_files(
                spark,
                src_path,
                rels,
                StructType.fromJson(hm["schema"]),
                src_v,
            )
            mode, write_mode = "append", "append"
        seen_map[source_id] = src_v
        n = df.count()
        try:
            v = publish_snapshot(
                df,
                dst_path,
                mode=write_mode,
                partition_by=partition_by,
                stats_cols=stats_cols,
                # a widened source replicates on; type changes stay loud
                schema_evolution="add" if write_mode == "append" else None,
                expected_parent=dst_head,
                properties={REPLICA_KEY: seen_map},
            )
        except VersionConflictError as e:
            last_err = e
            continue
        return {
            "mode": mode,
            "rows": n,
            "src_version": src_v,
            "version": v,
        }
    raise last_err


def parquet_incremental_sync(
    spark: SparkSession,
    source_path: str,
    target_path: str,
    cursor_col: str,
    **opts,
) -> dict:
    """Cursor sync from a parquet directory (or any path
    ``spark.read.parquet`` accepts). The bound becomes a plain filter —
    Catalyst pushes it into the scan (PushedFilters + row-group stats),
    so each run reads only row groups past the mark when the source is
    written in cursor order (the natural layout of a growing table)."""

    def load_since(low):
        df = spark.read.parquet(source_path)
        if low is not None:
            op = (
                F.col(cursor_col) >= F.lit(low)
                if opts.get("pk")
                else F.col(cursor_col) > F.lit(low)
            )
            df = df.filter(op)
        return df

    return incremental_sync(
        spark, load_since, target_path, cursor_col, **opts
    )


def jdbc_incremental_sync(
    spark: SparkSession,
    url: str,
    table: str,
    target_path: str,
    cursor_col: str,
    properties: dict[str, str] | None = None,
    quote: str = '"',
    **opts,
) -> dict:
    """Cursor sync from a live JDBC table: the bound compiles into the
    pushed-down query (``WHERE cursor > ?`` server-side — the database
    walks its index on the cursor column; the wire carries only the
    delta). The literal is rendered through Spark's own JDBC dialect
    rules for the common cursor types (numbers verbatim, strings /
    timestamps quoted) — matching the reference's parameterized
    keyset pagination (``/root/reference/dbcut/database.py:269-293``)."""
    props = dict(properties or {})
    q = quote

    def _render(v) -> str:
        import datetime
        import math
        from decimal import Decimal

        if isinstance(v, bool) or v is None:
            raise ValueError(
                f"unsupported cursor literal {v!r} for JDBC push-down"
            )
        if isinstance(v, float) and not math.isfinite(v):
            # repr(inf)/'nan' are not SQL literals — and neither value
            # can be a meaningful high-water mark
            raise ValueError(f"non-finite cursor literal {v!r}")
        if isinstance(v, (int, float)):
            return repr(v)
        if isinstance(v, Decimal):
            # unquoted: a quoted '12.34' against a NUMERIC column is a
            # string comparison on strict dialects
            return str(v)
        if isinstance(v, datetime.datetime):
            return "'" + v.strftime("%Y-%m-%d %H:%M:%S.%f") + "'"
        if isinstance(v, datetime.date):
            return f"'{v.isoformat()}'"
        return "'" + str(v).replace("'", "''") + "'"

    def load_since(low):
        reader = spark.read.format("jdbc").option("url", url).options(**props)
        if low is None:
            return reader.option("dbtable", table).load()
        op = ">=" if opts.get("pk") else ">"
        return reader.option(
            "query",
            f"SELECT * FROM {table} WHERE {q}{cursor_col}{q} {op} "
            + _render(low),
        ).load()

    return incremental_sync(
        spark, load_since, target_path, cursor_col, **opts
    )
