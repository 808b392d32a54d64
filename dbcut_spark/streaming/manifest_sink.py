"""Exactly-once streaming appends into manifest tables.

``foreachBatch`` re-runs a micro-batch after a crash, so a plain
``publish_snapshot(mode='append')`` per batch would double its rows.
This sink makes the append idempotent the way Delta's transaction log
does: every commit carries a ``stream_txn`` map — ``{query_id: last
committed batch_id}`` — in its manifest ``properties``, copied forward
from the previous commit and updated with this batch. A replayed batch
(same id as the last committed — the only batch Structured Streaming
ever re-delivers) becomes a no-op BEFORE staging any data; a batch id
BEHIND the committed txn means the checkpoint was reset or the
query_id reused, and the sink REFUSES loudly rather than silently
dropping everything up to the recorded id (Delta's txnAppId has this
same footgun and merely documents it). A batch racing another writer
loses the version CAS, re-resolves the head (whose txn map may now
include itself — e.g. its own publish succeeded but the
acknowledgement was lost), re-checks, and retries the COMMIT ONLY —
the batch is staged once; CAS losers never re-write the data. The
check and the data commit are the same atomic manifest publish, so
there is no window where the data landed but the txn didn't.

Map maintenance contract: any writer that REWRITES the table without
changing its logical content must carry the map forward —
``sinks.manifest.compact_snapshot`` preserves the head's properties
verbatim for exactly this reason. A manual append that drops the map
degrades replay detection for batches older than the last map-carrying
commit, so the resolver walks BACK from the head to the newest commit
that carries a map (normally the head itself, one manifest read).

Composes with ``operators/matview.py``: appends through this sink are
ordinary manifest ``append`` commits, so an incremental rollup refresh
per micro-batch reads exactly the files that batch added — a
streaming-maintained aggregate for O(view + batch) per trigger (the
``events_stream_manifest_rollup`` gate pins the composition
cross-engine).

Reference parity: the reference's idempotent load path is the
INSERT-IGNORE re-insertion of cached rows (dbcut/cli/operations.py) —
per-ROW idempotence keyed on PKs. This sink is the per-BATCH
equivalent for append-only tables where rows have no natural PK (log
and event ingestion), which insert-ignore cannot protect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

TXN_KEY = "stream_txn"


def _resolve_txn(table_path: str, head: int | None) -> dict:
    """The newest committed ``stream_txn`` map at or below ``head`` —
    the shared walk-back resolver (manifest.resolve_property_map):
    normally one manifest read, past map-less commits and overwrites
    (a reset table's old map still marks those batch ids as consumed,
    the conservative reading for replay detection)."""
    from dbcut_spark.sinks.manifest import resolve_property_map

    return resolve_property_map(table_path, TXN_KEY, head)


def append_batch_exactly_once(
    batch: DataFrame,
    batch_id: int,
    table_path: str,
    query_id: str,
    partition_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
    cluster_by: list[str] | None = None,
    retries: int = 4,
) -> int | None:
    """Append one micro-batch to a manifest table, exactly once per
    (query_id, batch_id). Returns the published version, or None when
    the batch was already committed (replay) — decided BEFORE staging,
    so a replay costs one manifest read, not a parquet write.

    The publish pins ``expected_parent`` to the head the txn check ran
    against: a racer (another query's batch, a compaction) taking that
    version fails THIS commit with a version conflict, and the retry
    re-reads the new head's txn map — which is how a writer whose
    previous publish succeeded but crashed before acknowledging
    discovers its own batch and returns None instead of double-writing."""
    from dbcut_spark.sinks.manifest import (
        VersionConflictError,
        current_version,
        publish_snapshot,
    )

    from dbcut_spark.sinks.manifest import _stage

    staged: list[str] | None = None
    for attempt in range(retries + 1):
        head = current_version(table_path)
        txn = _resolve_txn(table_path, head)
        last = txn.get(query_id)
        if last is not None and last == batch_id:
            return None  # crash-replay of the last committed batch
        if last is not None and last > batch_id:
            # Structured Streaming only ever re-delivers the LAST
            # batch; a LOWER id means the checkpoint was reset (or the
            # query_id reused for a new stream) — silently treating
            # every batch up to `last` as a replay would discard all
            # of that data with no error (review finding, round 11;
            # Delta's txnAppId has this same footgun and documents it,
            # this sink refuses instead)
            raise RuntimeError(
                f"batch_id {batch_id} is behind {table_path}'s committed "
                f"txn {last} for query_id {query_id!r}: the checkpoint "
                "was reset or the query_id was reused. Use a NEW "
                "query_id for a new stream (its batches will append), "
                "or resume from the original checkpoint."
            )
        txn[query_id] = batch_id
        if cluster_by is None and staged is None:
            # stage ONCE; CAS-losing retries recommit JUST the manifest
            # against the staged files instead of re-writing the batch
            # (cluster_by re-lays per publish and stays on that path)
            staged = _stage(batch, table_path, partition_by, True)
        try:
            return publish_snapshot(
                batch,
                table_path,
                mode="append",
                partition_by=partition_by,
                stats_cols=stats_cols,
                cluster_by=cluster_by,
                expected_parent=head,
                properties={TXN_KEY: txn},
                staged_files=staged,
            )
        except VersionConflictError:
            if attempt >= retries:
                raise
    raise AssertionError("unreachable")


def merge_batch_exactly_once(
    batch: DataFrame,
    batch_id: int,
    table_path: str,
    query_id: str,
    pk: list[str],
    op_col: str | None = None,
    retries: int = 4,
) -> int | None:
    """MERGE one CDC micro-batch into a manifest table exactly once
    per (query_id, batch_id) — the merge-on-read twin of
    :func:`append_batch_exactly_once`: replaced/deleted keys die via
    one equality tombstone, the batch's rows land as new files, and
    the txn map rides the SAME atomic commit (O(batch) per trigger,
    no existing file read or rewritten — the streaming-CDC write path
    into the lakehouse). Same replay contract: a re-delivered last
    batch no-ops BEFORE staging; a batch id behind the committed txn
    refuses loudly. A CAS-losing retry re-stages the batch (unlike the
    append sink's staged-file reuse — a merge's staged set depends on
    nothing else, and CAS losses are rare; stated trade). The empty
    table bootstraps with the first batch's upserts pinned to
    'table must be empty'."""
    from dbcut_spark.sinks.manifest import (
        VersionConflictError,
        current_version,
        publish_mor_commit,
        publish_snapshot,
    )
    from pyspark.sql import functions as F

    upserts = (
        batch.filter(~F.col(op_col).eqNullSafe("D")).drop(op_col)
        if op_col
        else batch
    )
    for attempt in range(retries + 1):
        head = current_version(table_path)
        txn = _resolve_txn(table_path, head)
        last = txn.get(query_id)
        if last is not None and last == batch_id:
            return None  # crash-replay of the last committed batch
        if last is not None and last > batch_id:
            raise RuntimeError(
                f"batch_id {batch_id} is behind {table_path}'s committed "
                f"txn {last} for query_id {query_id!r}: the checkpoint "
                "was reset or the query_id was reused. Use a NEW "
                "query_id for a new stream, or resume from the "
                "original checkpoint."
            )
        txn[query_id] = batch_id
        try:
            if head is None:
                return publish_snapshot(
                    upserts,
                    table_path,
                    mode="overwrite",
                    expected_parent=None,  # the table must still be empty
                    properties={TXN_KEY: txn},
                )
            return publish_mor_commit(
                batch.sparkSession,
                table_path,
                upserts,
                [(list(pk), batch.select(*pk))],
                retries=0,
                expected_parent=head,
                properties={TXN_KEY: txn},
                what="merge_batch_exactly_once",
            )
        except VersionConflictError:
            if attempt >= retries:
                raise
    raise AssertionError("unreachable")


def stream_manifest_merge(
    stream: DataFrame,
    table_path: str,
    query_id: str,
    checkpoint: str,
    pk: list[str],
    op_col: str | None = None,
    trigger: dict | None = None,
):
    """Start a streaming CDC MERGE into a manifest table (foreachBatch
    over :func:`merge_batch_exactly_once`). Returns the
    StreamingQuery. Default trigger drains available input and stops.
    Run :func:`dbcut_spark.sinks.manifest.compact_snapshot`
    periodically to fold the accumulating tombstone debt in."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        merge_batch_exactly_once(
            batch, batch_id, table_path, query_id, pk, op_col=op_col
        )

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def stream_manifest_append(
    stream: DataFrame,
    table_path: str,
    query_id: str,
    checkpoint: str,
    trigger: dict | None = None,
    rollup: dict | None = None,
    **publish_opts,
):
    """Start a streaming append into a manifest table (foreachBatch over
    :func:`append_batch_exactly_once`). Returns the StreamingQuery.
    Default trigger drains available input and stops; pass e.g.
    ``{"processingTime": "1 minute"}`` for continuous ingestion.

    ``rollup={"view_path": ..., "keys": [...], "measures": {...}}``
    refreshes an incrementally-maintained rollup view after each
    batch's append — the refresh reads exactly the files the batch
    added (manifest diff), so the view stays fresh for O(view + batch)
    per trigger. The refresh runs AFTER the exactly-once append and is
    itself idempotent (a replayed batch appends nothing, so the
    refresh is a noop)."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        append_batch_exactly_once(
            batch, batch_id, table_path, query_id, **publish_opts
        )
        if rollup:
            from dbcut_spark.operators.matview import refresh_rollup
            from dbcut_spark.sinks.manifest import VersionConflictError

            try:
                refresh_rollup(
                    batch.sparkSession,
                    table_path,
                    rollup["view_path"],
                    rollup["keys"],
                    rollup["measures"],
                )
            except VersionConflictError:
                # a concurrent refresher won the view's CAS — its
                # cursor is AT LEAST as fresh as ours would have been,
                # so losing here is not an error worth killing the
                # stream over; the NEXT batch's refresh catches the
                # view up (review finding, round 11)
                pass

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
