"""Streaming CDC merge: continuously upsert / delete a parquet target
from a change stream — the ``foreachBatch`` + MERGE pattern every
lakehouse pipeline uses for change-data-capture ingestion (the
streaming twin of the batch refresh surface gate-verified by
``tpch_rf_refresh`` / ``tpch_rf_refresh_partitioned``).

Structured Streaming has no row-level-mutation sink for parquet, and
none is expressible as a streaming query — MERGE needs the TARGET as a
join side, which would make the stream self-referential. The public
answer is ``foreachBatch``: each micro-batch is handed to batch code,
here :func:`dbcut_spark.sinks.insert_ignore.upsert_parquet` /
``delete_keys_parquet`` — so the streaming path reuses the exact
partition-pruned, staging-swapped rewrite the batch path is verified
on (one code path, two arrival modes).

Semantics: each micro-batch is deduped on the PK before the merge
(last-writer-wins WITHIN a batch needs an ordering column — pass
``order_within_batch`` for deterministic intra-batch resolution);
an optional ``op_col`` carrying 'D' rows routes deletes. Micro-batch
boundaries are checkpointed by Structured Streaming, and
``upsert_parquet`` is idempotent for identical replayed batches, so a
restart re-applying the last uncommitted batch converges to the same
table.

Scale: state lives in the target table, not the stream (no watermark
needed); per-batch cost is the partition-pruned rewrite — on a
date-partitioned 100 TB target a CDC batch touching today's partition
rewrites only that partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_cdc_batch(
    batch: DataFrame,
    path: str,
    pk: list[str],
    op_col: str | None = None,
    order_within_batch: str | None = None,
    schema_evolution: str = "strict",
    ambiguous_ops: str = "error",
) -> tuple[int, int, int]:
    """Merge ONE change batch into the parquet target. Returns
    (updated, inserted, deleted). Pure batch function — used by the
    streaming sink below and directly testable. ``ambiguous_ops``
    governs a same-batch delete+upsert on one PK when no
    ``order_within_batch`` column exists: ``'error'`` (default)
    refuses loudly, ``'upsert-wins'`` applies deletes first (the
    legacy order — correct ONLY when the source's same-batch pattern
    is delete-then-reinsert)."""
    if ambiguous_ops not in ("error", "upsert-wins"):
        raise ValueError(
            f"ambiguous_ops must be 'error' or 'upsert-wins', got "
            f"{ambiguous_ops!r}"
        )
    from dbcut_spark.sinks.insert_ignore import (
        delete_keys_parquet,
        upsert_parquet,
    )

    spark = batch.sparkSession
    if order_within_batch is not None:
        # deterministic intra-batch last-writer-wins: keep the max
        # ordering row per PK (ties broken by the ordering value only —
        # callers needing total order should pass a unique sequence col)
        from pyspark.sql import Window

        w = Window.partitionBy(*pk).orderBy(F.col(order_within_batch).desc())
        batch = (
            batch.withColumn("__dbcut_rn", F.row_number().over(w))
            .filter(F.col("__dbcut_rn") == 1)
            .drop("__dbcut_rn")
        )
        import os

        if os.path.exists(path) and order_within_batch not in (
            spark.read.parquet(path).columns
        ):
            # the ordering column is transport metadata when the target
            # lacks it — drop it DELIBERATELY here (upsert_parquet's
            # strict schema-drift guard would otherwise reject it, and
            # silently widening the target with a sequence column is
            # never what a CDC pipeline wants)
            batch = batch.drop(order_within_batch)
    deleted = 0
    if op_col is not None:
        if order_within_batch is None and ambiguous_ops == "error":
            # a PK carrying BOTH a delete and an upsert in one batch is
            # unresolvable without an ordering column: deletes apply
            # first here, so the upsert would ALWAYS win — silently
            # resurrecting rows whose true CDC order was
            # insert-then-delete (round-10 review). Detect and refuse
            # by default; one batch-sized aggregate, no target scan.
            # ``ambiguous_ops='upsert-wins'`` restores the legacy
            # deletes-first order for sources whose only same-batch
            # pattern is delete-then-reinsert (key recycling), where
            # upsert-wins IS the correct resolution — an explicit
            # opt-in, since the guard cannot tell the two apart
            # (round-10 second-pass review).
            amb = (
                batch.groupBy(*pk)
                .agg(
                    F.count_distinct(
                        F.col(op_col).eqNullSafe("D")
                    ).alias("__nops")
                )
                .filter(F.col("__nops") > 1)
                .select(*pk)
                .first()
            )
            if amb is not None:
                raise ValueError(
                    f"micro-batch carries both a delete and an upsert "
                    f"for PK {tuple(amb)}: pass order_within_batch (a "
                    "sequence/updated_at column) so last-writer-wins "
                    "can resolve them; without it the merge order is "
                    "arbitrary"
                )
        dels = batch.filter(F.col(op_col) == "D").select(*pk)
        batch = batch.filter(
            F.col(op_col).isNull() | (F.col(op_col) != "D")
        ).drop(op_col)
        deleted = delete_keys_parquet(spark, dels, path, pk)
    updated, inserted = upsert_parquet(
        spark, batch, path, pk, schema_evolution=schema_evolution
    )
    return updated, inserted, deleted


def stream_upsert_parquet(
    stream: DataFrame,
    path: str,
    pk: list[str],
    checkpoint: str,
    op_col: str | None = None,
    order_within_batch: str | None = None,
    trigger: dict | None = None,
    schema_evolution: str = "strict",
    ambiguous_ops: str = "error",
):
    """Start a streaming query that merges the change stream into the
    parquet table at ``path``. Returns the StreamingQuery.

    ``trigger`` passes straight to ``DataStreamWriter.trigger`` —
    default ``{"availableNow": True}`` drains what exists and stops
    (batch-drain/test mode); a continuously-running CDC merge passes
    e.g. ``{"processingTime": "30 seconds"}``.

    Note ``order_within_batch`` names a data column used for
    intra-batch last-writer-wins (e.g. ``updated_at``); when the
    existing target lacks that column it is treated as transport
    metadata and dropped after resolution (deliberately — see
    ``apply_cdc_batch``), otherwise it merges like any data column. It
    still becomes part of the schema when the FIRST batch creates the
    table. Any other incoming column the target lacks follows
    ``schema_evolution``: ``"strict"`` (default) fails the batch,
    ``"add"`` widens the target with NULL backfill."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(
            batch, path, pk, op_col, order_within_batch, schema_evolution,
            ambiguous_ops,
        )

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
