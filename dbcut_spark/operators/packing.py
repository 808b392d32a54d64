"""Sequence packing — assign documents to fixed-token-budget training
sequences (the packing step of a pretraining data pipeline: documents
are concatenated in a deterministic order and chunked into
``budget``-token sequences; documents may straddle a boundary, which
the offsets record).

Scale shape: packing is per-SHARD (the partition column — source,
date, or an explicit shard key), exactly how production pipelines run
it (each worker packs its own shard; global packing would serialize
the whole corpus through one cumulative scan). Within a shard the
running token offset is one window cumulative sum ordered by a
deterministic content-hash order — a single hash-partition shuffle on
the shard key, no global sort. The window is safe because a shard is
one worker's unit of work by construction; the 100 TB corpus is many
shards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    shard_col: str,
    budget: int,
    order_col: Column | None = None,
) -> DataFrame:
    """Per-shard concat-and-chunk packing.

    Returns one row per document: its shard, deterministic position,
    token count, global start offset within the shard's concatenated
    stream, the sequence index (``start_off // budget``) and offset
    within that sequence. ``order_col`` defaults to the md5 of the id —
    a reproducible shuffle that decorrelates adjacent documents (the
    usual bias guard), identical across runs/engines.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    order = order_col if order_col is not None else F.md5(F.col(id_col).cast("string"))
    # explicit ROWS frame: the default RANGE frame sums ALL peer rows
    # into each peer's cumulative total, so tied (order, id) pairs —
    # duplicate ids in a pre-dedup corpus — would get overlapping
    # offsets silently; the DuckDB oracle already pins ROWS UNBOUNDED
    # PRECEDING (round-8 review fix). n_tokens is the FINAL tie-break:
    # duplicate ids with UNEQUAL token counts are otherwise a total tie
    # under (md5(id), id), so which duplicate took which offset varied
    # across runs/partitionings — breaking the documented
    # reproducibility contract exactly on pre-dedup corpora (round-10
    # review; ids with equal counts remain interchangeable)
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order.asc(), F.col(id_col).asc(), F.col(token_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).alias("start_off")
    return df.select(
        F.col(id_col),
        F.col(shard_col),
        F.col(token_col).cast("long").alias("n_tokens"),
        start,
    ).select(
        id_col,
        shard_col,
        "n_tokens",
        F.col("start_off").cast("long").alias("start_off"),
        F.floor(F.col("start_off") / budget).cast("long").alias("seq_id"),
        (F.col("start_off") % budget).cast("long").alias("off_in_seq"),
    )


def length_batches(
    df: DataFrame,
    id_col: str,
    token_col: str,
    shard_col: str,
    batch_size: int,
) -> DataFrame:
    """Per-shard length-bucketed batching: within each shard,
    documents are sorted by token count (desc, id tiebreak) and cut
    into fixed-size batches, so same-batch documents have near-equal
    lengths and padding waste is minimized — the dynamic-batching prep
    every serving/training stack runs.

    Same scale shape as :func:`pack_sequences`: the per-shard window
    is one hash-partition shuffle on the shard key; no global sort, no
    single-partition window. A 100 TB corpus is many shards, each a
    single worker's unit of work. Returns one row per document keeping
    the caller's id/shard/token column names, plus the in-shard rank
    ``rn`` (1-based) and ``batch_id``."""
    if batch_size <= 0:
        # loud up front: a zero from a config typo would otherwise
        # surface as NULL batch_ids (non-ANSI) or a DIVIDE_BY_ZERO
        # abort after the full per-shard shuffle (ANSI) — same guard
        # contract as range_join's bin width
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    w = Window.partitionBy(shard_col).orderBy(
        F.col(token_col).desc(), F.col(id_col).asc()
    )
    return df.select(
        F.col(id_col),
        F.col(shard_col),
        F.col(token_col).cast("long").alias(token_col),
        F.row_number().over(w).cast("long").alias("rn"),
    ).withColumn(
        "batch_id", ((F.col("rn") - 1) / batch_size).cast("long")
    )
