"""Measured adjudication for the distributed-BPE trainer routing
(round-10 verdict ask #5): full per-round recount vs inverted-index
trainer (vs the round-9 incremental form) on a synthetic word-type
table big enough to engage the distributed path (> DRIVER_TYPES_MAX).

The type table is synthesized directly — trainers take (word, w), no
corpus needed: md5-derived hex words (alphabet 16, lengths 5-13,
deduped) with Zipf-ish counts, deterministic across runs.

Usage:
    python tools/bpe_bench.py [n_types] [n_merges] [trainer ...]
    # defaults: 2_000_000 30 full indexed

Prints one JSON line per trainer: total seconds, per-round seconds for
the steady-state tail (rounds after the first 5 — excludes JIT and,
for the indexed form, the index bootstrap write), and the learned
table's first/last merge for an identity spot-check. Results feed the
routing note in operators/bpe.py and ARCHITECTURE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_types(spark, n: int):
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select(
            F.substring(
                F.md5(F.col("id").cast("string")),
                1,
                (5 + F.pmod(F.col("id"), F.lit(9))).cast("int"),
            ).alias("word"),
            (1 + F.pmod(F.col("id"), F.lit(997))).alias("w0"),
        )
        .groupBy("word")
        .agg(F.sum("w0").cast("long").alias("w"))
    )


def timed_rounds(fn, words, n_merges):
    """Total wall plus a per-round trace via a counting wrapper around
    the trainer's argmax collects is invasive; instead run twice: once
    at 5 rounds (bootstrap+head) and once at n_merges — tail per-round
    = (t_full - t_head) / (n_merges - 5)."""
    t0 = time.perf_counter()
    m_head, _ = fn(words, 5)
    t_head = time.perf_counter() - t0
    t0 = time.perf_counter()
    merges, _ = fn(words, n_merges)
    t_full = time.perf_counter() - t0
    tail = (t_full - t_head) / max(n_merges - 5, 1)
    return t_full, t_head, tail, merges


def main() -> None:
    from dbcut_spark.operators import bpe
    from dbcut_spark.session import get_spark

    n_types = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    names = sys.argv[3:] or ["full", "indexed"]
    trainers = {
        "full": bpe._bpe_train_distributed,
        "indexed": bpe._bpe_train_indexed,
        "incremental": bpe._bpe_train_incremental,
    }
    spark = get_spark("bpe-bench")
    words = synth_types(spark, n_types).localCheckpoint()
    real_types = words.count()
    for name in names:
        t_full, t_head, tail, merges = timed_rounds(
            trainers[name], words, n_merges
        )
        print(
            json.dumps(
                {
                    "trainer": name,
                    "n_types": real_types,
                    "n_merges": n_merges,
                    "total_sec": round(t_full, 2),
                    "head5_sec": round(t_head, 2),
                    "tail_per_round_sec": round(tail, 3),
                    "first_merge": merges[0][:2] if merges else None,
                    "last_merge": merges[-1][:2] if merges else None,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
