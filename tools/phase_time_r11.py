"""Per-phase wall-clock instrumentation for multi-action queries
(round-11 optimization measurement, guide §1.5): monkeypatches the
building blocks of a named query with timing wrappers, runs the query
once on a warm session, and prints a phase->seconds breakdown.

Usage: python tools/phase_time_r11.py <query> [repeats]
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIMES: dict[str, float] = defaultdict(float)
CALLS: dict[str, int] = defaultdict(int)


def wrap(mod, name, label=None):
    fn = getattr(mod, name)
    key = label or f"{mod.__name__.rsplit('.', 1)[-1]}.{name}"

    def timed(*a, **k):
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            TIMES[key] += time.perf_counter() - t0
            CALLS[key] += 1

    setattr(mod, name, timed)
    return fn


def main() -> None:
    name = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import dbcut_spark.operators.curation as cur
    import dbcut_spark.operators.dedup as dd
    import dbcut_spark.sinks.insert_ignore as ii
    import dbcut_spark.sinks.manifest as mf
    import dbcut_spark.streaming.dedup as sd
    from dbcut_spark.operators.pinning import release_pinned
    from dbcut_spark.queries import QUERIES
    from dbcut_spark.session import get_spark

    wrap(mf, "_stage")
    wrap(mf, "_publish")
    wrap(mf, "publish_snapshot")
    wrap(mf, "read_snapshot")
    wrap(ii, "insert_ignore_parquet")
    wrap(ii, "upsert_parquet", "upsert_parquet") if hasattr(
        ii, "upsert_parquet") else None
    wrap(ii, "delete_keys_parquet") if hasattr(
        ii, "delete_keys_parquet") else None
    wrap(dd, "build_lsh_index")
    wrap(dd, "lsh_index_append")
    wrap(dd, "probe_lsh_index")
    wrap(dd, "minhash_signatures")
    wrap(cur, "incremental_dedup_indexed")
    # streaming.dedup imports names inside the function body, so the
    # module-level wraps on dd/ii/cur are what it actually calls
    wrap(sd, "dedup_ingest_batch")

    spark = get_spark("phase-time-r11")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    for i in range(repeats):
        TIMES.clear()
        CALLS.clear()
        t0 = time.perf_counter()
        n = QUERIES[name](spark, sf_dir).count()
        total = time.perf_counter() - t0
        release_pinned()
        spark.catalog.clearCache()
        print(f"\n== run {i}: total {total:.3f}s rows={n}")
        for k in sorted(TIMES, key=TIMES.get, reverse=True):
            print(f"  {TIMES[k]:7.3f}s x{CALLS[k]:<3d} {k}")


if __name__ == "__main__":
    main()
