"""Scale-credibility check (round-12 verdict item 8): run the heaviest
rewritten queries against a 10x-scaled deterministic derivative of
sf0.1 and record per-query seconds + ratios to BENCH_SF1.json —
evidence that the round-11/12 rewrites hold when data dominates fixed
overhead, measured instead of argued.

The scaled dataset is DERIVED (never committed, never read by the
bench/oracle): each scaled table is 10 deterministic key-shifted copies
of the sf0.1 original, written with real multi-file splits. documents
text is per-copy translate()'d ('e' -> the copy digit) so copies are
genuinely distinct documents (shingle sets mostly disjoint), keeping
the ingest gate's accept/append path at scale instead of collapsing to
all-dups. Queries needing committed per-sf artifacts (PQ codebooks →
ann_recall_eval) are excluded; ann_lsh_topk stands in for recall_eval's
heaviest unshared pipeline.

Usage: python tools/scale_check_r12.py [--regen]
Writes BENCH_SF1.json next to bench.py. The scaled data lives under
/tmp/dbcut_scale10 (regenerated with --regen).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/dbcut_scale10"
FACTOR = 10
QUERIES_RUN = [
    "dedup_ingest_sequential",   # r11 staging overlap + r12 probe path
    "dedup_clusters",            # r12 minhash construction + Arrow collect
    "part_cooccur_triangles",    # r11 broadcast-intersection rewrite
    "orders_corr_matrix",        # r11 _spread_for_agg
    "orders_manifest_cdf",       # MOR staging overlap
    "ann_lsh_topk",              # r11 signature fusion (recall_eval proxy)
]


def generate(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(OUT, exist_ok=True)
    copy_as_is = ["region", "nation", "customer", "supplier", "part",
                  "events"]
    import shutil

    for t in copy_as_is:
        src = os.path.join(BASE, f"{t}.parquet")
        dst = os.path.join(OUT, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            shutil.copy(src, dst)

    def scaled(name, build):
        dst = os.path.join(OUT, f"{name}.parquet")
        if os.path.exists(dst):
            return
        df = spark.read.parquet(os.path.join(BASE, f"{name}.parquet"))
        parts = [build(df, i) for i in range(FACTOR)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # real multi-file splits so scans parallelize like an at-scale
        # table (the whole point of the check)
        out.repartition(8).write.mode("overwrite").parquet(dst + ".tmp")
        os.rename(dst + ".tmp", dst)

    okey_span = 10_000_000
    pkey_span = 1_000_000
    did_span = 1_000_000
    vid_span = 1_000_000

    scaled("orders", lambda df, i: df.withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(i * okey_span)))
    scaled("lineitem", lambda df, i: df.withColumn(
        "l_orderkey", F.col("l_orderkey") + F.lit(i * okey_span)
    ).withColumn("l_partkey", F.col("l_partkey") + F.lit(i * pkey_span)))
    # translate 'e' -> copy digit: shingle sets of copies are mostly
    # disjoint, so the dedup probe treats them as distinct documents
    scaled("documents", lambda df, i: df.withColumn(
        "doc_id", F.col("doc_id") + F.lit(i * did_span)
    ).withColumn(
        "text",
        F.col("text") if i == 0 else F.translate("text", "e", str(i)),
    ))
    # copies land entirely on the candidate side (vec_id >= 10): the
    # query set stays fixed while the corpus scales, the ANN shape
    scaled("embeddings", lambda df, i: df.withColumn(
        "vec_id", F.col("vec_id") + F.lit(i * vid_span)) if i else df)


def run(spark, sf_dir: str, repeats: int = 3) -> dict:
    from dbcut_spark.operators.pinning import release_pinned
    from dbcut_spark.queries import QUERIES

    out = {}
    for name in QUERIES_RUN:
        spark.sparkContext.setJobDescription(f"scale-check {name} {sf_dir}")
        best, n = None, 0
        for _ in range(repeats):
            t0 = time.perf_counter()
            n = QUERIES[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            release_pinned()
            spark.catalog.clearCache()
        spark._jvm.System.gc()
        out[name] = {"best": round(best, 3), "rows": n}
        print(f"# {sf_dir} {name}: {best:.3f}s rows={n}", file=sys.stderr)
    return out


def main() -> None:
    from dbcut_spark.session import get_spark

    spark = get_spark("scale-check-r12")
    if "--regen" in sys.argv:
        import shutil

        shutil.rmtree(OUT, ignore_errors=True)
    generate(spark)
    spark.read.parquet(f"{BASE}/lineitem.parquet").count()  # warm JVM
    base = run(spark, BASE)
    big = run(spark, OUT)
    result = {
        "metric": "scale_check_10x",
        "unit": "sec",
        "factor": FACTOR,
        "base_sf": 0.1,
        "queries": {
            q: {
                "sf0.1_sec": base[q]["best"],
                "x10_sec": big[q]["best"],
                "time_ratio": round(big[q]["best"] / base[q]["best"], 2),
                "sf0.1_rows": base[q]["rows"],
                "x10_rows": big[q]["rows"],
            }
            for q in QUERIES_RUN
        },
        "notes": (
            "10x key-shifted derivative of sf0.1 (deterministic, "
            "never read by bench/oracle); ann_recall_eval excluded "
            "(PQ codebooks are committed per-sf artifacts) with "
            "ann_lsh_topk as its heaviest-pipeline proxy"
        ),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SF1.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps({k: v["time_ratio"] for k, v in
                      result["queries"].items()}))


if __name__ == "__main__":
    main()
