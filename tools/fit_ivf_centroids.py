"""Fit the IVF coarse quantizer offline and commit it as an artifact.

Real IVF indexes are built once and reused; refitting KMeans inside
every query would be wrong at any scale AND makes the result depend on
ML-library internals. Storing the centroids as repo data makes the
quantizer part of the query definition: the Spark path and the DuckDB
oracle consume the *same* literals, so ann_ivf_topk gets a full
value-hash oracle (assignment, probe, and re-rank are all plain SQL
once the centroids are constants — same pattern as the LSH
hyperplanes in queries_pipeline._lsh_ann_sql).

Usage: python tools/fit_ivf_centroids.py [sf_dir ...]
Writes dbcut_spark/data/ivf_centroids.json keyed by a cheap table
fingerprint (row count + sum(label)) that both Spark and DuckDB can
compute, since different scale factors can share a row count.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "dbcut_spark",
    "data",
    "ivf_centroids.json",
)

DEFAULT_DIRS = [f"/root/testdata/sf{sf}" for sf in ("0.001", "0.01", "0.1")]
N_CENTROIDS = 16
SEED = 7


def main() -> None:
    from pyspark.sql import functions as F

    from dbcut_spark.operators import similarity as sim
    from dbcut_spark.session import get_spark
    from dbcut_spark.sources.parquet import read_table

    dirs = sys.argv[1:] or DEFAULT_DIRS
    spark = get_spark("fit-ivf-centroids")
    entries = []
    for sf_dir in dirs:
        if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
            continue
        e = read_table(spark, sf_dir, "embeddings")
        fp = e.agg(
            F.count(F.lit(1)).alias("n"), F.sum("label").alias("slab")
        ).collect()[0]
        cands = e.filter(F.col("vec_id") >= 10)
        centroids = sim.fit_centroids(cands, n_centroids=N_CENTROIDS, seed=SEED)
        entries.append(
            {
                "path": os.path.realpath(sf_dir),
                "n_rows": fp["n"],
                "sum_label": fp["slab"],
                "n_centroids": N_CENTROIDS,
                "seed": SEED,
                "centroids": centroids,
            }
        )
        print(f"fitted {sf_dir}: n={fp['n']} sum_label={fp['slab']}")
    os.makedirs(os.path.dirname(ARTIFACT), exist_ok=True)
    with open(ARTIFACT, "w") as f:
        json.dump(entries, f)
    print(f"wrote {ARTIFACT} ({len(entries)} entries)")


if __name__ == "__main__":
    main()
