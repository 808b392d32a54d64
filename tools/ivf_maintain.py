"""Drift-triggered IVF index maintenance (round-7 verdict item 5).

Runs ONE maintenance step for a persisted IVF index against the current
corpus: build when missing, assign-only refresh while the embedding
distribution holds, full quantizer refit + rebuild when the corpus mean
has drifted past the cosine threshold — the loop a production ANN index
runs as its corpus evolves (see operators/similarity.py:ivf_maintain and
docs/ann_recall.md §drift).

Usage:
    python tools/ivf_maintain.py <index_path> [sf_dir] [--threshold 0.98]

Reads <sf_dir>/embeddings.parquet (default /root/testdata/sf0.01) as the
current corpus, candidates vec_id >= 10 (the gate queries' split).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from dbcut_spark.operators import similarity as sim
    from dbcut_spark.session import get_spark
    from dbcut_spark.sources.parquet import read_table

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        print(__doc__)
        sys.exit(2)
    index_path = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    threshold = 0.98
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a else sys.argv[
                sys.argv.index(a) + 1])

    spark = get_spark("ivf-maintain")
    corpus = read_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") >= 10
    )
    report = sim.ivf_maintain(
        spark, corpus, index_path, drift_cos_threshold=threshold
    )
    print(json.dumps({"index": index_path, "sf_dir": sf_dir, **report}))


if __name__ == "__main__":
    main()
