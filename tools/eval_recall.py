"""Recall@5 tuning sweep for the four approximate ANN paths, written to
docs/ann_recall.md — the table a user tuning bands/nprobe/shortlist
reads before picking settings for their corpus.

Per method the sweep varies ONE lever (everything else at gate-query
defaults), evaluating against the exact brute-force cosine top-5 on the
same query/candidate split the gate queries use (queries: vec_id < 10,
candidates: the rest).

Usage: python tools/eval_recall.py [sf_dir ...]   (default: sf0.01 sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 5


def topk_sets(df) -> dict:
    """{query_id: set(cand_id)} from a (query_id, cand_id, ...) top-k
    frame — tiny (n_queries x k rows), safe to collect."""
    out: dict = {}
    for r in df.select("query_id", "cand_id").collect():
        out.setdefault(r.query_id, set()).add(r.cand_id)
    return out


def recall(approx: dict, exact: dict) -> float:
    """Mean recall@K over queries: |approx ∩ exact| / K (denominator K
    even when a method returns fewer candidates — standard definition,
    same as ann_recall_eval's)."""
    if not exact:
        return 0.0
    total = sum(len(approx.get(q, set()) & hits) / K for q, hits in exact.items())
    return total / len(exact)


def sweep(spark, sf_dir: str) -> dict[str, list[tuple[str, object, float]]]:
    from pyspark.sql import functions as F

    from dbcut_spark.operators import similarity as sim
    from dbcut_spark.queries_pipeline import tp

    e = tp(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    c = e.filter(F.col("vec_id") >= 10)
    exact = topk_sets(sim.cosine_topk(q, c, k=K))

    rows: dict[str, list[tuple[str, object, float]]] = {}

    # LSH: fewer bits per band = more, shorter bands = more collisions =
    # higher recall and more scored pairs (16 planes fixed)
    rows["lsh"] = [
        (
            "band_bits",
            bb,
            recall(topk_sets(sim.lsh_ann_topk(q, c, k=K, band_bits=bb)), exact),
        )
        for bb in (2, 4, 8, 16)
    ]

    # IVF: probe more inverted lists -> recall rises toward exact at
    # nprobe == n_centroids (16), per-query work ~ nprobe/16 of corpus
    cents = sim.stored_centroids(sf_dir)
    if cents is None:
        cents = sim.fit_centroids(c, n_centroids=16)
    rows["ivf"] = [
        (
            "nprobe",
            np_,
            recall(
                topk_sets(
                    sim.ivf_topk(q, c, k=K, n_centroids=16, nprobe=np_, centroids=cents)
                ),
                exact,
            ),
        )
        for np_ in (1, 2, 4, 8, 16)
    ]

    # PQ: deeper ADC shortlist -> more candidates exactly re-ranked
    entry = sim.stored_pq(sf_dir)
    if entry is not None:
        rows["pq"] = [
            (
                "shortlist",
                sl,
                recall(
                    topk_sets(
                        sim.pq_adc_topk(
                            q, c, "embedding", "vec_id", entry["codebooks"], k=K, shortlist=sl
                        )
                    ),
                    exact,
                ),
            )
            for sl in (5, 10, 25, 50)
        ]

    # Binary sign-bit: Hamming shortlist depth, same two-phase tradeoff
    rows["binary"] = [
        (
            "shortlist",
            sl,
            recall(
                topk_sets(
                    sim.binary_hamming_topk(
                        q, c, "embedding", "vec_id", k=K, shortlist=sl
                    )
                ),
                exact,
            ),
        )
        for sl in (5, 10, 25, 50)
    ]
    return rows


DEFAULTS = {"lsh": 4, "ivf": 4, "pq": 50, "binary": 50}
COST = {
    "lsh": "scored pairs grow with collisions (shorter bands ⇒ more buckets shared)",
    "ivf": "per-query candidate work ≈ nprobe/n_centroids of the corpus",
    "pq": "exact re-rank joins raw vectors for shortlist × queries rows",
    "binary": "exact re-rank joins raw vectors for shortlist × queries rows",
}


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    from dbcut_spark.session import get_spark

    spark = get_spark("recall-eval")
    per_sf = {d: sweep(spark, d) for d in sf_dirs}

    labels = [os.path.basename(d.rstrip("/")) for d in sf_dirs]
    out = [
        "# ANN recall tuning — recall@5 vs exact cosine top-5",
        "",
        "Regenerate: `python tools/eval_recall.py`. Gate-query defaults",
        "are **bold**; each table varies one lever with everything else",
        "at defaults (16 hyperplanes, 16 IVF centroids, committed",
        "quantizer artifacts). The correctness gate (`ann_recall_eval`)",
        "hash-verifies the default rows against the DuckDB oracle; this",
        "sweep is the tuning map around them.",
        "",
    ]
    method_titles = {
        "lsh": "Hyperplane LSH (`lsh_ann_topk`) — lever: `band_bits` of 16 planes",
        "ivf": "IVF (`ivf_topk`) — lever: `nprobe` of 16 centroids",
        "pq": "Product quantization (`pq_adc_topk`) — lever: ADC re-rank `shortlist`",
        "binary": "Binary sign-bit (`binary_hamming_topk`) — lever: Hamming `shortlist`",
    }
    for m in ("lsh", "ivf", "pq", "binary"):
        if not all(m in per_sf[d] for d in sf_dirs):
            continue
        lever = per_sf[sf_dirs[0]][m][0][0]
        out.append(f"## {method_titles[m]}")
        out.append("")
        out.append(f"Cost: {COST[m]}.")
        out.append("")
        out.append(f"| {lever} | " + " | ".join(f"recall@5 ({lb})" for lb in labels) + " |")
        out.append("|" + "---|" * (1 + len(labels)))
        values = [v for (_, v, _) in per_sf[sf_dirs[0]][m]]
        for i, v in enumerate(values):
            cell = f"**{v}**" if v == DEFAULTS[m] else str(v)
            recs = [f"{per_sf[d][m][i][2]:.3f}" for d in sf_dirs]
            if v == DEFAULTS[m]:
                recs = [f"**{r}**" for r in recs]
            out.append(f"| {cell} | " + " | ".join(recs) + " |")
        out.append("")

    out += [
        "### Reading the tables",
        "",
        "- **LSH**: recall falls as `band_bits` rises (fewer, longer",
        "  bands ⇒ fewer collisions). Tune down for recall, up for cost;",
        "  adding planes (`n_planes`) raises precision at fixed",
        "  bands×bits.",
        "- **IVF**: `nprobe = n_centroids` is exact by construction —",
        "  the knob trades candidate volume linearly for recall. At",
        "  100 TB, `n_centroids` should scale to keep lists",
        "  partition-sized; `nprobe` then sets the per-query scan",
        "  fraction.",
        "- **PQ / binary**: shortlist below k cannot reach recall 1.0;",
        "  the knee is where ADC/Hamming ranking quality saturates —",
        "  deepen the shortlist until recall plateaus, it only costs",
        "  shortlist×queries re-rank rows.",
        "",
    ]
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "ann_recall.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote docs/ann_recall.md ({', '.join(labels)})")


if __name__ == "__main__":
    main()
