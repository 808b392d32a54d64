"""Mergeable distinct-count sketches (beyond-reference).

At 100 TB you do not count distinct tokens exactly — you sketch. The
standard engine answer is HyperLogLog (``approx_count_distinct``), but
its estimate depends on engine-internal hashing, so it cannot be
oracle-verified. The K-minimum-values (KMV / bottom-k) sketch gives
the same mergeability with a FULLY deterministic estimator — the k
smallest md5-derived hash fractions — reproducible bit-for-bit in any
engine, which is why it is the repo's sketch of choice for the
correctness gate (Beyer et al., "On synopses for distinct-value
estimation under multiset operations", SIGMOD'07).

Estimator: hash every value to U(0,1) (md5 head / 2^32); with v_k the
k-th smallest distinct hash, E[distinct] = (k-1)/v_k, relative error
~1/sqrt(k-2). Merging shards = merging their bottom-k sets and
re-taking the k smallest — associative and commutative, an ordinary
aggregation tree.

Plan shape: one hash projection, a per-group DISTINCT on the 32-bit
hash (the shuffle carries (group, int) pairs, never values), a
windowed bottom-k, one row per group out. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_DENOM = float(2**32)

# ONE cross-engine hashing idiom repo-wide: re-export the sampling
# module's U(0,1) hash (salt='' ⇒ md5(concat('', x)) == md5(x)) so the
# two modules cannot drift apart and silently break each other's
# oracle-parity assumptions
from dbcut_spark.operators.sampling import hash_fraction  # noqa: E402,F401


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct-count estimate: (group, n_exactish rows
    kept aside by the caller if wanted, est_distinct). Groups with
    fewer than k distinct hashes fall back to their exact distinct
    count (the sketch IS exact below k)."""
    h = (
        # NULL values carry no distinct-count information and their
        # NULL hash would sort FIRST, stealing a bottom-k rank (the
        # k-th row would then hold the (k-1)-th real hash and the
        # estimator would overshoot) — drop them before hashing
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col), hash_fraction(value_col).alias("hv"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("hv")
    ranked = h.withColumn("rn", F.row_number().over(w))
    kth = ranked.filter(F.col("rn") == k).select(
        F.col(group_col), F.col("hv").alias("vk")
    )
    exact_small = (
        ranked.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_distinct_hashes"))
    )
    return (
        exact_small.join(kth, group_col, "left_outer")
        .select(
            F.col(group_col),
            F.round(
                F.coalesce(
                    F.lit(float(k - 1)) / F.col("vk"),
                    F.col("n_distinct_hashes").cast("double"),
                ),
                2,
            ).alias("est_distinct"),
        )
    )


def kmv_bottom_k(df: DataFrame, group_col: str, value_col: str, k: int = 64) -> DataFrame:
    """The sketch itself: per group, the k smallest distinct hash
    fractions as a sorted array — the mergeable state :func:`kmv_distinct`
    summarizes. Stored form for reuse across queries (union/intersection
    estimates, incremental maintenance)."""
    h = (
        df.filter(F.col(value_col).isNotNull())  # same NULL guard as kmv_distinct
        .select(F.col(group_col), hash_fraction(value_col).alias("hv"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("hv")
    return (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(group_col)
        .agg(F.sort_array(F.collect_list("hv")).alias("kmv"))
    )


def kmv_union_estimate(kmv_a: Column, kmv_b: Column, k: int = 64) -> Column:
    """Distinct-count estimate of A ∪ B from two bottom-k sketches:
    merge, dedupe, re-take the bottom k — the associative merge that
    makes KMV a sketch. Falls back to the exact merged size when the
    union has fewer than k distinct hashes."""
    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat(kmv_a, kmv_b))), 1, k
    )
    n = F.size(merged)
    vk = F.element_at(merged, k)
    return F.when(n < k, n.cast("double")).otherwise(F.lit(float(k - 1)) / vk)


def kmv_intersection_estimate(kmv_a: Column, kmv_b: Column, k: int = 64) -> Column:
    """Distinct-count estimate of A ∩ B (the join-cardinality input):
    Jaccard is estimated from the merged bottom-k (fraction of the
    union's bottom-k present in both sketches — a minhash estimate),
    then scaled by the union estimate: |A∩B| ≈ J(A,B) · |A∪B|."""
    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat(kmv_a, kmv_b))), 1, k
    )
    both = F.size(F.array_intersect(merged, F.array_intersect(kmv_a, kmv_b)))
    jaccard = both.cast("double") / F.size(merged)
    return jaccard * kmv_union_estimate(kmv_a, kmv_b, k)


# ---------------------------------------------------------------------------
# Frequent items (heavy hitters): Misra-Gries candidates + exact recount
# ---------------------------------------------------------------------------


def mg_frequent_candidates(
    df: DataFrame, col: str, k: int = 1024, with_total: bool = False
):
    """Candidate heavy hitters via per-partition Misra-Gries summaries
    (k counters each), unioned on the driver.

    Guarantee (pigeonhole over partitions + the MG bound): every value
    with GLOBAL frequency > n/(k+1) appears in the union — if
    freq > Σn_p/(k+1) then some partition has freq_p > n_p/(k+1), and
    MG with k counters never evicts such a value. The union is a
    superset of the true heavy hitters; the exact recount pass
    (:func:`frequent_items_exact`) removes false positives, so the
    final answer is EXACT — the classic 2-pass heavy-hitters scheme
    (Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
    Summaries", PODS'12).

    Scale shape: pass 1 is one scan, Arrow-batched, state bounded at k
    counters per partition, and ≤ k·partitions candidate rows ever
    reach the driver — the full value domain is never shuffled. The
    same scan also tallies the per-partition row counts (a null-valued
    marker row each — unambiguous because value_counts never counts
    nulls), so ``with_total=True`` returns the table total WITHOUT the
    extra full scan a separate df.count() would pay.
    """
    import pandas as pd

    def summarize(pdf_iter):
        counters: dict = {}
        n_rows = 0
        for pdf in pdf_iter:
            n_rows += len(pdf)
            for val, cnt in pdf[col].value_counts().items():
                counters[val] = counters.get(val, 0) + int(cnt)
            if len(counters) > k:
                # MG decrement, batched: subtract the (k+1)-th largest
                # count from everyone, drop the non-positive
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    v: c - cut for v, c in counters.items() if c - cut > 0
                }
        out = pd.DataFrame({col: list(counters.keys())})
        out["__rows"] = 0
        yield pd.concat(
            [out, pd.DataFrame({col: [None], "__rows": [n_rows]})],
            ignore_index=True,
        )

    from pyspark.sql import types as T

    # nullable=True explicitly: an exploded token column arrives
    # non-nullable, and the null marker row would NPE against the
    # inherited nullability
    field = df.select(col).schema[0]
    schema = T.StructType(
        [
            T.StructField(field.name, field.dataType, True),
            T.StructField("__rows", T.LongType(), False),
        ]
    )
    rows = df.select(col).mapInPandas(summarize, schema).collect()
    cands = sorted({r[0] for r in rows if r[0] is not None})
    total = sum(r["__rows"] for r in rows)
    if with_total:
        return cands, total
    return cands


def frequent_items_exact(
    df: DataFrame,
    col: str,
    threshold_fraction: float = 0.001,
    k: int = 1024,
) -> DataFrame:
    """Values of ``col`` with frequency strictly greater than
    ``threshold_fraction`` of all rows, with EXACT counts.

    Two passes: Misra-Gries candidate generation (superset guarantee
    requires k+1 ≥ 1/threshold_fraction — asserted), then an exact
    count restricted to the candidate set (broadcast semi-join, so the
    pass-2 shuffle carries only candidate keys). Output: (value,
    n_occurrences) sorted by count desc then value.
    """
    if (k + 1) * threshold_fraction < 1.0:
        raise ValueError(
            f"k={k} counters cannot guarantee threshold {threshold_fraction}"
            f" (need k+1 >= {1.0 / threshold_fraction:.0f})"
        )
    spark = df.sparkSession
    # candidates AND the row total from ONE scan (a separate df.count()
    # was a third full pass — round-8 review fix)
    candidates, total = mg_frequent_candidates(df, col, k, with_total=True)
    cand_df = spark.createDataFrame(
        [(c,) for c in candidates], df.select(col).schema
    )
    return (
        df.join(F.broadcast(cand_df), on=col, how="left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") > total * threshold_fraction)
        .orderBy(F.col("n_occurrences").desc(), F.col(col).asc())
    )
