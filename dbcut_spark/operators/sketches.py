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


def hash_fraction(col: str | Column) -> Column:
    """U(0,1) hash of a value: first 8 md5 hex digits / 2^32 — the
    repo's cross-engine idiom (DuckDB: CAST('0x'||substr AS BIGINT))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(HASH_DENOM)


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct-count estimate: (group, n_exactish rows
    kept aside by the caller if wanted, est_distinct). Groups with
    fewer than k distinct hashes fall back to their exact distinct
    count (the sketch IS exact below k)."""
    h = (
        df.select(F.col(group_col), hash_fraction(value_col).alias("hv"))
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
    h = df.select(F.col(group_col), hash_fraction(value_col).alias("hv")).distinct()
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
