"""Bucketed table storage for co-located, shuffle-free joins.

At 100 TB the dominant closure cost is re-shuffling big child tables on
their FK every run. Writing the hot tables bucketed by that FK
(`bucketBy(n, key).sortBy(key)`) makes every later equi-join/groupBy on
the key shuffle-free: Spark matches bucket files one-to-one
(SortMergeJoin with zero Exchange), so the frontier semi-joins of
repeated extractions against the same corpus never move the big table
again. The same layout is what you'd pick for the dedup corpus
(bucket by doc hash) and the IVF index (bucket by cluster_id).

Bucket count guidance: total_size / bucket ≈ 128-512 MB; both join
sides must share the count (or be integer multiples in Spark ≥3.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Save as a bucketed managed table (parquet)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — verify with
    .explain(): no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
