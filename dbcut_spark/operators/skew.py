"""Skew mitigation: salted joins and two-phase salted aggregation.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
`dbcut_spark.session`) handles most skew at runtime by splitting
oversized shuffle partitions. These explicit forms cover the cases AQE
can't:

- a *broadcast-ineligible* dimension joined on a key where a handful of
  values dominate (the classic null-key / celebrity-key problem):
  :func:`salted_join` fans the hot left rows across ``n_salts``
  sub-keys and replicates the right side once per salt, so no single
  reducer owns a hot key;
- a high-cardinality aggregation with hot groups:
  :func:`salted_agg_count` splits each group into ``n_salts`` partial
  groups and re-aggregates — two small shuffles instead of one skewed
  one.

Both are pure Column algebra (rand-free: the salt is a deterministic
hash of the row, so results are reproducible and retry-safe — a Spark
task retry recomputes identical salts, which `F.rand()` would not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, cols: list[str], n_salts: int):
    """Deterministic per-row salt in [0, n_salts): hash of all non-key
    columns plus the input partition id. The partition id is the
    load-bearing term for key-only frames and identical-payload rows —
    hashing the key alone made the salt CONSTANT per key, so the hot
    key still landed on one reducer and the 'salting' was a pure-cost
    no-op (round-8 review fix). spark_partition_id is stable across
    task retries for deterministic input splits (file scans), so the
    rand-free/retry-safe contract in the module docstring holds; rows
    of a hot key spread across however many input partitions carry
    them, which is exactly the skew being mitigated.

    Caveat (round-9, SPARK-23207 class): when the INPUT itself is
    nondeterministic — e.g. downstream of another shuffle, where fetch
    order can vary across a map-stage re-execution — the salt value a
    given row receives can shift on recompute. The RESULT is still
    salt-invariant (the salt only routes rows; salted_agg_count
    re-aggregates over the true keys and salted_join's output is
    identical whatever salt a row carries), but a fetch-failure
    re-execution interleaved with partial reducer fetches could then
    duplicate or drop rows mid-shuffle. Callers feeding shuffled input
    should `.localCheckpoint(eager=False)` it first (the compaction
    writer in sinks/compact.py does exactly this); raw scans need
    nothing."""
    basis = [F.col(c) for c in df.columns if c not in cols]
    return F.pmod(
        F.xxhash64(*basis, F.spark_partition_id()), F.lit(n_salts)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` is skewed on ``on``: left rows get a
    deterministic salt, right rows are replicated across all salts, and
    the join key becomes (key..., salt). Output equals
    ``left.join(right, on, how)`` row-for-row.

    Cost model: right side is shuffled ``n_salts``× (use only when
    right is too big to broadcast but far smaller than the skewed
    shuffle spill it prevents)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join supports inner/left joins")
    salted_left = left.withColumn("__dbcut_salt", _row_salt(left, on, n_salts))
    exploded_right = right.withColumn(
        "__dbcut_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_left.join(exploded_right, on=[*on, "__dbcut_salt"], how=how)
    return out.drop("__dbcut_salt")


def salted_top_per_key(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    k: int,
    n_salts: int = 16,
) -> DataFrame:
    """Per-key top-k (descending by ``order_cols``) resistant to hot
    keys — the skew-safe form of ``row_number().over(partitionBy(keys))
    <= k`` (round-9 verdict ask #5): a window partition cannot be split
    across tasks, so one parent with 10^8 children stalls a single
    reducer; here each key's rows first split into ``n_salts``
    sub-partitions that each keep their local top-k, then the global
    top-k re-ranks over the ≤ n_salts×k survivors per key — the second
    window is tiny by construction.

    Result-identical to the single window for ANY salt assignment: a
    row in the true top-k of its key ranks ≤ k inside whatever salt
    group it lands in, so phase 1 can never drop it; phase 2 removes
    the rest. ``order_cols`` must be a per-key total order (a PK — the
    caller's cap is only deterministic under that same condition).

    The salt hashes the ORDER columns themselves — unique per row — so
    it is deterministic under any partitioning and across task retries
    (no ``spark_partition_id`` term, hence none of ``_row_salt``'s
    shuffled-input caveat): a hot key's rows spread because their PKs
    differ, not because their physical placement does."""
    oc = [F.col(c) for c in order_cols]
    salted = df.withColumn(
        "__dbcut_cap_salt", F.pmod(F.xxhash64(*oc), F.lit(n_salts))
    )
    w1 = Window.partitionBy(*keys, "__dbcut_cap_salt").orderBy(
        *[c.desc() for c in oc]
    )
    survivors = (
        salted.withColumn("__dbcut_cap_rn", F.row_number().over(w1))
        .filter(F.col("__dbcut_cap_rn") <= k)
        .drop("__dbcut_cap_salt", "__dbcut_cap_rn")
    )
    w2 = Window.partitionBy(*keys).orderBy(*[c.desc() for c in oc])
    return (
        survivors.withColumn("__dbcut_cap_rn", F.row_number().over(w2))
        .filter(F.col("__dbcut_cap_rn") <= k)
        .drop("__dbcut_cap_rn")
    )


def salted_agg_count(
    df: DataFrame, keys: list[str], n_salts: int = 16
) -> DataFrame:
    """groupBy(keys).count() resistant to hot keys: partial counts per
    (keys, salt), then re-aggregate per keys. Identical results to the
    plain aggregation; the first shuffle spreads each hot group over
    ``n_salts`` reducers.

    (For avg/sum-style aggregates the same shape applies to any
    algebraic aggregate: carry partial (sum, count) pairs.)"""
    partial = (
        df.withColumn("__dbcut_salt", _row_salt(df, keys, n_salts))
        .groupBy(*keys, "__dbcut_salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias("count"))
