"""Salted join / aggregation must be result-identical to the plain
forms (the only difference is the shuffle shape)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbcut_spark.operators.skew import salted_agg_count, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one hot key
    rows = [(i, i % 10 if i % 10 else 0, f"v{i}") for i in range(2000)]
    left = spark.createDataFrame(rows, "row_id long, k long, payload string")
    right = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(10)], "k long, dim string"
    )
    return left, right


def test_salted_join_equals_plain(skewed):
    left, right = skewed
    plain = left.join(right, ["k"]).select("row_id", "k", "dim")
    salted = salted_join(left, right, ["k"], n_salts=8).select("row_id", "k", "dim")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_keeps_unmatched(skewed):
    left, right = skewed
    lonely = left.withColumn("k", F.when(F.col("row_id") == 0, 999).otherwise(F.col("k")))
    plain = lonely.join(right, ["k"], "left").select("row_id", "dim")
    salted = salted_join(lonely, right, ["k"], n_salts=4, how="left").select(
        "row_id", "dim"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_agg_count_equals_plain(skewed):
    left, _ = skewed
    plain = {(r["k"]): r["count"] for r in left.groupBy("k").count().collect()}
    salted = {
        (r["k"]): r["count"] for r in salted_agg_count(left, ["k"], 8).collect()
    }
    assert salted == plain


def test_salt_is_deterministic(skewed):
    left, right = skewed
    a = sorted(map(tuple, salted_join(left, right, ["k"]).collect()))
    b = sorted(map(tuple, salted_join(left, right, ["k"]).collect()))
    assert a == b


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Same-bucketed tables must join without any Exchange (the
    co-location contract that amortizes repeated closure runs)."""
    from dbcut_spark.sinks.bucketed import bucketed_join, write_bucketed
    from dbcut_spark.sources.parquet import read_table

    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8)
    write_bucketed(lineitem, "b_lineitem", ["o_orderkey"], 8)
    # at test scale the planner would rather broadcast the small side
    # (also fine, but it hides the bucket mechanics); force the
    # big-table path a 100 TB join would take
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        n = joined.count()
        assert n == lineitem.count()  # FK join: every line matches an order
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # buckets align — zero shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salt_spreads_key_only_hot_key(spark):
    """Round-8 review fix: a key-only frame's hot key must spread over
    multiple (key, salt) partial groups — the old key-hash fallback
    gave every row of a key the SAME salt, making the salted shape a
    pure-cost no-op exactly when it was needed."""
    from dbcut_spark.operators.skew import _row_salt, salted_agg_count

    hot = spark.range(0, 10_000, 1, 8).select(F.lit(7).alias("k"))
    salts = (
        hot.withColumn("s", _row_salt(hot, ["k"], 16))
        .select("s")
        .distinct()
        .count()
    )
    assert salts > 1, "hot key must not collapse to one salt"
    # and the two-phase result is still exact
    out = salted_agg_count(hot, ["k"], 16).collect()
    assert [(r["k"], r["count"]) for r in out] == [(7, 10_000)]
