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
