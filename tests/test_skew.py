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


def test_salted_top_per_key_matches_plain_window(spark):
    """Two-phase salted per-key top-k == single-window top-k on a
    hot-key distribution (round-9 verdict ask #5 equivalence half)."""
    import random

    from pyspark.sql import Window

    from dbcut_spark.operators.skew import salted_top_per_key

    rng = random.Random(3)
    rows = [(i, 1 if i < 5000 else rng.randint(2, 50), f"p{i}")
            for i in range(5600)]  # key 1 holds ~90% of rows
    df = spark.createDataFrame(rows, "pk long, fk long, payload string")
    for k in (1, 3, 17):
        w = Window.partitionBy("fk").orderBy(F.col("pk").desc())
        plain = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
        salted = salted_top_per_key(df, ["fk"], ["pk"], k, n_salts=8)
        assert sorted(map(tuple, salted.collect())) == sorted(
            map(tuple, plain.collect())
        ), k


def test_closure_backref_cap_skew_routing(spark):
    """Skew-aware closure routing (round-9 verdict ask #5): a
    pathologically skewed FK takes the two-phase salted cap — plan pin
    on the salt column, bounded per-task partition assertion, and
    value equivalence with the plain window; a small child table keeps
    the plain single-window plan byte-for-byte."""
    from dbcut_spark.catalog import Catalog, ForeignKey, TableSpec
    from dbcut_spark.operators.closure import ClosureExecutor
    from dbcut_spark.plans.extraction import build_plan

    cat = Catalog()
    cat.tables["parent"] = TableSpec("parent", ("id",), ("id", "name"))
    cat.tables["child"] = TableSpec("child", ("id",), ("id", "parent_id"))
    cat.fks += [ForeignKey("child", ("parent_id",), "parent", ("id",))]

    hot = [(i, 1) for i in range(40_000)]      # one parent, 40k children
    cold = [(40_000 + i, 2) for i in range(10)]
    frames = {
        "parent": spark.createDataFrame(
            [(1, "hot"), (2, "cold")], "id long, name string"
        ),
        "child": spark.createDataFrame(
            hot + cold, "id long, parent_id long"
        ),
    }
    plan = build_plan(
        cat, {"from": "parent", "limit": 10, "backref_limit": 7}
    )

    def run(**kw):
        ex = ClosureExecutor(spark, lambda t: frames[t], **kw)
        return ex.execute(plan)["child"]

    plain = run(salted_backref_cap=False).select("id", "parent_id")
    salted = run(salted_backref_cap=True).select("id", "parent_id")
    # plan pin: the salted form carries the two-phase salt window, the
    # plain form must not
    assert "__dbcut_cap_salt" in salted._jdf.queryExecution().toString()
    assert "__dbcut_cap_salt" not in plain._jdf.queryExecution().toString()
    got_s = sorted(map(tuple, salted.collect()))
    got_p = sorted(map(tuple, plain.collect()))
    assert got_s == got_p
    # per-parent cap respected and deterministic (top-7 by pk desc)
    assert got_s == sorted(
        [(40_000 - 1 - i, 1) for i in range(7)]
        + [(40_000 + 9 - i, 2) for i in range(7)]
    )
    # bounded-task half: no single (key, salt) window partition holds
    # more than a ~2x-uniform share of the hot key's rows, so the
    # phase-1 task that previously owned all 40k rows is provably split
    from dbcut_spark.operators.skew import salted_top_per_key  # noqa: F401
    from pyspark.sql import functions as F2

    n_salts = 16
    per_group = (
        frames["child"]
        .withColumn(
            "__dbcut_cap_salt", F2.pmod(F2.xxhash64(F2.col("id")), F2.lit(n_salts))
        )
        .groupBy("parent_id", "__dbcut_cap_salt")
        .count()
        .agg(F2.max("count").alias("mx"))
        .first()["mx"]
    )
    assert per_group <= 2 * (40_000 // n_salts), per_group

    # auto routing: metadata rows below the threshold -> plain window;
    # at/above it -> salted
    auto_small = ClosureExecutor(
        spark, lambda t: frames[t], table_rows=lambda t: 40_010
    ).execute(plan)["child"]
    assert "__dbcut_cap_salt" not in auto_small._jdf.queryExecution().toString()
    auto_big = ClosureExecutor(
        spark, lambda t: frames[t], table_rows=lambda t: 2_000_000
    ).execute(plan)["child"]
    assert "__dbcut_cap_salt" in auto_big._jdf.queryExecution().toString()
    assert sorted(
        map(tuple, auto_big.select("id", "parent_id").collect())
    ) == got_p
