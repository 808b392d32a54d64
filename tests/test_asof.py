"""As-of join semantics + plan shape (operators/asof.py)."""

from pyspark.sql import functions as F

from dbcut_spark.operators.asof import asof_join_backward


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 100, 1000), (2, 100, 2000), (3, 200, 1500), (4, 300, 500)],
        "lid long, key long, t_us long",
    ).select("lid", "key", F.timestamp_micros("t_us").alias("lts"))
    right = spark.createDataFrame(
        [
            (10, 100, 1000),  # equal time -> inclusive match for lid=1
            (11, 100, 1000),  # tie: same key+time, larger id wins
            (12, 100, 1999),
            (13, 200, 1501),  # after lid=3 -> no match
        ],
        "rid long, key long, t_us long",
    ).select("rid", "key", F.timestamp_micros("t_us").alias("rts"))
    return left, right


def test_asof_backward_semantics(spark):
    left, right = _frames(spark)
    out = asof_join_backward(
        left, right, ["key"], "lts", "rts", {"rid": "match_id"}, tiebreak="rid"
    )
    got = {r["lid"]: r["match_id"] for r in out.collect()}
    assert got[1] == 11      # inclusive at equal time, max-tiebreak of the tie
    assert got[2] == 12      # latest at-or-before 2000
    assert got[3] is None    # only later right rows for key 200
    assert got[4] is None    # key 300 absent on the right
    assert len(got) == 4     # left-outer: every left row survives


def test_asof_null_field_not_backfilled_from_older_row(spark):
    """Regression (round-2 advice): all picked columns must come from
    the SAME right row. If the latest qualifying right row has NULL in
    one picked column, that NULL must survive — carrying columns
    independently would backfill it from an older right row."""
    left = spark.createDataFrame(
        [(1, 100, 3000)], "lid long, key long, t_us long"
    ).select("lid", "key", F.timestamp_micros("t_us").alias("lts"))
    right = spark.createDataFrame(
        [
            (10, 100, 1000, "old-label", 7.0),
            (11, 100, 2000, None, 9.0),  # latest row: label is NULL
        ],
        "rid long, key long, t_us long, label string, score double",
    ).select(
        "rid", "key", F.timestamp_micros("t_us").alias("rts"), "label", "score"
    )
    out = asof_join_backward(
        left,
        right,
        ["key"],
        "lts",
        "rts",
        {"rid": "match_id", "label": "label", "score": "score"},
        tiebreak="rid",
    ).collect()[0]
    assert out["match_id"] == 11
    assert out["label"] is None  # NOT "old-label"
    assert out["score"] == 9.0


def test_asof_single_shuffle(spark, sf_dir):
    """The union + carry-forward-window plan must shuffle exactly once
    on the key (plus the final presentation sort) — never a range-join
    pair explosion."""
    from dbcut_spark.queries import QUERIES

    df = QUERIES["events_asof_attribution"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE echoes the pre-AQE plan too
    hash_exchanges = plan.count("Exchange hashpartitioning")
    assert hash_exchanges == 1, f"expected 1 key shuffle, saw {hash_exchanges}"
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
