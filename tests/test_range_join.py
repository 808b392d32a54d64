"""Bin-bucketed interval join semantics + plan shape."""

from pyspark.sql import functions as F

from dbcut_spark.operators.range_join import point_in_interval_join


def test_point_in_interval_semantics(spark):
    intervals = spark.createDataFrame(
        [
            (1, 100, 1000, 2500),  # spans 3 bins at bin=1000
            (2, 100, 1900, 2100),
            (3, 200, 0, 10_000),
        ],
        "iid long, key long, s long, e long",
    )
    points = spark.createDataFrame(
        [
            (10, 100, 1000),  # boundary: == start of iid=1
            (11, 100, 2500),  # boundary: == end of iid=1
            (12, 100, 2000),  # inside iid=1 AND iid=2
            (13, 100, 3000),  # outside both
            (14, 300, 500),   # key absent in intervals
        ],
        "pid long, key long, t long",
    )
    out = point_in_interval_join(
        points, intervals, ["key"], "t", "s", "e", bin_us=1000
    )
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    # each qualifying (point, interval) pair appears EXACTLY once even
    # when the interval spans several bins (pair meets in the point's
    # bin only); boundaries are inclusive on both ends
    assert got == [(10, 1), (11, 1), (12, 1), (12, 2)]


def test_interval_join_no_pair_explosion(spark, sf_dir):
    """The plan must be a hash equi-join on (key, bin) — never the
    nested-loop/cartesian form Catalyst picks for a raw BETWEEN
    theta-join."""
    from dbcut_spark.queries import QUERIES

    df = QUERIES["events_purchase_window_clicks"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_overlap_join_exactly_once(spark):
    """Overlap semantics incl. touching endpoints, and exactly-once
    pair emission even when a pair spans many shared bins."""
    from dbcut_spark.operators.range_join import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 1, 0, 1000), (2, 1, 2000, 2500), (3, 2, 0, 10_000)],
        "lid long, key long, ls long, le long",
    )
    right = spark.createDataFrame(
        [
            (10, 1, 1000, 1500),   # touches lid=1 at 1000 (inclusive)
            (11, 1, 1501, 1999),   # gap: matches nothing
            (12, 2, 5, 9_999),     # nested in lid=3, spans ~100 bins at bin=100
        ],
        "rid long, key long, rs long, re long",
    )
    out = interval_overlap_join(
        left, right, ["key"], "ls", "le", "rs", "re", bin_us=100
    ).select("lid", "rid")
    got = [(r["lid"], r["rid"]) for r in out.collect()]
    assert sorted(got) == [(1, 10), (3, 12)]
    assert len(got) == len(set(got))  # exactly once despite shared bins
