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


def test_interval_overlap_randomized_vs_brute(spark):
    """Seeded random intervals: the binned plan must equal the brute
    theta-join exactly (same pairs, each exactly once) across bin
    sizes smaller, comparable, and larger than the interval lengths."""
    import random

    from dbcut_spark.operators.range_join import interval_overlap_join

    rng = random.Random(11)
    rows_l, rows_r = [], []
    for i in range(250):
        k = rng.randint(0, 6)
        s = rng.randint(0, 50_000)
        rows_l.append((i, k, s, s + rng.randint(0, 3_000)))
    for i in range(250):
        k = rng.randint(0, 6)
        s = rng.randint(0, 50_000)
        rows_r.append((1000 + i, k, s, s + rng.randint(0, 3_000)))
    left = spark.createDataFrame(rows_l, "lid long, key long, ls long, le long")
    right = spark.createDataFrame(rows_r, "rid long, key long, rs long, re long")

    brute = {
        (l[0], r[0])
        for l in rows_l
        for r in rows_r
        if l[1] == r[1] and l[2] <= r[3] and r[2] <= l[3]
    }
    for bin_us in (100, 2_500, 100_000):
        got = [
            (r["lid"], r["rid"])
            for r in interval_overlap_join(
                left, right, ["key"], "ls", "le", "rs", "re", bin_us=bin_us
            ).collect()
        ]
        assert len(got) == len(set(got)), f"bin={bin_us}: duplicate pairs"
        assert set(got) == brute, f"bin={bin_us}: pair set mismatch"


def test_range_join_caps_runaway_interval_fanout(spark):
    """One corrupt-but-ordered interval (end in year 2200) must fail
    loudly via the in-plan fan-out cap, not F.sequence billions of
    bins and OOM a task (round-10 review)."""
    import pytest
    from pyspark.errors.exceptions.base import PySparkException

    from dbcut_spark.operators.range_join import point_in_interval_join

    points = spark.createDataFrame([(1, 5_000_000)], "key long, t long")
    bad = spark.createDataFrame(
        [(1, 0, 7_000_000_000_000_000)], "key long, s long, e long"
    )
    with pytest.raises(PySparkException, match="explodes to more than"):
        point_in_interval_join(
            points, bad, ["key"], "t", "s", "e",
            bin_us=1_000_000, max_bins=1000,
        ).count()
    # a sane interval under the cap still joins
    ok = spark.createDataFrame([(1, 0, 9_000_000)], "key long, s long, e long")
    got = point_in_interval_join(
        points, ok, ["key"], "t", "s", "e", bin_us=1_000_000, max_bins=1000
    ).count()
    assert got == 1
