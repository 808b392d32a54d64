"""As-of join semantics + plan shape (operators/asof.py)."""

from pyspark.sql import functions as F

from dbcut_spark.operators.asof import asof_join_backward, asof_join_forward


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


def test_asof_forward_semantics(spark):
    from dbcut_spark.operators.asof import asof_join_forward

    left, right = _frames(spark)
    out = asof_join_forward(
        left, right, ["key"], "lts", "rts", {"rid": "match_id"}, tiebreak="rid"
    )
    got = {r["lid"]: r["match_id"] for r in out.collect()}
    assert got[1] == 11      # inclusive at equal time, max-tiebreak wins
    assert got[2] is None    # nothing at-or-after 2000 for key 100
    assert got[3] == 13      # earliest at-or-after 1500
    assert got[4] is None    # key 300 absent on the right
    assert len(got) == 4


def test_asof_tolerance_masks_stale_matches(spark):
    from dbcut_spark.operators.asof import asof_join_backward, asof_join_forward

    left, right = _frames(spark)
    back = asof_join_backward(
        left, right, ["key"], "lts", "rts", {"rid": "match_id"},
        tiebreak="rid", tolerance_us=1,
    )
    gb = {r["lid"]: r["match_id"] for r in back.collect()}
    assert gb[1] == 11       # distance 0 <= 1
    assert gb[2] == 12       # match at 1999: distance 1 <= 1 survives
    back0 = asof_join_backward(
        left, right, ["key"], "lts", "rts", {"rid": "match_id"},
        tiebreak="rid", tolerance_us=0,
    )
    gb0 = {r["lid"]: r["match_id"] for r in back0.collect()}
    assert gb0[2] is None    # distance 1 > 0 masked
    fwd = asof_join_forward(
        left, right, ["key"], "lts", "rts", {"rid": "match_id"},
        tiebreak="rid", tolerance_us=0,
    )
    gf = {r["lid"]: r["match_id"] for r in fwd.collect()}
    assert gf[1] == 11       # exact-time match survives tolerance 0
    assert gf[3] is None     # next right row is 1us later -> masked


def test_asof_differential_vs_pandas_merge_asof(spark):
    """Differential check against an independent implementation:
    pandas.merge_asof on seeded random data, both directions, with and
    without tolerance. pandas breaks (key, time) ties by row order, so
    right-side time ties are dropped to keep the comparison exact (our
    tie-break is max-tiebreak, pandas' is positional)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    left_pd = pd.DataFrame(
        {
            "lid": np.arange(300),
            "key": rng.randint(0, 5, 300),
            "t": rng.randint(0, 10_000, 300).astype("int64"),
        }
    )
    right_pd = pd.DataFrame(
        {
            "rid": np.arange(1000, 1200),
            "key": rng.randint(0, 5, 200),
            "t": rng.randint(0, 10_000, 200).astype("int64"),
        }
    ).drop_duplicates(subset=["key", "t"])  # kill ties: tie policies differ

    left = spark.createDataFrame(left_pd).select(
        "lid", "key", F.timestamp_micros(F.col("t")).alias("lts")
    )
    right = spark.createDataFrame(right_pd).select(
        "rid", "key", F.timestamp_micros(F.col("t")).alias("rts")
    )

    from dbcut_spark.operators.asof import asof_join_backward, asof_join_forward

    for direction, fn in [("backward", asof_join_backward), ("forward", asof_join_forward)]:
        for tol in [None, 500]:
            expected = pd.merge_asof(
                left_pd.sort_values(["t", "lid"]),
                right_pd.sort_values("t"),
                on="t",
                by="key",
                direction=direction,
                allow_exact_matches=True,
                tolerance=tol,
            )
            exp = {
                int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
                for r in expected.itertuples()
            }
            got_df = fn(
                left, right, ["key"], "lts", "rts", {"rid": "match_id"},
                tiebreak="rid", tolerance_us=tol,
            )
            got = {r["lid"]: r["match_id"] for r in got_df.collect()}
            assert got == exp, f"direction={direction} tol={tol}"


def test_asof_null_timestamps(spark):
    """Null-time LEFT rows keep left-outer semantics (null picks) in
    BOTH directions — they ride the single window pass sorted
    nulls-first, never inheriting a carried right value; null-time
    RIGHT rows are dropped and can never match."""
    from dbcut_spark.operators.asof import asof_join_backward, asof_join_forward

    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00"), (2, 1, None), (3, 2, None)],
        "lid long, key long, lts string",
    ).select("lid", "key", F.col("lts").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [
            (100, 1, "2024-01-01 09:00:00"),
            (101, 1, None),  # null right time: never a match
            (102, 2, "2024-01-01 08:00:00"),
        ],
        "rid long, key long, rts string",
    ).select("rid", "key", F.col("rts").cast("timestamp").alias("rts"))

    for fn in (asof_join_backward, asof_join_forward):
        got = {
            r["lid"]: r["match_id"]
            for r in fn(
                left, right, ["key"], "lts", "rts",
                {"rid": "match_id"}, tiebreak="rid",
            ).collect()
        }
        assert set(got) == {1, 2, 3}  # every left row survives
        assert got[2] is None and got[3] is None  # null-time left: no pick
    # the non-null left row still matches normally (backward: 09:00)
    back = {
        r["lid"]: r["match_id"]
        for r in asof_join_backward(
            left, right, ["key"], "lts", "rts", {"rid": "match_id"}, tiebreak="rid"
        ).collect()
    }
    assert back[1] == 100


def test_asof_null_keys_never_match(spark):
    """Equi-join NULL semantics (round-10 review): a NULL-key right row
    must never attach to NULL-key left rows — the window partition
    groups NULLs together, but no SQL/merge_asof equi-join matches
    NULL to NULL. NULL-key left rows survive with NULL picks."""
    left = spark.createDataFrame(
        [(1, None, "2024-01-01 10:00:00"), (2, 7, "2024-01-01 10:00:00")],
        "lid long, key long, lts string",
    ).select("lid", "key", F.col("lts").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [(100, None, "2024-01-01 09:00:00"), (200, 7, "2024-01-01 09:00:00")],
        "rid long, key long, rts string",
    ).select("rid", "key", F.col("rts").cast("timestamp").alias("rts"))
    for fn in (asof_join_backward, asof_join_forward):
        got = {
            r["lid"]: r["match_id"]
            for r in fn(
                left, right.withColumn(
                    "rts",
                    F.when(F.lit(fn is asof_join_forward),
                           F.col("rts") + F.expr("INTERVAL 2 HOURS"))
                    .otherwise(F.col("rts")),
                ),
                ["key"], "lts", "rts", {"rid": "match_id"}, tiebreak="rid",
            ).collect()
        }
        assert got[1] is None, fn.__name__  # NULL key: no match, row kept
        assert got[2] in (100, 200) and got[2] == 200, fn.__name__
