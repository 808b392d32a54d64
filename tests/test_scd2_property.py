"""Randomized differential for the SCD2 family (operators/scd2.py):
scd2_build vs a pure-Python gaps-and-islands reference, and
scd2_apply_delta(build(old), delta) == build(all) over random
time-threshold splits — the split respects the per-key ordering
contract by construction (every delta ts >= cut > every old ts)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbcut_spark.operators.scd2 import scd2_apply_delta, scd2_build

ROW_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_i", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def gen_rows(seed: int, n: int = 200, keys: int = 6, states: int = 3):
    """~10% NULL keys: scd2_build's Window.partitionBy groups NULLs
    into one history, and apply_delta must match them null-safely
    (round-8 review fix) — the generator keeps that path covered."""
    rng = random.Random(seed)
    return [
        (
            None if rng.random() < 0.1 else rng.randrange(keys),
            rng.randrange(1000),
            i,
            chr(ord("a") + rng.randrange(states)),
        )
        for i in range(n)
    ]


def py_scd2(rows):
    """Pure-Python reference: intervals as
    (key, state, valid_from, valid_to|None, version, n_events)."""
    by_key: dict[int, list] = {}
    for k, ts, seq, st in rows:
        by_key.setdefault(k, []).append((ts, seq, st))
    out = set()
    for k, evs in by_key.items():
        evs.sort()
        runs = []  # (state, valid_from, n)
        for ts, _seq, st in evs:
            if runs and runs[-1][0] == st:
                runs[-1][2] += 1
            else:
                runs.append([st, ts, 1])
        for i, (st, vfrom, n) in enumerate(runs):
            vto = runs[i + 1][1] if i + 1 < len(runs) else None
            out.add((k, st, vfrom, vto, i + 1, n))
    return out


def spark_df(spark, rows):
    return (
        spark.createDataFrame(rows, ROW_SCHEMA)
        .withColumn("ts", F.col("ts_i").cast("timestamp"))
        .select("user_id", "ts", "event_id", "event_type")
    )


def spark_rows(df):
    return {
        (
            r["user_id"],
            r["state"],
            int(r["valid_from"].timestamp()),
            None if r["valid_to"] is None else int(r["valid_to"].timestamp()),
            r["version"],
            r["n_events"],
        )
        for r in df.collect()
    }


def test_build_matches_python_reference(spark):
    for seed in (1, 2, 3):
        rows = gen_rows(seed)
        got = spark_rows(scd2_build(spark_df(spark, rows)))
        assert got == py_scd2(rows), f"seed {seed}"


def test_apply_delta_matches_rebuild_random_splits(spark):
    for seed in (4, 5):
        rows = gen_rows(seed)
        rng = random.Random(seed + 100)
        for _ in range(2):
            cut = rng.randrange(100, 900)
            old = [r for r in rows if r[1] < cut]
            delta = [r for r in rows if r[1] >= cut]
            if not old or not delta:
                continue
            got = spark_rows(
                scd2_apply_delta(
                    scd2_build(spark_df(spark, old)), spark_df(spark, delta)
                )
            )
            assert got == py_scd2(rows), f"seed {seed} cut {cut}"


def test_apply_delta_empty_target_is_build(spark):
    rows = gen_rows(6, n=60)
    empty = spark_df(spark, []).limit(0)
    target = scd2_build(empty)
    got = spark_rows(scd2_apply_delta(target, spark_df(spark, rows)))
    assert got == py_scd2(rows)


def test_retroactive_delta_raises(spark):
    """Round-9 guard: a delta event dated BEFORE its key's open-interval
    valid_from must fail loudly toward rebuild, not compact silently
    wrong intervals (round-8 verdict 'What's wrong' #2). Round 10
    folded the default guard INTO the compaction action (verdict ask
    #3): validate=True raises inside the caller's action with the
    rebuild message; validate='eager' keeps the typed pre-flight."""
    import pytest
    from pyspark.errors.exceptions.base import PySparkException

    from dbcut_spark.operators.scd2 import RetroactiveDeltaError

    # key 1: a->b, open interval (b) starts at ts=500
    old = [(1, 100, 0, "a"), (1, 500, 1, "b")]
    target = scd2_build(spark_df(spark, old))
    retro = [(1, 499, 2, "c")]  # predates open valid_from=500
    # eager mode: typed error BEFORE any action
    with pytest.raises(RetroactiveDeltaError, match="rebuild"):
        scd2_apply_delta(target, spark_df(spark, retro), validate="eager")
    # default mode: no pre-flight job — the violation fails the
    # caller's own action with the same rebuild message
    deferred = scd2_apply_delta(target, spark_df(spark, retro))
    with pytest.raises(PySparkException, match="rebuild"):
        deferred.count()
    # validate=False restores the (documented out-of-contract) old path
    scd2_apply_delta(
        target, spark_df(spark, retro), validate=False
    ).count()
    # in-contract deltas still pass under the default guard: equality
    # at valid_from is legal (the seed's _SEED_SEQ sorts first), and a
    # brand-new key has no open interval to violate
    ok = [(1, 500, 3, "c"), (2, 10, 4, "a")]
    got = spark_rows(scd2_apply_delta(target, spark_df(spark, ok)))
    assert got == py_scd2(old + ok)
    # ... and under the eager guard
    got = spark_rows(
        scd2_apply_delta(target, spark_df(spark, ok), validate="eager")
    )
    assert got == py_scd2(old + ok)


def test_validate_flag_normalization(spark):
    """The guard dispatches on `validate is True` / `== 'eager'`, so a
    merely-truthy value (1, numpy.bool_) must normalize to the default
    in-plan guard instead of silently disabling ALL validation; an
    unknown string must fail loudly, not fall through (round-10
    review)."""
    import pytest
    from pyspark.errors.exceptions.base import PySparkException

    old = [(1, 100, 0, "a"), (1, 500, 1, "b")]
    target = scd2_build(spark_df(spark, old))
    retro = spark_df(spark, [(1, 499, 2, "c")])
    # truthy non-True values get the default in-plan guard
    for flag in (1, 2.0):
        with pytest.raises(PySparkException, match="rebuild"):
            scd2_apply_delta(target, retro, validate=flag).count()
    try:
        import numpy as np
    except ImportError:
        np = None
    if np is not None:
        with pytest.raises(PySparkException, match="rebuild"):
            scd2_apply_delta(
                target, retro, validate=np.bool_(True)
            ).count()
    # falsy non-False disables, like False
    scd2_apply_delta(target, retro, validate=0).count()
    # unknown strings are a loud contract error, not a silent off
    with pytest.raises(ValueError, match="eager"):
        scd2_apply_delta(target, retro, validate="defered")


def test_retroactive_guard_null_key(spark):
    """NULL-key histories are matched null-safely by the guard too —
    both the eager typed probe and the default in-plan raise."""
    import pytest
    from pyspark.errors.exceptions.base import PySparkException

    from dbcut_spark.operators.scd2 import RetroactiveDeltaError

    old = [(None, 200, 0, "a")]
    target = scd2_build(spark_df(spark, old))
    with pytest.raises(RetroactiveDeltaError):
        scd2_apply_delta(
            target, spark_df(spark, [(None, 100, 1, "b")]), validate="eager"
        )
    with pytest.raises(PySparkException, match="rebuild"):
        scd2_apply_delta(
            target, spark_df(spark, [(None, 100, 1, "b")])
        ).count()
