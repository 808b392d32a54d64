"""Bloom semi-join pre-filter (operators/bloom.py): result-identical to
a plain LEFT SEMI join (false positives only, removed by the exact join
behind it), bitmap bounded, child side never shuffled before the
pre-filter."""

from pyspark.sql import functions as F

from dbcut_spark.operators.bloom import (
    DEFAULT_K,
    bloom_bitmap,
    bloom_prefilter,
    bloom_semi_join,
    bloom_size,
)


def test_bloom_semi_join_equals_plain_semi_join(spark, sf_dir):
    """Differential on real data, single- and multi-column keys."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    keys = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("l_orderkey")
    ).distinct()

    exact = li.join(keys, on=["l_orderkey"], how="left_semi")
    bloomy = bloom_semi_join(li, keys, ["l_orderkey"])
    a = sorted(tuple(r) for r in exact.select("l_orderkey", "l_linenumber").collect())
    b = sorted(tuple(r) for r in bloomy.select("l_orderkey", "l_linenumber").collect())
    assert a == b and a  # identical and non-empty

    # multi-column key (composite PK shape)
    k2 = li.filter(F.col("l_linenumber") <= 2).select(
        "l_orderkey", "l_linenumber"
    ).distinct().limit(500)
    exact2 = li.join(k2, on=["l_orderkey", "l_linenumber"], how="left_semi")
    bloomy2 = bloom_semi_join(li, k2, ["l_orderkey", "l_linenumber"])
    assert exact2.count() == bloomy2.count() > 0
    assert (
        exact2.exceptAll(bloomy2).count() == 0
        and bloomy2.exceptAll(exact2).count() == 0
    )


def test_bloom_prefilter_is_selective_superset(spark, sf_dir):
    """The pre-filter must pass every true match (no false negatives —
    the correctness contract) while dropping the bulk of non-matching
    rows at ~10 bits/key (the efficiency contract)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = (
        li.select(F.col("l_orderkey")).distinct().limit(20)
    )
    n_keys = keys.count()
    m = bloom_size(n_keys)
    pre = bloom_prefilter(li, keys, ["l_orderkey"], m)
    true_rows = li.join(keys, on=["l_orderkey"], how="left_semi")
    n_pre, n_true, n_all = pre.count(), true_rows.count(), li.count()
    assert n_pre >= n_true  # superset
    # selective: survivors are a small fraction of the table (FP rate
    # ~1.2% at 10 bits/key; allow generous slack for tiny-m rounding)
    assert n_pre <= n_true + max(50, int(0.05 * n_all))


def test_bloom_bitmap_bounded_and_empty_keys(spark):
    df = spark.range(100000).select(F.col("id").alias("k"))
    m = bloom_size(100000)
    bm = bloom_bitmap(df, ["k"], m)
    assert bm.count() <= m // 64
    # empty frontier short-circuits to an empty result without a scan
    child = spark.range(10).select(F.col("id").alias("k"))
    empty = df.filter(F.lit(False)).select("k")
    assert bloom_semi_join(child, empty, ["k"]).count() == 0


def test_bloom_prefilter_plan_no_child_shuffle(spark, sf_dir):
    """Plan pin: the pre-filter is k broadcast hash joins — the child
    scan reaches the bit tests without an Exchange on its side."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = li.select("l_orderkey").distinct().limit(10)
    pre = bloom_prefilter(li, keys, ["l_orderkey"], bloom_size(10))
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == DEFAULT_K
    assert "SortMergeJoin" not in plan
    # exchanges may exist on the BUILD (bitmap/keys) side — tiny by
    # construction; the streamed child spine (':-' branches) must be
    # shuffle-free: scan → project(position) → broadcast join, k deep
    child_spine = [ln for ln in plan.splitlines() if ln.lstrip().startswith(":-")]
    assert child_spine and not any("Exchange" in ln for ln in child_spine)


def test_unbounded_closure_plan_build_runs_no_jobs(spark, sf_dir):
    """Routing pin (round-7 verdict item 2): with source metadata
    available (parquet footers) and every table under the broadcast
    threshold, building an unbounded closure must schedule ZERO Spark
    jobs — the old per-edge keys.distinct().count() was a sequential
    driver-blocking job per edge (100-table graphs ⇒ 100 stalls)."""
    from dbcut_spark.catalog import TPCH_CATALOG
    from dbcut_spark.operators.closure import (
        ClosureExecutor,
        parquet_loader,
        parquet_table_rows,
    )
    from dbcut_spark.plans.extraction import build_plan

    raw = {
        "from": "region",
        "include": ["customer"],
        "limit": "no",
        "backref_limit": "no",
        "exclude": ["events", "supplier"],
    }
    ex = ClosureExecutor(
        spark,
        parquet_loader(spark, sf_dir),
        table_rows=parquet_table_rows(sf_dir),
    )
    sc = spark.sparkContext
    sc.setJobGroup("closure-build", "closure-build")
    try:
        frames = ex.execute(build_plan(TPCH_CATALOG, raw))
    finally:
        sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    stage_names = [
        si.name
        for j in tracker.getJobIdsForGroup("closure-build")
        for s in tracker.getJobInfo(j).stageIds
        if (si := tracker.getStageInfo(s)) is not None
    ]
    # spark.read.parquet schema inference fires one 1-task "parquet at"
    # job per table — inherent to any read, not routing. No job from
    # the build may be a count (the old routing shape).
    counts = [n for n in stage_names if "count" in n]
    assert not counts, f"routing count jobs during plan build: {counts}"
    # and the built plan is still the exact closure
    assert frames["customer"].count() == spark.read.parquet(
        f"{sf_dir}/customer.parquet"
    ).count()


def test_unbounded_closure_uses_bloom_and_matches(spark, sf_dir, monkeypatch):
    """An unbounded (limit: no) closure above the key threshold must
    route frontier expansion through the Bloom path and still produce
    the exact closure (threshold forced to 0 so the tiny fixture takes
    the large-frontier route)."""
    import dbcut_spark.operators.closure as closure_mod
    from dbcut_spark.catalog import TPCH_CATALOG
    from dbcut_spark.operators.closure import ClosureExecutor, parquet_loader
    from dbcut_spark.plans.extraction import build_plan

    monkeypatch.setattr(closure_mod, "BLOOM_MIN_KEYS", 0)
    raw = {
        "from": "customer",
        "where": {"c_mktsegment": "BUILDING"},
        "limit": "no",
        "backref_limit": "no",
        "join_depth": 1,
        "backref_depth": 1,
        "exclude": ["events", "part", "supplier", "lineitem"],
    }
    ex = ClosureExecutor(spark, parquet_loader(spark, sf_dir))
    frames = ex.execute(build_plan(TPCH_CATALOG, raw))
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").join(
        cust.select(F.col("c_custkey").alias("o_custkey")).distinct(),
        on=["o_custkey"],
        how="left_semi",
    )
    assert frames["customer"].count() == cust.count()
    assert frames["orders"].count() == orders.count()


def test_bloom_randomized_differential(spark):
    """Seeded randomized differential: adversarial key domains (negative
    keys, sparse + dense ranges, sizes straddling word boundaries) must
    all produce exactly the plain semi-join result — no false negatives
    under any hash alignment."""
    import random

    rng = random.Random(1234)
    for trial in range(4):
        n_child = rng.randint(50, 3000)
        child_keys = [rng.randint(-(10**9), 10**9) for _ in range(n_child)]
        picked = rng.sample(child_keys, k=rng.randint(0, min(63, n_child)))
        noise = [rng.randint(-(10**9), 10**9) for _ in range(rng.randint(0, 40))]
        child = spark.createDataFrame([(k, trial) for k in child_keys], ["k", "tag"])
        keys = spark.createDataFrame(
            [(k,) for k in picked + noise] or [(0,)], ["k"]
        )
        if not picked and not noise:
            keys = keys.filter("k <> 0")
        exact = child.join(keys.distinct(), on=["k"], how="left_semi")
        got = bloom_semi_join(child, keys.distinct(), ["k"])
        a = sorted(tuple(r) for r in exact.collect())
        b = sorted(tuple(r) for r in got.collect())
        assert a == b, f"trial {trial}: {len(a)} vs {len(b)}"


def test_bloom_at_routing_scale(spark):
    """Above-threshold volume smoke: a 5M-key frontier (past
    BLOOM_MIN_KEYS) against a 20M-row child — the real routing case.
    Verifies the bitmap caps at MAX_BITS/64 words, the result is exact,
    and the path completes without broadcasting the raw key set."""
    from pyspark.sql import functions as F2

    from dbcut_spark.operators.bloom import MAX_BITS, bloom_semi_join, bloom_size

    child = spark.range(0, 20_000_000).select(
        F2.col("id").alias("k"), (F2.col("id") % 97).alias("tag")
    )
    # keys = every 4th id → 5M keys, exact expected count known
    keys = spark.range(0, 20_000_000, 4).select(F2.col("id").alias("k"))
    m = bloom_size(5_000_000)
    assert m <= MAX_BITS
    got = bloom_semi_join(child, keys, ["k"], n_keys=5_000_000)
    assert got.count() == 5_000_000


def test_bloom_key_type_mismatch_no_false_negatives(spark):
    """INT frontier keys against a BIGINT child column (the reflected
    FK/PK type-mismatch case): the exact semi join coerces and matches,
    so the Bloom path must too — the key side is cast to the child's
    types before hashing."""
    from pyspark.sql import functions as F2

    child = spark.range(0, 1000).select(F2.col("id").alias("k"))  # bigint
    keys = spark.createDataFrame(
        [(i,) for i in range(0, 100, 3)], "k int"  # int
    )
    exact = child.join(keys, on=["k"], how="left_semi")
    got = bloom_semi_join(child, keys, ["k"])
    assert sorted(r.k for r in got.collect()) == sorted(
        r.k for r in exact.collect()
    )
    assert got.count() == 34  # 0,3,...,99


def test_bloom_bails_on_uncoercible_type_mix(spark):
    """STRING child vs NUMERIC keys: the exact semi join coerces
    through DOUBLE ('05' matches 5) but hash representations can't be
    aligned ('05' vs '5'), so the prefilter must BAIL to the identity
    instead of dropping rows the exact join keeps (round-10 review)."""
    from pyspark.sql import functions as F2

    from dbcut_spark.operators.bloom import bloom_prefilter, bloom_semi_join

    # note: no non-numeric strings — under ANSI the EXACT reference
    # join itself strict-casts the string side and would abort on them
    child = spark.createDataFrame(
        [("05",), ("5",), ("7",)], "k string"
    )
    keys = spark.createDataFrame([(5,)], "k bigint")
    # prefilter is the identity on the unsafe mix — nothing dropped
    assert bloom_prefilter(child, keys, ["k"], m=1 << 10).count() == 3
    got = {r["k"] for r in bloom_semi_join(child, keys, ["k"]).collect()}
    exact = {
        r["k"] for r in child.join(keys, ["k"], "left_semi").collect()
    }
    assert got == exact and "05" in got


def test_salted_ops_tolerate_user_salt_columns(spark):
    """A frame already carrying a __salt-like user column must survive
    salted_join unchanged — internal columns use the __dbcut_ prefix
    now (round-10 review)."""
    from dbcut_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(1, "keep-me")], "k long, __salt string"
    )
    right = spark.createDataFrame([(1, "r")], "k long, rv string")
    out = salted_join(left, right, ["k"]).collect()
    assert out[0]["__salt"] == "keep-me"
