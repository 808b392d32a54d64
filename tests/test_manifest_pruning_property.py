"""Property test: manifest file skipping NEVER changes semantics.

For a table published with footer stats + hash buckets, and ANY
conjunction of supported predicates over mixed type domains,
``read_snapshot(where=...)`` must return exactly the rows of the
UNPRUNED snapshot filtered by the same predicates — pruning (stats
min/max, all-NULL skip, bucket routing) is purely a scan-size
optimization. This is the one invariant a wrong bound-encode, a
domain-bridge slip, or a bucket-hash mismatch would break by LOSING
rows silently, so it gets the randomized treatment on top of the
example-based suite."""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dbcut_spark.sinks import manifest as mf

_N = 400

_OPS = ["=", "<", "<=", ">", ">="]

# predicate values deliberately overshoot the data ranges so boundary,
# empty-result, and all-match cases all get generated
_num_vals = st.one_of(
    st.integers(min_value=-50, max_value=_N + 50),
    st.floats(min_value=-50, max_value=_N + 50,
              allow_nan=False, allow_infinity=False),
)
_ts_vals = st.integers(min_value=-10, max_value=120).map(
    lambda d: datetime.datetime(2020, 1, 1) + datetime.timedelta(days=d)
)
_str_vals = st.sampled_from(["a", "cat_1", "cat_5", "cat_9", "zzz", ""])

_pred = st.one_of(
    st.tuples(st.just("v"), st.sampled_from(_OPS), _num_vals),
    st.tuples(st.just("ts"), st.sampled_from(_OPS), _ts_vals),
    st.tuples(st.just("cat"), st.sampled_from(_OPS), _str_vals),
    # (a string predicate on the numeric column — the foreign-domain
    # case — raises Spark's ANSI cast error identically through the
    # pruned and unpruned paths, and prune_report's conservatism for
    # it is pinned in test_manifest_stats_typed_pruning; it is not a
    # runnable comparison, so it is not generated here)
    st.tuples(
        st.just("k"), st.just("in"),
        st.lists(st.integers(min_value=-5, max_value=_N + 5),
                 min_size=1, max_size=4),
    ),
    st.tuples(
        st.just("cat"), st.just("in"),
        st.lists(_str_vals, min_size=1, max_size=3),
    ),
)


def _build(spark, path: str) -> None:
    base = spark.range(0, _N).select(
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("v"),
        F.expr(
            "timestamp'2020-01-01 00:00:00' + make_interval(0,0,0,id,0,0,0)"
        ).alias("ts"),
        F.concat(F.lit("cat_"), (F.col("id") % 10)).alias("cat"),
    )
    # three commits: clustered ranges + a slice with NULLs in v/cat
    s1 = base.filter(F.col("k") < 150)
    s2 = base.filter((F.col("k") >= 150) & (F.col("k") < 300)).withColumn(
        "v", F.when(F.col("k") % 2 == 0, F.col("v"))
    )
    s3 = base.filter(F.col("k") >= 300).withColumn(
        "cat", F.lit(None).cast("string")
    )
    mf.publish_snapshot(s1, path, stats_cols=["v", "ts", "cat"],
                        cluster_by=["k"])
    for s in (s2, s3):
        mf.publish_snapshot(s, path, mode="append",
                            stats_cols=["v", "ts", "cat"],
                            cluster_by=["k"])


_TBL = {}


def _table(spark, tmp_path_factory) -> str:
    if "p" not in _TBL:
        _TBL["p"] = str(tmp_path_factory.mktemp("prune_prop") / "tbl")
        _build(spark, _TBL["p"])
    return _TBL["p"]


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(preds=st.lists(_pred, min_size=1, max_size=3))
def test_where_pruning_never_changes_semantics(
    spark, tmp_path_factory, preds
):
    tbl = _table(spark, tmp_path_factory)
    where = list(preds)
    got = sorted(
        tuple(r)
        for r in mf.read_snapshot(spark, tbl, where=where)
        .select("k").collect()
    )
    cond = mf._where_column(where)
    exp = sorted(
        tuple(r)
        for r in mf.read_snapshot(spark, tbl).filter(cond)
        .select("k").collect()
    )
    assert got == exp


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(st.integers(min_value=-5, max_value=_N + 5),
                  min_size=1, max_size=5)
)
def test_bucket_routing_never_loses_rows(spark, tmp_path_factory, keys):
    if "b" not in _TBL:
        _TBL["b"] = str(tmp_path_factory.mktemp("bucket_prop") / "tbl")
        a = spark.range(0, _N).select(F.col("id").alias("k"))
        b = spark.range(_N, 2 * _N).select(F.col("id").alias("k"))
        mf.publish_snapshot(a, _TBL["b"], bucket_by=("k", 8))
        mf.publish_snapshot(b, _TBL["b"], mode="append", bucket_by=("k", 8))
    tbl = _TBL["b"]
    where = [("k", "in", keys)]
    got = sorted(
        r["k"]
        for r in mf.read_snapshot(spark, tbl, where=where).collect()
    )
    exp = sorted(k for k in set(keys) if 0 <= k < 2 * _N)
    assert got == exp
