"""Incrementally-maintained materialized rollup views
(operators/matview.py): the incremental path must be bit-identical to
a full recompute, fall back to full on any non-append base history,
and never double-count under concurrent refreshes."""

import pytest
from pyspark.sql import functions as F

from dbcut_spark.operators.matview import refresh_rollup, rollup
from dbcut_spark.sinks import manifest as mf

KEYS = ["o_orderstatus"]
MEASURES = {
    "n_orders": ("count", None),
    "total_price": ("sum", "o_totalprice"),
    "min_price": ("min", "o_totalprice"),
    "max_price": ("max", "o_totalprice"),
}


def _mrows(df):
    return sorted(tuple(r) for r in df.collect())


def _types(df):
    return [(f.name, f.dataType.simpleString()) for f in df.schema.fields]


@pytest.fixture()
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def _check_view_equals_full(spark, base, view):
    got = mf.read_snapshot(spark, view)
    exp = rollup(mf.read_snapshot(spark, base), KEYS, MEASURES)
    assert _types(got) == _types(exp)
    assert _mrows(got) == _mrows(exp)


def test_matview_incremental_equals_full(spark, tmp_path, orders):
    """Append-by-append refresh == one-shot rollup at every step, with
    the expected mode per step (full bootstrap, then incremental, then
    noop)."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    slices = [
        orders.filter(F.year("o_orderdate") < 1995),
        orders.filter(
            (F.year("o_orderdate") >= 1995) & (F.year("o_orderdate") < 1997)
        ),
        orders.filter(F.year("o_orderdate") >= 1997),
    ]
    mf.publish_snapshot(slices[0], base)
    r = refresh_rollup(spark, base, view, KEYS, MEASURES)
    assert r["mode"] == "full"
    _check_view_equals_full(spark, base, view)
    for sl in slices[1:]:
        mf.publish_snapshot(sl, base, mode="append")
        r = refresh_rollup(spark, base, view, KEYS, MEASURES)
        assert r["mode"] == "incremental" and r["delta_files"] >= 1
        _check_view_equals_full(spark, base, view)
    r = refresh_rollup(spark, base, view, KEYS, MEASURES)
    assert r["mode"] == "noop"


def test_matview_multi_append_between_refreshes(spark, tmp_path, orders):
    """Several appends between two refreshes fold into ONE delta read
    (the manifest diff spans versions)."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    mf.publish_snapshot(orders.filter(F.year("o_orderdate") < 1995), base)
    refresh_rollup(spark, base, view, KEYS, MEASURES)
    for y in (1995, 1996, 1997):
        mf.publish_snapshot(
            orders.filter(F.year("o_orderdate") == y), base, mode="append"
        )
    r = refresh_rollup(spark, base, view, KEYS, MEASURES)
    assert r["mode"] == "incremental"
    _check_view_equals_full(spark, base, view)


def test_matview_overwrite_forces_full(spark, tmp_path, orders):
    """An overwrite (or upsert) in the window invalidates min/max and
    counts — the refresh must take the full path and still be exact."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    mf.publish_snapshot(orders.filter(F.year("o_orderdate") < 1997), base)
    refresh_rollup(spark, base, view, KEYS, MEASURES)
    mf.publish_snapshot(
        orders.filter(F.year("o_orderdate") >= 1995), base, mode="overwrite"
    )
    r = refresh_rollup(spark, base, view, KEYS, MEASURES)
    assert r["mode"] == "full"
    _check_view_equals_full(spark, base, view)


def test_matview_upsert_forces_full(spark, tmp_path, orders):
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    mf.publish_snapshot(orders.limit(200), base)
    refresh_rollup(spark, base, view, KEYS, MEASURES)
    delta = orders.limit(50).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    mf.upsert_snapshot(spark, delta, base, ["o_orderkey"])
    r = refresh_rollup(spark, base, view, KEYS, MEASURES)
    assert r["mode"] == "full"
    _check_view_equals_full(spark, base, view)


def test_matview_spec_change_forces_full(spark, tmp_path, orders):
    """A cursor built for a DIFFERENT spec must not be merged into."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    mf.publish_snapshot(orders.limit(100), base)
    refresh_rollup(spark, base, view, KEYS, MEASURES)
    mf.publish_snapshot(orders.limit(300), base, mode="append")
    other = {"n_orders": ("count", None)}
    r = refresh_rollup(spark, base, view, KEYS, other)
    assert r["mode"] == "full"
    got = mf.read_snapshot(spark, view)
    exp = rollup(mf.read_snapshot(spark, base), KEYS, other)
    assert _mrows(got) == _mrows(exp)


def test_matview_empty_delta_append(spark, tmp_path, orders):
    """An append that adds zero rows still advances the cursor and
    leaves the numbers unchanged."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    mf.publish_snapshot(orders.limit(100), base)
    refresh_rollup(spark, base, view, KEYS, MEASURES)
    before = _mrows(mf.read_snapshot(spark, view))
    mf.publish_snapshot(orders.limit(0), base, mode="append")
    r = refresh_rollup(spark, base, view, KEYS, MEASURES)
    assert r["mode"] == "incremental"
    assert _mrows(mf.read_snapshot(spark, view)) == before
    assert refresh_rollup(spark, base, view, KEYS, MEASURES)["mode"] == "noop"


def test_matview_concurrent_refresh_loses_loudly(
    spark, tmp_path, orders, monkeypatch
):
    """A racer publishing the view between our read and our publish
    makes THIS refresh raise VersionConflictError — a delta is never
    double-counted into a view it was not derived from."""
    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    mf.publish_snapshot(orders.limit(100), base)
    refresh_rollup(spark, base, view, KEYS, MEASURES)
    mf.publish_snapshot(orders.limit(300), base, mode="append")

    orig = mf.publish_snapshot

    def racing(df, table_path, **kw):
        if table_path == view and kw.get("expected_parent") is not None:
            monkeypatch.setattr(mf, "publish_snapshot", orig)
            orig(df.limit(0), table_path, mode="overwrite")  # racer wins
        return orig(df, table_path, **kw)

    monkeypatch.setattr(mf, "publish_snapshot", racing)
    with pytest.raises(mf.VersionConflictError):
        refresh_rollup(spark, base, view, KEYS, MEASURES)


def test_matview_rejects_non_decomposable(spark, tmp_path, orders):
    with pytest.raises(ValueError, match="not decomposable"):
        rollup(orders, KEYS, {"d": ("count_distinct", "o_custkey")})
    with pytest.raises(ValueError, match="needs a column"):
        rollup(orders, KEYS, {"s": ("sum", None)})
    with pytest.raises(ValueError, match="at least one group key"):
        rollup(orders, [], MEASURES)
    with pytest.raises(ValueError, match="collide with group keys"):
        rollup(orders, KEYS, {"o_orderstatus": ("count", None)})


def test_matview_approx_distinct_incremental(spark, tmp_path, orders):
    """approx_distinct maintains an HLL sketch through incremental
    merges; the merged estimates equal a one-pass sketch over the
    whole base (union-of-partials exactness), and the view stores the
    mergeable sketch, not the estimate."""
    from dbcut_spark.operators.matview import finalize_rollup

    base, view = str(tmp_path / "base"), str(tmp_path / "view")
    measures = {
        "n_orders": ("count", None),
        "approx_custs": ("approx_distinct", "o_custkey"),
    }
    slices = [
        orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)
    ]
    mf.publish_snapshot(slices[0], base)
    modes = [refresh_rollup(spark, base, view, KEYS, measures)["mode"]]
    for sl in slices[1:]:
        mf.publish_snapshot(sl, base, mode="append")
        modes.append(refresh_rollup(spark, base, view, KEYS, measures)["mode"])
    assert modes == ["full", "incremental", "incremental"]
    got = mf.read_snapshot(spark, view)
    assert got.schema["approx_custs"].dataType.simpleString() == "binary"
    est = _mrows(finalize_rollup(got, measures))
    exp = _mrows(
        finalize_rollup(
            rollup(mf.read_snapshot(spark, base), KEYS, measures), measures
        )
    )
    assert est == exp
    # and the estimates are honest: within 5% of exact per key
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in mf.read_snapshot(spark, base)
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for status, _n, approx in est:
        assert abs(approx - exact[status]) <= 0.05 * exact[status]
