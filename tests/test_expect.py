"""Data-quality expectations (operators/expect.py) and the equi-width
histogram (operators/profile.py:column_histogram)."""

import pytest
from pyspark.sql import functions as F

from dbcut_spark.operators.expect import check_constraints
from dbcut_spark.operators.profile import column_histogram


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, "x-1"),
            (2, "a", 20.0, "x-2"),
            (2, None, 500.0, "y-3"),
            (4, "b", None, "zz"),
        ],
        "id long, cat string, val double, code string",
    )


def _report(spark, rules, refs=None):
    return {
        r.rule: r
        for r in check_constraints(_df(spark), rules, refs).collect()
    }


def test_scalar_rules_fold(spark):
    got = _report(
        spark,
        [
            {"rule": "not_null", "col": "cat"},
            {"rule": "in_range", "col": "val", "lo": 0.0, "hi": 100.0},
            {"rule": "accepted_values", "col": "cat", "values": ["a"]},
            {"rule": "matches", "col": "code", "pattern": "^[a-z]-"},
            {"rule": "unique", "cols": ["id"]},
        ],
    )
    nn = got["not_null(cat)"]
    assert (nn.checked, nn.violations, nn.passed) == (4, 1, False)
    ir = got["in_range(val)"]
    # NULL val is skipped (checked=3); 500 violates
    assert (ir.checked, ir.violations, ir.passed) == (3, 1, False)
    av = got["accepted_values(cat)"]
    assert (av.checked, av.violations, av.passed) == (3, 1, False)
    m = got["matches(code)"]
    assert (m.checked, m.violations, m.passed) == (4, 1, False)
    u = got["unique(id)"]
    assert (u.checked, u.violations, u.passed) == (4, 1, False)


def test_unique_multi_column_skips_null_keys(spark):
    got = _report(spark, [{"rule": "unique", "cols": ["id", "cat"]}])
    u = got["unique(id,cat)"]
    # the NULL-cat row is not a checkable key; remaining 3 are distinct
    assert (u.checked, u.violations, u.passed) == (3, 0, True)


def test_foreign_key_rule(spark):
    parent = spark.createDataFrame([(1,), (2,)], "pid long")
    got = _report(
        spark,
        [
            {"rule": "foreign_key", "cols": ["id"], "ref": "p",
             "ref_cols": ["pid"]},
        ],
        refs={"p": parent},
    )
    fk = got["foreign_key(id -> p.pid)"]
    # id=4 is an orphan; the duplicate id=2 rows both check
    assert (fk.checked, fk.violations, fk.passed) == (4, 1, False)


def test_all_passing_report(spark):
    got = _report(
        spark,
        [
            {"rule": "not_null", "col": "id"},
            {"rule": "in_range", "col": "val", "lo": 0.0, "hi": 1000.0},
        ],
    )
    assert all(r.passed for r in got.values())


def test_validation_errors(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="no rules"):
        check_constraints(df, [])
    with pytest.raises(ValueError, match="not in the frame"):
        check_constraints(df, [{"rule": "not_null", "col": "nope"}])
    with pytest.raises(ValueError, match="unknown rule kind"):
        check_constraints(df, [{"rule": "sparkle", "col": "id"}])
    with pytest.raises(ValueError, match="needs lo and hi"):
        check_constraints(df, [{"rule": "in_range", "col": "val"}])
    with pytest.raises(ValueError, match="not provided"):
        check_constraints(
            df,
            [{"rule": "foreign_key", "cols": ["id"], "ref": "p",
              "ref_cols": ["pid"]}],
        )
    with pytest.raises(ValueError, match="lengths differ"):
        check_constraints(
            df,
            [{"rule": "foreign_key", "cols": ["id"], "ref": "p",
              "ref_cols": ["a", "b"]}],
            refs={"p": df},
        )


def test_scalar_rules_single_scan_plan(spark):
    """All scalar + unique rules fold into one aggregate: one scan."""
    df = _df(spark)
    rep = check_constraints(
        df,
        [
            {"rule": "not_null", "col": "cat"},
            {"rule": "in_range", "col": "val", "lo": 0.0, "hi": 100.0},
            {"rule": "matches", "col": "code", "pattern": "^x"},
        ],
    )
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1


def test_histogram_basic_and_clamp(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(11)] + [(None,)], "x double"
    )
    got = {r.bin: (r.n_rows, r.total) for r in
           column_histogram(df, "x", bins=5).collect()}
    # lo=0, hi=10, width 2: bins [0,2) [2,4) ... and x=10 clamps to 4
    assert got == {
        0: (2, 1.0), 1: (2, 5.0), 2: (2, 9.0), 3: (2, 13.0),
        4: (3, 27.0),
    }


def test_histogram_explicit_bounds_filter_outside(spark):
    df = spark.createDataFrame([(1.0,), (5.0,), (99.0,)], "x double")
    got = {r.bin: r.n_rows for r in
           column_histogram(df, "x", bins=2, lo=0.0, hi=10.0).collect()}
    # 99 is outside the bounds; 5.0 sits exactly on the boundary and
    # belongs to the upper half-open bin
    assert got == {0: 1, 1: 1}


def test_histogram_degenerate_and_validation(spark):
    one = spark.createDataFrame([(7.0,), (7.0,)], "x double")
    got = column_histogram(one, "x", bins=4).collect()
    assert len(got) == 1 and got[0].bin == 0 and got[0].n_rows == 2
    with pytest.raises(ValueError, match="bins"):
        column_histogram(one, "x", bins=0)
    with pytest.raises(ValueError, match="not in the frame"):
        column_histogram(one, "nope")
    with pytest.raises(ValueError, match="both lo and hi"):
        column_histogram(one, "x", lo=0.0)
    with pytest.raises(ValueError, match="lo < hi"):
        column_histogram(one, "x", lo=5.0, hi=5.0)


def test_histogram_lazy_no_collect(spark):
    # bounds ride a broadcast scalar join, not a driver collect: the
    # unexecuted frame must already hold the full plan
    df = spark.createDataFrame([(1.0,)], "x double")
    h = column_histogram(df, "x", bins=2)
    plan = h._jdf.queryExecution().optimizedPlan().toString()
    assert "min(" in plan and "max(" in plan  # bounds inside the plan


def test_cli_check(spark, sf_dir, tmp_path):
    import yaml
    from click.testing import CliRunner

    from dbcut_spark.cli import cli

    cfg = {
        "databases": {
            "source_uri": sf_dir,
            "destination_uri": str(tmp_path / "dest"),
        },
        "cache": str(tmp_path / "cache"),
        "queries": [],
    }
    cfg_path = str(tmp_path / "dbcut.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    rules = [
        {"rule": "not_null", "col": "o_custkey"},
        {"rule": "unique", "cols": ["o_custkey"]},  # fails: repeat buyers
        {"rule": "foreign_key", "cols": ["o_custkey"],
         "ref": "customer", "ref_cols": ["c_custkey"]},
    ]
    rules_path = str(tmp_path / "rules.yml")
    with open(rules_path, "w") as f:
        yaml.safe_dump(rules, f)
    res = CliRunner().invoke(
        cli,
        ["-c", cfg_path, "check", "--rules", rules_path, "orders"],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    assert "3 rules, 1 failing" in res.output
    assert "FAIL unique(o_custkey)" in res.output
    assert "ok   not_null(o_custkey)" in res.output
    # CI gate mode propagates the failure as exit code
    res2 = CliRunner().invoke(
        cli,
        ["-c", cfg_path, "check", "--rules", rules_path,
         "--fail-on-violation", "orders"],
    )
    assert res2.exit_code == 1


def test_corr_matrix_exact_known_values(spark):
    from dbcut_spark.operators.profile import corr_matrix

    df = spark.createDataFrame(
        [(1.0, 2.0, 5.0), (2.0, 4.0, 1.0), (3.0, 6.0, 4.0),
         (4.0, 8.0, 2.0)],
        "x double, y double, z double",
    )
    got = {(r.col_x, r.col_y): r for r in
           corr_matrix(df, ["x", "y", "z"]).collect()}
    # y = 2x exactly
    assert got[("x", "y")].corr == 1.0
    assert got[("x", "y")].n == 4
    # z is weakly anti-correlated with x; hand computation for
    # (1,5),(2,1),(3,4),(4,2): -6/(sqrt(20)*sqrt(10)) = -0.424264...
    assert got[("x", "z")].corr == pytest.approx(-0.4242641, abs=1e-6)


def test_corr_matrix_pairwise_nulls_and_zero_variance(spark):
    from dbcut_spark.operators.profile import corr_matrix

    df = spark.createDataFrame(
        [(1.0, 1.0, 7.0), (2.0, None, 7.0), (3.0, 3.0, 7.0)],
        "x double, y double, k double",
    )
    got = {(r.col_x, r.col_y): r for r in
           corr_matrix(df, ["x", "y", "k"]).collect()}
    # pairwise deletion: (x,y) checks only the 2 complete rows
    assert got[("x", "y")].n == 2 and got[("x", "y")].corr == 1.0
    # constant column: zero variance -> NULL, never a div-by-zero
    assert got[("x", "k")].corr is None
    assert got[("y", "k")].corr is None


def test_corr_matrix_exact_matches_builtin(spark, sf_dir):
    from dbcut_spark.operators.profile import corr_matrix

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cols = ["o_custkey", "o_totalprice"]
    e = corr_matrix(orders, cols, exact=True).collect()[0]
    a = corr_matrix(orders, cols, exact=False).collect()[0]
    assert e.corr == pytest.approx(a.corr, abs=1e-5)
    assert e.n == a.n


def test_corr_matrix_validation(spark):
    from dbcut_spark.operators.profile import corr_matrix

    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="at least 2"):
        corr_matrix(df, ["x"])
    with pytest.raises(ValueError, match="not in frame"):
        corr_matrix(df, ["x", "nope"])
