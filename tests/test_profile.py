"""One-pass table profiler (operators/profile.py)."""

import pytest
from pyspark.sql import functions as F

from dbcut_spark.operators.profile import table_profile


def _by_col(df):
    return {r.column_name: r for r in df.collect()}


def test_profile_basic_exact(spark):
    df = spark.createDataFrame(
        [
            (1, "aa", 1.5, None),
            (2, "bbbb", 2.5, None),
            (2, None, None, None),
        ],
        "id int, s string, x double, dead string",
    )
    p = _by_col(table_profile(df, exact_distinct=True))
    assert set(p) == {"id", "s", "x", "dead"}
    assert all(r.n_rows == 3 for r in p.values())
    assert p["id"].n_nulls == 0 and p["id"].n_distinct == 2
    assert p["id"].min_value == "1" and p["id"].max_value == "2"
    assert p["id"].avg_len is None
    assert p["s"].n_nulls == 1 and p["s"].n_distinct == 2
    assert p["s"].min_value == "aa" and p["s"].max_value == "bbbb"
    assert p["s"].avg_len == 3.0  # (2+4)/2 over non-NULLs
    # fractional min/max bridge through DECIMAL(38,6)
    assert p["x"].min_value == "1.500000"
    assert p["x"].max_value == "2.500000"
    assert p["dead"].n_nulls == 3 and p["dead"].n_distinct == 0
    assert p["dead"].min_value is None and p["dead"].avg_len is None
    # deterministic output order
    names = [r.column_name for r in table_profile(df).collect()]
    assert names == sorted(names)


def test_profile_unsupported_types_profile_counts_only(spark):
    df = spark.createDataFrame(
        [([1, 2], 1), ([], 2), (None, 3)],
        "arr array<int>, id int",
    )
    p = _by_col(table_profile(df, exact_distinct=True))
    assert p["arr"].n_rows == 3 and p["arr"].n_nulls == 1
    assert p["arr"].n_distinct == 2
    assert p["arr"].min_value is None and p["arr"].max_value is None


def test_profile_column_subset_and_validation(spark):
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    got = table_profile(df, columns=["s"]).collect()
    assert [r.column_name for r in got] == ["s"]
    with pytest.raises(ValueError, match="not in the frame"):
        table_profile(df, columns=["nope"])
    with pytest.raises(ValueError, match="no columns"):
        table_profile(df.select(F.lit(1).alias("x")), columns=[])


def test_profile_empty_frame(spark):
    df = spark.createDataFrame([], "id int, s string")
    p = _by_col(table_profile(df, exact_distinct=True))
    assert p["id"].n_rows == 0 and p["id"].n_nulls == 0
    assert p["id"].n_distinct == 0 and p["id"].min_value is None


def test_profile_approx_default_close_to_exact(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = _by_col(table_profile(orders, exact_distinct=True))
    approx = _by_col(table_profile(orders))  # rsd=0.05 default
    for c in exact:
        e, a = exact[c].n_distinct, approx[c].n_distinct
        assert a == pytest.approx(e, rel=0.15), c
        # everything but the distinct estimator is identical
        assert approx[c].n_nulls == exact[c].n_nulls
        assert approx[c].min_value == exact[c].min_value


def test_profile_single_aggregate_plan(spark, sf_dir):
    """The profile is ONE aggregate over the scan: exactly one
    Scan parquet node in the plan, and no Python UDF anywhere."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plan = table_profile(orders)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cli_profile(spark, sf_dir, tmp_path):
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
    res = CliRunner().invoke(
        cli,
        ["-c", cfg_path, "profile", "--exact", "nation"],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    assert "n_nationkey" in res.output and "n_name" in res.output
    assert "25 rows" in res.output
    # unknown table is a usage error
    res2 = CliRunner().invoke(cli, ["-c", cfg_path, "profile", "nope"])
    assert res2.exit_code != 0
    # a manifest table profiles through read_snapshot
    from dbcut_spark.sinks import manifest as mf

    tbl = str(tmp_path / "mtbl")
    mf.publish_snapshot(
        spark.createDataFrame([(1, "x")], "id int, s string"), tbl
    )
    res3 = CliRunner().invoke(
        cli,
        ["-c", cfg_path, "profile", "--manifest", tbl],
        catch_exceptions=False,
    )
    assert res3.exit_code == 0, res3.output
    assert "1 rows" in res3.output
