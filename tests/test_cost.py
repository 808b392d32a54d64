"""Static cost estimator (plans/cost.py): footer accuracy, bound
propagation lockstep with the executor, and the no-Spark guarantee."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from dbcut_spark.catalog import TPCH_CATALOG
from dbcut_spark.plans import build_plan
from dbcut_spark.plans.cost import estimate_plan, footer_stats

SF_DIR = "/root/testdata/sf0.001"


def _plan(raw: dict):
    return build_plan(TPCH_CATALOG, raw)


def test_footer_stats_match_pyarrow():
    path = os.path.join(SF_DIR, "orders.parquet")
    stats = footer_stats(path)
    assert stats is not None
    assert stats.rows == pq.ParquetFile(path).metadata.num_rows
    assert stats.compressed_bytes > 0
    assert stats.uncompressed_bytes >= stats.compressed_bytes // 2
    # per-column totals partition the whole-file total
    assert sum(stats.col_uncompressed.values()) == stats.uncompressed_bytes
    assert "o_orderkey" in stats.col_uncompressed


def test_footer_stats_missing_table_is_none():
    assert footer_stats(os.path.join(SF_DIR, "no_such.parquet")) is None


def test_bounded_plan_all_edges_broadcast():
    plan = _plan({"from": "customer", "limit": 20, "backref_limit": 5})
    est = estimate_plan(plan, SF_DIR)
    assert est.root_rows is not None and est.root_rows > 0
    assert est.edges, "customer tree has edges"
    assert {e.route for e in est.edges} == {"broadcast"}
    assert est.total_scan_bytes is not None and est.total_scan_bytes > 0


def test_unbounded_small_tables_still_broadcast():
    # limit:no over sf0.001 — every table's footer row count is far
    # under the byte-derived broadcast threshold, so the metadata tier
    # proves broadcastability without any runtime count
    plan = _plan({"from": "customer", "limit": "no", "backref_limit": "no"})
    est = estimate_plan(plan, SF_DIR)
    assert {e.route for e in est.edges} == {"broadcast"}
    # unbounded root: no STATIC bound, but the metadata tier derives
    # one from the customer footer row count (and writes it back so
    # deeper propagation continues from it, mirroring closure.py:261)
    root_rows = footer_stats(os.path.join(SF_DIR, "customer.parquet")).rows
    root_edges = [e for e in est.edges if e.parent == "customer"]
    assert all(e.frontier_bound == root_rows for e in root_edges)


def test_bounds_match_executor_rules():
    """Propagation rules are the executor's (closure.py:309-331):
    root ≤ limit; m2o through the child's full PK keeps the bound;
    capped o2m multiplies by backref_limit."""
    plan = _plan({"from": "customer", "limit": 20, "backref_limit": 5})
    est = estimate_plan(plan, SF_DIR)
    by_edge = {(e.parent, e.table): e for e in est.edges}
    # root frontier bound = limit on every edge out of customer
    assert by_edge[("customer", "orders")].frontier_bound == 20
    assert by_edge[("customer", "nation")].frontier_bound == 20
    # orders frontier came through a capped o2m: 20 parents × 5
    assert by_edge[("orders", "lineitem")].frontier_bound == 100
    # lineitem→part is m2o through part's full PK: bound carries from
    # lineitem's (o2m, 100 × 5 = 500)
    assert by_edge[("lineitem", "part")].frontier_bound == 500


def test_global_backref_mode_caps_child_bound():
    plan = _plan(
        {
            "from": "customer",
            "limit": 20,
            "backref_limit": 7,
            "backref_limit_mode": "global",
        }
    )
    est = estimate_plan(plan, SF_DIR)
    by_edge = {(e.parent, e.table): e for e in est.edges}
    # global mode: ONE limit over the whole child fetch, so the orders
    # frontier is ≤ 7 regardless of parent count
    assert by_edge[("orders", "lineitem")].frontier_bound == 7


def test_huge_synthetic_bound_routes_runtime(tmp_path):
    """A frontier bound past the broadcast threshold → 'runtime' (the
    executor would count, then pick broadcast or Bloom)."""
    plan = _plan(
        {"from": "customer", "limit": 50_000_000, "backref_limit": "no"}
    )
    est = estimate_plan(plan, SF_DIR)
    by_edge = {(e.parent, e.table): e for e in est.edges}
    edge = by_edge[("customer", "orders")]
    # bound known (50M) but over the threshold, and customer's footer
    # rows don't help once a static bound exists — mixed spec
    # (limit set, backref_limit:no) is NOT 'bounded', so routing runs
    assert edge.frontier_bound == 50_000_000
    assert edge.route == "runtime" or edge.broadcast_max_rows >= 50_000_000


def test_missing_table_degrades_not_raises(tmp_path):
    # point at an empty dir: every table lacks stats; estimator still
    # returns a render-able report with unknown costs
    plan = _plan({"from": "customer", "limit": 10, "backref_limit": 5})
    est = estimate_plan(plan, str(tmp_path))
    assert est.root_rows is None
    assert est.total_scan_bytes is None
    assert "customer" in est.stats_missing
    out = est.render()
    assert "no footer stats" in out


def test_render_mentions_routes_and_totals():
    plan = _plan({"from": "customer", "limit": 20, "backref_limit": 5})
    out = estimate_plan(plan, SF_DIR).render()
    assert "route=broadcast" in out
    assert "total scan:" in out
    assert "customer" in out.splitlines()[0]


def test_no_spark_session_needed():
    """The estimator is pure driver-side metadata — prove it by running
    in a subprocess with pyspark's JVM never started."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from dbcut_spark.catalog import TPCH_CATALOG\n"
        "from dbcut_spark.plans import build_plan\n"
        "from dbcut_spark.plans.cost import estimate_plan\n"
        "plan = build_plan(TPCH_CATALOG, {'from': 'customer', 'limit': 20, 'backref_limit': 5})\n"
        f"est = estimate_plan(plan, {SF_DIR!r})\n"
        "assert est.total_scan_bytes > 0\n"
        "from pyspark.sql import SparkSession\n"
        "assert SparkSession.getActiveSession() is None\n"
        "print('OK', est.total_scan_bytes)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout.startswith("OK")


def test_cli_tree_cost(tmp_path):
    """`tree --cost` renders the estimate under each query's tree —
    and, on a parquet TPC-H source, without starting Spark."""
    import yaml
    from click.testing import CliRunner

    from dbcut_spark.cli import cli

    cfg = {
        "databases": {
            "source_uri": SF_DIR,
            "destination_uri": str(tmp_path / "dest"),
        },
        "cache": str(tmp_path / "cache"),
        "queries": [{"from": "customer", "limit": 20, "backref_limit": 5}],
    }
    cfg_path = str(tmp_path / "dbcut.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    runner = CliRunner()
    res = runner.invoke(
        cli, ["-c", cfg_path, "tree", "--cost"], catch_exceptions=False
    )
    assert res.exit_code == 0, res.output
    assert "route=broadcast" in res.output
    assert "total scan:" in res.output


def test_engine_estimate_facade():
    """Engine.estimate mirrors tree --cost without starting jobs (the
    Engine here reuses the session only for lazily-built executors)."""
    from dbcut_spark.api import Engine
    from dbcut_spark.catalog import TPCH_CATALOG

    eng = Engine(SF_DIR, spark=object(), catalog=TPCH_CATALOG)
    est = eng.estimate({"from": "customer", "limit": 20, "backref_limit": 5})
    assert est.total_scan_bytes > 0
    assert {e.route for e in est.edges} == {"broadcast"}


def test_estimator_bounds_dominate_actual_frontiers(spark):
    """Soundness differential: for every edge where the estimator
    claims a static frontier bound, the EXECUTOR's actual parent
    frontier (distinct key rows) must be <= that bound — the estimate
    is an upper bound by construction, and this pins the two walks to
    the same propagation rules on real data."""
    from pyspark.sql import functions as F

    from dbcut_spark.operators.closure import (
        ClosureExecutor,
        parquet_loader,
        parquet_table_rows,
    )

    specs = [
        {"from": "customer", "limit": 20, "backref_limit": 5},
        {"from": "orders", "limit": 15, "backref_limit": 3,
         "backref_limit_mode": "global"},
        {"from": "nation", "limit": 7, "backref_limit": 2,
         "include": ["customer"]},
    ]
    for raw in specs:
        plan = _plan(raw)
        est = estimate_plan(plan, SF_DIR)
        ex = ClosureExecutor(
            spark,
            parquet_loader(spark, SF_DIR),
            table_rows=parquet_table_rows(SF_DIR),
        )
        _tables, frontiers = ex.execute_nodes(plan)
        # estimator edges come out in the same BFS walk order as the
        # executor's loop — re-walk to pair each edge with its parent
        idx = 0
        for node in plan.tree.root.walk():
            for child in node.children:
                edge = est.edges[idx]
                assert edge.parent == node.table and edge.table == child.table
                if edge.frontier_bound is not None:
                    rel = child.relationship
                    actual = (
                        frontiers[id(node)]
                        .select(*rel.source_cols)
                        .dropna()
                        .distinct()
                        .count()
                    )
                    assert actual <= edge.frontier_bound, (
                        raw, edge.parent, edge.table, actual,
                        edge.frontier_bound,
                    )
                idx += 1
        assert idx == len(est.edges)


def test_footer_stats_corrupt_file_degrades(tmp_path):
    """A garbage .parquet file (truncated upload, torn write) must not
    crash the preview — the table degrades to unknown cost exactly like
    a missing one."""
    bad = tmp_path / "customer.parquet"
    bad.write_bytes(b"PAR1 this is not a real parquet footer")
    assert footer_stats(str(bad)) is None
    plan = _plan({"from": "customer", "limit": 5, "backref_limit": 2})
    est = estimate_plan(plan, str(tmp_path))
    assert est.root_rows is None and "customer" in est.stats_missing


def test_rows_only_stats_provider_jdbc_shape():
    """A rows-only stats_fn (what a JDBC information_schema estimate
    provides) keeps the routing prediction but reports scan bytes as
    unknown rather than zero."""
    from dbcut_spark.plans.cost import TableStats

    rows = {"customer": 1500, "orders": 15000, "nation": 25,
            "region": 5, "lineitem": 60000, "supplier": 100,
            "part": 2000, "events": 10000, "documents": 500,
            "embeddings": 500}

    def stats_fn(table):
        return TableStats(rows.get(table, 0), 0, 0, {})

    plan = _plan({"from": "customer", "limit": "no", "backref_limit": "no"})
    est = estimate_plan(plan, "ignored-dir", stats_fn=stats_fn)
    # every table under the threshold -> still all-broadcast
    assert {e.route for e in est.edges} == {"broadcast"}
    assert est.root_rows == 1500
    # bytes unknown, never zero
    assert est.root_scan_bytes is None
    assert est.total_scan_bytes is None
    assert all(e.child_scan_bytes is None for e in est.edges)
    assert "?" in est.render()


def test_cli_verify_differential(tmp_path, spark):
    """cli verify: every per-table closure of the config's queries
    re-derived by DuckDB and value-compared."""
    import yaml
    from click.testing import CliRunner

    from dbcut_spark.cli import cli

    cfg = {
        "databases": {
            "source_uri": SF_DIR,
            "destination_uri": str(tmp_path / "dest"),
        },
        "cache": str(tmp_path / "cache"),
        "queries": [
            {
                "from": "customer",
                "where": {"c_mktsegment": "BUILDING"},
                "limit": 10,
                "backref_limit": 5,
                "exclude": ["events", "part", "supplier"],
                "join_depth": 2,
                "backref_depth": 1,
            }
        ],
    }
    cfg_path = str(tmp_path / "dbcut.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    runner = CliRunner()
    res = runner.invoke(
        cli, ["-c", cfg_path, "verify"], catch_exceptions=False
    )
    assert res.exit_code == 0, res.output
    assert "0 failures" in res.output
    assert "ok    query 0 customer rows=10" in res.output


def test_cli_skew_diagnostic(tmp_path, spark):
    import yaml
    from click.testing import CliRunner

    from dbcut_spark.cli import cli

    cfg = {
        "databases": {
            "source_uri": SF_DIR,
            "destination_uri": str(tmp_path / "dest"),
        },
        "cache": str(tmp_path / "cache"),
        "queries": [],
    }
    cfg_path = str(tmp_path / "dbcut.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    runner = CliRunner()
    # chained click groups parse subcommand options BEFORE the
    # positional argument (same convention as `sql -n 5 <stmt>`)
    res = runner.invoke(
        cli, ["-c", cfg_path, "skew", "-k", "3", "events.user_id"],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    assert "rows over" in res.output
    assert "x uniform" in res.output
    # exactly 3 heavy-key rows after the two header lines
    body = [ln for ln in res.output.splitlines() if ln.strip()]
    assert len(body) == 2 + 3, res.output

    bad = runner.invoke(cli, ["-c", cfg_path, "skew", "nodot"])
    assert bad.exit_code != 0


def test_metadata_bound_propagates_to_deeper_edges():
    """Round-8 review fix: the metadata-derived bound must write back
    into the node's bound (closure.py:261 does) so DEEPER edges keep
    predicting broadcast — a 100k-row root with limit:no must not make
    its grandchild edge read 'runtime' just because the child table is
    huge."""
    from dbcut_spark.plans.cost import TableStats

    rows = {"customer": 100_000, "orders": 50_000_000,
            "lineitem": 200_000_000, "nation": 25, "region": 5,
            "supplier": 100, "part": 2000, "events": 10,
            "documents": 10, "embeddings": 10}

    def stats_fn(table):
        return TableStats(rows.get(table, 0), 0, 0, {})

    plan = _plan({"from": "customer", "limit": "no", "backref_limit": 5})
    est = estimate_plan(plan, "ignored", stats_fn=stats_fn)
    by_edge = {(e.parent, e.table): e for e in est.edges}
    # customer's 100k metadata rows prove the root frontier broadcasts
    assert by_edge[("customer", "orders")].route == "broadcast"
    assert by_edge[("customer", "orders")].frontier_bound == 100_000
    # ...and propagate through the capped o2m: orders frontier <= 500k,
    # so orders->lineitem broadcasts even though orders has 50M rows
    e = by_edge[("orders", "lineitem")]
    assert e.frontier_bound == 500_000
    assert e.route == "broadcast", e


def test_bench_isolate_merge_semantics():
    """merge_isolate: successful re-runs win, failed children keep the
    standing record, unknown queries append, different-sf artifacts are
    replaced wholesale."""
    from bench import merge_isolate

    prev = {
        "sf": 0.1,
        "queries": {
            "a": {"query": "a", "best": 1.0},
            "b": {"query": "b", "best": 2.0},
        },
    }
    out = {
        "a": {"query": "a", "best": 0.9},     # success -> wins
        "b": {"error": "child OOM"},           # failure -> keep prior
        "c": {"query": "c", "best": 3.0},      # new -> appended
    }
    merged = merge_isolate(prev, out, 0.1)
    assert merged["a"]["best"] == 0.9
    assert merged["b"]["best"] == 2.0
    assert merged["c"]["best"] == 3.0
    # different sf: replace wholesale (no mixed-sf comparisons) — but
    # error stubs are dropped even then (round-9 protocol hardening:
    # an {"error": ...} record must NEVER enter the artifact)
    clean = {k: v for k, v in out.items() if "best" in v}
    assert merge_isolate(prev, out, 0.01) == clean
    assert merge_isolate(None, out, 0.1) == clean


def test_bounded_but_huge_static_bound_routes_runtime():
    """Round-8 review fix: bounded specs force-broadcast ONLY while the
    compounding limit x backref_limit^depth product stays under the
    byte threshold — a provably-huge bounded frontier must route
    adaptively (executor) and read 'runtime' (preview)."""
    plan = _plan({"from": "customer", "limit": 50_000_000,
                  "backref_limit": 1000})
    est = estimate_plan(plan, SF_DIR)
    by_edge = {(e.parent, e.table): e for e in est.edges}
    e = by_edge[("customer", "orders")]
    assert e.frontier_bound == 50_000_000
    assert e.route == "runtime"
    # deeper: orders bound = 50M x 1000 -> also runtime
    assert by_edge[("orders", "lineitem")].route == "runtime"
    # a small bounded spec is untouched
    small = estimate_plan(
        _plan({"from": "customer", "limit": 20, "backref_limit": 5}), SF_DIR
    )
    assert {x.route for x in small.edges} == {"broadcast"}


def test_cli_skew_and_sql_reject_jdbc_source(tmp_path):
    """skew and sql branch on the source kind like their siblings: a
    jdbc: source gets a clean UsageError, not a raw Spark path error."""
    import yaml
    from click.testing import CliRunner

    from dbcut_spark.cli import cli

    cfg = {
        "databases": {
            "source_uri": "jdbc:mysql://db.example/prod",
            "destination_uri": str(tmp_path / "dest"),
        },
        "cache": str(tmp_path / "cache"),
        "queries": [],
    }
    cfg_path = str(tmp_path / "dbcut.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    r1 = CliRunner().invoke(cli, ["-c", cfg_path, "skew", "orders.o_custkey"])
    assert r1.exit_code != 0 and "parquet" in r1.output
    r2 = CliRunner().invoke(cli, ["-c", cfg_path, "sql", "SELECT 1"])
    assert r2.exit_code != 0 and "parquet" in r2.output
