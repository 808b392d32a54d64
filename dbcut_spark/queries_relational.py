"""Extended relational coverage: TPC-H-shaped queries q4/q6/q7/q10/q14/
q15/q17/q18/q19/q21/q22 adapted to the harness's trimmed schema (no
``partsupp``, no commit/receipt dates — late shipment is expressed
against ``o_orderdate`` instead).

These widen the relational surface beyond what the reference's own test
queries exercise (the reference cuts relational closures; a user doing
analytics on the cut output runs exactly these shapes). Every query
follows the repo's parity rules: money sums go through DECIMAL(25,8),
ratios divide as DOUBLE (IEEE-deterministic on both engines), every
computed column is aliased identically in Spark and the DuckDB oracle,
and orderings carry full tiebreakers.

Plan goals per query are stated in each docstring; `tests/test_plans.py`
pins the load-bearing shapes (broadcasts, semi/anti joins, pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbcut_spark.queries import register, t

# tpch_rf_refresh scratch-dir bookkeeping: dirs whose result frames may
# still be lazily read (see the reaping comment in tpch_rf_refresh)
import threading as _threading_mod

_RF_LOCK = _threading_mod.Lock()
_RF_LIVE: set[str] = set()
_RF_TLOCAL = _threading_mod.local()


def _rf_scratch() -> str:
    """Fresh scratch dir for a refresh-function query; reaps this
    THREAD's previous invocation's dir (its result DataFrame was
    consumed before the next call in every harness path) so best-of-N
    benching doesn't accumulate copies, without ever touching a LIVE
    target:
    - the prefix embeds the PID, so a concurrent session (e.g. a bench
      --isolate child racing a parity run) never reaps a dir it doesn't
      own; other PIDs' leftovers reap only once >1h old AND the owning
      process is dead (a legitimately long-running or idle session's
      live scratch must never be deleted from under its lazily-read
      result frame);
    - within this process, _RF_LIVE tracks dirs whose result frames may
      still be lazily read (concurrent threads), and reaping skips
      them; a thread retires its own previous dir on re-entry."""
    import glob as _glob
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    import time as _time

    # configurable root (round-10 review): the default tempdir is
    # NODE-LOCAL — fine for the single-JVM gate harness, but on a real
    # cluster executors each see their own /tmp, so a fact-sized
    # staged table must land on a SHARED filesystem; deployments set
    # SPARK_GRAFT_SCRATCH_DIR to an HDFS-mounted / shared path
    tmp_root = _os.environ.get(
        "SPARK_GRAFT_SCRATCH_DIR", _tempfile.gettempdir()
    )
    pid = _os.getpid()
    with _RF_LOCK:
        prev = getattr(_RF_TLOCAL, "scratch", None)
        if prev is not None:
            _RF_LIVE.discard(prev)
        own_prefix = f"dbcut_rf_refresh_{pid}_"

        def owner_dead(name: str) -> bool:
            # dbcut_rf_refresh_<pid>_<rand>: reap another process's dir
            # only if that pid no longer exists (kill -0 probe).
            # Unparseable names (or pid-reuse making a dead owner look
            # alive) stay on disk — leak-towards-safety.
            try:
                owner = int(name[len("dbcut_rf_refresh_"):].split("_", 1)[0])
            except ValueError:
                return False
            try:
                _os.kill(owner, 0)
                return False
            except ProcessLookupError:
                return True
            except OSError:  # e.g. EPERM: alive but not ours
                return False

        for stale in _glob.glob(f"{tmp_root}/dbcut_rf_refresh_*"):
            if stale in _RF_LIVE:
                continue
            base = _os.path.basename(stale)
            own = base.startswith(own_prefix)
            try:
                aged = _time.time() - _os.path.getmtime(stale) > 3600
            except OSError:
                aged = False
            if own or (aged and owner_dead(base)):
                _shutil.rmtree(stale, ignore_errors=True)
        # dir=tmp_root, NOT the tempfile default: without it the
        # configured SPARK_GRAFT_SCRATCH_DIR was only ever used by the
        # reap glob above while every new dir still landed in the
        # node-local tempdir — the staged table would be unreadable by
        # executors on a real cluster AND leak there forever, since
        # the reaper scans a directory nothing is created in (review
        # finding, round 11)
        scratch = _tempfile.mkdtemp(prefix=own_prefix, dir=tmp_root)
        _RF_LIVE.add(scratch)
        _RF_TLOCAL.scratch = scratch
    return scratch

# Shared money-sum fragment: exact decimal accumulation, rounded to
# cents, surfaced as DOUBLE (identical arithmetic in both engines).
_REV = "CAST(round(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS DECIMAL(25,8))), 2) AS DOUBLE)"


def _rev_col(alias: str):
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double")
    return (
        F.round(F.sum(revenue.cast("decimal(25,8)")), 2).cast("double").alias(alias)
    )


@register(
    "tpch_q4_late_orders",
    sql="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def tpch_q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape, late-shipment variant:
    EXISTS a lineitem shipped >90 days after the order date). The
    correlated EXISTS compiles to a LEFT SEMI hash join on l_orderkey
    with the date predicate as join condition — no subquery re-execution,
    one shuffle, and the quarter filter prunes orders at the scan."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q6_revenue_forecast",
    sql="""
    SELECT CAST(round(SUM(CAST(CAST(l_extendedprice * l_discount AS DOUBLE)
                       AS DECIMAL(25,8))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting-revenue-change (TPC-H Q6 shape): pure scan-filter-agg.
    All three predicates and the 4-column projection push into the
    parquet scan; the aggregate is a single partial+final with no keys
    (one row crosses the exchange per partition)."""
    li = t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * F.col("l_discount")).cast("double")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(rev.cast("decimal(25,8)")), 2).cast("double").alias("revenue"))
    )


@register(
    "tpch_q7_volume_shipping",
    sql=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           {_REV} AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY sn.n_name, cn.n_name, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations (TPC-H Q7 shape). Both nation
    nation dims broadcast; the 2-nation customer/supplier sides scale
    with SF, so their joins are left to AQE (it broadcasts them at
    gate sizes; a forced hint dies at the 8 GB cap at 100 TB —
    round-10 review). The disjunctive nation-pair predicate is
    applied after the joins so the only shuffle is
    orders⋈lineitem. Grouping is on low-cardinality keys (2×2×years)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    c = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
        .filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
        .filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    )
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_rev_col("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q10_returned_items",
    sql=f"""
    SELECT c.c_custkey, c.c_name, {_REV} AS revenue, c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): who returned the most
    revenue last quarter. Quarter + returnflag filters push to the scans;
    nation broadcasts; the full customer dim scales with SF and is
    AQE-decided (round-10 review). Top-20 is TakeOrderedAndProject.
    The quarter-filtered orders side is NOT hinted: it scales with the
    fact table (~1/8 of orders), so the orderkey join is left to
    Spark/AQE, which still broadcasts it when it measures small."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_rev_col("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q14_promo_revenue",
    sql="""
    SELECT CAST(round(
             100.0 * CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                        THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DOUBLE)
                        ELSE 0.0 END AS DECIMAL(25,8))) AS DOUBLE)
                   / CAST(SUM(CAST(CAST(l.l_extendedprice * (1 - l.l_discount) AS DOUBLE)
                        AS DECIMAL(25,8))) AS DOUBLE), 6) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-effect (TPC-H Q14 shape): % of month revenue from PROMO
    parts. The part join is AQE-decided (part scales with SF —
    round-10 review); both sums accumulate in DECIMAL then the
    ratio divides as DOUBLE (bit-identical in both engines)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(promo.cast("decimal(25,8)")).cast("double")
                / F.sum(rev.cast("decimal(25,8)")).cast("double"),
                6,
            ).cast("double").alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q15_top_supplier",
    sql=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, {_REV} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by quarterly revenue (TPC-H Q15 shape). The scalar
    max-subquery is a rank-1 window over the 100-row supplier aggregate —
    no self-join re-aggregation, no second lineitem scan; ties all
    surface (rank, not row_number), matching the SQL's = max semantics."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _rev_col("total_revenue")
    )
    w = Window.orderBy(F.col("total_revenue").desc())
    top = (
        rev.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        s.join(F.broadcast(top), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q17_small_qty_orders",
    sql="""
    WITH pavg AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)
               AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(round(SUM(CAST(CAST(l.l_extendedprice AS DOUBLE)
                       AS DECIMAL(25,8))) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pavg  ON pavg.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12'
      AND l.l_quantity < 0.5 * pavg.avg_qty
    """,
)
def tpch_q17_small_qty_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): lineitems under
    half the part's average quantity, for one brand. The correlated AVG
    is a join against the brand-pruned per-part aggregate
    (decimal-sum / count so the
    threshold is bit-identical across engines); the brand filter prunes
    part before the join so only matching parts' lineitems survive."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12").select("p_partkey")
    # the per-part average is computed ONLY for the brand's parts —
    # unfiltered it aggregates (and previously broadcast!) one row per
    # distinct l_partkey, ~|part| rows, which scales linearly with SF
    # (round-10 review); the semi join prunes ~96% before the agg
    pavg = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("ap_partkey"))
        .agg(
            (
                F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty")
        )
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(pavg, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("double").cast("decimal(25,8)")) / 7.0,
                2,
            ).cast("double").alias("avg_yearly")
        )
    )


@register(
    "tpch_q18_large_orders",
    sql="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(25,6))) > 260)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18 shape): orders whose total
    quantity exceeds 260. The HAVING subquery is ONE aggregation of
    lineitem reused as a semi-join filter (AQE-decided: the ~1% tail
    by construction); the outer re-aggregation then runs on the
    surviving ~100 orders only."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("q"))
        .filter(F.col("q") > 260)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    o = t(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi"
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(
            o.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "tpch_q19_disjunctive_pred",
    sql=f"""
    SELECT {_REV} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def tpch_q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted-revenue under a 3-branch disjunctive predicate (TPC-H
    Q19 shape). Catalyst extracts the common-across-branches implications
    (brand IN (...), size/quantity envelope bounds) and pushes them into
    both scans; the residual OR evaluates post-join inside codegen.
    The part join is AQE-decided — part scales with SF (round-10
    review)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#14") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(_rev_col("revenue"))
    )


@register(
    "tpch_q21_late_sole_supplier",
    sql="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def tpch_q21_late_sole_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape, shipdate
    variant): on finished multi-supplier orders, the supplier who alone
    shipped >60 days late. EXISTS/NOT EXISTS become one LEFT SEMI and
    one LEFT ANTI hash join against the same lineitem projection, both
    shuffling on l_orderkey — Spark co-partitions all three joins in a
    single exchange chain, no correlated re-scans."""
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    l1 = (
        # no broadcast hint: status-F orders are ~half the fact table,
        # unbounded at scale - Spark/AQE picks the strategy
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("r_orderkey"), F.col("l_suppkey").alias("r_suppkey")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("a_orderkey"),
        F.col("l_suppkey").alias("a_suppkey"),
        F.col("l_shipdate").alias("a_shipdate"),
    )
    sole_late = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("r_orderkey"))
            & (F.col("l_suppkey") != F.col("r_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("a_orderkey"))
            & (F.col("l_suppkey") != F.col("a_suppkey"))
            & (F.col("a_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_anti",
        )
    )
    return (
        sole_late.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


@register(
    "tpch_q22_idle_customers",
    sql="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)
               AS v
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c.c_nationkey AS cust_group,
           COUNT(*) AS numcust,
           CAST(round(SUM(CAST(c.c_acctbal AS DECIMAL(25,6))), 2) AS DOUBLE)
             AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.v
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c.c_nationkey
    ORDER BY cust_group
    """,
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-sales-opportunity (TPC-H Q22 shape): above-average-balance
    customers with no recent (post-1999) orders, grouped by nation. The
    global average is a 1-row broadcast cross join (decimal-sum/count,
    engine-identical); no-recent-orders is a LEFT ANTI join against the
    date-pruned orders key projection."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(25,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("v")
        )
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("v"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cust_group"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(25,6)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cust_group")
    )


# ---------------------------------------------------------------------------
# TPC-H completion: q2/q8/q9/q11/q12/q16/q20 shapes (q13 = the existing
# outer_join_custdist). partsupp does not exist in the harness schema, so
# the partsupp-derived quantities are substituted — supplier-of-part from
# DISTINCT lineitem pairs, supply cost from p_retailprice — keeping each
# query's structural essence (correlated argmax, market share, scalar
# global threshold, distinct-count with NOT IN, fraction-of-total semi
# chain) intact.
# ---------------------------------------------------------------------------


@register(
    "tpch_q2_best_supplier",
    sql="""
    WITH ps AS (SELECT DISTINCT l_partkey AS p_key, l_suppkey AS s_key
                FROM lineitem),
    eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
           FROM supplier JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'EUROPE'),
    cand AS (SELECT p.p_partkey, p.p_name, e.s_name, e.s_acctbal, e.n_name,
                    max(e.s_acctbal) OVER (PARTITION BY p.p_partkey) AS best
             FROM part p JOIN ps ON ps.p_key = p.p_partkey
             JOIN eu e ON e.s_suppkey = ps.s_key
             WHERE p.p_size = 15 AND p.p_type = 'SMALL')
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM cand WHERE s_acctbal = best
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
)
def tpch_q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best supplier per part (TPC-H Q2 shape: correlated argmax over a
    region-restricted supplier set; partsupp -> DISTINCT lineitem
    pairs, min supplycost -> max account balance). The correlated
    subquery compiles to a window max over p_partkey + equality filter
    — one pass, no re-scan per part. The filtered part list and the
    5-nation supplier dim are constant FRACTIONS of SF-linear tables,
    so their joins are AQE-decided rather than force-broadcast
    (round-10 review); the only shuffle is the DISTINCT on
    (partkey, suppkey) id pairs."""
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_key"), F.col("l_suppkey").alias("s_key")
    ).distinct()
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    ).select("p_partkey", "p_name")
    eu = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        li.join(p, F.col("p_key") == F.col("p_partkey"))
        .join(eu, F.col("s_key") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("best", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("best"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "tpch_q8_market_share",
    sql="""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      round(CAST(round(SUM(CASE WHEN n2.n_name = 'NATION_2'
                  THEN CAST(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE)
                       AS DECIMAL(25,8)) ELSE 0 END), 2) AS DOUBLE)
      / CAST(round(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE)
                  AS DECIMAL(25,8))), 2) AS DOUBLE), 6) AS mkt_share
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_year ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape, fully faithful — every
    column it needs exists): NATION_2's fraction of ASIA's ECONOMY-part
    revenue by order year. Star join: lineitem is the fact; the
    constant-size nation/region lookups broadcast, while the
    SF-linear part/supplier/customer sides stay AQE-decided (round-10
    review); one shuffle for the year aggregation. Numerator
    and denominator run in the SAME aggregate (conditional sum), so
    the fact table is scanned once."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust_region = (
        t(spark, sf_dir, "customer")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp_nation = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").select(
                    F.col("n_nationkey").alias("n2_key"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("n2_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double")
    nat_rev = F.when(
        F.col("supp_nation") == "NATION_2", rev.cast("decimal(25,8)")
    ).otherwise(F.lit(0).cast("decimal(25,8)"))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_region, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.round(F.sum(nat_rev), 2).cast("double")
                / F.round(F.sum(rev.cast("decimal(25,8)")), 2).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q9_product_profit",
    sql="""
    SELECT n_name AS supp_nation, CAST(year(o_orderdate) AS INT) AS o_year,
      CAST(round(SUM(CAST(CAST(l_extendedprice * (1 - l_discount)
                 - 0.5 * p_retailprice * l_quantity AS DOUBLE)
                 AS DECIMAL(25,8))), 2) AS DOUBLE) AS sum_profit
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY supp_nation, o_year ORDER BY supp_nation, o_year DESC
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape; ps_supplycost substituted
    by 0.5*p_retailprice) for parts named like '%bolt%', by supplier
    nation and order year. The name-filtered part dim and the
    supplier->nation dim scale with SF and stay AQE-decided (round-10
    review); orders joins shuffle on
    orderkey; profit accumulates through DECIMAL(25,8) with the exact
    same expression tree as the oracle (IEEE double arithmetic is
    order-deterministic inside the cast)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%")).select(
        "p_partkey", "p_retailprice"
    )
    sn = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("double")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "supp_nation", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(
            F.round(F.sum(profit.cast("decimal(25,8)")), 2)
            .cast("double")
            .alias("sum_profit")
        )
        .orderBy("supp_nation", F.col("o_year").desc())
    )


@register(
    "tpch_q11_important_stock",
    sql="""
    WITH val AS (
      SELECT l_partkey AS p_partkey,
             SUM(CAST(CAST(l_quantity * p_retailprice AS DOUBLE)
                 AS DECIMAL(25,8))) AS v
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN part ON l_partkey = p_partkey
      WHERE n_name = 'NATION_7' GROUP BY 1),
    tot AS (SELECT AVG(CAST(v AS DOUBLE)) AS av FROM val)
    SELECT p_partkey, CAST(round(v, 2) AS DOUBLE) AS part_value
    FROM val, tot
    WHERE CAST(v AS DOUBLE) > 2.0 * av
    ORDER BY part_value DESC, p_partkey
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock identification (TPC-H Q11 shape: per-part value
    vs a scalar global threshold; availqty*supplycost substituted by
    shipped quantity * retail price, GERMANY -> NATION_7; the original
    FRACTION-of-total cutoff is replaced by >2x the average part value
    because a fixed fraction degenerates as the part count scales — at
    sf0.1 it already returned zero rows). The global average is a
    single-row aggregate broadcast back over the per-part values — the
    scalar-subquery pattern without re-scanning. The threshold
    comparison runs in DOUBLE on both engines (decimal precision-
    widening rules differ between Spark and DuckDB; the exact-decimal
    sums feed the OUTPUT, the epsilon-insensitive comparison does not
    need them)."""
    li = t(spark, sf_dir, "lineitem")
    sn = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name") == "NATION_7")
        .select("s_suppkey")
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    val = (
        li.join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey")
        .agg(
            F.sum(
                (F.col("l_quantity") * F.col("p_retailprice"))
                .cast("double")
                .cast("decimal(25,8)")
            ).alias("v")
        )
    )
    tot = val.agg(F.avg(F.col("v").cast("double")).alias("av"))
    return (
        val.join(F.broadcast(tot))
        .filter(F.col("v").cast("double") > F.lit(2.0) * F.col("av"))
        .select(
            "p_partkey", F.round(F.col("v"), 2).cast("double").alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


@register(
    "tpch_q12_ship_priority",
    sql="""
    SELECT CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY
                THEN 'FAST' ELSE 'SLOW' END AS delay_class,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY delay_class ORDER BY delay_class
    """,
)
def tpch_q12_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-delay vs order priority (TPC-H Q12 shape; l_shipmode/
    commitdate don't exist, so the two-valued dimension is a ship-delay
    class computed from l_shipdate - o_orderdate). Two conditional
    counts in one aggregate over the orderkey join; the year filter
    prunes orders at the scan before the shuffle."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.when(
                F.col("l_shipdate")
                <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
                F.lit("FAST"),
            )
            .otherwise(F.lit("SLOW"))
            .alias("delay_class"),
            high.alias("is_high"),
        )
        .groupBy("delay_class")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(~F.col("is_high"), 1).otherwise(0))
            .cast("long")
            .alias("low_line_count"),
        )
        .orderBy("delay_class")
    )


@register(
    "tpch_q16_supplier_cnt",
    sql="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT s_key) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey AS p_key, l_suppkey AS s_key
          FROM lineitem) ps
    JOIN part ON p_partkey = p_key
    WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 19, 25, 36, 45, 49, 50)
      AND s_key NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship count (TPC-H Q16 shape: distinct
    suppliers per (brand, type, size) bucket, excluding one brand, one
    type class, and blacklisted suppliers; partsupp -> DISTINCT
    lineitem pairs, complaint suppliers -> negative account balance).
    The NOT IN compiles to a LEFT ANTI join against the blacklist
    and the part attributes join onto the id pairs — both SF-linear,
    both AQE-decided (round-10 review); one distinct-count
    aggregation."""
    ps = t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_key"), F.col("l_suppkey").alias("s_key")
    ).distinct()
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 9, 19, 25, 36, 45, 49, 50))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_key")
    )
    return (
        ps.join(p, F.col("p_key") == F.col("p_partkey"))
        .join(bad, F.col("s_key") == F.col("bad_key"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("s_key")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q20_excess_shippers",
    sql="""
    WITH sq AS (SELECT l_partkey AS p_key, l_suppkey AS s_key,
                       SUM(CAST(l_quantity AS DECIMAL(25,6))) AS qty
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                GROUP BY 1, 2),
    pt AS (SELECT p_key, SUM(qty) AS total_qty, count(*) AS n_supp
           FROM sq GROUP BY 1)
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3','NATION_8','NATION_13','NATION_18','NATION_23')
      AND s_suppkey IN (
        SELECT s_key FROM sq JOIN pt USING (p_key)
        JOIN part ON p_partkey = p_key
        WHERE p_name LIKE 'blue%' AND n_supp >= 3
          AND CAST(qty AS DOUBLE) > 0.5 * CAST(total_qty AS DOUBLE))
    ORDER BY s_name
    """,
)
def tpch_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant shippers (TPC-H Q20 shape: the semi-join chain
    suppliers <- parts <- quantity threshold; availqty > half-year
    demand substituted by 'shipped a MAJORITY of the part's 1997
    volume for a blue part with at least 3 competing shippers' — the
    competition floor keeps the predicate meaningful as supplier
    density scales; without it every sole shipper qualifies). Per-
    (part, supplier) quantities aggregate once; the per-part totals
    REUSE that aggregate (one scan); the supplier filter is a LEFT
    SEMI join on the qualifying supplier keys, and the comparison runs
    in DOUBLE on both engines (decimal widening rules differ)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    sq = li.groupBy(
        F.col("l_partkey").alias("p_key"), F.col("l_suppkey").alias("s_key")
    ).agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("qty"))
    pt = sq.groupBy("p_key").agg(
        F.sum("qty").alias("total_qty"), F.count(F.lit(1)).alias("n_supp")
    )
    blue = t(spark, sf_dir, "part").filter(F.col("p_name").like("blue%")).select(
        "p_partkey"
    )
    qualifying = (
        sq.join(pt, "p_key")
        .join(blue, F.col("p_key") == F.col("p_partkey"))
        .filter(
            (F.col("n_supp") >= 3)
            & (
                F.col("qty").cast("double")
                > F.lit(0.5) * F.col("total_qty").cast("double")
            )
        )
        .select("s_key")
    )
    nations = ["NATION_3", "NATION_8", "NATION_13", "NATION_18", "NATION_23"]
    return (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name").isin(nations))
        .join(
            qualifying, F.col("s_suppkey") == F.col("s_key"), "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# TPC-H refresh functions (RF1/RF2-shaped) over the parquet sink path
# ---------------------------------------------------------------------------


@register(
    "tpch_rf_refresh",
    sql="""
    WITH upd AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             o_totalprice + 1000 AS o_totalprice, o_orderdate,
             o_orderpriority
      FROM orders
      WHERE substr(md5('rfu:' || CAST(o_orderkey AS VARCHAR)), 1, 8)
            < '0ccccccc'),
    ins AS (
      SELECT -o_orderkey AS o_orderkey, o_custkey,
             'N' AS o_orderstatus, o_totalprice * 0.5 AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders
      WHERE substr(md5('rfi:' || CAST(o_orderkey AS VARCHAR)), 1, 8)
            < '19999999'),
    delta AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
    merged AS (
      SELECT * FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM delta d
                        WHERE d.o_orderkey = o.o_orderkey)
      UNION ALL SELECT * FROM delta),
    final AS (
      SELECT * FROM merged m
      WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE substr(md5('rfd:' || CAST(o.o_orderkey AS VARCHAR)), 1, 8)
              < '147ae147'
          AND o.o_orderkey = m.o_orderkey))
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS total_price,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM final GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def tpch_rf_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H refresh-function-shaped mutation check (RF1 insert + update,
    RF2 delete) over the REAL parquet sink path: the orders table is
    materialized to a scratch target, a deterministic hash-derived delta
    (5% updates with o_orderstatus='U' and +1000 price, 10% inserts under
    NEGATED keys with 'N' status and halved price — negation keeps the
    insert keys outside the base o_orderkey domain at ANY scale factor,
    where a fixed +1M shift would collide with base keys at sf>=~0.17) is applied via
    :func:`sinks.insert_ignore.upsert_parquet`, an 8% hash-derived key
    set is removed via :func:`delete_keys_parquet`, and the POST-REFRESH
    state is read back from disk and aggregated by status. The oracle
    recomputes the end state declaratively (merge = base anti delta keys
    union delta, minus delete keys), so the row-level mutation machinery
    — staging-swap rewrite, PK anti-joins, listing-cache refresh — is
    value-hash-verified end to end, not just pytest'd. Reference parity:
    dbcut's insert/delete round-trip surface (/root/reference/dbcut/
    serializer.py load path); the hash-derived delta replaces TPC-H's
    refresh stream files so both engines can regenerate it bit-identically.

    Scale: the delta derivation is a codegen'd filter+projection; upsert
    and delete are PK anti-joins (shuffle on the key) plus a table
    rewrite — on a partitioned 100 TB target the rewrite would be
    restricted to touched partitions (see upsert_parquet's scale note).
    Arithmetic stays exact (+1000, *0.5 are exact in IEEE double; sums
    route through DECIMAL), so the cross-engine hash is stable."""
    from dbcut_spark.operators.sampling import hash_bucket, hash_threshold
    from dbcut_spark.sinks.insert_ignore import (
        delete_keys_parquet,
        upsert_parquet,
    )

    target = _rf_scratch() + "/orders"

    base = t(spark, sf_dir, "orders")
    base.write.parquet(target)

    upd = base.filter(
        hash_bucket(F.col("o_orderkey"), "rfu:") < hash_threshold(0.05)
    ).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    ins = base.filter(
        hash_bucket(F.col("o_orderkey"), "rfi:") < hash_threshold(0.1)
    ).select(
        (-F.col("o_orderkey")).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        (F.col("o_totalprice") * 0.5).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    # counts=False: the gate certifies the post-refresh STATE (read back
    # below); the updated/inserted/deleted counts would cost three extra
    # count jobs only to be discarded (round-11 optimization)
    upsert_parquet(
        spark, upd.unionByName(ins), target, ["o_orderkey"], counts=False
    )

    dels = base.filter(
        hash_bucket(F.col("o_orderkey"), "rfd:") < hash_threshold(0.08)
    ).select("o_orderkey")
    delete_keys_parquet(spark, dels, target, ["o_orderkey"], counts=False)

    return (
        spark.read.parquet(target)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_price"),
            F.countDistinct("o_custkey").alias("n_custs"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "tpch_rf_refresh_partitioned",
    sql="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders),
    recent AS (SELECT * FROM base WHERE year(o_orderdate) >= 2000),
    upd AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             o_totalprice + 1000 AS o_totalprice, o_orderdate,
             o_orderpriority
      FROM recent
      WHERE substr(md5('rfpu:' || CAST(o_orderkey AS VARCHAR)), 1, 8)
            < '0ccccccc'),
    ins AS (
      SELECT -o_orderkey AS o_orderkey, o_custkey,
             'N' AS o_orderstatus, o_totalprice * 0.5 AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM recent
      WHERE substr(md5('rfpi:' || CAST(o_orderkey AS VARCHAR)), 1, 8)
            < '19999999'),
    delta AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
    merged AS (
      SELECT * FROM base b
      WHERE NOT EXISTS (SELECT 1 FROM delta d
                        WHERE d.o_orderkey = b.o_orderkey)
      UNION ALL SELECT * FROM delta),
    final AS (
      SELECT * FROM merged m
      WHERE NOT EXISTS (
        SELECT 1 FROM base b
        WHERE substr(md5('rfpd:' || CAST(b.o_orderkey AS VARCHAR)), 1, 8)
              < '147ae147'
          AND b.o_orderkey = m.o_orderkey))
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS total_price,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           CAST(count(DISTINCT CAST(year(o_orderdate) AS INT)) AS BIGINT)
             AS n_years
    FROM final GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def tpch_rf_refresh_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PARTITIONED twin of :func:`tpch_rf_refresh` — the same
    RF1/RF2 merge semantics, but the scratch target is hive-partitioned
    by order year, so the hash gate verifies the PARTITION-PRUNED
    upsert/delete path end-to-end (touched-partition scan predicate,
    per-partition staged swap, emptied-partition removal, listing-cache
    refresh), not just the full-rewrite path. The update/insert delta
    is restricted to years >= 2000, so the upsert genuinely prunes:
    only ~2 of the ~7 year partitions are touched (the on-disk
    untouched-files property is mtime-pinned in tests/test_sinks.py;
    this query pins the VALUES). Partitioning is physical layout only —
    the oracle recomputes the identical merge declaratively with no
    notion of partitions, which is exactly the point: same answer,
    pruned I/O.

    Scale: identical plan shapes to tpch_rf_refresh plus partition
    pruning — at 100 TB a year-partitioned orders table upserting one
    year rewrites ~1/years of the table and scans existing rows only
    under the touched-partition predicate."""
    from dbcut_spark.operators.sampling import hash_bucket, hash_threshold
    from dbcut_spark.sinks.insert_ignore import (
        delete_keys_parquet,
        upsert_parquet,
    )

    target = _rf_scratch() + "/orders_part"

    base = t(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    # co-locate each year before partitionBy — but SALTED to cluster
    # width: a bare repartition("o_year") hashes onto ~7 distinct year
    # values, so ~7 tasks each write one year's ENTIRE data (a
    # multi-TB straggler per task at 100 TB; round-10 review). The
    # salt bounds files-per-year at ceil(parallelism/years) while
    # keeping every file single-year (partitionBy still routes rows);
    # same trade as dedup._bands_for_write
    par = max(1, spark.sparkContext.defaultParallelism)
    salt = F.pmod(F.xxhash64("o_orderkey"), F.lit(max(1, par // 7)))
    base.repartition(par, F.col("o_year"), salt).write.partitionBy(
        "o_year"
    ).parquet(target)

    recent = base.filter(F.col("o_year") >= 2000)
    upd = recent.filter(
        hash_bucket(F.col("o_orderkey"), "rfpu:") < hash_threshold(0.05)
    ).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
        "o_year",
    )
    ins = recent.filter(
        hash_bucket(F.col("o_orderkey"), "rfpi:") < hash_threshold(0.1)
    ).select(
        (-F.col("o_orderkey")).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        (F.col("o_totalprice") * 0.5).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
        "o_year",
    )
    # counts=False: same discarded-counts trim as tpch_rf_refresh
    upsert_parquet(
        spark, upd.unionByName(ins), target, ["o_orderkey"], counts=False
    )

    dels = base.filter(
        hash_bucket(F.col("o_orderkey"), "rfpd:") < hash_threshold(0.08)
    ).select("o_orderkey")
    delete_keys_parquet(spark, dels, target, ["o_orderkey"], counts=False)

    return (
        spark.read.parquet(target)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_price"),
            F.countDistinct("o_custkey").alias("n_custs"),
            F.countDistinct("o_year").alias("n_years"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "orders_manifest_snapshot",
    sql="""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS total_price,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM orders
    GROUP BY 1 ORDER BY o_year
    """,
)
def orders_manifest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-commit publish/resolve end-to-end (round-9 verdict ask
    #4, sinks/manifest.py): orders lands in a manifest table as an
    overwrite snapshot (years < 2000, hive-partitioned) plus an append
    commit (years >= 2000), and the reader resolves the newest
    manifest — files from BOTH commit directories, partition columns
    reconstructed, nothing doubled, nothing dropped. The oracle is the
    plain per-year aggregate over the source table, so the hash pins
    that snapshot resolution reproduces the table exactly; the
    crash/race/torn-manifest matrix is pinned in tests/test_sinks.py.

    Scale: the commit point is one object creation regardless of table
    size — the property directory renames cannot give on S3-class
    stores — and a reader's file set is immutable once resolved."""
    from dbcut_spark.sinks.manifest import publish_snapshot, read_snapshot

    target = _rf_scratch() + "/orders_manifest"
    base = t(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    publish_snapshot(
        base.filter(F.col("o_year") < 2000), target,
        mode="overwrite", partition_by=["o_year"],
    )
    publish_snapshot(
        base.filter(F.col("o_year") >= 2000), target,
        mode="append", partition_by=["o_year"],
    )
    return (
        read_snapshot(spark, target)
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_price"),
            F.countDistinct("o_custkey").alias("n_custs"),
        )
        .orderBy("o_year")
    )


@register(
    "orders_manifest_skipping",
    sql="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1 ORDER BY o_orderstatus
    """,
)
def orders_manifest_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest footer-stats file skipping (round 11): orders lands in
    THREE append commits time-sliced on o_orderdate, each publishing
    per-file min/max stats (``stats_cols``), and the reader's
    ``where=o_orderdate >= 1997`` must (a) PROVABLY skip the pre-1997
    commits' files — the query raises if ``prune_report`` shows zero
    skips, so the gate certifies pruning happened, not just that the
    filter worked — and (b) return exactly the predicate's rows (the
    DuckDB hash pins that skipping never changes semantics).

    Scale: manifests list explicit files, which bypasses the parquet
    reader's directory-level pruning across commits — at 100 TB of
    time-ordered ingest, footer-stats skipping is what keeps a
    time-windowed read O(window), the same data-skipping contract as
    Iceberg/Delta. Stats collection reads footers only and fans out as
    a Spark job past 64 staged files (sinks/manifest.py:_collect_stats)."""
    import datetime

    from dbcut_spark.sinks.manifest import (
        prune_report,
        publish_snapshot,
        read_snapshot,
    )

    target = _rf_scratch() + "/orders_skip"
    base = t(spark, sf_dir, "orders")
    stats = ["o_orderdate", "o_totalprice"]
    slices = [
        base.filter(F.year("o_orderdate") < 1995),
        base.filter(
            (F.year("o_orderdate") >= 1995) & (F.year("o_orderdate") < 1997)
        ),
        base.filter(F.year("o_orderdate") >= 1997),
    ]
    publish_snapshot(slices[0], target, mode="overwrite", stats_cols=stats)
    for sl in slices[1:]:
        publish_snapshot(sl, target, mode="append", stats_cols=stats)
    where = [("o_orderdate", ">=", datetime.datetime(1997, 1, 1))]
    rep = prune_report(target, where)
    if not rep["skipped_files"] or rep["stats_files"] != rep["total_files"]:
        raise RuntimeError(
            f"footer-stats skipping did not engage: {rep} — the gate "
            "exists to certify pruning, not just filtering"
        )
    return (
        read_snapshot(spark, target, where=where)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "orders_manifest_time_travel",
    sql="""
    SELECT 1 AS at_version,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS total_price
    FROM orders WHERE year(o_orderdate) < 1996
    UNION ALL
    SELECT 2 AS at_version,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS total_price
    FROM orders
    ORDER BY at_version
    """,
)
def orders_manifest_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel (round 11): after an append supersedes the
    head, ``read_snapshot(version=1)`` must still see EXACTLY the first
    commit's rows while the head sees everything — both pinned in one
    cross-engine hash (version 1 == the pre-1996 slice, version 2 ==
    the whole table). This is the reader-isolation half of the manifest
    contract: a resolved version's file set is immutable under later
    publishes, so a long-running 100 TB job joins against ONE
    consistent snapshot no matter how many commits land mid-flight."""
    from dbcut_spark.sinks.manifest import publish_snapshot, read_snapshot

    target = _rf_scratch() + "/orders_tt"
    base = t(spark, sf_dir, "orders")
    publish_snapshot(
        base.filter(F.year("o_orderdate") < 1996), target, mode="overwrite"
    )
    publish_snapshot(
        base.filter(F.year("o_orderdate") >= 1996), target, mode="append"
    )

    def agg_at(version: int) -> DataFrame:
        return (
            read_snapshot(spark, target, version=version)
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
                .cast("double")
                .alias("total_price"),
            )
            .select(F.lit(version).alias("at_version"), "n_orders", "total_price")
        )

    return agg_at(1).unionByName(agg_at(2)).orderBy("at_version")


@register(
    "orders_rollup_incremental",
    sql="""
    SELECT o_orderstatus,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS total_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY 1, 2 ORDER BY o_orderstatus, o_year
    """,
)
def orders_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained materialized rollup
    (operators/matview.py, round 11): orders lands in three append
    commits with a refresh after each; the second and third refresh
    MUST take the incremental path (the query raises otherwise — the
    gate certifies delta maintenance, not recompute), reading ONLY the
    files that commit added (the manifest diff is the change capture).
    The DuckDB hash pins the end state == a flat GROUP BY over the
    whole table, i.e. merging per-delta partials (sum/count/min/max)
    is bit-identical to recomputing.

    Scale: each refresh is O(view + delta) — at 100 TB of append-only
    facts the rollup stays fresh for the cost of aggregating the new
    files, never a full rescan; a non-append commit in the window is
    detected from manifest history alone and falls back to a full
    recompute (silently-correct, never silently-stale)."""
    from dbcut_spark.operators.matview import refresh_rollup
    from dbcut_spark.sinks.manifest import publish_snapshot, read_snapshot

    scratch = _rf_scratch()
    base_path, view_path = scratch + "/rollup_base", scratch + "/rollup_view"
    base = t(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    keys = ["o_orderstatus", "o_year"]
    measures = {
        "n_orders": ("count", None),
        "total_price": ("sum", "o_totalprice"),
        "min_price": ("min", "o_totalprice"),
        "max_price": ("max", "o_totalprice"),
    }
    slices = [
        base.filter(F.col("o_year") < 1997),
        base.filter((F.col("o_year") >= 1997) & (F.col("o_year") < 1999)),
        base.filter(F.col("o_year") >= 1999),
    ]
    publish_snapshot(slices[0], base_path, mode="overwrite")
    modes = [refresh_rollup(spark, base_path, view_path, keys, measures)["mode"]]
    for sl in slices[1:]:
        publish_snapshot(sl, base_path, mode="append")
        modes.append(
            refresh_rollup(spark, base_path, view_path, keys, measures)["mode"]
        )
    if modes != ["full", "incremental", "incremental"]:
        raise RuntimeError(
            f"rollup refresh modes {modes} != ['full', 'incremental', "
            "'incremental'] — the gate certifies delta maintenance"
        )
    return (
        read_snapshot(spark, view_path)
        .select(
            "o_orderstatus",
            "o_year",
            "n_orders",
            F.col("total_price").cast("double").alias("total_price"),
            "min_price",
            "max_price",
        )
        .orderBy("o_orderstatus", "o_year")
    )


@register(
    "orders_manifest_changes",
    sql="""
    SELECT o_orderkey FROM orders
    WHERE year(o_orderdate) >= 1995 ORDER BY o_orderkey
    """,
)
def orders_manifest_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed read over manifest history (round 11,
    sinks/manifest.read_changes): orders lands in three append commits
    time-sliced on o_orderdate, and a consumer that saw version 1 pulls
    ``read_changes(since_version=1)`` — exactly the rows commits 2 and
    3 added, no log, no timestamp column; the manifest file diff IS the
    change capture. The oracle is the flat key list of the >=1995
    slice, so the hash pins the delta at ROW granularity (a doubled or
    dropped file breaks it). A same-version read must be empty
    (asserted in-gate); the non-append refusal and vacuum-expiry
    matrix is in tests/test_manifest_sink.py.

    Scale: each downstream consumer (replication, index build, rollup)
    advances by reading ONLY the files its window added — O(delta) per
    pull on a 100 TB append table."""
    from dbcut_spark.sinks.manifest import publish_snapshot, read_changes

    target = _rf_scratch() + "/orders_changes"
    base = t(spark, sf_dir, "orders")
    year = F.year("o_orderdate")
    publish_snapshot(base.filter(year < 1995), target, mode="overwrite")
    publish_snapshot(
        base.filter((year >= 1995) & (year < 1997)), target, mode="append"
    )
    publish_snapshot(base.filter(year >= 1997), target, mode="append")
    if read_changes(spark, target, 3).count() != 0:
        raise RuntimeError("changes since the head must be empty")
    return (
        read_changes(spark, target, since_version=1)
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


@register(
    "orders_sync_incremental",
    sql="SELECT o_orderkey FROM orders ORDER BY o_orderkey",
)
def orders_sync_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cursor sync (operators/sync.py, round 11): a
    'growing' orders source is pulled into a manifest table in three
    sync runs — bootstrap, then two deltas bounded by the committed
    high-water mark on o_orderdate, each run ONE atomic commit carrying
    both the rows and the advanced cursor. ``pk`` mode re-reads the
    boundary slice (``>= mark`` + anti-join of the target's rows AT the
    mark, a footer-stats-pruned read) so rows sharing the boundary
    date land exactly once — the oracle is the flat key list of the
    whole table, so the hash pins exactly-once at ROW granularity: a
    doubled or dropped boundary row breaks it. A fourth run must be a
    noop (the gate raises otherwise).

    Scale: each run moves O(delta) — the bound compiles into the
    source scan (PushedFilters here; server-side WHERE via
    jdbc_incremental_sync for live databases), and the cursor rides
    the target's own manifest properties, so there is no window where
    rows landed without the mark or the mark without the rows.

    Reference parity: the recurring re-extraction dbcut serves by full
    reload on cache miss (dbcut/query.py:108-131), upgraded to
    O(delta) with an atomic high-water-mark commit."""
    from dbcut_spark.operators.sync import incremental_sync

    target = _rf_scratch() + "/orders_sync"
    base = t(spark, sf_dir, "orders")
    year = F.year("o_orderdate")
    states = [
        base.filter(year < 1996),
        base.filter(year < 1998),
        base,
        base,  # no growth: must be a noop
    ]
    expect = ["bootstrap", "append", "append", "noop"]
    for state, want in zip(states, expect):
        got = incremental_sync(
            spark,
            lambda low, s=state: s,  # sync re-filters by the mark
            target,
            "o_orderdate",
            pk=["o_orderkey"],
            stats_cols=["o_orderdate"],
        )["mode"]
        if got != want:
            raise RuntimeError(
                f"sync mode {got!r} != {want!r} — the gate certifies "
                "the bootstrap/delta/noop protocol, not just the rows"
            )
    from dbcut_spark.sinks.manifest import read_snapshot

    return read_snapshot(spark, target).select("o_orderkey").orderBy(
        "o_orderkey"
    )


@register(
    "orders_bucket_lookup",
    sql="""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_custkey IN (7, 400, 911)
    GROUP BY 1 ORDER BY o_custkey
    """,
)
def orders_bucket_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest hash-bucket equality pruning (round 11,
    sinks/manifest.py bucket_by): orders lands in two append commits
    hash-bucketed on o_custkey, and a 3-key 'in' probe must (a)
    PROVABLY open at most |keys| buckets of each commit — the query
    raises if prune_report shows no skips — and (b) return exactly the
    predicate's rows (the DuckDB hash pins that bucket routing never
    loses or duplicates a key's rows; the probe's bucket ids come from
    Spark's own hash, so a skip cannot lose rows by construction).

    Scale: uniform keys (ids, hashes) defeat min/max skipping — every
    file's range spans the domain — so bucket routing is what turns a
    100 TB key lookup from a full scan into 1/n of each commit's
    files, the Iceberg bucket-transform contract."""
    from dbcut_spark.sinks.manifest import (
        prune_report,
        publish_snapshot,
        read_snapshot,
    )

    target = _rf_scratch() + "/orders_bucket"
    base = t(spark, sf_dir, "orders")
    n = 16
    publish_snapshot(
        base.filter(F.col("o_orderkey") % 2 == 0), target,
        mode="overwrite", bucket_by=("o_custkey", n),
    )
    publish_snapshot(
        base.filter(F.col("o_orderkey") % 2 == 1), target,
        mode="append", bucket_by=("o_custkey", n),
    )
    where = [("o_custkey", "in", [7, 400, 911])]
    rep = prune_report(target, where, spark=spark)
    if not rep["bucketed"] or not rep["skipped_files"]:
        raise RuntimeError(
            f"bucket pruning did not engage: {rep} — the gate exists "
            "to certify bucket routing, not just filtering"
        )
    return (
        read_snapshot(spark, target, where=where)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_custkey")
    )


@register(
    "orders_manifest_mor_delete",
    sql="""
    WITH del AS (
      SELECT o_orderkey FROM orders
      WHERE substr(md5('mord:' || CAST(o_orderkey AS VARCHAR)), 1, 8)
            < '26666666'
    ), final AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del)
      UNION ALL
      SELECT o_orderkey, o_custkey, 'R' AS o_orderstatus, o_totalprice
      FROM orders
      WHERE o_orderkey IN (SELECT o_orderkey FROM del)
        AND year(o_orderdate) >= 1997
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS total_price,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM final GROUP BY 1 ORDER BY o_orderstatus
    """,
)
def orders_manifest_mor_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read equality deletes (round 11, sinks/manifest.py:
    delete_keys_snapshot): orders lands as two commits, a ~15% key
    sample is DELETED as one tombstone commit — the gate RAISES unless
    the delete inherited every data file verbatim (an O(keys) commit,
    never a rewrite) — and then the deleted keys' post-1997 rows are
    RE-INSERTED with a new status. The cross-engine hash pins the
    Iceberg sequence rule end-to-end: tombstones kill only rows whose
    file predates them, so the re-inserts survive while every other
    deleted row stays gone.

    Scale: a key purge over 100 TB costs one tiny parquet write + one
    manifest create; readers pay one broadcast anti join until
    compact_snapshot folds the debt in. The reference's row deletes
    are SQLAlchemy DELETEs against a live database — mutation in
    place, no snapshot isolation (dbcut/database.py)."""
    from dbcut_spark.operators.sampling import hash_bucket, hash_threshold
    from dbcut_spark.sinks import manifest as mf

    target = _rf_scratch() + "/orders_mor_del"
    base = t(spark, sf_dir, "orders")
    mf.publish_snapshot(
        base.filter(F.year("o_orderdate") < 1996), target, mode="overwrite"
    )
    mf.publish_snapshot(
        base.filter(F.year("o_orderdate") >= 1996), target, mode="append"
    )
    doomed = hash_bucket(F.col("o_orderkey"), "mord:") < hash_threshold(0.15)
    pre = mf._load_manifest(target, mf.current_version(target))
    dv = mf.delete_keys_snapshot(
        spark, base.filter(doomed).select("o_orderkey"), target
    )
    dm = mf._load_manifest(target, dv)
    if dm["files"] != pre["files"] or dm["mode"] != "delete":
        raise RuntimeError(
            "merge-on-read delete rewrote data files — the gate exists "
            "to certify an O(keys) commit, not a table rewrite"
        )
    mf.publish_snapshot(
        base.filter(doomed & (F.year("o_orderdate") >= 1997)).withColumn(
            "o_orderstatus", F.lit("R")
        ),
        target,
        mode="append",
    )
    return (
        mf.read_snapshot(spark, target)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_price"),
            F.countDistinct("o_custkey").alias("n_custs"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "orders_manifest_merge",
    sql="""
    WITH b AS (
      SELECT o.*,
             substr(md5('morm:' || CAST(o_orderkey AS VARCHAR)), 1, 8) AS h
      FROM orders o
    ), final AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM b
      WHERE (h >= '0ccccccc' AND h < '19999999') OR h >= '28f5c28f'
      UNION ALL
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             o_totalprice + 1000 AS o_totalprice
      FROM b WHERE h < '0ccccccc'
      UNION ALL
      SELECT -o_orderkey AS o_orderkey, o_custkey,
             'N' AS o_orderstatus,
             o_totalprice * 0.5 AS o_totalprice
      FROM b WHERE h >= '0ccccccc' AND h < '19999999'
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS total_price,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM final GROUP BY 1 ORDER BY o_orderstatus
    """,
)
def orders_manifest_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read MERGE (round 11, sinks/manifest.py:
    merge_snapshot): one commit applies a CDC delta — ~5% updates
    (status 'U', price+1000), ~5% inserts (negated keys, status 'N'),
    ~6% deletes (op='D') on disjoint deterministic hash ranges —
    staging only the delta's rows plus one equality-delete tombstone.
    The gate RAISES unless every parent data file was inherited
    verbatim: the commit must be O(delta), the property the
    copy-on-write upsert_snapshot (full rewrite) cannot give. The
    DuckDB hash pins the merged final state cross-engine.

    Scale: this is the CDC-ingest write path at 100 TB — per-batch
    cost O(batch); readers pay one broadcast anti join until
    compact_snapshot materializes. Same MERGE semantics as the JDBC
    MERGE twins and upsert_parquet, re-expressed as an immutable
    snapshot commit."""
    from dbcut_spark.operators.sampling import hash_bucket, hash_threshold
    from dbcut_spark.sinks import manifest as mf

    target = _rf_scratch() + "/orders_mor_merge"
    base = t(spark, sf_dir, "orders")
    mf.publish_snapshot(base, target, mode="overwrite")
    h = hash_bucket(F.col("o_orderkey"), "morm:")
    t_upd, t_ins, t_del = (
        hash_threshold(0.05), hash_threshold(0.10), hash_threshold(0.16),
    )
    upd = base.filter(h < t_upd).select(
        "o_orderkey", "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
        "o_orderdate", "o_orderpriority", F.lit("U").alias("op"),
    )
    ins = base.filter((h >= t_upd) & (h < t_ins)).select(
        (-F.col("o_orderkey")).alias("o_orderkey"), "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        (F.col("o_totalprice") * 0.5).alias("o_totalprice"),
        "o_orderdate", "o_orderpriority", F.lit("U").alias("op"),
    )
    dels = base.filter((h >= t_ins) & (h < t_del)).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority", F.lit("D").alias("op"),
    )
    pre = mf._load_manifest(target, mf.current_version(target))
    v = mf.merge_snapshot(
        spark, upd.unionByName(ins).unionByName(dels), target,
        ["o_orderkey"], op_col="op",
    )
    m = mf._load_manifest(target, v)
    if not set(pre["files"]) <= set(m["files"]) or m["mode"] != "merge":
        raise RuntimeError(
            "merge-on-read MERGE rewrote parent data files — the gate "
            "exists to certify an O(delta) commit, not a table rewrite"
        )
    return (
        mf.read_snapshot(spark, target)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_price"),
            F.countDistinct("o_custkey").alias("n_custs"),
        )
        .orderBy("o_orderstatus")
    )


from dbcut_spark.operators.profile import profile_oracle_sql as _prof_sql

_PROFILE_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
]
_PROFILE_TYPES = {
    "o_orderkey": "direct", "o_custkey": "direct",
    "o_orderstatus": "string", "o_totalprice": "decimal",
    "o_orderdate": "direct", "o_orderpriority": "string",
}


@register(
    "orders_profile",
    sql=_prof_sql("orders", _PROFILE_COLS, _PROFILE_TYPES),
)
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profiler (round 11, operators/profile.py): every
    orders column profiles to (rows, nulls, exact distinct, rendered
    min/max, avg string length) in ONE aggregate — a single scan whose
    partials are one row per task — then unpivots via ``stack`` with
    no collect. The DuckDB oracle is a per-column UNION ALL generated
    from the SAME column/type spec, so the hash pins the whole
    rendering contract (fractional numerics bridge min/max through
    DECIMAL(38,6); ints/strings/timestamps cast directly).

    Scale: the gate uses exact_distinct (COUNT DISTINCT plans an
    EXPAND — acceptable here, certifiable against SQL); the production
    default is approx_count_distinct (HLL++ mergeable partials, no
    expand), the same stats trade Iceberg/Delta make. Reference
    parity: widens the reference's per-table counts
    (dbcut/cli.py inspect) to the per-column profile."""
    from dbcut_spark.operators.profile import table_profile

    return table_profile(
        t(spark, sf_dir, "orders"),
        columns=_PROFILE_COLS,
        exact_distinct=True,
    )


@register(
    "part_cooccur_triangles",
    sql="""
    WITH pairs AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                   FROM lineitem),
    keep AS (SELECT g FROM pairs GROUP BY g HAVING count(*) <= 1000),
    p2 AS (SELECT p.* FROM pairs p JOIN keep k ON p.g = k.g),
    edges AS (
      SELECT p.i AS a, q.i AS b, count(*) AS w
      FROM p2 p JOIN p2 q ON p.g = q.g AND p.i < q.i
      GROUP BY 1, 2
    ),
    deg AS (SELECT n, count(*) AS d FROM (
              SELECT a AS n FROM edges
              UNION ALL SELECT b AS n FROM edges) GROUP BY 1),
    j AS (SELECT e.a, e.b, da.d AS da, db.d AS db,
                 (da.d < db.d OR (da.d = db.d AND e.a < e.b)) AS fwd
          FROM edges e JOIN deg da ON da.n = e.a
                       JOIN deg db ON db.n = e.b),
    ori AS (SELECT CASE WHEN fwd THEN a ELSE b END AS src,
                   CASE WHEN fwd THEN b ELSE a END AS dst,
                   CASE WHEN fwd THEN db ELSE da END AS ddst FROM j),
    wedges AS (
      SELECT e1.src, e1.dst AS x, e2.dst AS y
      FROM ori e1 JOIN ori e2 ON e1.src = e2.src
      WHERE e1.ddst < e2.ddst
         OR (e1.ddst = e2.ddst AND e1.dst < e2.dst)
    ),
    tri AS (SELECT w.src AS v1, w.x AS v2, w.y AS v3
            FROM wedges w JOIN ori c ON c.src = w.x AND c.dst = w.y),
    tri3 AS (SELECT v1 AS node FROM tri
             UNION ALL SELECT v2 FROM tri
             UNION ALL SELECT v3 FROM tri)
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM tri3 GROUP BY node
    ORDER BY n_triangles DESC, node LIMIT 20
    """,
)
def part_cooccur_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-ordered triangle counting (round 11,
    operators/graph_algo.py) over the part co-occurrence graph (parts
    sharing an order are an edge): top-20 parts by triangle
    participation. The DuckDB oracle walks the SAME degree-orientation
    construction, so the hash pins edge building (distinct pairs, hub
    guard), orientation tie-breaking, wedge pairing, AND the closing
    equi-join — all integer math, bit-exact cross-engine.

    Scale: orientation bounds every out-degree by O(sqrt(2m)), so the
    wedge self-join is O(m^1.5) total with no hub straggler — the
    standard distributed triangle recipe; the co-occurrence builder
    hard-caps group width before pairs can explode quadratically. No
    cartesian anywhere (equi-joins only)."""
    from dbcut_spark.operators.graph_algo import (
        cooccurrence_edges,
        triangle_counts,
    )

    edges = cooccurrence_edges(
        t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey"
    )
    return (
        triangle_counts(edges)
        .orderBy(F.desc("n_triangles"), F.asc("node"))
        .limit(20)
    )


from dbcut_spark.operators.graph_algo import pagerank_oracle_sql as _pr_sql

_NATION_EDGES_SQL = (
    "SELECT s.s_nationkey AS src, c.c_nationkey AS dst, "
    "count(*) AS w "
    "FROM lineitem l "
    "JOIN orders o ON o.o_orderkey = l.l_orderkey "
    "JOIN customer c ON c.c_custkey = o.o_custkey "
    "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
    "GROUP BY 1, 2"
)
_NATION_VERTS_SQL = "SELECT n_nationkey AS node FROM nation"


@register(
    "nation_trade_pagerank",
    sql=_pr_sql(_NATION_EDGES_SQL, _NATION_VERTS_SQL, n=25, n_iter=5)
    + "\n    ORDER BY pr DESC, node",
)
def nation_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (round 11, operators/graph_algo.py) on the
    nation trade graph: supplier nation -> customer nation edges
    weighted by lineitem count, 5 power iterations, damping 0.85. The
    DuckDB oracle runs the IDENTICAL unrolled recurrence — generated
    from the same spec by pagerank_oracle_sql — with each contribution
    rounded to 12 dp and summed as exact DECIMAL(38,14), so the float
    iteration is order-independent and the hash pins all five rounds.

    Scale: each iteration is one ranks-by-edges equi-join plus one
    aggregation — the textbook PageRank shuffle shape; the edge-ratio
    frame computes once and is reused every round. Dangling mass not
    redistributed (documented variant, identical on both engines)."""
    from dbcut_spark.operators.graph_algo import pagerank

    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    verts = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node")
    )
    return pagerank(edges, verts, n_iter=5).orderBy(
        F.desc("pr"), F.asc("node")
    )


@register(
    "orders_expectations",
    sql="""
    SELECT 'not_null(o_custkey)' AS rule, 'not_null' AS kind,
           CAST(count(*) AS BIGINT) AS checked,
           CAST(coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1
                                  ELSE 0 END), 0) AS BIGINT)
             AS violations,
           coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1
                             ELSE 0 END), 0) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'unique(o_orderkey)', 'unique',
           CAST(count(o_orderkey) AS BIGINT),
           CAST(count(o_orderkey) - count(DISTINCT o_orderkey)
                AS BIGINT),
           count(o_orderkey) = count(DISTINCT o_orderkey)
    FROM orders
    UNION ALL
    SELECT 'unique(o_custkey)', 'unique',
           CAST(count(o_custkey) AS BIGINT),
           CAST(count(o_custkey) - count(DISTINCT o_custkey) AS BIGINT),
           count(o_custkey) = count(DISTINCT o_custkey)
    FROM orders
    UNION ALL
    SELECT 'in_range(o_totalprice)', 'in_range',
           CAST(count(o_totalprice) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN o_totalprice < 1000.0
                                    OR o_totalprice > 300000.0
                                  THEN 1 ELSE 0 END), 0) AS BIGINT),
           coalesce(sum(CASE WHEN o_totalprice < 1000.0
                               OR o_totalprice > 300000.0
                             THEN 1 ELSE 0 END), 0) = 0
    FROM orders
    UNION ALL
    SELECT 'accepted_values(o_orderstatus)', 'accepted_values',
           CAST(count(o_orderstatus) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN o_orderstatus NOT IN
                                       ('O', 'F', 'P')
                                  THEN 1 ELSE 0 END), 0) AS BIGINT),
           coalesce(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                             THEN 1 ELSE 0 END), 0) = 0
    FROM orders
    UNION ALL
    SELECT 'accepted_values(o_orderpriority)', 'accepted_values',
           CAST(count(o_orderpriority) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN o_orderpriority NOT IN
                                       ('1-URGENT', '2-HIGH')
                                  THEN 1 ELSE 0 END), 0) AS BIGINT),
           coalesce(sum(CASE WHEN o_orderpriority NOT IN
                                  ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END), 0) = 0
    FROM orders
    UNION ALL
    SELECT 'matches(o_orderpriority)', 'matches',
           CAST(count(o_orderpriority) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN NOT regexp_matches(
                                       o_orderpriority, '^[0-9]-')
                                  THEN 1 ELSE 0 END), 0) AS BIGINT),
           coalesce(sum(CASE WHEN NOT regexp_matches(o_orderpriority,
                                                     '^[0-9]-')
                             THEN 1 ELSE 0 END), 0) = 0
    FROM orders
    UNION ALL
    SELECT 'foreign_key(o_custkey -> customer.c_custkey)',
           'foreign_key',
           CAST((SELECT count(*) FROM orders
                 WHERE o_custkey IS NOT NULL) AS BIGINT),
           CAST((SELECT count(*) FROM orders o
                 WHERE o.o_custkey IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT),
           (SELECT count(*) FROM orders o
            WHERE o.o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) = 0
    ORDER BY rule
    """,
)
def orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (round 11,
    operators/expect.py): eight rules over orders — not-null,
    uniqueness (one passing, one deliberately failing on o_custkey),
    range and accepted-value checks (one failing on priority), a
    regex rule, and referential integrity against customer. Every
    scalar + uniqueness rule folds into ONE aggregate pass (rule count
    does not multiply scans); the foreign key is one anti-join count.
    The DuckDB oracle recomputes each rule independently, so the hash
    pins checked/violations/passed per rule — including the failing
    ones, which is the half a validation gate usually leaves untested.

    Scale: the deequ-style pre-flight a pipeline runs before trusting
    a 100 TB source; map-side partial counters, one shuffle."""
    from dbcut_spark.operators.expect import check_constraints

    orders = t(spark, sf_dir, "orders")
    return check_constraints(
        orders,
        [
            {"rule": "not_null", "col": "o_custkey"},
            {"rule": "unique", "cols": ["o_orderkey"]},
            {"rule": "unique", "cols": ["o_custkey"]},
            {"rule": "in_range", "col": "o_totalprice",
             "lo": 1000.0, "hi": 300000.0},
            {"rule": "accepted_values", "col": "o_orderstatus",
             "values": ["O", "F", "P"]},
            {"rule": "accepted_values", "col": "o_orderpriority",
             "values": ["1-URGENT", "2-HIGH"]},
            {"rule": "matches", "col": "o_orderpriority",
             "pattern": "^[0-9]-"},
            {"rule": "foreign_key", "cols": ["o_custkey"],
             "ref": "customer", "ref_cols": ["c_custkey"]},
        ],
        refs={"customer": t(spark, sf_dir, "customer")},
    )


@register(
    "orders_price_histogram",
    sql="""
    WITH v AS (SELECT o_totalprice AS x FROM orders
               WHERE o_totalprice IS NOT NULL),
    mm AS (SELECT CAST(min(x) AS DOUBLE) AS lo,
                  CAST(max(x) AS DOUBLE) AS hi FROM v)
    SELECT CASE WHEN hi - lo = 0 THEN 0
                ELSE LEAST(CAST(floor((CAST(x AS DOUBLE) - lo) * 16
                                      / (hi - lo)) AS INT), 15)
           END AS bin,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE) AS total
    FROM v, mm
    WHERE x >= lo AND x <= hi
    GROUP BY 1 ORDER BY bin
    """,
)
def orders_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (round 11, operators/profile.py:
    column_histogram): 16 bins over o_totalprice with exact min/max
    bounds joined back by BROADCAST (1-row scalar grid — no driver
    collect, the plan stays lazy). The oracle repeats the bin
    expression with identical parenthesization, so the hash pins the
    IEEE arithmetic of the bin function itself, the top-bound clamp
    (x == max lands in the last bin), and the DECIMAL-bridged per-bin
    sums.

    Scale: two scans (bounds + binning) with map-side partials; pass
    known domain bounds to pay one."""
    from dbcut_spark.operators.profile import column_histogram

    return column_histogram(
        t(spark, sf_dir, "orders"), "o_totalprice", bins=16
    )


from dbcut_spark.operators.profile import corr_oracle_sql as _corr_sql

_CORR_COLS = ["o_custkey", "o_orderkey", "o_totalprice"]


@register(
    "orders_corr_matrix",
    sql=_corr_sql("orders", _CORR_COLS),
)
def orders_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix (round 11,
    operators/profile.py:corr_matrix): all three column pairs in ONE
    aggregate pass (6 decimal-bridged moments per pair, partial-
    aggregated map-side). The DuckDB oracle is GENERATED from the same
    column spec (corr_oracle_sql) and computes the identical
    round(10)->DECIMAL(38,10) moments and identical final arithmetic,
    so the hash pins the whole numeric pipeline — sums, co-moments,
    sqrt/divide, round(6).

    Scale: exact mode is the certification harness; production at
    100 TB flips exact=False for the built-in single-pass co-moment
    `corr` (no rounding, no decimal) — same plan shape."""
    from dbcut_spark.operators.profile import corr_matrix

    return corr_matrix(
        t(spark, sf_dir, "orders"), _CORR_COLS, exact=True
    )


@register(
    "orders_manifest_cdf",
    sql="""
    WITH b AS (
      SELECT o.*,
             substr(md5('cdf:' || CAST(o_orderkey AS VARCHAR)), 1, 8) AS h
      FROM orders o
    ), feed AS (
      SELECT CAST(2 AS BIGINT) AS _commit_version,
             'insert' AS _change_type, o_custkey, o_totalprice
      FROM b WHERE year(o_orderdate) >= 1996
      UNION ALL
      SELECT 3, 'delete', o_custkey, o_totalprice
      FROM b WHERE h < '19999999'
      UNION ALL
      SELECT 4, 'insert', o_custkey, o_totalprice + 1000
      FROM b WHERE h < '23d70a3d'
      UNION ALL
      SELECT 4, 'delete', o_custkey, o_totalprice
      FROM b WHERE h >= '19999999' AND h < '33333333'
    )
    SELECT _commit_version, _change_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS total_price,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM feed GROUP BY 1, 2 ORDER BY _commit_version, _change_type
    """,
)
def orders_manifest_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed change-data feed over a merge-on-read window (round 11,
    sinks/manifest.py:read_change_feed): the window holds an append
    (v2), an equality-delete commit (v3, ~10% of keys), and a MERGE
    (v4: ~14% updates + ~6% op-deletes, with the update range
    deliberately OVERLAPPING the v3-deleted keys). The feed must emit
    v2's rows as inserts, v3's tombstoned PRE-IMAGES as deletes, and
    v4 as the standard delete-pre-image + insert pair for updates plus
    delete-only rows for op='D' — and a v3-deleted key merged again at
    v4 must re-appear as an insert WITHOUT a delete emission (the
    pre-image read applies the prior snapshot's own tombstones first).
    The DuckDB oracle reconstructs the exact feed
    from the base table, and the hash pins per-(commit, change_type)
    row counts, value sums, and key cardinalities.

    Scale: insert rows are O(added files); delete pre-images read the
    prior snapshot filtered by the tombstone join — the documented
    trade vs Delta's commit-time CDC files (read_change_feed
    docstring). Consumers that only need keys use read_changes +
    tombstones instead."""
    from dbcut_spark.operators.sampling import hash_bucket, hash_threshold
    from dbcut_spark.sinks import manifest as mf

    target = _rf_scratch() + "/orders_cdf"
    base = t(spark, sf_dir, "orders")
    h = hash_bucket(F.col("o_orderkey"), "cdf:")
    mf.publish_snapshot(
        base.filter(F.year("o_orderdate") < 1996), target, mode="overwrite"
    )
    mf.publish_snapshot(
        base.filter(F.year("o_orderdate") >= 1996), target, mode="append"
    )
    mf.delete_keys_snapshot(
        spark,
        base.filter(h < hash_threshold(0.10)).select("o_orderkey"),
        target,
    )
    t_u1, t_d1 = hash_threshold(0.14), hash_threshold(0.20)
    # the update range deliberately OVERLAPS the v3-deleted keys
    # (h < 0.10): their v4 tombstone matches nothing in the pre-state
    # (already deleted), so they must re-appear as inserts WITHOUT a
    # delete emission — the pre-image-applies-prior-tombstones half of
    # the contract the oracle pins
    upd = base.filter(h < t_u1).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
        "o_orderdate", "o_orderpriority", F.lit("U").alias("op"),
    )
    dels = base.filter((h >= t_u1) & (h < t_d1)).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority", F.lit("D").alias("op"),
    )
    mf.merge_snapshot(
        spark, upd.unionByName(dels), target, ["o_orderkey"], op_col="op"
    )
    feed = mf.read_change_feed(spark, target, since_version=1)
    return (
        feed.groupBy("_commit_version", "_change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_price"),
            F.countDistinct("o_custkey").alias("n_custs"),
        )
        .orderBy("_commit_version", "_change_type")
    )


@register(
    "orders_stream_cdc_merge",
    sql="""
    WITH b AS (
      SELECT o.*,
             substr(md5('scm:' || CAST(o_orderkey AS VARCHAR)), 1, 8) AS h
      FROM orders o
    ), final AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN year(o_orderdate) < 1997
                    AND h >= '147ae147' AND h < '1eb851eb'
                  THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN year(o_orderdate) < 1997
                    AND h >= '147ae147' AND h < '1eb851eb'
                  THEN o_totalprice + 500 ELSE o_totalprice
             END AS o_totalprice
      FROM b
      WHERE NOT (year(o_orderdate) < 1995 AND h < '147ae147')
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS total_price,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM final GROUP BY 1 ORDER BY o_orderstatus
    """,
)
def orders_stream_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming CDC MERGE loop (round 11,
    streaming/manifest_sink.py:merge_batch_exactly_once): three CDC
    micro-batches — bootstrap (pre-1995), then upserts+deletes (~8% of
    the bootstrap keys die), then upserts+updates (~4% of pre-1997
    keys get price+500/status 'U') — each landing as ONE merge-on-read
    commit carrying rows, tombstone, and the stream txn map
    atomically. The gate RAISES unless (a) a REPLAY of the final batch
    is a no-op that publishes no version (the exactly-once half) and
    (b) no batch rewrote an earlier commit's data files (the O(batch)
    half). The DuckDB oracle reconstructs the chained final state, so
    the hash pins merge semantics ACROSS the batch sequence, not just
    one commit.

    Scale: this is the streaming-CDC-to-lakehouse write path — per
    trigger cost O(batch); compact_snapshot folds the tombstone debt
    as maintenance."""
    from dbcut_spark.operators.sampling import hash_bucket, hash_threshold
    from dbcut_spark.sinks import manifest as mf
    from dbcut_spark.streaming.manifest_sink import (
        merge_batch_exactly_once,
    )

    target = _rf_scratch() + "/orders_scm"
    base = t(spark, sf_dir, "orders")
    h = hash_bucket(F.col("o_orderkey"), "scm:")
    t_del, t_upd = hash_threshold(0.08), hash_threshold(0.12)
    yr = F.year("o_orderdate")
    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ]
    b0 = base.filter(yr < 1995).select(*cols, F.lit("U").alias("op"))
    b1 = (
        base.filter((yr >= 1995) & (yr < 1997))
        .select(*cols, F.lit("U").alias("op"))
        .unionByName(
            base.filter((yr < 1995) & (h < t_del)).select(
                *cols, F.lit("D").alias("op")
            )
        )
    )
    b2 = (
        base.filter(yr >= 1997)
        .select(*cols, F.lit("U").alias("op"))
        .unionByName(
            base.filter((yr < 1997) & (h >= t_del) & (h < t_upd)).select(
                "o_orderkey", "o_custkey",
                F.lit("U").alias("o_orderstatus"),
                (F.col("o_totalprice") + 500).alias("o_totalprice"),
                "o_orderdate", "o_orderpriority",
                F.lit("U").alias("op"),
            )
        )
    )
    for i, b in enumerate((b0, b1, b2)):
        merge_batch_exactly_once(
            b, i, target, "scmq", ["o_orderkey"], op_col="op"
        )
    head = mf.current_version(target)
    if merge_batch_exactly_once(
        b2, 2, target, "scmq", ["o_orderkey"], op_col="op"
    ) is not None or mf.current_version(target) != head:
        raise RuntimeError(
            "replayed CDC batch published a new version — the gate "
            "exists to certify exactly-once, not just merge output"
        )
    hist = {
        m["version"]: m
        for v in range(1, head + 1)
        if (m := mf._load_manifest(target, v)) is not None
    }
    for v in range(2, head + 1):
        if not set(hist[v - 1]["files"]) <= set(hist[v]["files"]):
            raise RuntimeError(
                "a CDC batch rewrote earlier data files — the commits "
                "must be O(batch)"
            )
    return (
        mf.read_snapshot(spark, target)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_price"),
            F.countDistinct("o_custkey").alias("n_custs"),
        )
        .orderBy("o_orderstatus")
    )
