"""TPC-DS-shaped analytics pack: the decision-support query shapes the
TPC-H 22 don't exercise — grouping lattices (ROLLUP / CUBE), year-over-
year ratio windows, centered moving averages, INTERSECT / EXCEPT set
ops, correlated above-average filters, ranked top-n-per-group with
share-of-total, and a channel-union rollup. Shapes follow the public
TPC-DS specification queries (q5, q38, q47, q67, q75, q87 and the q6
correlated-average pattern), adapted to the harness schema.

Scale notes per shape:
- rollup/cube compile to Spark's Expand + single hash aggregate — one
  shuffle on the grouping keys, the lattice adds map-side rows, never
  extra shuffles;
- the window queries partition by low-cardinality keys (nation,
  priority) after a pre-aggregation that shrinks the data to one row
  per (key, period) — window state is tiny;
- INTERSECT / EXCEPT become left-semi / left-anti joins over distinct
  keys (id columns only — no payload shuffles);
- the correlated-average filter is a window avg over the SAME
  pre-shuffled partition the ranking uses (one exchange, reused).

Oracle conventions: identical aliases, sums through DECIMAL, round(6)
before cross-engine ratio comparisons, '(all)' sentinels instead of
NULL grouping keys (Spark sorts NULLS FIRST, DuckDB NULLS LAST — the
sentinel sidesteps the divergence), explicit ORDER BY everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbcut_spark.queries import dsum, dsum_sql, register, t

ALL = "(all)"


def _orders_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer ⋈ nation — the shared star-join spine.
    nation (25 rows, constant) broadcasts by force; customer SCALES
    with SF, so its join is AQE-decided — the old hint claimed it was
    'small at any sf', which is false at 100 TB (~15B rows) and would
    die at the 8 GB broadcast cap (round-10 review; AQE still
    broadcasts it at every gate size)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return o.join(
        c, o.o_custkey == c.c_custkey
    ).join(F.broadcast(n), c.c_nationkey == n.n_nationkey)


_ORDERS_NATION_SQL = """
    orders o JOIN customer c ON o.o_custkey = c.c_custkey
             JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


@register(
    "tpcds_rollup_priority",
    sql=f"""
    SELECT COALESCE(n_name, '{ALL}') AS nation,
           COALESCE(o_orderpriority, '{ALL}') AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           {dsum_sql('o_totalprice', 'total_price')}
    FROM {_ORDERS_NATION_SQL}
    GROUP BY ROLLUP(n_name, o_orderpriority)
    ORDER BY nation, priority
    """,
)
def tpcds_rollup_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP lattice (TPC-DS q5/q77 totals shape): per (nation,
    priority) + per nation + grand total in ONE pass. Spark compiles
    the rollup to Expand feeding a single hash aggregate — the lattice
    costs map-side row expansion, not extra shuffles."""
    return (
        _orders_nation(spark, sf_dir)
        .rollup("n_name", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_price"),
        )
        .select(
            F.coalesce(F.col("n_name"), F.lit(ALL)).alias("nation"),
            F.coalesce(F.col("o_orderpriority"), F.lit(ALL)).alias("priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("nation", "priority")
    )


@register(
    "tpcds_cube_lineitem",
    sql=f"""
    SELECT COALESCE(l_returnflag, '{ALL}') AS rflag,
           COALESCE(l_linestatus, '{ALL}') AS lstatus,
           CAST(count(*) AS BIGINT) AS n_items,
           {dsum_sql('l_quantity', 'sum_qty')},
           {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY rflag, lstatus
    """,
)
def tpcds_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE lattice over (returnflag, linestatus) — every marginal
    of TPC-H q1's grouping in one aggregate (2^2 grouping sets via
    Expand, one shuffle)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity", "sum_qty"),
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(25,6)")
            )
            .cast("double")
            .alias("revenue"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit(ALL)).alias("rflag"),
            F.coalesce(F.col("l_linestatus"), F.lit(ALL)).alias("lstatus"),
            "n_items",
            "sum_qty",
            "revenue",
        )
        .orderBy("rflag", "lstatus")
    )


@register(
    "tpcds_yoy_nation",
    sql=f"""
    WITH yearly AS (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS yr,
             {dsum_sql('o_totalprice', 'revenue')}
      FROM {_ORDERS_NATION_SQL}
      GROUP BY n_name, CAST(year(o_orderdate) AS INT))
    SELECT nation, yr, revenue,
           round(revenue / lag(revenue) OVER (PARTITION BY nation ORDER BY yr),
                 6) AS yoy_ratio
    FROM yearly
    QUALIFY lag(revenue) OVER (PARTITION BY nation ORDER BY yr) IS NOT NULL
    ORDER BY nation, yr
    """,
)
def tpcds_yoy_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue ratio per nation (TPC-DS q75 shape).
    The window runs AFTER a pre-aggregation to one row per (nation,
    year) — window state is bounded by years, not orders."""
    yearly = (
        _orders_nation(spark, sf_dir)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(dsum("o_totalprice", "revenue"))
    )
    w = Window.partitionBy("nation").orderBy("yr")
    return (
        yearly.withColumn("prev", F.lag("revenue").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            "nation",
            "yr",
            "revenue",
            F.round(F.col("revenue") / F.col("prev"), 6).alias("yoy_ratio"),
        )
        .orderBy("nation", "yr")
    )


@register(
    "tpcds_moving_avg",
    sql=f"""
    WITH monthly AS (
      SELECT o_orderpriority AS priority,
             CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS ym,
             {dsum_sql('o_totalprice', 'revenue')}
      FROM orders
      GROUP BY o_orderpriority,
               CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT))
    SELECT priority, ym, revenue,
           round(CAST(SUM(CAST(revenue AS DECIMAL(25,6)))
                        OVER (PARTITION BY priority ORDER BY ym
                              ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
                      AS DOUBLE)
                 / COUNT(*) OVER (PARTITION BY priority ORDER BY ym
                                  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING),
                 6) AS mavg3
    FROM monthly
    ORDER BY priority, ym
    """,
)
def tpcds_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered 3-month moving average of monthly revenue per priority
    (TPC-DS q47 shape). The average is sum(DECIMAL)/count rather than
    avg(double) so both engines fold identically."""
    monthly = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("int")
            .alias("ym"),
        )
        .agg(dsum("o_totalprice", "revenue"))
    )
    w = Window.partitionBy("priority").orderBy("ym").rowsBetween(-1, 1)
    return (
        monthly.withColumn(
            "mavg3",
            F.round(
                F.sum(F.col("revenue").cast("decimal(25,6)")).over(w).cast("double")
                / F.count(F.lit(1)).over(w),
                6,
            ),
        )
        .select("priority", "ym", "revenue", "mavg3")
        .orderBy("priority", "ym")
    )


@register(
    "tpcds_intersect_buyers",
    sql="""
    SELECT user_id FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT DISTINCT o_custkey AS user_id FROM orders
      WHERE o_totalprice > 100000)
    ORDER BY user_id
    """,
)
def tpcds_intersect_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (TPC-DS q38 shape): users who both fired a purchase
    event and placed a >100k order. Spark compiles intersect to a
    left-semi join over distinct ids — id columns only, no payload
    shuffle."""
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    big = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select(F.col("o_custkey").alias("user_id"))
        .distinct()
    )
    return ev.intersect(big).orderBy("user_id")


@register(
    "tpcds_except_browsers",
    sql="""
    SELECT user_id FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT
      SELECT DISTINCT o_custkey AS user_id FROM orders
      WHERE o_orderpriority = '1-URGENT')
    ORDER BY user_id
    """,
)
def tpcds_except_browsers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (TPC-DS q87 shape): purchase-event users with no urgent
    order — compiled to a left-anti join over distinct ids. (The
    predicates exist to keep the difference NON-empty on the harness
    corpus — an empty gate row would verify nothing.)"""
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    urgent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("user_id"))
        .distinct()
    )
    return ev.subtract(urgent).orderBy("user_id")


@register(
    "tpcds_top_spenders",
    sql=f"""
    WITH spend AS (
      SELECT n_name AS nation, c.c_custkey AS custkey,
             {dsum_sql('o_totalprice', 'cust_total')}
      FROM {_ORDERS_NATION_SQL}
      GROUP BY n_name, c.c_custkey),
    ranked AS (
      SELECT nation, custkey, cust_total,
             CAST(row_number() OVER (PARTITION BY nation
                                     ORDER BY cust_total DESC, custkey) AS INT)
               AS rnk,
             round(cust_total /
                   CAST(SUM(CAST(cust_total AS DECIMAL(25,6)))
                          OVER (PARTITION BY nation) AS DOUBLE),
                   6) AS nation_share
      FROM spend)
    SELECT nation, custkey, cust_total, rnk, nation_share
    FROM ranked WHERE rnk <= 3
    ORDER BY nation, rnk
    """,
)
def tpcds_top_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 spenders per nation with share-of-nation (TPC-DS q67
    ranking shape). The RANK window stays (its rnk<=3 filter group-
    limit-prunes, so only 3 rows per nation survive the exchange), but
    the share denominator is a 25-row groupBy aggregate broadcast
    back — a frameless sum window over the per-customer frame must
    materialize EVERY row in its 25 nation partitions (a 25-task
    parallelism ceiling buffering ~600M rows each at 100 TB; round-10
    review). The per-customer frame is pinned: it feeds the totals
    aggregate and the ranked join. row_number over (total DESC,
    custkey) keeps ties deterministic cross-engine."""
    from dbcut_spark.operators.pinning import pin

    spend = pin(
        _orders_nation(spark, sf_dir)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("c_custkey").alias("custkey"),
        )
        .agg(dsum("o_totalprice", "cust_total"))
    )
    totals = spend.groupBy("nation").agg(
        F.sum(F.col("cust_total").cast("decimal(25,6)"))
        .cast("double")
        .alias("__nation_total")
    )
    w_rank = Window.partitionBy("nation").orderBy(
        F.col("cust_total").desc(), F.col("custkey")
    )
    return (
        spend.join(F.broadcast(totals), "nation")
        .withColumn("rnk", F.row_number().over(w_rank).cast("int"))
        .withColumn(
            "nation_share",
            F.round(F.col("cust_total") / F.col("__nation_total"), 6),
        )
        .filter(F.col("rnk") <= 3)
        .select("nation", "custkey", "cust_total", "rnk", "nation_share")
        .orderBy("nation", "rnk")
    )


@register(
    "tpcds_above_avg_orders",
    sql="""
    WITH stats AS (
      SELECT o_orderkey, o_orderpriority AS priority, o_totalprice,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                    OVER (PARTITION BY o_orderpriority) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY o_orderpriority) AS prio_avg
      FROM orders)
    SELECT o_orderkey, priority, o_totalprice,
           round(o_totalprice / prio_avg, 6) AS avg_ratio
    FROM stats WHERE o_totalprice > 1.3 * prio_avg
    ORDER BY o_orderkey
    """,
)
def tpcds_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated above-average filter (TPC-DS q6 pattern): orders
    priced >1.3× their priority class's mean. The class mean is a
    5-row groupBy aggregate BROADCAST back onto the fact scan — NOT a
    window: a window partitioned by a 5-value key funnels the entire
    un-aggregated fact table into 5 reducer tasks (~1/5 of all orders
    each at 100 TB — the parallelism collapse, round-10 review),
    while the aggregate gets map-side partials at full width and the
    join side is constant-size. Decimal-sum/count keeps the float
    comparison engine-exact either way."""
    o = t(spark, sf_dir, "orders")
    means = o.groupBy("o_orderpriority").agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("prio_avg")
    )
    return (
        o.join(F.broadcast(means), "o_orderpriority")
        .filter(F.col("o_totalprice") > 1.3 * F.col("prio_avg"))
        .select(
            "o_orderkey",
            F.col("o_orderpriority").alias("priority"),
            "o_totalprice",
            F.round(F.col("o_totalprice") / F.col("prio_avg"), 6).alias("avg_ratio"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "tpcds_channel_rollup",
    sql=f"""
    WITH chan AS (
      SELECT 'store' AS channel, CAST(year(o_orderdate) AS INT) AS yr,
             o_totalprice AS amount
      FROM orders
      UNION ALL
      SELECT 'web' AS channel, CAST(year(ts) AS INT) AS yr, value AS amount
      FROM events WHERE event_type = 'purchase')
    SELECT COALESCE(channel, '{ALL}') AS channel,
           COALESCE(CAST(yr AS VARCHAR), '{ALL}') AS yr,
           CAST(count(*) AS BIGINT) AS n_sales,
           {dsum_sql('amount', 'total_amount')}
    FROM chan
    GROUP BY ROLLUP(channel, yr)
    ORDER BY channel, yr
    """,
)
def tpcds_channel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Channel-union rollup (TPC-DS q5 shape): store sales (orders) and
    web sales (purchase events) union into one channel frame, then a
    ROLLUP lattice by (channel, year). The union is append-only
    (map-side); the rollup is one shuffle."""
    store = t(spark, sf_dir, "orders").select(
        F.lit("store").alias("channel"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.col("o_totalprice").alias("amount"),
    )
    web = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.lit("web").alias("channel"),
            F.year("ts").cast("int").alias("yr"),
            F.col("value").alias("amount"),
        )
    )
    return (
        store.unionByName(web)
        .rollup("channel", "yr")
        .agg(
            F.count(F.lit(1)).alias("n_sales"),
            dsum("amount", "total_amount"),
        )
        .select(
            F.coalesce(F.col("channel"), F.lit(ALL)).alias("channel"),
            F.coalesce(F.col("yr").cast("string"), F.lit(ALL)).alias("yr"),
            "n_sales",
            "total_amount",
        )
        .orderBy("channel", "yr")
    )


@register(
    "tpcds_grouping_sets",
    sql=f"""
    SELECT COALESCE(n_name, '{ALL}') AS nation,
           COALESCE(o_orderstatus, '{ALL}') AS status,
           CAST(count(*) AS BIGINT) AS n_orders,
           {dsum_sql('o_totalprice', 'total_price')}
    FROM {_ORDERS_NATION_SQL}
    GROUP BY GROUPING SETS ((n_name), (o_orderstatus), (n_name, o_orderstatus))
    ORDER BY nation, status
    """,
)
def tpcds_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the irregular lattice neither ROLLUP
    nor CUBE expresses: per-nation, per-status, and the cross, WITHOUT
    the grand total. Uses the first-class DataFrame.groupingSets
    operator (Spark 4); same Expand + single-aggregate-exchange plan
    as the rollup/cube queries."""
    return (
        _orders_nation(spark, sf_dir)
        .groupingSets(
            [["n_name"], ["o_orderstatus"], ["n_name", "o_orderstatus"]],
            "n_name",
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_price"),
        )
        .select(
            F.coalesce(F.col("n_name"), F.lit(ALL)).alias("nation"),
            F.coalesce(F.col("o_orderstatus"), F.lit(ALL)).alias("status"),
            "n_orders",
            "total_price",
        )
        .orderBy("nation", "status")
    )


@register(
    "tpcds_pivot_status",
    sql=f"""
    SELECT o_orderpriority AS priority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_F,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_O,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_P,
           {dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END", 'price_F')},
           {dsum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END", 'price_O')},
           {dsum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END", 'price_P')}
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
)
def tpcds_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tab / PIVOT (the TPC-DS q88-style one-scan multi-bucket
    report): order counts and price totals per priority, pivoted wide
    by status. Uses Spark's first-class ``pivot`` operator with
    EXPLICIT pivot values — omitting them costs an extra
    distinct-values pass and makes the output schema data-dependent,
    both wrong at scale. Compiles to ONE scan + one hash aggregate of
    CASE-gated partials (no join, no union of per-bucket scans); the
    oracle spells the same thing as FILTER/CASE conditional
    aggregation."""
    o = t(spark, sf_dir, "orders")
    piv = (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.coalesce(F.col("o_totalprice"), F.lit(0.0)).cast("decimal(25,6)")
            )
            .cast("double")
            .alias("price"),
        )
    )
    return piv.select(
        "priority",
        F.coalesce(F.col("F_n"), F.lit(0)).alias("n_F"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("n_O"),
        F.coalesce(F.col("P_n"), F.lit(0)).alias("n_P"),
        F.coalesce(F.col("F_price"), F.lit(0.0)).alias("price_F"),
        F.coalesce(F.col("O_price"), F.lit(0.0)).alias("price_O"),
        F.coalesce(F.col("P_price"), F.lit(0.0)).alias("price_P"),
    ).orderBy("priority")
