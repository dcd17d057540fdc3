"""Core relational surface: scan/filter/project/agg/join/window/setops/sort.

SURVEY §2B rows: scans, projection, filters, joins (all types), aggregation
(incl. rollup/cube/pivot/grouping sets), window functions, sort/limit/top-k,
set operations. All pure built-in Spark — Catalyst handles pushdown, column
pruning, broadcast selection (dimension tables are far below the broadcast
threshold at any SF), and AQE handles skew at the 100 TB end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_lunar_spark.operators.topk import top_k_per_group
from pulsar_lunar_spark.session import load_table
from pulsar_lunar_spark.queries.registry import register


# --------------------------------------------------------------------------
# Aggregation / scan / filter
# --------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4)                                   AS sum_qty,
           ROUND(SUM(l_extendedprice), 4)                              AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)           AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                   AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                              AS avg_price,
           ROUND(AVG(l_discount), 4)                                   AS avg_disc,
           COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "scan", "filter", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filter -> hash agg -> sort.

    Scale: single shuffle on (returnflag, linestatus) — 6 groups, map-side
    partial aggregation makes the shuffle tiny regardless of input size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 4
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q2_stats_by_segment",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*)                            AS n_customers,
           ROUND(AVG(c_acctbal), 4)            AS avg_bal,
           ROUND(MIN(c_acctbal), 4)            AS min_bal,
           ROUND(MAX(c_acctbal), 4)            AS max_bal,
           ROUND(STDDEV_SAMP(c_acctbal), 4)    AS sd_bal,
           ROUND(VAR_SAMP(c_acctbal), 4)       AS var_bal,
           COUNT(DISTINCT c_nationkey)         AS n_nations
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg",),
)
def q2_stats_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scalar-aggregate family incl. stddev/variance/count-distinct."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        F.round(F.min("c_acctbal"), 4).alias("min_bal"),
        F.round(F.max("c_acctbal"), 4).alias("max_bal"),
        F.round(F.stddev_samp("c_acctbal"), 4).alias("sd_bal"),
        F.round(F.var_samp("c_acctbal"), 4).alias("var_bal"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           STRFTIME(o_orderdate, '%Y-%m-%d')                 AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way equi-join, agg, global top-10 (TakeOrderedAndProject)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "agg", "broadcast"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; nation/region/supplier broadcast (dim tables)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2001-06-01 00:00:00'
    )
    ORDER BY s_suppkey
    """,
    tags=("join",),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: suppliers with recent shipments."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-06-01").cast("timestamp")
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    ORDER BY c_custkey
    """,
    tags=("join",),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers that never ordered."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "q_join_outer",
    oracle="""
    SELECT n_nationkey, n_name,
           COALESCE(cnt, 0) AS n_customers
    FROM nation
    LEFT JOIN (
        SELECT c_nationkey, COUNT(*) AS cnt FROM customer GROUP BY c_nationkey
    ) c ON n_nationkey = c_nationkey
    ORDER BY n_nationkey
    """,
    tags=("join", "agg"),
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving empty nations (aggregate-then-join, so the
    outer side stays small — join AFTER agg is the scale-correct order)."""
    n = load_table(spark, sf_dir, "nation")
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        n.join(c, n.n_nationkey == c.c_nationkey, "left")
        .select("n_nationkey", "n_name", F.coalesce("cnt", F.lit(0)).alias("n_customers"))
        .orderBy("n_nationkey")
    )


@register(
    "q_join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cn.k, sn.k) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.k = sn.k
    ORDER BY nationkey
    """,
    tags=("join",),
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two aggregates (customer vs supplier nation counts)."""
    cn = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cn.join(sn, cn.ck == sn.sk, "full_outer")
        .select(
            F.coalesce("ck", "sk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_name < r2.r_name
    ORDER BY from_region, to_region
    """,
    tags=("join",),
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (bounded to the 5-row region table — cross joins of big
    tables are forbidden by the 100 TB design rule, SURVEY §4)."""
    r1 = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("from_region"))
    r2 = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("to_region"))
    return (
        r1.crossJoin(r2)
        .filter(F.col("from_region") < F.col("to_region"))
        .orderBy("from_region", "to_region")
    )


@register(
    "q_join_theta_range",
    oracle="""
    SELECT p_size            AS bucket_size,
           COUNT(*)          AS n_parts,
           ROUND(AVG(p_retailprice), 4) AS avg_price
    FROM part
    JOIN (SELECT DISTINCT p_size AS bucket_size FROM part) b
      ON p_size >= bucket_size AND p_size < bucket_size + 5
    GROUP BY p_size
    ORDER BY p_size
    """,
    tags=("join", "range"),
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range (non-equi) join: parts binned against broadcast bucket
    boundaries. Scale: the build side (distinct sizes) is tiny → broadcast
    nested loop is the right physical plan; the probe side streams."""
    p = load_table(spark, sf_dir, "part")
    b = F.broadcast(p.select(F.col("p_size").alias("bucket_size")).distinct())
    return (
        p.join(b, (p.p_size >= b.bucket_size) & (p.p_size < b.bucket_size + 5))
        .groupBy(F.col("p_size").alias("bucket_size2"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
        .select(
            F.col("bucket_size2").alias("bucket_size"),
            "n_parts",
            "avg_price",
        )
        .orderBy("bucket_size")
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "agg"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS as a left-semi join with a non-key predicate."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

@register(
    "q_window_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, ROUND(o_totalprice, 4) AS totalprice, rn
    FROM (
        SELECT c_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY c_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'MACHINERY'
    )
    WHERE rn <= 3
    ORDER BY c_custkey, rn
    """,
    tags=("window", "topk"),
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via the topk operator (row_number window; Spark ≥3.5
    rewrites rn<=k into a WindowGroupLimit — no full per-group sort)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "MACHINERY")
    joined = o.join(c, o.o_custkey == c.c_custkey).select("c_custkey", "o_orderkey", "o_totalprice")
    ranked = top_k_per_group(
        joined,
        partition_by=["c_custkey"],
        order_by=[F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
        rank_col="rn",
    )
    return ranked.select(
        "c_custkey",
        "o_orderkey",
        F.round("o_totalprice", 4).alias("totalprice"),
        "rn",
    ).orderBy("c_custkey", "rn")


@register(
    "q_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(SUM(o_totalprice) OVER w_cum, 4)  AS running_total,
           ROUND(AVG(o_totalprice) OVER w3, 4)     AS moving_avg3,
           ROUND(LAG(o_totalprice)  OVER w, 4)     AS prev_price,
           ROUND(LEAD(o_totalprice) OVER w, 4)     AS next_price,
           ROUND(FIRST_VALUE(o_totalprice) OVER w_cum, 4) AS first_price,
           COUNT(*) OVER (PARTITION BY o_custkey)  AS n_orders
    FROM orders
    WHERE o_custkey <= 50
    WINDOW w     AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w_cum AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w3    AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    tags=("window",),
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running/moving aggregates + lag/lead/first_value over ROWS frames."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w3 = w.rowsBetween(-2, Window.currentRow)
    w_all = Window.partitionBy("o_custkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.round(F.sum("o_totalprice").over(w_cum), 4).alias("running_total"),
        F.round(F.avg("o_totalprice").over(w3), 4).alias("moving_avg3"),
        F.round(F.lag("o_totalprice").over(w), 4).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 4).alias("next_price"),
        F.round(F.first("o_totalprice").over(w_cum), 4).alias("first_price"),
        F.count(F.lit(1)).over(w_all).alias("n_orders"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


@register(
    "q_window_ranks",
    oracle="""
    SELECT p_brand, p_partkey,
           ROUND(p_retailprice, 4) AS retailprice,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           NTILE(4)       OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 4) AS cume
    FROM part
    WHERE p_brand IN ('Brand#11', 'Brand#22')
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
    ORDER BY p_brand, rnk, p_partkey
    """,
    tags=("window",),
)
def q_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank / cume_dist."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand").isin("Brand#11", "Brand#22"))
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return p.select(
        "p_brand",
        "p_partkey",
        F.round("p_retailprice", 4).alias("retailprice"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    ).orderBy("p_brand", "rnk", "p_partkey")


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube / pivot
# --------------------------------------------------------------------------

@register(
    "q_rollup",
    oracle="""
    SELECT COALESCE(r_name, '<all>') AS region_name,
           COALESCE(n_name, '<all>') AS nation_name,
           COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal), 4) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY region_name, nation_name
    """,
    tags=("agg", "rollup"),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region->nation hierarchy with grand total."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(r, n.n_regionkey == r.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("total_bal"),
        )
        .select(
            F.coalesce("r_name", F.lit("<all>")).alias("region_name"),
            F.coalesce("n_name", F.lit("<all>")).alias("nation_name"),
            "n_customers",
            "total_bal",
        )
        .orderBy("region_name", "nation_name")
    )


@register(
    "q_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, '<all>')   AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 4) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
    tags=("agg", "cube"),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over status × priority."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("status", "priority")
    )


@register(
    "q_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY returnflag, linestatus
    """,
    tags=("agg",),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (via Spark SQL on a temp view)."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("pl_lineitem_gs")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
               COALESCE(l_linestatus, '<all>') AS linestatus,
               COUNT(*) AS n_items
        FROM pl_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY returnflag, linestatus
        """
    )


@register(
    "q_pivot",
    oracle="""
    SELECT c_mktsegment,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_cnt,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_cnt,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_cnt
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("agg", "pivot"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with explicit values (explicit values keep the plan
    single-pass — no extra distinct scan to discover columns)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    piv = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return piv.select(
        "c_mktsegment",
        F.coalesce(F.col("F"), F.lit(0)).alias("f_cnt"),
        F.coalesce(F.col("O"), F.lit(0)).alias("o_cnt"),
        F.coalesce(F.col("P"), F.lit(0)).alias("p_cnt"),
    ).orderBy("c_mktsegment")


# --------------------------------------------------------------------------
# Set operations / distinct
# --------------------------------------------------------------------------

@register(
    "q_set_union",
    oracle="""
    SELECT k FROM (
        SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
        UNION
        SELECT s_nationkey AS k FROM supplier
    ) ORDER BY k
    """,
    tags=("setop",),
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT of customer/supplier nation keys."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("k")
    )
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.union(s).distinct().orderBy("k")


@register(
    "q_set_intersect",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY k
    """,
    tags=("setop",),
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s).orderBy("k")


@register(
    "q_set_except",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY k
    """,
    tags=("setop",),
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): nations with customers but no suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.subtract(s).orderBy("k")


@register(
    "q_drop_duplicates",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority
    FROM orders
    ORDER BY o_orderstatus, o_orderpriority
    """,
    tags=("setop",),
)
def q_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a column subset."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderstatus", "o_orderpriority")
        .dropDuplicates(["o_orderstatus", "o_orderpriority"])
        .orderBy("o_orderstatus", "o_orderpriority")
    )


# --------------------------------------------------------------------------
# Sort / limit / predicates showcase
# --------------------------------------------------------------------------

@register(
    "q_sort_limit",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 4) AS totalprice,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    tags=("sort", "topk"),
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key top-100 (Spark compiles to TakeOrderedAndProject —
    O(k) per partition, no full sort at scale)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 4).alias("totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


@register(
    "q_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_size BETWEEN 10 AND 20
      AND p_brand IN ('Brand#11', 'Brand#12', 'Brand#13')
      AND p_name LIKE '%bolt%'
      AND REGEXP_MATCHES(p_type, '^(STANDARD|SMALL)')
      AND p_retailprice IS NOT NULL
    ORDER BY p_partkey
    """,
    tags=("filter",),
)
def q_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate family: BETWEEN / IN / LIKE / RLIKE / IS NOT NULL — all
    pushdown-eligible (BETWEEN+IN reach the parquet scan as min/max filters)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_size").between(10, 20)
            & F.col("p_brand").isin("Brand#11", "Brand#12", "Brand#13")
            & F.col("p_name").like("%bolt%")
            & F.col("p_type").rlike("^(STANDARD|SMALL)")
            & F.col("p_retailprice").isNotNull()
        )
        .select("p_partkey", "p_name", "p_brand", "p_size")
        .orderBy("p_partkey")
    )


@register(
    "q_conditional",
    oracle="""
    SELECT
        CASE WHEN o_totalprice >= 300000 THEN 'high'
             WHEN o_totalprice >= 150000 THEN 'mid'
             ELSE 'low' END AS price_band,
        o_orderstatus,
        COUNT(*) AS n,
        ROUND(SUM(o_totalprice), 4) AS total
    FROM orders
    GROUP BY 1, 2
    ORDER BY price_band, o_orderstatus
    """,
    tags=("filter", "agg"),
)
def q_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN banding + aggregation."""
    o = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 150000, "mid")
        .otherwise("low")
    )
    return (
        o.select(band.alias("price_band"), "o_orderstatus", "o_totalprice")
        .groupBy("price_band", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 4).alias("total"))
        .orderBy("price_band", "o_orderstatus")
    )
