"""Third relational batch: the remaining TPC-H-shaped patterns, adapted to
the driver's reduced star schema (no partsupp, no commit/receipt dates —
FIXTURES.md). Covers: multi-way join chains with dimension broadcast (Q7/Q8/
Q9 shapes), grouped top-k with total tiebreaks (Q10/Q18), scalar-subquery
HAVING (Q11/Q15), outer-join distribution (Q13), correlated scalar subquery
(Q17), semi-join chain (Q20), EXISTS/NOT-EXISTS (Q21 shape), and anti-join +
scalar subquery (Q22 shape).

Scale notes (100 TB): every join here either broadcasts a dimension
(nation/region/supplier/part stay tiny at any SF) or shuffles on the fact
table's natural key once; correlated subqueries are expressed so Catalyst
rewrites them into aggregate+join (no per-row re-execution). Sums over
l_quantity are exact (integral doubles < 2^53), so HAVING thresholds cannot
flip between engines due to partial-sum ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import load_table


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume), 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name <> n2.n_name
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg", "multiway"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation shipping volume. lineitem shuffles once
    per fact-side equi-join; both nation copies broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n1 = F.broadcast(load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_region = 'ASIA' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             r2.r_name AS supp_region
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      WHERE r1.r_name = 'EUROPE' AND p_type = 'STANDARD'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("join", "agg", "multiway", "conditional"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: ASIA suppliers' share of EUROPE customers' STANDARD-
    part volume per year. Five dimension broadcasts, one fact shuffle chain."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = F.broadcast(load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")))
    r1 = F.broadcast(load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("cr_rkey"), F.col("r_name").alias("cust_region")))
    n2 = F.broadcast(load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_regionkey").alias("sr_key")))
    r2 = F.broadcast(load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("sr_rkey"), F.col("r_name").alias("supp_region")))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("c_nationkey") == F.col("cn_key"))
        .join(r1, F.col("cr_key") == F.col("cr_rkey"))
        .filter(F.col("cust_region") == "EUROPE")
        .join(n2, F.col("s_nationkey") == F.col("sn_key"))
        .join(r2, F.col("sr_key") == F.col("sr_rkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_region") == "ASIA", vol).otherwise(0.0)) / F.sum(vol), 4
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, o_year, ROUND(SUM(amount), 4) AS sum_profit
    FROM (
      SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - p_retailprice * l_quantity * 0.1 AS amount
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_type IN ('PROMO', 'ECONOMY')
    )
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year
    """,
    tags=("join", "agg", "multiway"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (partsupp-less): profit proxy uses p_retailprice as
    unit cost. Nation/part/supplier broadcast; lineitem⋈orders is the only
    big shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_type").isin("PROMO", "ECONOMY"))
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    o = load_table(spark, sf_dir, "orders")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.round(F.sum(amount), 4).alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           ROUND(c_acctbal, 4) AS c_acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue. Revenue is
    rounded BEFORE the sort so the Spark/DuckDB order (and therefore the
    limit cut) is identical; c_custkey is the total tiebreak."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select(
            "c_custkey", "c_name", "n_name", "revenue",
            F.round("c_acctbal", 4).alias("c_acctbal"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q11_important_suppliers",
    oracle="""
    WITH value_by_supp AS (
      SELECT l_suppkey, SUM(l_extendedprice) AS value
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, ROUND(value, 4) AS value
    FROM supplier JOIN value_by_supp ON s_suppkey = l_suppkey
    WHERE value > (SELECT SUM(value) * 0.011 FROM value_by_supp)
    ORDER BY value DESC, s_suppkey
    """,
    tags=("agg", "scalar-subquery", "having"),
)
def q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp-less): suppliers whose lineitem value
    exceeds a fraction of the global total. The scalar subquery is a
    second aggregation over the same grouped result — Catalyst reuses the
    exchange. Threshold compares raw doubles: both engines sum the same
    per-supplier values, and the filter margin (~1%) dwarfs fp noise."""
    li = load_table(spark, sf_dir, "lineitem")
    by_supp = li.groupBy("l_suppkey").agg(F.sum("l_extendedprice").alias("value"))
    total = by_supp.agg((F.sum("value") * F.lit(0.011)).alias("t"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    return (
        by_supp.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(total))
        .filter(F.col("value") > F.col("t"))
        .select("s_suppkey", "s_name", F.round("value", 4).alias("value"))
        .orderBy(F.col("value").desc(), "s_suppkey")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("outer-join", "agg", "distribution"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: orders-per-customer histogram via left outer join with a
    join-side predicate (customers with zero matches count as 0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("agg", "scalar-subquery", "max"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue. Revenue is rounded
    to 4dp BEFORE the max comparison on both sides, so partial-sum fp noise
    cannot make the engines disagree about the argmax."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 4) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
    tags=("join", "correlated-subquery", "agg"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-order revenue below 20% of the part's mean quantity.
    The correlated scalar AVG becomes an aggregate+join in both engines;
    l_quantity is integral so sums/averages are fp-exact and the threshold
    compare cannot flip. Spark side: explicit agg + broadcast-join (what
    Catalyst's decorrelation would produce, but with the per-part aggregate
    computed once, pre-shuffled on the join key)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(per_part, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           ROUND(o_totalprice, 4) AS o_totalprice,
           ROUND(SUM(l_quantity), 4) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("join", "semi-join", "having", "topk"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 300 (IN-subquery =
    left-semi join on an aggregated, exactly-summed key)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "b_orderkey"),
               F.col("o_orderkey") == F.col("b_orderkey"), "left_semi")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.round("o_totalprice", 4).alias("o_totalprice"), "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q20_part_volume_suppliers",
    oracle="""
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'PROMO'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 2500
    )
    ORDER BY s_suppkey
    """,
    tags=("semi-join", "having", "join-chain"),
)
def q20_part_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (partsupp-less): suppliers who moved >2500 units of
    PROMO parts — an aggregate-gated semi-join chain. Integral quantities
    keep the HAVING threshold fp-exact."""
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    )
    movers = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 2500)
        .select("l_suppkey")
    )
    return (
        s.join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
    tags=("exists", "anti-join", "join-chain", "topk"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (shipdate>orderdate+90d stands in for the missing
    receipt/commit dates): the sole late supplier in multi-supplier
    finished orders.

    Single-shuffle, window-free form, one lineitem pass (the
    EXISTS/NOT-EXISTS are per-order facts):

    1. orders pre-filtered to status 'F' BEFORE the (broadcast) join —
       the status is constant per order, and non-F orders can contribute
       nothing to either the outer rows or the EXISTS facts;
    2. groupBy(l_orderkey, l_suppkey) shuffles lineitem ONCE, with
       map-side partial aggregation compressing ~4x before the exchange;
       the second groupBy(l_orderkey) reuses that partitioning (hash on
       a key subset satisfies the clustering requirement) — no further
       full-width exchange and, unlike a window over l_orderkey, NO sort:
       because a waiting order has EXACTLY ONE late supplier,
       max(when(late, ..)) inside the per-order hash aggregate recovers
       that supplier's key and late-row count directly;
    3. what remains is order-count-sized: a broadcast supplier join and
       a 25-row TakeOrdered.

    waiting ⇔ supplier is late, order has ≥2 suppliers, exactly 1 late
    supplier; numwait sums that supplier's late rows in the order (the
    oracle counts l1 rows)."""
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))

    base = (
        li.join(o_f, li.l_orderkey == o_f.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("is_late"))
        # one explicit hash partition on the order key: hash(l_orderkey)
        # satisfies the clustering requirement of BOTH groupBys below
        # (a subset-key partitioning clusters any superset key), so the
        # whole aggregate chain runs on a single exchange
        .repartition("l_orderkey")
    )
    per_supp = base.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("late"),
        F.sum(F.col("is_late").cast("long")).alias("n_late_rows"),
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("late").cast("long")).alias("n_late_supp"),
        F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_suppkey"),
        F.max(F.when(F.col("late"), F.col("n_late_rows"))).alias("late_rows"),
    )
    waiting = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    return (
        waiting.join(s, F.col("late_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("late_rows").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 4) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("anti-join", "scalar-subquery", "agg"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no URGENT
    orders (every customer has orders in this data, so the anti-join is on
    the priority slice). Continuous acctbal values keep the avg-threshold
    compare off fp boundaries."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q_sql_interface",
    oracle="""
    WITH r AS (
      SELECT n_name, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT n_name, ROUND(SUM(c_acctbal), 4) AS top3_bal
    FROM r WHERE rn <= 3
    GROUP BY n_name ORDER BY n_name
    """,
    tags=("sql", "cte", "window"),
)
def q_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL entry point: tables registered as temp views, the
    query text handed to spark.sql verbatim (CTE + window + join + agg) —
    Catalyst plans SQL and DataFrame identically."""
    from pulsar_lunar_spark.session import tables

    tables(spark, sf_dir, names=("customer", "nation"))
    return spark.sql(
        """
        WITH r AS (
          SELECT n_name, c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY n_name
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer JOIN nation ON c_nationkey = n_nationkey
        )
        SELECT n_name, ROUND(SUM(c_acctbal), 4) AS top3_bal
        FROM r WHERE rn <= 3
        GROUP BY n_name ORDER BY n_name
        """
    )


@register(
    "q16_excluded_suppliers",
    oracle="""
    SELECT p_brand, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_type = 'ECONOMY'
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
      )
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    LIMIT 40
    """,
    tags=("null-aware-anti-join", "distinct-agg", "not-in"),
)
def q16_excluded_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part group, excluding
    a supplier denylist via NOT IN (subquery) — NULL-aware anti-join
    semantics (the whole result empties if the subquery yields a NULL;
    Catalyst simplifies to a plain anti-join here after proving the key
    non-null). Expressed through spark.sql because the DataFrame API has
    no null-aware anti operator."""
    from pulsar_lunar_spark.session import tables

    tables(spark, sf_dir, names=("lineitem", "part", "supplier"))
    return spark.sql(
        """
        SELECT p_brand, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'ECONOMY'
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
          )
        GROUP BY p_brand, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_size
        LIMIT 40
        """
    )


@register(
    "q_window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY EPOCH(o_orderdate)
             RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS orders_last_90d
    FROM orders
    WHERE o_custkey < 100
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "range-frame"),
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): per customer, how many
    orders fell in the trailing 90 days of each order — rangeBetween over
    epoch seconds. ROWS frames are covered by q_window_running; RANGE
    differs whenever order dates tie."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-90 * 86400, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.count(F.lit(1)).over(w).cast("bigint").alias("orders_last_90d"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "q_salted_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(l_quantity) AS BIGINT) AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "skew", "salting"),
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof salted equi-join (operators/partitioning.py): the fact
    side gets a random salt, the other side is replicated across all
    salts, and the join key becomes (key, salt) — a hot orderkey spreads
    over 8 reducers instead of one. The salt only routes rows, so the
    aggregate is value-identical to the plain join (which is exactly what
    the oracle checks)."""
    from pulsar_lunar_spark.operators.partitioning import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), o, "o_orderkey", n_salts=8
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("l_quantity").cast("bigint").alias("total_qty"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice >= 1000.0
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("sql", "parameterized"),
)
def q_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (spark.sql(..., args={...})): the parameters
    bind as typed literals in the plan — the injection-safe interface an
    application layer uses — and the filter still pushes to the scan like
    any literal predicate."""
    from pulsar_lunar_spark.session import tables

    tables(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS total_cents
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice >= :min_price
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        args={"status": "F", "min_price": 1000.0},
    )
