"""Reshaping + windowed-sequence queries, batch 14 (SURVEY §2B):
unpivot/melt (the wide→long inverse of q_pivot), cumulative-distinct
counting via the first-occurrence-flag trick (no O(n²) state), and
view→purchase conversion latency distribution.

Determinism: all outputs are integers / strings; latency buckets are
floor divisions of exact second differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import load_table


@register(
    "q_unpivot",
    oracle="""
    WITH w AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_open,
               CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_filled,
               CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_partial
        FROM orders GROUP BY 1
    )
    SELECT o_orderpriority, status, n
    FROM w UNPIVOT (n FOR status IN (n_open, n_filled, n_partial))
    ORDER BY o_orderpriority, status
    """,
    tags=("analytics", "reshape", "unpivot"),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt — the wide→long inverse of q_pivot: a per-priority
    status-count matrix folds back to (priority, status, n) rows via
    stack(), evaluated in the projection (a generator, not a shuffle).
    The wide matrix itself is one hash aggregate with FILTER-style
    conditional counts (map-side combined)."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.sum((F.col("o_orderstatus") == "O").cast("long")).alias("n_open"),
        F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("n_filled"),
        F.sum((F.col("o_orderstatus") == "P").cast("long")).alias("n_partial"),
    )
    return (
        wide.select(
            "o_orderpriority",
            F.expr(
                "stack(3, 'n_open', n_open, 'n_filled', n_filled, "
                "'n_partial', n_partial) AS (status, n)"
            ),
        )
        .orderBy("o_orderpriority", "status")
    )


@register(
    "q_cumulative_distinct",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ROW_NUMBER() OVER
                        (PARTITION BY user_id, event_type
                         ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS first_seen
        FROM events
    )
    SELECT event_id,
           CAST(SUM(first_seen) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_distinct_types_so_far
    FROM flagged
    QUALIFY event_id % 23 = 0
    ORDER BY event_id
    """,
    tags=("analytics", "window", "cumulative-distinct"),
)
def q_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) per user — impossible as a naive window
    aggregate without O(n) state per row, but exact and cheap as the
    composition: flag each (user, type)'s FIRST occurrence with
    row_number()=1, then a running SUM of flags over the user timeline.
    Two window passes, both shuffling on user_id once (same partition
    key, Spark reuses the exchange). This is the scalable form of
    'distinct items seen so far' at any cardinality."""
    e = load_table(spark, sf_dir, "events")
    # Both windows partition by user_id ONLY, so they share one exchange
    # (partitioning by (user_id, event_type) for the first-seen flag would
    # NOT satisfy the second window's user_id clustering — that costs a
    # second full shuffle). First occurrence per (user, type) = the row
    # where the type changes under an (event_type, ts) in-partition sort.
    w_first = Window.partitionBy("user_id").orderBy("event_type", "ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.select(
        "user_id", "ts", "event_id",
        (
            F.lag("event_type").over(w_first).isNull()
            | (F.lag("event_type").over(w_first) != F.col("event_type"))
        ).cast("long").alias("first_seen"),
    )
    return (
        flagged.select(
            "event_id",
            F.sum("first_seen").over(w_run).alias("n_distinct_types_so_far"),
        )
        .filter(F.col("event_id") % 23 == 0)
        .orderBy("event_id")
    )


@register(
    "q_conversion_latency",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS t1
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'purchase' AND e.ts > v.t0
        GROUP BY e.user_id
    )
    SELECT CAST(DATE_DIFF('second', v.t0, p.t1) // 3600 AS BIGINT)
               AS latency_hours,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM v JOIN p USING (user_id)
    GROUP BY 1 ORDER BY 1
    """,
    tags=("analytics", "funnel", "latency"),
)
def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: hours between a user's first view
    and their first subsequent purchase, bucketed by floor division of
    the exact second difference. Same chained per-user-MIN shape as
    q_funnel (all shuffles on user_id); the histogram is a bounded
    second aggregate."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    lat = v.join(p, "user_id").select(
        F.expr(
            "(unix_timestamp(t1) - unix_timestamp(t0)) DIV 3600"
        ).alias("latency_hours")
    )
    return (
        lat.groupBy("latency_hours")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("latency_hours")
    )


@register(
    "q_temporal_join",
    oracle="""
    WITH st AS (
        SELECT user_id, ts AS vf, event_type AS state,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS vt
        FROM events WHERE event_type IN ('signup', 'error')
    ), f AS (
        SELECT user_id, event_id, ts FROM events
        WHERE event_type = 'purchase'
    )
    SELECT f.event_id AS event_id, st.state AS state_at_purchase
    FROM f JOIN st
      ON f.user_id = st.user_id
     AND f.ts >= st.vf AND (st.vt IS NULL OR f.ts < st.vt)
    WHERE f.event_id % 9 = 0
    ORDER BY f.event_id
    """,
    tags=("analytics", "temporal-join", "point-in-time"),
)
def q_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal / point-in-time lookup join: each purchase fact is
    enriched with the dimension state (last signup/error transition)
    VALID AT its event time — the SCD2-lookup shape every warehouse
    feature store serves. The oracle is the interval-containment join
    spec; the engine path is operators/asof.py::asof_join — a UNION +
    single (user_id)-partitioned window sweep, ONE shuffle total, no
    interval explosion and no non-equi join at any scale."""
    from pulsar_lunar_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    facts = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    states = e.filter(F.col("event_type").isin("signup", "error")).select(
        "user_id", F.col("ts").alias("st_ts"), F.col("event_type").alias("state")
    )
    joined = asof_join(
        facts, states, on="user_id", left_ts="ts", right_ts="st_ts",
        payload_cols=["state"],
    )
    return (
        joined.filter(F.col("state_asof").isNotNull())
        .filter(F.col("event_id") % 9 == 0)
        .select("event_id", F.col("state_asof").alias("state_at_purchase"))
        .orderBy("event_id")
    )
