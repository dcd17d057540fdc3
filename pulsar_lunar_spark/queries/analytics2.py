"""Time-series + statistics queries, batch 9 (SURVEY §2B north star):
OHLC bars (the hypertable-rollup shape), time-RANGE rolling windows,
SCD Type-2 interval builds from a changelog, exact-integer z-score
outlier detection, exponentially time-decayed engagement scores, and a
mergeable approximate-quantile sketch.

Determinism discipline: `value` is converted to integer cents
(floor(value*100+0.5) — the same IEEE double op in both engines) BEFORE
any sum, so every aggregate here is exact BIGINT arithmetic; z-score
thresholds are evaluated as cross-multiplied integer inequalities
((cn−Σ)² > 4(nΣc²−Σ²)), never as float divisions whose rounding could
flip a borderline row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import load_table

def _cents():
    """Integer cents (lazy: Column exprs need an active SparkContext)."""
    return (F.floor(F.col("value") * 100 + 0.5)).cast("long")


@register(
    "q_ohlc_bars",
    oracle="""
    SELECT user_id, STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           FIRST(value ORDER BY ts, event_id) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           LAST(value ORDER BY ts, event_id) AS close,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    WHERE user_id % 5 = 0
    GROUP BY user_id, CAST(ts AS DATE)
    ORDER BY user_id, day
    """,
    tags=("analytics", "timeseries", "ohlc"),
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily OHLC bars — the time-bucket rollup every metrics
    hypertable serves. open/close are min_by/max_by over the total
    (ts, event_id) order; high/low are plain min/max. All outputs are
    PICKED doubles (never summed), so they are exact. One hash aggregate
    keyed (user, day) — partial aggregation makes this a single shuffle
    of one row per bar at any scale."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 5 == 0)
    key = F.struct("ts", "event_id")
    return (
        e.groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "user_id",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "open", "high", "low", "close", "n",
        )
        .orderBy("user_id", "day")
    )


@register(
    "q_rolling_7d",
    oracle="""
    SELECT event_id,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY DATE_TRUNC('second', ts)
               RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS sum_cents_7d,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY DATE_TRUNC('second', ts)
               RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_7d
    FROM events
    QUALIFY event_id % 31 = 0
    ORDER BY event_id
    """,
    tags=("analytics", "timeseries", "rolling-window"),
)
def q_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-7-day rolling sum/count via a time-RANGE window
    frame (orderBy epoch seconds, rangeBetween(-604800, 0)) — the frame is
    defined by TIME, not row count, so sparse and dense users get the same
    semantics. Values are summed as integer cents (exact). One window
    shuffle on user_id; frame evaluation is a per-partition sorted sweep,
    O(events) state — the same plan at 100 TB. DuckDB orders by
    second-truncated ts so RANGE peers match Spark's epoch-second key."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-7 * 86400, 0)
    )
    return (
        e.select(
            "event_id",
            F.sum(_cents()).over(w).alias("sum_cents_7d"),
            F.count(F.lit(1)).over(w).alias("n_7d"),
        )
        .filter(F.col("event_id") % 31 == 0)
        .orderBy("event_id")
    )


@register(
    "q_scd2_intervals",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events WHERE user_id % 7 = 0
    ), changes AS (
        SELECT user_id, ts, event_id, event_type FROM ordered
        WHERE prev_type IS NULL OR prev_type != event_type
    )
    SELECT user_id, event_type,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           COALESCE(STRFTIME(LEAD(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id),
                    '%Y-%m-%d %H:%M:%S.%f'),
                    '9999-12-31 00:00:00.000000') AS valid_to,
           CAST(LEAD(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                IS NULL AS INT) AS is_current
    FROM changes
    ORDER BY user_id, valid_from
    """,
    tags=("analytics", "scd2", "cdc"),
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from an event changelog: consecutive
    duplicate states collapse (lag != current keeps only transitions),
    each surviving transition becomes a validity interval
    [ts, next-transition ts) with an is_current flag on the open row.
    Two windows over the SAME (user_id, ts-order) partitioning — Spark
    reuses the sort across them, so the whole build is one shuffle."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select(
            "user_id", "ts", "event_id", "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    lead_ts = F.lead("ts").over(w)
    return (
        changes.select(
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_from"),
            F.coalesce(
                F.date_format(lead_ts, "yyyy-MM-dd HH:mm:ss.SSSSSS"),
                F.lit("9999-12-31 00:00:00.000000"),
            ).alias("valid_to"),
            lead_ts.isNull().cast("int").alias("is_current"),
        )
        .orderBy("user_id", "valid_from")
    )


@register(
    "q_zscore_outliers",
    oracle="""
    WITH c AS (
        SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ), stats AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(SUM(cents * cents) AS BIGINT) AS s2
        FROM c GROUP BY event_type
    )
    SELECT c.event_type AS event_type,
           CAST(SUM(CASE WHEN (c.cents * st.n - st.s) * (c.cents * st.n - st.s)
                              > 4 * (st.n * st.s2 - st.s * st.s)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM c JOIN stats st USING (event_type)
    GROUP BY 1 ORDER BY 1
    """,
    tags=("analytics", "anomaly", "zscore"),
)
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score outlier counts (|z| > 2) per event_type, with
    the threshold evaluated as the cross-multiplied integer inequality
    (c·n − Σ)² > 4·(n·Σc² − Σ²) — algebraically identical to
    ((c−μ)/σ)² > 4 but exact in BIGINT, so a borderline row can never
    flip on float rounding. Two passes over the scan: a 5-row stats
    aggregate broadcast back onto the rows (no second shuffle of the
    fact side). BIGINT headroom holds to ~10⁹ rows/group at this value
    range; beyond that the products move to DECIMAL(38,0)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", _cents().alias("cents")
    )
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
    )
    dev = F.col("cents") * F.col("n") - F.col("s")
    is_out = (dev * dev) > 4 * (F.col("n") * F.col("s2") - F.col("s") * F.col("s"))
    return (
        e.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(is_out.cast("long")).alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "q_decay_scores",
    oracle="""
    SELECT user_id,
           CAST(SUM((CAST(FLOOR(value * 100 + 0.5) AS BIGINT) * 1000000)
                    // CAST(POWER(2, DATE_DIFF('day', CAST(ts AS DATE),
                                               DATE '2024-02-01') // 7)
                            AS BIGINT)) AS BIGINT) AS decayed_micro,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY user_id ORDER BY user_id
    """,
    tags=("analytics", "decay", "engagement"),
)
def q_decay_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement score per user with a 1-week
    half-life, anchored at a FIXED as-of date (2024-02-01 — decay must be
    reproducible, never wall-clock). Each event contributes
    cents·10⁶ DIV 2^age_weeks — a power-of-two integer divide, so the
    whole score is exact BIGINT and order-independent. One hash aggregate
    on user_id; the decay weight is computed in the scan projection."""
    e = load_table(spark, sf_dir, "events")
    micro = F.expr(
        "(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) * 1000000L) "
        "DIV shiftleft(1L, CAST(datediff(DATE'2024-02-01', to_date(ts)) DIV 7 AS INT))"
    )
    return (
        e.groupBy("user_id")
        .agg(
            F.sum(micro).alias("decayed_micro"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("user_id")
    )


@register(
    "q_approx_quantile",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("analytics", "sketch", "quantile"),
)
def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approximate quantiles (Greenwald-Khanna) of integer
    cents per event_type at accuracy 10000 (rank error <= n/10000). The
    sketch is what a 100 TB scan ships: partial sketches merge
    associatively in the combine, so no sorted global pass ever happens.
    Sketch values are engine-specific, so the oracle checks exact group
    counts plus booleans pinning each approximate quantile inside the
    exact [q-0.005, q+0.005] quantile envelope (50x the sketch's
    guaranteed rank error); exact-value bounds in tests/test_analytics.py."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", _cents().alias("cents")
    )
    qs = F.expr(
        "percentile(cents, array(0.495, 0.505, 0.895, 0.905, 0.985, 0.995))"
    )
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.percentile_approx("cents", [0.5, 0.9, 0.99], 10000).alias("q"),
            qs.alias("env"),
        )
        .select(
            "event_type",
            "n",
            ((F.col("q")[0] >= F.col("env")[0]) & (F.col("q")[0] <= F.col("env")[1])).alias("p50_ok"),
            ((F.col("q")[1] >= F.col("env")[2]) & (F.col("q")[1] <= F.col("env")[3])).alias("p90_ok"),
            ((F.col("q")[2] >= F.col("env")[4]) & (F.col("q")[2] <= F.col("env")[5])).alias("p99_ok"),
        )
        .orderBy("event_type")
    )
