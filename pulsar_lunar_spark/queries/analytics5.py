"""Sequence + robust-statistics queries, batch 13 (SURVEY §2B north
star): first-order Markov transition estimation over per-user event
sequences, hour-of-week seasonality profiling, and MAD-based robust
outlier detection with fully exact arithmetic.

Determinism discipline: transition probabilities are exact ppm ratios;
the MAD pipeline doubles every quantity (2x, 2·median, 2·MAD are all
integers because a median of integers ends in .0 or .5) so the robust
z-score threshold is a pure BIGINT comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import load_table


@register(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS cur,
               LEAD(event_type) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ), t AS (
        SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ), m AS (
        SELECT cur, CAST(SUM(n) AS BIGINT) AS row_n FROM t GROUP BY 1
    )
    SELECT t.cur AS cur, t.nxt AS nxt, n,
           CAST((1000000 * n) // m.row_n AS BIGINT) AS p_ppm
    FROM t JOIN m USING (cur)
    ORDER BY cur, nxt
    """,
    tags=("analytics", "markov", "sequence"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams
    (the session-model behind next-action prediction and bot detection):
    LEAD over the total (ts, event_id) order pairs each event with its
    successor, one hash aggregate counts transitions, and probabilities
    are exact ppm ratios against broadcast row totals. One window shuffle
    on user_id + one K²-row aggregate — K (event types) is tiny, the
    window is the only data-sized stage."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    t = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    m = t.groupBy("cur").agg(F.sum("n").alias("row_n"))
    return (
        t.join(F.broadcast(m), "cur")
        .select(
            "cur", "nxt", "n",
            F.expr("(1000000L * n) DIV row_n").alias("p_ppm"),
        )
        .orderBy("cur", "nxt")
    )


@register(
    "q_seasonality",
    oracle="""
    SELECT CAST((ISODOW(ts) - 1) * 24 + HOUR(ts) AS BIGINT) AS hour_of_week,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
    tags=("analytics", "timeseries", "seasonality"),
)
def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week activity profile (0 = Monday 00h .. 167 = Sunday 23h)
    — the seasonality fingerprint used for traffic normalization and
    anomaly baselining. The bucket is computed in the scan projection
    (ISO weekday + hour, both engines share the ISO convention); one
    168-row hash aggregate with exact integer-cents sums."""
    e = load_table(spark, sf_dir, "events")
    how = (
        (F.expr("weekday(ts)")) * 24 + F.hour("ts")
    ).cast("long")  # weekday(): Monday=0, matches ISODOW-1
    return (
        e.groupBy(how.alias("hour_of_week"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)")).alias(
                "sum_cents"
            ),
        )
        .orderBy("hour_of_week")
    )


@register(
    "q_mad_outliers",
    oracle="""
    WITH c AS (
        SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ), med AS (
        SELECT event_type,
               CAST(2 * MEDIAN(cents) AS BIGINT) AS med2
        FROM c GROUP BY 1
    ), dev AS (
        SELECT c.event_type AS event_type, c.cents,
               ABS(2 * c.cents - med.med2) AS d2
        FROM c JOIN med USING (event_type)
    ), mad AS (
        SELECT event_type, CAST(2 * MEDIAN(d2) AS BIGINT) AS mad4
        FROM dev GROUP BY 1
    )
    SELECT dev.event_type AS event_type,
           CAST(SUM(CASE WHEN 20000 * dev.d2 > 3 * 14826 * mad.mad4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM dev JOIN mad USING (event_type)
    GROUP BY 1 ORDER BY 1
    """,
    tags=("analytics", "robust-stats", "mad"),
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts via the median-absolute-deviation rule
    (|x − med| > 3·1.4826·MAD — the robust z-score that, unlike
    q_zscore_outliers, no single corrupt value can mask). Exactness
    trick: every quantity is DOUBLED before use — a median of BIGINTs
    ends in .0 or .5, so 2·median, the doubled deviations |2x − 2med|,
    and 2·MAD are all exact integers (a cast of a .5-ending double
    would TRUNCATE in Spark but ROUND in DuckDB — doubling first removes
    the fraction entirely), and the 1.4826 constant becomes the integer
    cross-multiplication 20000·d2 > 44478·mad4. Two median
    passes (exact single-column percentile per 5-key group) + broadcast
    joins back onto the scan."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents")
    )
    med = e.groupBy("event_type").agg(
        (2 * F.expr("percentile(cents, 0.5)")).cast("long").alias("med2")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(2 * F.col("cents") - F.col("med2")).alias("d2"),
    )
    mad = dev.groupBy("event_type").agg(
        (2 * F.expr("percentile(d2, 0.5)")).cast("long").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                (20000 * F.col("d2") > 3 * 14826 * F.col("mad4")).cast("long")
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )
