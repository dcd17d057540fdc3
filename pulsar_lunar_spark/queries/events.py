"""Event-stream semantics, batch-verified (SURVEY §2B streaming row, §2C).

These queries exercise the engine's stream-shaped operators (tumbling /
sliding windows, sessionization, compacted reads, as-of enrichment,
first/last-by-time) in batch mode so the DuckDB oracle can check them
hash-exact. The same operators run under Structured Streaming in
``pulsar_lunar_spark.streaming`` (tested separately — streaming output
is checked by the streaming test suite, not the SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_lunar_spark.operators.asof import asof_join
from pulsar_lunar_spark.operators.compaction import compacted_latest_by_key
from pulsar_lunar_spark.session import load_table
from pulsar_lunar_spark.queries.registry import register


@register(
    "q_events_tumbling",
    oracle="""
    SELECT STRFTIME(TIME_BUCKET(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY win_start, event_type
    """,
    tags=("streaming", "window-agg"),
)
def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (same F.window the streaming path
    uses with a watermark)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("win_start", "event_type")
    )


@register(
    "q_events_sliding",
    oracle="""
    WITH shifted AS (
        SELECT TIME_BUCKET(INTERVAL 30 MINUTE, ts) - (i * INTERVAL 30 MINUTE) AS win_start,
               value
        FROM events, (VALUES (0), (1)) t(i)
    )
    SELECT STRFTIME(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           COUNT(*) AS n,
           FLOOR((ROUND(SUM(value), 6) / COUNT(*)) * 10000 + 0.5) / 10000 AS avg_value
    FROM shifted
    GROUP BY 1
    ORDER BY win_start
    """,
    tags=("streaming", "window-agg"),
)
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1 hour long, every 30 minutes (each event lands in 2
    windows — the oracle reproduces that by unioning two shifted buckets)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # boundary-proof portable rounding: Spark's round() goes through
            # the shortest decimal string of the double (73.91375 -> .9138)
            # while DuckDB rounds the binary value (73.9137499.. -> .9137);
            # floor(x*1e4 + 0.5) is bit-identical half-up in both engines
            (F.floor((F.round(F.sum("value"), 6) / F.count(F.lit(1))) * 10000 + 0.5) / 10000).alias(
                "avg_value"
            ),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n",
            "avg_value",
        )
        .orderBy("win_start")
    )


@register(
    "q_events_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST(EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts)) AS BIGINT) AS duration_us,
           ROUND(SUM(value), 4) AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    tags=("streaming", "session"),
)
def q_events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap (batch gaps-and-islands
    twin of F.session_window; one shuffle by user, in-partition sort)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gap_us = 1800 * 1_000_000
    flagged = e.select(
        "user_id",
        "ts",
        "value",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.select(
        "user_id",
        "ts",
        "value",
        F.sum("new_session").over(w_cum).cast("bigint").alias("session_id"),
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "q_events_session_dynamic",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, value, event_id,
               EPOCH_US(ts) AS ts_us,
               CAST(CASE event_type WHEN 'purchase' THEN 3600
                                    WHEN 'click' THEN 1800
                                    WHEN 'view' THEN 1800
                                    ELSE 900 END AS BIGINT) * 1000000 AS gap_us
        FROM events
    ), flagged AS (
        SELECT user_id, ts, value, ts_us, gap_us,
               CASE WHEN MAX(ts_us + gap_us) OVER w IS NULL
                         OR ts_us >= MAX(ts_us + gap_us) OVER w
                    THEN 1 ELSE 0 END AS new_session
        FROM g
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), sessions AS (
        SELECT user_id, ts, value, ts_us, gap_us,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, ts_us
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
        FROM flagged
    )
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           STRFTIME(MAKE_TIMESTAMP(MAX(ts_us + gap_us)),
                    '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    tags=("streaming", "session", "dynamic-gap"),
)
def q_events_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap sessionization: F.session_window with a PER-EVENT gap
    expression (purchases hold a session open 60 min, clicks/views 30,
    everything else 15) — each event contributes the interval
    [ts, ts + gap(event)) and overlapping intervals merge. The oracle is
    the exact gaps-and-islands twin: a session breaks when the event's
    start is at or past the running max of all previous interval ends.
    One shuffle on user_id; the same expression runs unchanged under
    Structured Streaming (session_window supports dynamic gaps there too).
    """
    e = load_table(spark, sf_dir, "events")
    # session_window's dynamic gap must be CalendarIntervalType —
    # make_interval produces it; INTERVAL literals are DayTimeIntervalType
    # and are rejected at analysis.
    gap = F.make_interval(
        mins=F.when(F.col("event_type") == "purchase", F.lit(60))
        .when(F.col("event_type").isin("click", "view"), F.lit(30))
        .otherwise(F.lit(15))
    )
    return (
        e.groupBy(F.session_window(F.col("ts"), gap).alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("s.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format(F.col("s.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_end"
            ),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "q_events_compacted",
    oracle="""
    SELECT user_id, event_type AS last_event_type,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
           ROUND(value, 4) AS last_value
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
    tags=("streaming", "compaction"),
)
def q_events_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compacted-topic view: newest message per key (Pulsar read_compacted,
    /root/reference/src/PulsarApi.proto:325) via the compaction operator."""
    e = load_table(spark, sf_dir, "events")
    latest = compacted_latest_by_key(e, ["user_id"], ["ts", "event_id"])
    return latest.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
        F.round("value", 4).alias("last_value"),
    ).orderBy("user_id")


@register(
    "q_events_asof",
    oracle="""
    SELECT p.event_id,
           STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           ROUND(c.value, 4) AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    tags=("join", "asof"),
)
def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase enriched with the user's latest prior click
    (union + carry-forward window — one shuffle, no range explosion)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts", payload_cols=["value"]
    )
    return joined.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.date_format("ts_asof", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.round("value_asof", 4).alias("click_value"),
    ).orderBy("event_id")


@register(
    "q_events_asof_tolerance",
    oracle="""
    SELECT p.event_id,
           STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           CASE WHEN FLOOR(EPOCH(p.ts)) - FLOOR(EPOCH(c.ts)) <= 3600
                THEN STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S.%f') END AS click_ts,
           CASE WHEN FLOOR(EPOCH(p.ts)) - FLOOR(EPOCH(c.ts)) <= 3600
                THEN ROUND(c.value, 4) END AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    tags=("join", "asof", "tolerance"),
)
def q_events_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance bound (pandas merge_asof semantics):
    the latest prior click counts only if it is within 1 hour of the
    purchase — stale state older than the tolerance enriches as NULL
    instead of carrying forward forever (the freshness contract a
    feature-store lookup needs). Same single-shuffle union+window
    machinery; the tolerance is a post-window predicate on floored epoch
    seconds, replicated exactly in the oracle's CASE guard."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        payload_cols=["value"], tolerance_seconds=3600,
    )
    return joined.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.date_format("ts_asof", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.round("value_asof", 4).alias("click_value"),
    ).orderBy("event_id")


@register(
    "q_events_asof_forward",
    oracle="""
    SELECT c.event_id,
           STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS next_purchase_ts,
           ROUND(p.value, 4) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    ORDER BY c.event_id
    """,
    tags=("join", "asof", "forward"),
)
def q_events_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each click enriched with the user's NEXT purchase
    at or after it — the time-to-conversion enrichment. Same union +
    window machinery as the backward join (one shuffle, no range
    explosion), with the frame flipped to currentRow..unboundedFollowing
    and FIRST ignorenulls."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    joined = asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        payload_cols=["value"], direction="forward",
    )
    return joined.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        F.date_format("ts_asof", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("next_purchase_ts"),
        F.round("value_asof", 4).alias("purchase_value"),
    ).orderBy("event_id")


@register(
    "q_events_first_last",
    oracle="""
    SELECT user_id,
           MIN_BY(event_type, ts) AS first_type,
           MAX_BY(event_type, ts) AS last_type,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
           STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
           COUNT(*) AS n
    FROM events
    WHERE user_id <= 20
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("agg", "streaming"),
)
def q_events_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last-by-event-time per key (min_by/max_by aggregates)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    return (
        e.groupBy("user_id")
        .agg(
            F.min_by("event_type", "ts").alias("first_type"),
            F.max_by("event_type", "ts").alias("last_type"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("first_ts"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("user_id")
    )


@register(
    "q_events_islands",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events WHERE user_id <= 30
    ), islands AS (
        SELECT user_id,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW) AS session_no
        FROM gaps
    )
    SELECT user_id,
           CAST(COUNT(DISTINCT session_no) AS BIGINT) AS n_sessions,
           CAST(MAX(cnt) AS BIGINT) AS max_session_events
    FROM (SELECT user_id, session_no, COUNT(*) AS cnt
          FROM islands GROUP BY user_id, session_no)
    GROUP BY user_id ORDER BY user_id
    """,
    tags=("window", "sessionization", "gaps-islands"),
)
def q_events_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (the relational equivalent of
    F.session_window, q_events_session): lag-gap flag -> running sum =
    session number -> per-session counts. Two windows over one user_id
    shuffle; at scale this is the batch-replay twin of the streaming
    session operator."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 30)
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-exact gap: matches the oracle's `ts - LAG(ts) > INTERVAL
    # 30 MINUTE` even for sub-second timestamps (load_table normalizes all
    # timestamps to TIMESTAMP, so unix_micros is always applicable).
    ts_us = F.unix_micros(F.col("ts"))
    gap = ts_us - F.lag(ts_us).over(w_order)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap > 30 * 60 * 1_000_000, 1).otherwise(0).alias("new_session"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.select(
        "user_id", F.sum("new_session").over(w_run).alias("session_no")
    )
    per_session = islands.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.countDistinct("session_no").cast("bigint").alias("n_sessions"),
            F.max("cnt").cast("bigint").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


@register(
    "q_events_ffill",
    oracle="""
    SELECT event_id, user_id,
           ROUND(LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END
                            IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               AS last_purchase_value
    FROM events
    WHERE user_id <= 20
    ORDER BY user_id, event_id
    """,
    tags=("window", "timeseries", "ffill"),
)
def q_events_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (time-series gap fill): carry the last purchase value
    forward across each user's event stream — `last(ignorenulls)` over a
    running frame, the standard interpolation primitive. At scale the
    window shuffles once on user_id; no state beyond one value per row."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sparse = F.when(F.col("event_type") == "purchase", F.col("value"))
    return (
        e.select(
            "event_id",
            "user_id",
            F.round(F.last(sparse, ignorenulls=True).over(w), 4).alias(
                "last_purchase_value"
            ),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "q_events_collect",
    oracle="""
    SELECT event_type,
           STRING_AGG(DISTINCT CAST(user_id AS VARCHAR), ','
                      ORDER BY CAST(user_id AS VARCHAR)) AS users_sorted,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE user_id <= 15
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("agg", "collect"),
)
def q_events_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set -> sorted string (bounded key domain, so the collected
    set is small — unbounded collect_list at scale is forbidden, SURVEY §4)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 15)
    return (
        e.groupBy("event_type")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set(F.col("user_id").cast("string"))), ","
            ).alias("users_sorted"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )
