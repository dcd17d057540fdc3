"""Time-series regularization (linear interpolation, time-weighted average)
and dataset snapshot diffing.

These extend the hypertable-rollup family (densify/ffill/OHLC/rolling in
queries/pipeline.py and events.py) with the two remaining continuous-
aggregate staples — linear gap-fill interpolation and LOCF time-weighted
averages — plus a CDC-style snapshot diff, the audit primitive a
100 TB training-data pipeline runs after every ingestion batch.

Determinism discipline: all interpolation/weighting math is integer
(value in micro-units via FLOOR(value*1e6); time in epoch seconds), and
integer division is Spark `DIV` vs DuckDB `//` — both truncate toward
zero (verified, including negatives), so every emitted value is exact
cross-engine. No floats ever cross an aggregation boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import load_table

_INTERP_ORACLE = """
WITH obs AS (
    SELECT user_id,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t_s,
           CAST(FLOOR(value * 1000000) AS BIGINT) AS v_u
    FROM events WHERE user_id <= 10
), bounds AS (
    SELECT user_id, MIN(t_s) // 3600 AS h0, MAX(t_s) // 3600 AS h1
    FROM obs GROUP BY user_id
), grid AS (
    SELECT user_id, UNNEST(GENERATE_SERIES(h0, h1)) * 3600 AS t_s
    FROM bounds
), u AS (
    SELECT user_id, t_s, v_u, 0 AS is_grid, t_s AS obs_t FROM obs
    UNION ALL
    SELECT user_id, t_s, NULL, 1, NULL FROM grid
), filled AS (
    SELECT user_id, t_s, is_grid,
           LAST_VALUE(v_u IGNORE NULLS) OVER wp AS prev_v,
           LAST_VALUE(obs_t IGNORE NULLS) OVER wp AS prev_t,
           FIRST_VALUE(v_u IGNORE NULLS) OVER wn AS next_v,
           FIRST_VALUE(obs_t IGNORE NULLS) OVER wn AS next_t
    FROM u
    WINDOW wp AS (PARTITION BY user_id
                  ORDER BY t_s, is_grid, v_u ASC NULLS FIRST
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wn AS (PARTITION BY user_id
                  ORDER BY t_s, is_grid, v_u ASC NULLS FIRST
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, t_s,
       CASE WHEN prev_v IS NULL THEN next_v
            WHEN next_v IS NULL THEN prev_v
            WHEN next_t = prev_t THEN prev_v
            ELSE prev_v + (next_v - prev_v) * (t_s - prev_t) // (next_t - prev_t)
       END AS interp_u
FROM filled WHERE is_grid = 1
ORDER BY user_id, t_s
"""


@register("q_events_interpolate", oracle=_INTERP_ORACLE,
          tags=("timeseries", "interpolate", "gapfill"))
def q_events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap-fill interpolation onto a regular hourly grid (the
    hypertable `interpolate()` rollup): union the observation stream with
    generated grid points, then one window pass per direction recovers the
    surrounding observations, and the interpolated value is exact integer
    math in micro-units.

    Scale shape: the grid is `sequence()`-generated per user (no driver
    loop), the union shuffles ONCE on user_id and both window directions
    share that sort — O(rows + grid) with a single exchange, the same
    plan at 100 TB. Grid points outside the observed range back/forward
    fill from the nearest endpoint."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 10)
    obs = e.select(
        "user_id",
        F.unix_timestamp("ts").alias("t_s"),
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("v_u"),
    )
    bounds = obs.groupBy("user_id").agg(
        F.expr("min(t_s) div 3600").alias("h0"),
        F.expr("max(t_s) div 3600").alias("h1"),
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("h")
    ).select("user_id", (F.col("h") * 3600).alias("t_s"))
    u = obs.select(
        "user_id", "t_s", "v_u", F.lit(0).alias("is_grid"),
        F.col("t_s").alias("obs_t"),
    ).unionAll(
        grid.select(
            "user_id", "t_s", F.lit(None).cast("bigint").alias("v_u"),
            F.lit(1).alias("is_grid"), F.lit(None).cast("bigint").alias("obs_t"),
        )
    )
    order = [F.col("t_s"), F.col("is_grid"), F.col("v_u").asc_nulls_first()]
    wp = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = u.select(
        "user_id", "t_s", "is_grid",
        F.last("v_u", ignorenulls=True).over(wp).alias("prev_v"),
        F.last("obs_t", ignorenulls=True).over(wp).alias("prev_t"),
        F.first("v_u", ignorenulls=True).over(wn).alias("next_v"),
        F.first("obs_t", ignorenulls=True).over(wn).alias("next_t"),
    )
    interp = (
        F.when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .when(F.col("next_t") == F.col("prev_t"), F.col("prev_v"))
        .otherwise(
            F.col("prev_v")
            + F.expr(
                "(next_v - prev_v) * (t_s - prev_t) div (next_t - prev_t)"
            )
        )
    )
    return (
        filled.filter(F.col("is_grid") == 1)
        .select("user_id", "t_s", interp.alias("interp_u"))
        .orderBy("user_id", "t_s")
    )


_TWA_ORACLE = """
WITH obs AS (
    SELECT user_id,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t_s,
           CAST(FLOOR(value * 1000000) AS BIGINT) AS v_u,
           event_id
    FROM events
), seg AS (
    SELECT user_id, v_u,
           LEAD(t_s) OVER (PARTITION BY user_id ORDER BY t_s, event_id) - t_s
               AS dur_s,
           t_s
    FROM obs
)
SELECT user_id,
       CAST(SUM(v_u * dur_s) AS BIGINT) AS twa_num,
       MAX(t_s) - MIN(t_s) AS twa_den,
       CAST(SUM(v_u * dur_s) AS BIGINT) // (MAX(t_s) - MIN(t_s)) AS twa_u
FROM seg
GROUP BY user_id
HAVING MAX(t_s) > MIN(t_s)
ORDER BY user_id
"""


@register("q_time_weighted_avg", oracle=_TWA_ORACLE,
          tags=("timeseries", "twa", "rollup"))
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user (LOCF step integral — the hypertable
    `time_weight('LOCF')` rollup): each observation holds its value until
    the next one, so the integral is sum(v_i * (t_{i+1} - t_i)) over the
    observed span. Irregular sampling makes the plain AVG wrong; this is
    the correct aggregate for sensor/price streams.

    One window (LEAD) and the groupBy share a single user_id exchange;
    integer micro-unit values x second durations stay < 2^63 by ~6 orders
    of magnitude at any SF. The last observation of each user carries no
    weight (null dur drops from the sum) — standard LOCF endpoint rule."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("t_s", "event_id")
    obs = e.select(
        "user_id",
        F.unix_timestamp("ts").alias("t_s"),
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("v_u"),
        "event_id",
    )
    seg = obs.select(
        "user_id", "v_u", "t_s",
        (F.lead("t_s").over(w) - F.col("t_s")).alias("dur_s"),
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.sum(F.col("v_u") * F.col("dur_s")).cast("bigint").alias("twa_num"),
            (F.max("t_s") - F.min("t_s")).alias("twa_den"),
            F.expr(
                "cast(sum(v_u * dur_s) as bigint) div (max(t_s) - min(t_s))"
            ).alias("twa_u"),
        )
        .filter(F.col("twa_den") > 0)
        .orderBy("user_id")
    )


_DIFF_ORACLE = """
WITH v1 AS (
    SELECT o_orderkey AS k,
           CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
    FROM orders WHERE o_orderkey % 5 <> 0
), v2 AS (
    SELECT o_orderkey AS k,
           CAST(FLOOR(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END AS price_c
    FROM orders WHERE o_orderkey % 7 <> 0
), d AS (
    SELECT COALESCE(v1.k, v2.k) AS k,
           CASE WHEN v1.k IS NULL THEN 'added'
                WHEN v2.k IS NULL THEN 'removed'
                WHEN v1.price_c <> v2.price_c THEN 'changed'
                ELSE 'unchanged' END AS status,
           COALESCE(v2.price_c, 0) - COALESCE(v1.price_c, 0) AS delta_c
    FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
)
SELECT status, COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS sum_keys,
       CAST(SUM(delta_c) AS BIGINT) AS sum_delta_c
FROM d GROUP BY status ORDER BY status
"""


@register("q_snapshot_diff", oracle=_DIFF_ORACLE,
          tags=("cdc", "diff", "audit"))
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset snapshot diff (CDC audit): classify every key across two
    snapshot versions as added / removed / changed / unchanged via one
    full-outer join on the key, and report counts + exact key/delta sums
    per class — the post-ingest audit a pipeline runs between versions
    (the batch twin of maintenance.merge_upsert's change feed).

    The two versions are deterministic modular slices of orders (v2 drops
    multiples of 7, adds back multiples of 5, and perturbs every 3rd
    price by one cent). One key-equi join — bucketable at 100 TB — and
    integer cents throughout."""
    o = load_table(spark, sf_dir, "orders")
    price_c = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    v1 = o.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("k"), price_c.alias("price_c")
    )
    v2 = o.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k"),
        (
            price_c
            + F.when(F.col("o_orderkey") % 3 == 0, F.lit(1)).otherwise(F.lit(0))
        ).alias("price_c"),
    )
    j = v1.alias("a").join(v2.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer")
    d = j.select(
        F.coalesce(F.col("a.k"), F.col("b.k")).alias("k"),
        F.when(F.col("a.k").isNull(), F.lit("added"))
        .when(F.col("b.k").isNull(), F.lit("removed"))
        .when(F.col("a.price_c") != F.col("b.price_c"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        (
            F.coalesce(F.col("b.price_c"), F.lit(0))
            - F.coalesce(F.col("a.price_c"), F.lit(0))
        ).alias("delta_c"),
    )
    return (
        d.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").cast("bigint").alias("sum_keys"),
            F.sum("delta_c").cast("bigint").alias("sum_delta_c"),
        )
        .orderBy("status")
    )


_GINI_ORACLE = """
WITH x AS (
    SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS v,
           ROW_NUMBER() OVER (ORDER BY FLOOR(o_totalprice * 100), o_orderkey) AS i
    FROM orders
), s AS (
    SELECT COUNT(*) AS n, SUM(v) AS tot, SUM(i * v) AS iv
    FROM x
)
SELECT n, CAST(tot AS BIGINT) AS tot,
       CAST((2 * iv - (n + 1) * tot) // ((n * tot) // 1000000) AS BIGINT)
           AS gini_ppm
FROM s
"""


@register("q_gini_index", oracle=_GINI_ORACLE, tags=("analytics", "inequality"))
def q_gini_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order values (the inequality / concentration
    audit a curation pipeline runs on source contributions): the exact
    rank formula G = (2·Σi·x_(i) − (n+1)·Σx) / (n·Σx) over integer cents
    with a total (value, key) tiebreak rank — moment sums widened to
    decimal(38,0) (int128 on the DuckDB side), emitted as a floor ppm
    ratio so both engines agree bit-exactly at any scale factor.

    One global sort (range exchange) + one aggregate; at 100 TB the same
    statistic is computed per-source with the sort partitioned by
    source."""
    o = load_table(spark, sf_dir, "orders")
    v = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    w = Window.orderBy(v, "o_orderkey")
    x = o.select(v.alias("v"), F.row_number().over(w).alias("i"))
    return x.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("bigint").alias("tot"),
        # moment sums in decimal(38,0): sum(i*v) ~ n^2/2 * avg_cents passes
        # 2^63 once orders exceed ~8e5 rows (sf0.5), and n*tot follows near
        # sf1 — DuckDB widens SUM to int128 automatically, Spark needs the
        # explicit decimal widening. `div` (IntegralDivide) on decimals is
        # exact integral division, identical to DuckDB's `//` on hugeint
        # (all terms positive), so the ppm value matches bit-exactly at any
        # scale factor.
        F.expr(
            "cast((2 * sum(cast(i as decimal(38,0)) * cast(v as decimal(38,0)))"
            "      - (count(1) + 1) * sum(cast(v as decimal(38,0))))"
            " div ((count(1) * sum(cast(v as decimal(38,0)))) div 1000000)"
            " as bigint)"
        ).alias("gini_ppm"),
    )


_BENFORD_ORACLE = """
WITH d AS (
    SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                AS INT) AS digit
    FROM orders WHERE o_totalprice >= 1
)
SELECT digit, COUNT(*) AS n,
       CAST(1000000 * COUNT(*) // SUM(COUNT(*)) OVER () AS BIGINT) AS share_ppm
FROM d GROUP BY digit ORDER BY digit
"""


@register("q_benford_digits", oracle=_BENFORD_ORACLE, tags=("analytics", "dq", "benford"))
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit (the anomaly screen for fabricated or
    truncated numeric feeds): leading-digit distribution of order values
    as exact counts + floor-ppm shares. A synthetic/capped price feed
    flattens the curve; the per-digit counts are the evidence. One scan +
    one 9-group aggregate — nothing at any scale beyond the scan."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = o.groupBy(digit.alias("digit")).agg(F.count(F.lit(1)).alias("n"))
    return counts.select(
        "digit",
        "n",
        F.expr("cast(1000000 * n div sum(n) over () as bigint)").alias("share_ppm"),
    ).orderBy("digit")
