"""Vector-compression + robust-mean + path-mining queries, batch 15
(SURVEY §2B north star): int8 scalar quantization of embeddings (the
memory-bandwidth lever for vector search), 5% trimmed means (robust
location), and top event paths (3-step sequence mining).

Determinism: quantization is pure per-element IEEE arithmetic (identical
double ops in both engines — the hazards are only aggregation ORDER and
transcendental libm calls, neither appears here); trimmed mean is exact
integer sums over exact rank bounds; paths are string counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import load_table


@register(
    "q_embed_quantize",
    oracle="""
    WITH dims AS (
        SELECT vec_id,
               UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(embedding)),
                      i -> {'pos': i - 1,
                            'x': CAST(embedding[i] AS DOUBLE)})) AS s
        FROM embeddings
    ), flat AS (
        SELECT vec_id, s.pos AS pos, s.x AS x FROM dims WHERE s.pos < 4
    ), rng AS (
        SELECT pos, MIN(x) AS lo, MAX(x) AS hi FROM flat GROUP BY pos
    )
    SELECT f.vec_id AS vec_id, f.pos AS pos,
           CAST(FLOOR((f.x - r.lo) * 255 / (r.hi - r.lo)) AS BIGINT) AS code,
           CAST(FLOOR(r.lo * 1000000 + 0.5) AS BIGINT) AS lo_micro,
           CAST(FLOOR(r.hi * 1000000 + 0.5) AS BIGINT) AS hi_micro
    FROM flat f JOIN rng r USING (pos)
    WHERE f.vec_id % 29 = 0
    ORDER BY f.vec_id, f.pos
    """,
    tags=("analytics", "embeddings", "quantization"),
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of embedding dims (shown for dims 0-3):
    per-dimension [min,max] ranges (exact picks) train the codebook, each
    value maps to floor((x-lo)·255/(hi-lo)) — pure per-element IEEE
    double arithmetic, bit-identical across engines, so even the floor
    boundaries agree. This is the 4x memory-bandwidth lever before ANN
    scan; ranges are a tiny broadcast, codes ride the scan. code=255 only
    at x=hi (the max itself)."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", F.posexplode(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")).alias("pos", "x")
    ).filter(F.col("pos") < 4)
    rng = flat.groupBy("pos").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    return (
        flat.join(F.broadcast(rng), "pos")
        .filter(F.col("vec_id") % 29 == 0)
        .select(
            "vec_id",
            "pos",
            F.floor((F.col("x") - F.col("lo")) * 255 / (F.col("hi") - F.col("lo")))
            .cast("long")
            .alias("code"),
            F.floor(F.col("lo") * 1000000 + 0.5).cast("long").alias("lo_micro"),
            F.floor(F.col("hi") * 1000000 + 0.5).cast("long").alias("hi_micro"),
        )
        .orderBy("vec_id", "pos")
    )


@register(
    "q_trimmed_mean",
    oracle="""
    WITH c AS (
        SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type,
           CAST(SUM(cents) AS BIGINT) AS kept_sum_cents,
           CAST(COUNT(*) AS BIGINT) AS kept_n
    FROM c
    WHERE rk > n * 5 // 100 AND rk <= n - n * 5 // 100
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("analytics", "robust-stats", "trimmed-mean"),
)
def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5% two-sided trimmed mean inputs per event_type: rank rows by
    (value, event_id) (total order), drop the bottom and top n·5//100
    ranks — EXACT integer rank bounds, no percentile interpolation —
    and emit the kept integer-cents sum and count (the mean is the
    rational sum/count, never divided into a float). One window shuffle
    + one hash aggregate."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    c = e.select(
        "event_type",
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    trim = F.expr("n * 5 DIV 100")
    return (
        c.filter((F.col("rk") > trim) & (F.col("rk") <= F.col("n") - trim))
        .groupBy("event_type")
        .agg(
            F.sum("cents").alias("kept_sum_cents"),
            F.count(F.lit(1)).alias("kept_n"),
        )
        .orderBy("event_type")
    )


@register(
    "q_top_paths",
    oracle="""
    WITH seq AS (
        SELECT event_type AS a,
               LEAD(event_type, 1) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS b,
               LEAD(event_type, 2) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS c
        FROM events
    )
    SELECT a || '>' || b || '>' || c AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE b IS NOT NULL AND c IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT 15
    """,
    tags=("analytics", "sequence", "path-mining"),
)
def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-step behavioral paths (the sequence-mining view behind
    navigation analysis): two LEADs over the same (user, time) window —
    one sort, one shuffle — then a K³-bounded path count with a total
    tiebreak. The window is the only data-sized stage."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    ).filter(F.col("b").isNotNull() & F.col("c").isNotNull())
    return (
        seq.groupBy(
            F.concat_ws(">", "a", "b", "c").alias("path")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(15)
    )


@register(
    "q_spatial_grid_join",
    oracle="""
    WITH pts AS (
        SELECT c_custkey AS id,
               (c_custkey * 48271) % 2000 AS x,
               (c_custkey * 69621) % 2000 AS y
        FROM customer WHERE c_custkey < 3000
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                AS BIGINT) AS dist2
    FROM pts a JOIN pts b
      ON a.id < b.id
     AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 2500
    ORDER BY id_a, id_b
    """,
    tags=("spatial", "grid-join", "bin-verify"),
)
def q_spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial self-join without a cross product: points land in 50x50 grid
    cells, one side explodes to its 3x3 cell neighborhood, candidates come
    from a plain equi-join on the cell key, and the exact distance
    predicate verifies — the bin-then-verify pattern that makes a radius
    join O(n * 9) shuffle rows instead of O(n^2) comparisons (same recipe
    at 100 TB with geohash/S2 cells). Each qualifying pair matches on
    exactly one neighbor offset (both home cells are fixed), so no
    dedup pass is needed. All-integer coordinates and distances, so the
    brute-force theta-join oracle is value-exact."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 3000)
    pts = c.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 48271) % 2000).alias("x"),
        ((F.col("c_custkey") * 69621) % 2000).alias("y"),
    )
    cell = pts.select(
        "id", "x", "y",
        (F.col("x") / 50).cast("long").alias("cx"),
        (F.col("y") / 50).cast("long").alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = cell.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(offsets).alias("o"),
        "cx", "cy",
    ).select(
        "id_a", "xa", "ya",
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
    )
    home = cell.select(
        F.col("id").alias("id_b"), F.col("x").alias("xb"), F.col("y").alias("yb"),
        "cx", "cy",
    )
    return (
        probe.join(home, ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            ((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
             + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
             ).cast("bigint").alias("dist2"),
        )
        .filter(F.col("dist2") <= 2500)
        .orderBy("id_a", "id_b")
    )


# CUSUM fold with packed state: acc = cusum + running_max * 2^31.
# cusum' = max(0, cusum + (cents - TARGET)); max' = max(max, cusum').
_CUSUM_TARGET = 50000  # cents
_CUSUM_P = 1 << 31


@register(
    "q_cusum_drift",
    oracle=f"""
    WITH seq AS (
        SELECT user_id,
               LIST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                    ORDER BY ts, event_id) AS cs
        FROM events WHERE user_id <= 40 GROUP BY user_id
    ), folded AS (
        SELECT user_id, LEN(cs) AS n,
               LIST_REDUCE(
                   LIST_PREPEND(CAST(0 AS BIGINT), cs),
                   (acc, c) -> (
                     GREATEST(CAST(0 AS BIGINT),
                              (acc & {_CUSUM_P - 1}) + c - {_CUSUM_TARGET})
                     | (GREATEST(acc >> 31,
                                 GREATEST(CAST(0 AS BIGINT),
                                          (acc & {_CUSUM_P - 1}) + c - {_CUSUM_TARGET}))
                        << 31))
               ) AS acc
        FROM seq
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           CAST(acc & {_CUSUM_P - 1} AS BIGINT) AS final_cusum,
           CAST(acc >> 31 AS BIGINT) AS max_cusum,
           (acc >> 31) > 2000000 AS drifted
    FROM folded ORDER BY user_id
    """,
    tags=("analytics", "cusum", "drift", "fold"),
)
def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection per user: cusum_t = max(0, cusum_{t-1} +
    (x_t - target)) — a running RECURRENCE no window frame can express
    (each step depends nonlinearly on the previous). Realized as an
    ordered in-group fold: collect the time-ordered cents, fold with a
    packed integer state (cusum + running_max * 2^31) — exact BIGINT
    arithmetic, so both engines produce identical values. Groups are
    per-user bounded, the documented collect_list discipline."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 40)
    seq = e.groupBy("user_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.unix_micros("ts").alias("t"),
                        F.col("event_id").alias("i"),
                        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"),
                    )
                )
            ),
            lambda s: s["c"],
        ).alias("cs")
    )
    mask = F.lit(_CUSUM_P - 1).cast("long")

    def _step(acc, c):
        # shift/mask, never divide: acc can reach 2^62, beyond exact
        # double-precision division
        cus = F.greatest(
            F.lit(0).cast("long"),
            acc.bitwiseAND(mask) + c - F.lit(_CUSUM_TARGET),
        )
        mx = F.greatest(F.shiftright(acc, 31), cus)
        return cus.bitwiseOR(F.shiftleft(mx, 31))

    folded = seq.select(
        "user_id",
        F.size("cs").cast("bigint").alias("n_events"),
        F.aggregate("cs", F.lit(0).cast("long"), _step).alias("acc"),
    )
    return folded.select(
        "user_id",
        "n_events",
        F.col("acc").bitwiseAND(mask).cast("bigint").alias("final_cusum"),
        F.shiftright(F.col("acc"), 31).cast("bigint").alias("max_cusum"),
        (F.shiftright(F.col("acc"), 31) > 2_000_000).alias("drifted"),
    ).orderBy("user_id")


@register(
    "q_ewma_smooth",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               LIST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                    ORDER BY ts, event_id) AS cs
        FROM events WHERE user_id <= 40 GROUP BY user_id
    )
    SELECT user_id,
           CAST(LEN(cs) AS BIGINT) AS n_events,
           CAST(LIST_REDUCE(
                    LIST_PREPEND(cs[1] * 256, cs),
                    (acc, c) -> acc + (c * 256 - acc) // 8
                ) AS BIGINT) AS ewma_x256
    FROM seq ORDER BY user_id
    """,
    tags=("analytics", "ewma", "smoothing", "fold"),
)
def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing (alpha = 1/8) per user — like CUSUM, a recurrence no
    window frame expresses. All-integer: values scale to cents x 256 so
    the alpha step is an exact floor division (e' = e + (x - e) DIV 8),
    seeded with the first value; both engines fold the identical
    arithmetic over the time-ordered list, so the final smoothed level
    hash-matches exactly."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 40)
    seq = e.groupBy("user_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.unix_micros("ts").alias("t"),
                        F.col("event_id").alias("i"),
                        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"),
                    )
                )
            ),
            lambda s: s["c"],
        ).alias("cs")
    )

    def _step(acc, c):
        # DuckDB's // TRUNCATES toward zero on negatives (floor would
        # differ when the level is above the new value): cast-after-divide
        # truncates identically, and the operands stay far inside double
        # exactness
        return acc + ((c * 256 - acc) / 8).cast("long")

    return seq.select(
        "user_id",
        F.size("cs").cast("bigint").alias("n_events"),
        F.aggregate(
            "cs",
            (F.element_at("cs", 1) * 256).cast("long"),
            _step,
        ).cast("bigint").alias("ewma_x256"),
    ).orderBy("user_id")
