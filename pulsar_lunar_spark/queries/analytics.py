"""Behavioral-analytics + fuzzy-matching queries, batch 8 (SURVEY §2B
north star): sequential funnel conversion, cohort retention, SymSpell
delete-neighborhood fuzzy join (the scale path for edit-distance entity
resolution), integer-exact PMI collocations, the bucketed rewrite of an
interval self-join (theta -> equi-join, the range-join scale path), and
per-group percent-rank feature normalization plus value histograms.

Determinism discipline: every output is integers, strings, or exact
rationals quantized with floor(x*1e4+0.5)/1e4 on BOTH sides; PMI is
ranked by an all-BIGINT scaled ratio (no transcendental log whose last
ulp could differ between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import load_table


@register(
    "q_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(e.ts) AS t1
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t0 GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t1 GROUP BY e.user_id
    )
    SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
    UNION ALL
    SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
    UNION ALL
    SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p
    ORDER BY stage
    """,
    tags=("analytics", "funnel"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential conversion funnel view -> click -> purchase: each stage
    is the users whose earliest qualifying event strictly follows their
    previous-stage timestamp. Three per-user MIN aggregates chained by
    equi-joins on user_id — every shuffle is on the same key, so at scale
    the stages co-locate and AQE broadcasts the shrinking stage frontier.

    The explicit repartition(user_id) right after the scan makes every
    branch (v feeds both its own count and c's join; c feeds its count and
    p) reuse ONE exchange instead of re-scanning events per consumer —
    the union references v 3x and c 2x, which without the shared exchange
    re-executed the scan 6 times."""
    e = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .repartition("user_id")
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )

    def stage(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(label).alias("stage"), "n_users"
        )

    return (
        stage(v, "1_view")
        .unionAll(stage(c, "2_click"))
        .unionAll(stage(p, "3_purchase"))
        .orderBy("stage")
    )


@register(
    "q_cohort_retention",
    oracle="""
    WITH f AS (
        SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS w0
        FROM events GROUP BY user_id
    ), a AS (
        SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS w FROM events
    )
    SELECT STRFTIME(f.w0, '%Y-%m-%d') AS cohort_week,
           CAST(DATE_DIFF('day', f.w0, a.w) // 7 AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("analytics", "cohort", "retention"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity ISO week,
    counted in each later week they remained active. The (user, week)
    de-dup happens BEFORE the join, so the join input is bounded by
    users x active-weeks, not raw events — the shape that survives a
    100 TB event log. Both shuffles key on user_id."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first = e.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("w0"))
    act = e.select("user_id", F.date_trunc("week", "ts").alias("w")).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            F.date_format("w0", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("w", "w0") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "q_fuzzy_neighbors",
    oracle="""
    WITH c AS (
        SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 2000
    )
    SELECT a.c_custkey AS c_custkey, CAST(COUNT(*) AS BIGINT) AS n_neighbors
    FROM c a JOIN c b
      ON a.c_custkey != b.c_custkey AND LEVENSHTEIN(a.c_name, b.c_name) <= 1
    GROUP BY 1 ORDER BY 1
    """,
    tags=("analytics", "fuzzy", "entity-resolution"),
)
def q_fuzzy_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance<=1 neighbor counts via the SymSpell delete-
    neighborhood: each name expands to its single-deletion variants (+
    itself, O(len) rows), candidates are pairs sharing a variant (an
    EQUI-join on the variant string — lev<=1 implies a shared variant),
    then the exact levenshtein filter prunes false candidates (shared
    variant allows lev 2, e.g. 'ab'/'ba'). The oracle is the O(n^2)
    cross-join spec; the engine plan is O(n*len) explode + hash join —
    the only formulation that survives n in the billions."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 2000)
        .select("c_custkey", "c_name")
    )
    variants = F.array_distinct(
        F.expr(
            "transform(sequence(0, length(c_name)), i -> "
            "IF(i = 0, c_name, "
            "concat(substring(c_name, 1, i-1), substring(c_name, i+1))))"
        )
    )
    # repartition on the join key: the self-join's two children are the
    # same subplan, and sharing one hash exchange on v makes Spark compute
    # the explode ONCE (exchange reuse) instead of racing two copies
    ex = cust.select("c_custkey", "c_name", F.explode(variants).alias("v")).repartition(
        "v"
    )
    a = ex.alias("a")
    b = ex.alias("b")
    pairs = (
        a.join(b, "v")
        .filter(F.col("a.c_custkey") < F.col("b.c_custkey"))
        .select(
            F.col("a.c_custkey").alias("ka"),
            F.col("b.c_custkey").alias("kb"),
            F.col("a.c_name").alias("na"),
            F.col("b.c_name").alias("nb"),
        )
        .distinct()
        .filter(F.levenshtein("na", "nb") <= 1)
    )
    # one pass over pairs: explode each confirmed pair to both endpoints
    # (a union of two selects would re-execute the join per branch)
    sym = pairs.select(F.explode(F.array("ka", "kb")).alias("c_custkey"))
    return (
        sym.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n_neighbors"))
        .orderBy("c_custkey")
    )


@register(
    "q_pmi_collocations",
    oracle="""
    WITH dl AS (
        SELECT LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z]+'),
                           x -> x != '') AS t
        FROM documents
    ), bg AS (
        SELECT UNNEST(LIST_TRANSFORM(GENERATE_SERIES(2, LEN(t)),
                                     i -> {'w1': t[i-1], 'w2': t[i]})) AS s
        FROM dl WHERE LEN(t) >= 2
    ), bc AS (
        SELECT s.w1 AS w1, s.w2 AS w2, COUNT(*) AS cxy FROM bg GROUP BY 1, 2
    ), uni AS (
        SELECT tok, COUNT(*) AS cnt
        FROM (SELECT UNNEST(t) AS tok FROM dl) GROUP BY 1
    ), tot AS (SELECT SUM(cnt) AS n_tok FROM uni)
    SELECT w1, w2, CAST(cxy AS BIGINT) AS n_pair,
           CAST((1000000 * cxy * tot.n_tok) // (u1.cnt * u2.cnt) AS BIGINT)
               AS pmi_scaled
    FROM bc, tot
    JOIN uni u1 ON bc.w1 = u1.tok
    JOIN uni u2 ON bc.w2 = u2.tok
    WHERE cxy >= 5
    ORDER BY pmi_scaled DESC, w1, w2 LIMIT 20
    """,
    tags=("analytics", "pmi", "collocations"),
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by pointwise mutual information over adjacent
    token pairs. PMI is monotone in cxy*N/(cx*cy), so the ranking uses the
    scaled BIGINT ratio (1e6*cxy*N) DIV (cx*cy) — exact integer arithmetic,
    no log whose last ulp could differ between engines. Bigram and unigram
    counts are two hash aggregates over one tokenized scan; the corpus
    total joins in as a single-row broadcast (same pattern as
    q_unigram_surprisal)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.filter(
            F.split(F.lower("text"), "[^a-z]+"), lambda x: x != F.lit("")
        ).alias("t")
    )
    bigrams = toks.filter(F.size("t") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(2, size(t)), "
                "i -> struct(t[i-2] AS w1, t[i-1] AS w2))"
            )
        ).alias("s")
    )
    bc = bigrams.groupBy(
        F.col("s.w1").alias("w1"), F.col("s.w2").alias("w2")
    ).agg(F.count(F.lit(1)).alias("cxy"))
    uni = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = uni.agg(F.sum("cnt").alias("n_tok"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("cnt").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("cnt").alias("c2"))
    return (
        bc.filter(F.col("cxy") >= 5)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("cxy").alias("n_pair"),
            F.expr("(1000000L * cxy * n_tok) DIV (c1 * c2)").alias("pmi_scaled"),
        )
        .orderBy(F.desc("pmi_scaled"), "w1", "w2")
        .limit(20)
    )


@register(
    "q_interval_pairs_binned",
    oracle="""
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
     AND b.ts <= a.ts + INTERVAL 300 SECOND
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("analytics", "interval-join", "binning"),
)
def q_interval_pairs_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event pairs within a 5-minute window, as the BUCKETED rewrite of an
    interval self-join: each left event explodes to its own 300 s bucket
    and the next (any successor within 300 s lands in exactly one of the
    two), the join is a pure EQUI-join on (user_id, bucket), and the exact
    time predicate filters inside the joined partition. The theta-join
    spec (the oracle) would be O(per-user^2) row comparisons scheduled as
    a non-equi join; the binned form is a hash shuffle both engines can
    scale — this is how range joins ship at 100 TB. Each true pair joins
    exactly once (the right side's bucket is single-valued)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type",
        (F.unix_timestamp("ts") / F.lit(300)).cast("long").alias("b"),
    )
    left = e.select(
        F.col("event_id").alias("id_a"),
        F.col("user_id"),
        F.col("ts").alias("ts_a"),
        F.col("event_type").alias("type_a"),
        F.explode(F.array(F.col("b"), F.col("b") + 1)).alias("jb"),
    )
    right = e.select(
        F.col("event_id").alias("id_b"),
        F.col("user_id"),
        F.col("ts").alias("ts_b"),
        F.col("event_type").alias("type_b"),
        F.col("b").alias("jb"),
    )
    pairs = left.join(right, ["user_id", "jb"]).filter(
        (
            (F.col("ts_b") > F.col("ts_a"))
            | ((F.col("ts_b") == F.col("ts_a")) & (F.col("id_b") > F.col("id_a")))
        )
        & (F.col("ts_b") <= F.col("ts_a") + F.expr("interval 300 seconds"))
    )
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("type_a", "type_b")
    )


@register(
    "q_percentrank_norm",
    oracle="""
    SELECT doc_id, source, n_chars,
           FLOOR(PERCENT_RANK() OVER
                     (PARTITION BY source ORDER BY n_chars, doc_id)
                 * 10000 + 0.5) / 10000 AS qnorm
    FROM documents
    QUALIFY doc_id % 7 = 0
    ORDER BY doc_id
    """,
    tags=("analytics", "normalization", "percent-rank"),
)
def q_percentrank_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile normalization of a quality feature: percent_rank
    of n_chars within each source (doc_id tiebreak makes ranks total, so
    the value is the exact rational (rank-1)/(n-1) in both engines).
    One window shuffle on source; the feature becomes comparable across
    sources of wildly different length distributions — the standard move
    before mixing quality thresholds across crawl snapshots."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return (
        d.select(
            "doc_id",
            "source",
            "n_chars",
            (F.floor(F.percent_rank().over(w) * 10000 + 0.5) / 10000).alias(
                "qnorm"
            ),
        )
        .filter(F.col("doc_id") % 7 == 0)
        .orderBy("doc_id")
    )


@register(
    "q_value_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 25) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("analytics", "histogram"),
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (width_bucket shape): bin =
    floor(value/25) — floor of an IEEE division is bit-identical across
    engines, so bins are exact. One hash aggregate; count-distinct rides
    the same shuffle as a partial aggregate."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.floor(F.col("value") / 25).cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("bin")
    )
