"""Data-quality + corpus-novelty queries, batch 11 (SURVEY §2B north
star): declarative data-quality rule evaluation (FK orphans, domain
rules, null/range audits — the pipeline-hygiene gate before any training
run), n-gram novelty scoring (the memorization/diversity signal), and
sentence-level segmentation statistics.

Determinism discipline: every rule verdict and ratio is integer
arithmetic (counts, scaled BIGINT ratios); sentence boundaries come from
one shared regex evaluated identically by Java regex and DuckDB RE2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import ensure_parallelism, load_table


@register(
    "q_dq_checks",
    oracle="""
    SELECT 'fk_orders_customer' AS rule,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_violations,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_checked
    UNION ALL
    SELECT 'fk_lineitem_orders',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'range_totalprice_positive',
           CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'domain_orderstatus',
           CAST((SELECT COUNT(*) FROM orders
                 WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'not_null_shipdate',
           CAST((SELECT COUNT(*) FROM lineitem WHERE l_shipdate IS NULL)
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    ORDER BY rule
    """,
    tags=("analytics", "data-quality", "constraints"),
)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit — the constraint suite a pipeline
    evaluates before promoting a snapshot: referential integrity via
    LEFT-ANTI joins (never a correlated per-row probe), plus domain /
    range / not-null rules as filter-counts that ride the scan. Each rule
    is one aggregate over one scan or one anti-join; the verdict table is
    5 rows regardless of input size."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    def rule(name: str, viol: DataFrame, total: DataFrame) -> DataFrame:
        v = viol.agg(F.count(F.lit(1)).alias("n_violations"))
        t = total.agg(F.count(F.lit(1)).alias("n_checked"))
        return v.crossJoin(t).select(
            F.lit(name).alias("rule"), "n_violations", "n_checked"
        )

    fk_oc = orders.join(
        F.broadcast(customer.select("c_custkey")),
        orders["o_custkey"] == F.col("c_custkey"),
        "left_anti",
    )
    fk_lo = lineitem.join(
        orders.select("o_orderkey"),
        lineitem["l_orderkey"] == F.col("o_orderkey"),
        "left_anti",
    )
    return (
        rule("fk_orders_customer", fk_oc, orders)
        .unionAll(rule("fk_lineitem_orders", fk_lo, lineitem))
        .unionAll(
            rule(
                "range_totalprice_positive",
                orders.filter(F.col("o_totalprice") <= 0),
                orders,
            )
        )
        .unionAll(
            rule(
                "domain_orderstatus",
                orders.filter(~F.col("o_orderstatus").isin("O", "F", "P")),
                orders,
            )
        )
        .unionAll(
            rule(
                "not_null_shipdate",
                lineitem.filter(F.col("l_shipdate").isNull()),
                lineitem,
            )
        )
        .orderBy("rule")
    )


@register(
    "q_ngram_novelty",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z]+'),
                           x -> x != '') AS t
        FROM documents
    ), tri AS (
        SELECT DISTINCT doc_id,
               UNNEST(LIST_TRANSFORM(GENERATE_SERIES(3, LEN(t)),
                      i -> t[i-2] || ' ' || t[i-1] || ' ' || t[i])) AS g
        FROM toks WHERE LEN(t) >= 3
    ), dfreq AS (
        SELECT g, COUNT(*) AS df FROM tri GROUP BY g
    )
    SELECT tri.doc_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(SUM(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unique_to_doc,
           CAST((1000000 * SUM(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS novelty_ppm
    FROM tri JOIN dfreq USING (g)
    WHERE tri.doc_id % 13 = 0
    GROUP BY tri.doc_id ORDER BY tri.doc_id
    """,
    tags=("analytics", "novelty", "ngrams"),
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document trigram novelty: the fraction (ppm, exact BIGINT
    ratio) of a document's distinct trigrams that appear in NO other
    document — the inverse-memorization signal used to weigh corpus
    diversity.

    Plan (round 4, replaces the inverted-index join form): per-doc
    trigram arrays are array_distinct'ed in the MAP pass, so the
    exploded postings are already (doc, g)-distinct — no distinct
    shuffle; ONE aggregate on g computes both the document frequency
    and (via min) the would-be owner, so a df=1 trigram IS its owner's
    unique trigram and the corpus-wide postings-to-df join disappears
    entirely; per-doc trigram counts come map-side (size of the
    distinct array) with no explode. What remains: one exchange on g,
    one tiny per-selected-doc aggregate, one tiny per-doc join —
    the trigram-keyed shuffle is the only corpus-sized movement."""
    # scale-out BEFORE the interpreted trigram transform: the single-split
    # parquet scan otherwise serializes the whole tokenize+shingle stage
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), "[^a-z]+"), lambda x: x != F.lit("")
        ).alias("t"),
    )
    arrs = toks.filter(F.size("t") >= 3).select(
        "doc_id",
        F.array_distinct(
            F.expr(
                "transform(sequence(3, size(t)), "
                "i -> concat(t[i-3], ' ', t[i-2], ' ', t[i-1]))"
            )
        ).alias("__g"),
    )
    n_tri = arrs.filter(F.col("doc_id") % 13 == 0).select(
        "doc_id", F.size("__g").cast("long").alias("n_trigrams")
    )
    uniq = (
        arrs.select("doc_id", F.explode("__g").alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"), F.min("doc_id").alias("owner"))
        .filter((F.col("df") == 1) & (F.col("owner") % 13 == 0))
        .groupBy(F.col("owner").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_unique_to_doc"))
    )
    return (
        n_tri.join(uniq, "doc_id", "left")
        .select(
            "doc_id",
            "n_trigrams",
            F.coalesce("n_unique_to_doc", F.lit(0)).alias("n_unique_to_doc"),
        )
        .select(
            "doc_id",
            "n_trigrams",
            "n_unique_to_doc",
            F.expr("(1000000L * n_unique_to_doc) DIV n_trigrams").alias(
                "novelty_ppm"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "q_sentence_stats",
    oracle="""
    WITH s AS (
        SELECT doc_id,
               LIST_FILTER(
                   LIST_TRANSFORM(STRING_SPLIT_REGEX(text, '[.!?]+'),
                                  x -> TRIM(x)),
                   x -> x != '') AS sents
        FROM documents
    )
    SELECT doc_id,
           CAST(LEN(sents) AS BIGINT) AS n_sentences,
           CAST(LIST_SUM(LIST_TRANSFORM(sents, x -> LENGTH(x))) AS BIGINT)
               AS n_sentence_chars,
           CAST(LIST_MAX(LIST_TRANSFORM(sents, x -> LENGTH(x))) AS BIGINT)
               AS max_sentence_chars
    FROM s
    WHERE doc_id % 17 = 0 AND LEN(sents) > 0
    ORDER BY doc_id
    """,
    tags=("analytics", "text", "sentences"),
)
def q_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation statistics (count / total / max chars per
    document) — the granularity pass before sentence-level dedup or
    packing. Segmentation is one shared regex split ([.!?]+) + trim +
    drop-empty evaluated entirely in array HOFs inside the scan
    projection: zero shuffles, zero explodes — the whole query is a
    single scan-local stage before the final sample-order."""
    d = load_table(spark, sf_dir, "documents")
    sents = F.filter(
        F.transform(F.split("text", "[.!?]+"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    lens = F.transform(F.col("sents"), lambda x: F.length(x).cast("long"))
    return (
        d.filter(F.col("doc_id") % 17 == 0)
        .select("doc_id", sents.alias("sents"))
        .filter(F.size("sents") > 0)
        .select(
            "doc_id",
            F.size("sents").cast("long").alias("n_sentences"),
            F.aggregate(
                lens, F.lit(0).cast("long"), lambda a, x: a + x
            ).alias("n_sentence_chars"),
            F.array_max(lens).alias("max_sentence_chars"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_chi2_cells",
    oracle="""
    WITH o AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS obs
        FROM documents GROUP BY 1, 2
    ), r AS (SELECT lang, CAST(SUM(obs) AS BIGINT) AS rt FROM o GROUP BY 1),
    c AS (SELECT source, CAST(SUM(obs) AS BIGINT) AS ct FROM o GROUP BY 1),
    n AS (SELECT CAST(SUM(obs) AS BIGINT) AS nt FROM o)
    SELECT o.lang AS lang, o.source AS source, obs,
           CAST((1000 * r.rt * c.ct) // n.nt AS BIGINT) AS exp_milli,
           CAST(((obs * n.nt - r.rt * c.ct) * (obs * n.nt - r.rt * c.ct))
                // (r.rt * c.ct) AS BIGINT) AS chi2_contrib_xn
    FROM o, n
    JOIN r ON o.lang = r.lang
    JOIN c ON o.source = c.source
    ORDER BY lang, source
    """,
    tags=("analytics", "statistics", "chi-square"),
)
def q_chi2_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency cells for lang x source independence (the
    drift / bias audit between corpus dimensions). Every cell carries its
    observed count, expected count (milli-units) and chi-square
    contribution scaled by N: (obs·N − r·c)² DIV (r·c) = N·(o−e)²/e —
    all positive BIGINT (floor- and truncate-division agree on
    positives), so the statistic is exact and order-free. One hash agg
    over the scan + two tiny broadcast margins + 1-row total."""
    d = load_table(spark, sf_dir, "documents")
    o = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("obs"))
    r = o.groupBy("lang").agg(F.sum("obs").alias("rt"))
    c = o.groupBy("source").agg(F.sum("obs").alias("ct"))
    n = o.agg(F.sum("obs").alias("nt"))
    return (
        o.join(F.broadcast(r), "lang")
        .join(F.broadcast(c), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "source",
            "obs",
            F.expr("(1000L * rt * ct) DIV nt").alias("exp_milli"),
            F.expr(
                "((obs * nt - rt * ct) * (obs * nt - rt * ct)) DIV (rt * ct)"
            ).alias("chi2_contrib_xn"),
        )
        .orderBy("lang", "source")
    )


@register(
    "q_group_regression",
    oracle="""
    WITH pts AS (
        SELECT user_id,
               CAST(DATE_DIFF('hour', TIMESTAMP '2024-01-01', ts) AS BIGINT)
                   AS x,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
        FROM events
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT)
               AS slope_num,
           CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT)
               AS slope_den
    FROM pts
    GROUP BY user_id HAVING slope_den != 0
    ORDER BY user_id
    """,
    tags=("analytics", "regression", "grouped-ml"),
)
def q_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of spend (cents) over time (hours since a fixed
    anchor): the slope as an exact integer RATIONAL (num, den) —
    n·Σxy − Σx·Σy over n·Σx² − (Σx)², never divided, so no float and no
    floor-vs-truncate hazard on negative slopes. One hash aggregate;
    the four sums are partial-aggregated map-side. The anchor keeps x
    small enough that every product stays in BIGINT through sf1."""
    e = load_table(spark, sf_dir, "events")
    x = F.expr(
        "CAST((unix_timestamp(ts) - 1704067200) DIV 3600 AS BIGINT)"
    )
    y = F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)")
    pts = e.select("user_id", x.alias("x"), y.alias("y"))
    return (
        pts.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .select(
            "user_id",
            "n",
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
                "slope_num"
            ),
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
                "slope_den"
            ),
        )
        .filter(F.col("slope_den") != 0)
        .orderBy("user_id")
    )


@register(
    "q_bpe_encode",
    oracle=r"""
    WITH w AS (
        SELECT doc_id,
               UNNEST(LIST_FILTER(
                   STRING_SPLIT(REGEXP_REPLACE(TRIM(LOWER(text)), '\s+', ' ', 'g'), ' '),
                   x -> LEN(x) > 0)) AS word
        FROM documents WHERE doc_id % 19 = 0
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           TRUE AS tokens_ok
    FROM w GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("analytics", "tokenizer", "bpe"),
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION: encode documents with the merges learned by
    corpus.bpe_train (train on the corpus, then apply corpus-wide — the
    round-trip a tokenizer-fitting pipeline ships). Each word splits to
    characters and the merge list folds over it in rank order as JVM
    array rewrites (corpus._merge_adjacent — scan-local, no Python).

    The merge sequence is iterative (no SQL twin), so the oracle checks
    the exact per-doc word counts plus a tokens_ok boolean pinning the
    post-merge token count inside its provable envelope
    (n_words <= n_tokens <= total characters: merges only ever shrink a
    word's symbol count, never below 1). Exact merge semantics are
    replicated against a pure-python reference in tests/test_analytics.py."""
    from pulsar_lunar_spark.operators.corpus import _merge_adjacent, bpe_train
    from pulsar_lunar_spark.operators.dedup import normalize_text

    d = load_table(spark, sf_dir, "documents")
    merges = bpe_train(d, "text", n_merges=6)
    words = d.filter(F.col("doc_id") % 19 == 0).select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(normalize_text(F.col("text")), " "),
                lambda w: F.length(w) > 0,
            )
        ).alias("w"),
    )
    syms = F.split(F.regexp_replace("w", "(?<=.)", " "), " ")
    toks = words.select(
        "doc_id",
        F.length("w").alias("n_chars"),
        F.filter(syms, lambda s: F.length(s) > 0).alias("syms"),
    )
    for _rank, a, b, _cnt in merges:
        toks = toks.select("doc_id", "n_chars", _merge_adjacent(F.col("syms"), a, b).alias("syms"))
    return (
        toks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            (
                (F.sum(F.size("syms")) >= F.count(F.lit(1)))
                & (F.sum(F.size("syms")) <= F.sum("n_chars"))
            ).alias("tokens_ok"),
        )
        .orderBy("doc_id")
    )
