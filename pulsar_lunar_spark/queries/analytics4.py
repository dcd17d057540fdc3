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
from pulsar_lunar_spark.session import load_table


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
    diversity. Same inverted-index shape as q_contamination: explode
    distinct (doc, trigram), aggregate document frequency, join back.
    Two hash aggregates + one shuffle join on the trigram key; the
    trigram space dominates, so the join is hash-partitioned on g —
    never broadcast (df can be corpus-wide)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), "[^a-z]+"), lambda x: x != F.lit("")
        ).alias("t"),
    )
    tri = (
        toks.filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(3, size(t)), "
                    "i -> concat(t[i-3], ' ', t[i-2], ' ', t[i-1]))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    dfreq = tri.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    return (
        tri.join(dfreq, "g")
        .filter(F.col("doc_id") % 13 == 0)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum((F.col("df") == 1).cast("long")).alias("n_unique_to_doc"),
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
