"""LLM-pipeline batch 12 (round 8, second wave): dedup economics and
learnability-based selection —

- dedup Pareto curve (``q_dedup_pareto``): what exact-prefix
  (boilerplate) deduplication actually BUYS — group-size histogram with
  exact byte savings at keep-one-per-group, the table a curation team
  reads before deciding a dedup pass is worth its cost;
- RHO-style learnability selection (``q_rho_select``): rank documents
  by excess loss between a WEAK and a STRONG hashed classifier (the
  deterministic stand-in for RHO-1's reference-vs-learned excess-loss
  ranking) — the docs the stronger model handles much better than the
  weak one are the learnable ones worth training on;
- reference-LM perplexity filtering (``q_perplexity_filter``): the
  CCNet quality gate — Laplace-smoothed unigram LM on a clean reference
  slice, per-source keep counts at a fixed mean-surprisal line.

Determinism: byte savings are pure integer sums; the RHO losses are
cross-entropy micro-integers via the FLOOR(-LN(p)*1e6+0.5) precedent
(q_unigram_surprisal), with p bounded away from {0,1} by the bounded
logit construction (|avg logit| <= 10 after the /100 scale), so LN never
sees 0 on either engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_lunar_spark.operators import corpus as C
from pulsar_lunar_spark.operators.dedup import normalize_text
from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import ensure_parallelism, load_table

_NORM = "REGEXP_REPLACE(TRIM(LOWER(text)), '\\s+', ' ', 'g')"
_PREFIX_CHARS = 64


# ---------------------------------------------------------------------------
# Dedup Pareto: what keep-one-per-prefix-group saves, by group size
# ---------------------------------------------------------------------------


@register(
    "q_dedup_pareto",
    oracle=f"""
    WITH g AS (
        SELECT SUBSTR({_NORM}, 1, {_PREFIX_CHARS}) AS pfx,
               CAST(COUNT(*) AS BIGINT) AS s,
               CAST(SUM(n_chars) AS BIGINT) AS chars_total,
               CAST(ARG_MIN(n_chars, doc_id) AS BIGINT) AS chars_kept
        FROM documents GROUP BY 1
    )
    SELECT s AS dup_size,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(s) AS BIGINT) AS n_docs,
           CAST(SUM(chars_total) AS BIGINT) AS total_chars,
           CAST(SUM(chars_kept) AS BIGINT) AS chars_after_keep1,
           CAST((1000000 * (SUM(chars_total) - SUM(chars_kept)))
                // SUM(chars_total) AS BIGINT) AS savings_ppm
    FROM g GROUP BY s ORDER BY dup_size
    """,
    tags=("llm", "dedup", "pareto", "boilerplate", "economics"),
)
def q_dedup_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup economics: group documents by their normalized 64-char
    PREFIX (the boilerplate-header signal — templated pages share exact
    prefixes long before they share full bodies), then report the
    group-size histogram with exact byte totals and what keep-one-per-
    group (keeper = min doc_id) would save, per size and in ppm. This is
    the Pareto table that decides whether a dedup pass pays for itself:
    savings concentrate in the big-s rows or they don't exist.

    All-integer: counts, char sums, and the savings ratio are BIGINT
    arithmetic; the keeper's size rides the group aggregate as
    min_by(n_chars, doc_id) — no second join back. Plan: one scan, one
    prefix-group aggregate (shuffle keyed on the 64-char prefix — AQE
    splits boilerplate skew), one size-histogram re-aggregate over the
    GROUP table (already corpus-compressed). At 100 TB the group table
    is bounded by distinct prefixes, the natural compression of the
    statistic."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    g = (
        d.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.substring(normalize_text(F.col("text")), 1, _PREFIX_CHARS).alias("pfx"),
        )
        .groupBy("pfx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("s"),
            F.sum("n_chars").cast("long").alias("chars_total"),
            F.min_by("n_chars", "doc_id").cast("long").alias("chars_kept"),
        )
    )
    return (
        g.groupBy(F.col("s").alias("dup_size"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("s").cast("long").alias("n_docs"),
            F.sum("chars_total").cast("long").alias("total_chars"),
            F.sum("chars_kept").cast("long").alias("chars_after_keep1"),
            F.expr(
                "(1000000 * (sum(chars_total) - sum(chars_kept)))"
                " div sum(chars_total)"
            )
            .cast("long")
            .alias("savings_ppm"),
        )
        .orderBy("dup_size")
    )


# ---------------------------------------------------------------------------
# RHO-style learnability selection (weak-vs-strong excess loss)
# ---------------------------------------------------------------------------

_RHO_WEAK_BUCKETS = 64
_RHO_TOPK = 20


def _scorer_sql(buckets: int, alias: str) -> str:
    """CTE chain scoring documents with a hashed bag-of-words classifier
    of `buckets` buckets (the q_quality_classifier construction — weight
    hash salt 'w-' is shared, so the weak model IS a coarser projection
    of the same weight source). Emits {alias}(doc_id, pos, loss_micro):
    cross-entropy of the score against the n_chars>=300 proxy label in
    exact micro units."""
    from pulsar_lunar_spark.queries.llm5 import _WORDS, _md5_int_sql

    return f"""w_{alias} AS (
        SELECT i AS bucket,
               {_md5_int_sql("CAST(i AS VARCHAR)", 6, "w-")} % 2001 - 1000 AS w
        FROM RANGE({buckets}) AS t(i)
    ), tok_{alias} AS (
        SELECT doc_id, n_chars, UNNEST({_WORDS}) AS word FROM documents
    ), sc_{alias} AS (
        SELECT t.doc_id, t.n_chars,
               CAST(SUM(w.w) AS BIGINT) AS logit_sum, COUNT(*) AS n_tokens
        FROM tok_{alias} t
        JOIN w_{alias} w ON {_md5_int_sql("t.word", 6)} % {buckets} = w.bucket
        GROUP BY t.doc_id, t.n_chars
    ), {alias} AS (
        SELECT doc_id,
               CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS pos,
               CAST(FLOOR(-LN(
                   CASE WHEN n_chars >= 300
                        THEN 1.0 / (1.0 + EXP(-(logit_sum * 1.0 / n_tokens) / 100.0))
                        ELSE 1.0 - 1.0 / (1.0 + EXP(-(logit_sum * 1.0 / n_tokens) / 100.0))
                   END) * 1000000 + 0.5) AS BIGINT) AS loss_micro
        FROM sc_{alias}
    )"""


def scored_docs(
    spark: SparkSession,
    sf_dir: str,
    *,
    extra_cols: tuple[str, ...] = (),
    weak: bool = False,
) -> DataFrame:
    """Per-document hashed bag-of-words classifier logits — the Spark
    twin of the shared ``_scorer_sql`` oracle builder, factored once so
    q_rho_select / q_source_attribution / q_conformal_threshold cannot
    drift apart (round-9 code review; the _bitext_margin_frame
    precedent). ONE token explode; the strong (4096-bucket) weight
    table always broadcast-joins, the weak (64-bucket) one only when
    ``weak=True`` — both bucket ids derive from one md5 per word.
    Returns (doc_id, *extra_cols, n_chars, [logit_weak,] logit_strong,
    n_tokens)."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id",
        *extra_cols,
        "n_chars",
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("word"),
    )

    def weight_table(buckets: int, w_name: str) -> DataFrame:
        return spark.range(buckets).select(
            F.col("id").alias(f"b_{w_name}"),
            (
                C.md5_int(F.col("id").cast("string"), hex_chars=6, salt="w-")
                % 2001
                - 1000
            ).alias(w_name),
        )

    h = C.md5_int(F.col("word"), hex_chars=6)
    bucket_cols = [(h % 4096).alias("b_st")]
    if weak:
        bucket_cols.insert(0, (h % _RHO_WEAK_BUCKETS).alias("b_wk"))
    staged = tok.select("doc_id", *extra_cols, "n_chars", *bucket_cols)
    if weak:
        staged = staged.join(
            F.broadcast(weight_table(_RHO_WEAK_BUCKETS, "wk")), "b_wk"
        )
    staged = staged.join(F.broadcast(weight_table(4096, "st")), "b_st")
    aggs = []
    if weak:
        aggs.append(F.sum("wk").cast("long").alias("logit_weak"))
    aggs.append(F.sum("st").cast("long").alias("logit_strong"))
    aggs.append(F.count(F.lit(1)).alias("n_tokens"))
    return staged.groupBy("doc_id", *extra_cols, "n_chars").agg(*aggs)


def ce_loss_micro(logit_col: str) -> Column:
    """Cross-entropy loss of the hashed classifier against the
    n_chars>=300 proxy label in exact micro-nats — FLOOR(-LN(p)*1e6+0.5),
    the q_unigram_surprisal precedent. Requires ``n_chars`` and
    ``n_tokens`` columns in scope (scored_docs provides them)."""
    p = 1.0 / (1.0 + F.exp(-(F.col(logit_col) / F.col("n_tokens")) / 100.0))
    p_true = F.when(F.col("n_chars") >= 300, p).otherwise(1.0 - p)
    return F.floor(-F.log(p_true) * 1000000 + 0.5).cast("long")


@register(
    "q_rho_select",
    oracle=f"""
    WITH {_scorer_sql(_RHO_WEAK_BUCKETS, "weak")},
         {_scorer_sql(4096, "strong")}
    SELECT w.doc_id, w.pos,
           w.loss_micro AS loss_weak_micro,
           s.loss_micro AS loss_strong_micro,
           w.loss_micro - s.loss_micro AS excess_micro
    FROM weak w JOIN strong s USING (doc_id)
    ORDER BY excess_micro DESC, doc_id LIMIT {_RHO_TOPK}
    """,
    tags=("llm", "selection", "rho", "learnability", "training-prep"),
)
def q_rho_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learnability-based data selection (the RHO-1 idea, deterministic
    stand-in): score every document with a WEAK (64-bucket) and a STRONG
    (4096-bucket) hashed classifier against the same proxy label, take
    per-doc cross-entropy losses, and select the top-20 documents by
    EXCESS loss (weak minus strong) — the documents where capacity helps
    most are the learnable ones a reference-model-guided selection keeps;
    documents both models get right (boilerplate) or both get wrong
    (noise) rank low. The weak model is a coarser projection of the same
    hashed weight source, exactly how a smaller reference model relates
    to a larger one in the published recipe.

    Determinism: losses are FLOOR(-LN(p)*1e6+0.5) micro-integers (the
    q_unigram_surprisal precedent); p is bounded away from {{0,1}}
    because |avg logit| <= 10 by the +-1000-weight / /100-scale
    construction, so LN is well-conditioned on both engines; the top-20
    has the (excess DESC, doc_id) total order.

    Plan: ONE token explode feeds both scorers (two broadcast weight
    joins of 64 and 4096 rows over the same pass — bucket ids are
    computed per scorer from the same md5), two doc aggregates, one
    doc_id join, TakeOrdered top-20. At 100 TB everything is one corpus
    pass plus dimension-sized broadcasts. The scorer body is the shared
    scored_docs/ce_loss_micro pair (round-9 factoring — the same
    pipeline also powers q_source_attribution and
    q_conformal_threshold, mirroring the shared _scorer_sql on the
    oracle side)."""
    sc = scored_docs(spark, sf_dir, weak=True)
    return (
        sc.select(
            "doc_id",
            F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("pos"),
            ce_loss_micro("logit_weak").alias("loss_weak_micro"),
            ce_loss_micro("logit_strong").alias("loss_strong_micro"),
        )
        .withColumn(
            "excess_micro", F.col("loss_weak_micro") - F.col("loss_strong_micro")
        )
        .orderBy(F.desc("excess_micro"), "doc_id")
        .limit(_RHO_TOPK)
    )


# ---------------------------------------------------------------------------
# Reference-LM perplexity filtering (CCNet-style, per source)
# ---------------------------------------------------------------------------

_PPL_REF_SOURCE = "src0"
_PPL_KEEP_MICRO = 3_420_000  # mean word surprisal (micro-nats) keep line


@register(
    "q_perplexity_filter",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source, UNNEST(STRING_SPLIT({_NORM}, ' ')) AS word
        FROM documents
    ), ref AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok WHERE source = '{_PPL_REF_SOURCE}' GROUP BY word
    ), scal AS (
        SELECT CAST(SUM(tf) AS BIGINT) AS n_ref,
               CAST(COUNT(*) + 1 AS BIGINT) AS v
        FROM ref
    ), ws AS (
        SELECT t.doc_id, t.source,
               CAST(FLOOR(-LN((COALESCE(r.tf, 0) + 1) * 1.0 / (s.n_ref + s.v))
                          * 1000000 + 0.5) AS BIGINT) AS smic
        FROM tok t LEFT JOIN ref r USING (word) CROSS JOIN scal s
    ), dm AS (
        SELECT doc_id, source,
               CAST(SUM(smic) // COUNT(*) AS BIGINT) AS mean_micro
        FROM ws GROUP BY doc_id, source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(mean_micro) // COUNT(*) AS BIGINT) AS avg_surprisal_micro,
           CAST(SUM(CASE WHEN mean_micro <= {_PPL_KEEP_MICRO} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST((1000000 * SUM(CASE WHEN mean_micro <= {_PPL_KEEP_MICRO}
                                    THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
               AS kept_ppm
    FROM dm GROUP BY source ORDER BY source
    """,
    tags=("llm", "quality", "perplexity", "filtering", "training-prep"),
)
def q_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-LM perplexity filtering (the CCNet recipe, unigram
    stand-in): train a Laplace-smoothed unigram LM on the REFERENCE
    slice (source 'src0' — the clean-corpus stand-in for the published
    recipe's Wikipedia LM), score every document's mean word surprisal
    against it, and report per source how many documents clear the keep
    line — low perplexity under a clean reference = fluent text, the
    classic pre-classifier quality gate. OOV words get the 1/(N+V)
    smoothing mass, so a source full of reference-unseen vocabulary
    scores honestly high instead of erroring.

    Determinism: per-WORD surprisal is floored to micro-nats ONCE
    (FLOOR(-LN((tf+1)/(N+V))*1e6+0.5) — the q_unigram_surprisal
    precedent); everything downstream (per-doc mean, per-source
    average, keep counts) is exact BIGINT arithmetic on those integers,
    so engines can only disagree inside the one well-conditioned LN.

    Plan: one token explode; the reference counts aggregate on the word
    key and join back to the token stream on the same key (one shuffle
    class — at 100 TB this is the shuffle-join-on-word the statistic
    requires; the reference side is vocabulary-sized, broadcastable
    when the reference slice is curated-small); then per-doc and
    per-source aggregates. The N/V scalars ride a 1-row broadcast."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id",
        "source",
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("word"),
    )
    ref = (
        tok.filter(F.col("source") == _PPL_REF_SOURCE)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    scal = ref.agg(
        F.sum("tf").cast("long").alias("n_ref"),
        (F.count(F.lit(1)) + 1).cast("long").alias("v"),
    )
    ws = (
        tok.join(ref, "word", "left")
        .crossJoin(F.broadcast(scal))
        .select(
            "doc_id",
            "source",
            F.floor(
                -F.log(
                    (F.coalesce(F.col("tf"), F.lit(0)) + 1)
                    / (F.col("n_ref") + F.col("v"))
                )
                * 1000000
                + 0.5
            )
            .cast("long")
            .alias("smic"),
        )
    )
    dm = ws.groupBy("doc_id", "source").agg(
        F.expr("sum(smic) div count(*)").cast("long").alias("mean_micro")
    )
    return (
        dm.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr("sum(mean_micro) div count(*)")
            .cast("long")
            .alias("avg_surprisal_micro"),
            F.sum(
                F.when(F.col("mean_micro") <= _PPL_KEEP_MICRO, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_kept"),
            F.expr(
                f"(1000000 * sum(CASE WHEN mean_micro <= {_PPL_KEEP_MICRO}"
                " THEN 1 ELSE 0 END)) div count(*)"
            )
            .cast("long")
            .alias("kept_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Dataset card: per-source datasheet row (sizes + language entropy)
# ---------------------------------------------------------------------------


@register(
    "q_dataset_card",
    oracle=f"""
    WITH t AS (
        SELECT source, lang,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(LEN(STRING_SPLIT({_NORM}, ' ')) AS BIGINT) AS n_words
        FROM documents
    ), sl AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM t GROUP BY source, lang
    ), ent AS (
        SELECT source,
               CAST(SUM(CAST(FLOOR(
                   -(CAST(p_ppm AS DOUBLE) / 1000000.0)
                     * LN(CAST(p_ppm AS DOUBLE) / 1000000.0) * 1000000
                   + 0.5) AS BIGINT)) AS BIGINT) AS lang_entropy_micro,
               CAST(MAX(p_ppm) AS BIGINT) AS top_lang_ppm,
               CAST(COUNT(*) AS BIGINT) AS n_langs
        FROM (
            SELECT source, lang, n,
                   (1000000 * n) // CAST(SUM(n) OVER (PARTITION BY source)
                                        AS BIGINT) AS p_ppm
            FROM sl
        ) GROUP BY source
    ), sz AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(n_words) AS BIGINT) AS total_words,
               CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS mean_chars
        FROM t GROUP BY source
    )
    SELECT sz.source, n_docs, total_chars, total_words, mean_chars,
           n_langs, top_lang_ppm, lang_entropy_micro
    FROM sz JOIN ent ON sz.source = ent.source
    ORDER BY sz.source
    """,
    tags=("llm", "datasheet", "card", "entropy", "governance"),
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card: the one-row-per-source datasheet a curation team
    publishes with a corpus — document/char/word totals, mean length,
    language count, dominant-language share, and the Shannon entropy of
    the language mix (micro-nats) — the single number that separates a
    monolingual source (entropy ~0) from a balanced multilingual one
    (~ln K).

    Determinism: language shares are exact integer ppm; each entropy
    TERM -p*ln(p) is floored to micro-nats independently and the terms
    summed as BIGINTs (per-term flooring — the one-float-op-then-integer
    discipline of q_psi_drift), so engines can only disagree inside one
    well-conditioned LN per (source, lang). p > 0 by construction
    (present languages only).

    Plan: one scan into a (source, lang) aggregate; shares via a window
    over the source dimension (<= sources x langs rows); sizes ride a
    second aggregate of the same scan-level projection joined back on
    source. At 100 TB everything after the first aggregate is
    dimension-sized."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    t = d.select(
        "source",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(F.split(normalize_text(F.col("text")), " "))
        .cast("long")
        .alias("n_words"),
    )
    sl = t.groupBy("source", "lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    shares = sl.select(
        "source",
        F.expr(
            "(1000000 * n) div SUM(n) OVER (PARTITION BY source)"
        )
        .cast("long")
        .alias("p_ppm"),
    )
    ent = shares.groupBy("source").agg(
        F.sum(
            F.expr(
                "CAST(FLOOR(-(CAST(p_ppm AS DOUBLE) / 1000000.0)"
                " * LN(CAST(p_ppm AS DOUBLE) / 1000000.0) * 1000000"
                " + 0.5) AS BIGINT)"
            )
        )
        .cast("long")
        .alias("lang_entropy_micro"),
        F.max("p_ppm").cast("long").alias("top_lang_ppm"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
    )
    sz = t.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.expr("sum(n_chars) div count(*)").cast("long").alias("mean_chars"),
    )
    return (
        sz.join(ent, "source")
        .select(
            "source", "n_docs", "total_chars", "total_words", "mean_chars",
            "n_langs", "top_lang_ppm", "lang_entropy_micro",
        )
        .orderBy("source")
    )
