"""LLM-pipeline batch 10 (round 7): the next three ops a large-scale
curation team reaches for after round 6's selection/training-prep set —

- cross-modal pair dedup (``q_crossmodal_dedup``): image↔text near-dup
  pairs across two embedding towers through the blocked GEMM lane — the
  multimodal twin of q_dedup_embedding;
- SoftDeDup reweighting (``q_softdedup_weights``): down-weight duplicated
  examples by near-dup cluster size instead of dropping them (soft
  deduplication), exact integer micro-unit weights;
- classifier calibration (``q_calibration_ece``): reliability buckets +
  expected calibration error for the hashed quality classifier, all exact
  ppm integers — the calibration-eval twin of q_langid_f1;
- classifier operating-point sweep (``q_threshold_sweep``): exact P/R/F1
  at five thresholds from one scoring pass;
- filter agreement (``q_filter_agreement``): Cohen's kappa between the
  rule filter and the classifier, sign-explicit integer DIV;
- token-budget mixture fill (``q_token_budget_mix``): alpha=0.5 weights
  -> exact token quotas -> deterministic greedy fill per source;
- leakage-safe split (``q_leakage_safe_split``): train/val assignment
  hashed on the duplicate-GROUP key so copies never span splits.

Determinism discipline: cosines rounded to 6 on both sides (float-ranking
rule); weights/calibration are integer ppm arithmetic end-to-end (BIGINT
DIV — no float sums anywhere); the SoftDeDup oracle replays the full
md5-portable LSH pipeline plus a recursive-CTE connected-components pass
(the q_dedup_cluster precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_lunar_spark.operators import corpus as C
from pulsar_lunar_spark.operators import dedup as D
from pulsar_lunar_spark.operators import similarity as S
from pulsar_lunar_spark.operators.dedup import normalize_text
from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import ensure_parallelism, load_table

_COS = """
LIST_INNER_PRODUCT({a}, {b})
  / (SQRT(LIST_INNER_PRODUCT({a}, {a})) * SQRT(LIST_INNER_PRODUCT({b}, {b})))
"""


# ---------------------------------------------------------------------------
# Cross-modal (image <-> text) embedding pair dedup
# ---------------------------------------------------------------------------


@register(
    "q_crossmodal_dedup",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label, vec_id % 2 AS side,
               CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_COS.format(a="a.v", b="b.v")}, 6) AS cosine_sim
    FROM e a JOIN e b ON a.label = b.label AND a.side = 0 AND b.side = 1
    WHERE {_COS.format(a="a.v", b="b.v")} >= 0.40
    ORDER BY id_a, id_b
    """,
    tags=("llm", "dedup", "multimodal", "cross-modal", "blocked-join"),
)
def q_crossmodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal near-duplicate pairs: even vec_ids stand in for the
    image tower, odd for the text tower (two aligned encoders in
    production), blocked by the coarse cell (`label`), one rectangular
    GEMM per block (operators/similarity.py::blocked_cross_modal_pairs).
    Catches captions re-used across images / frames re-used across
    transcripts — pairs q_dedup_embedding cannot see because it treats
    the corpus as one modality.

    Threshold 0.40 inherits q_dedup_embedding's verified fp-safe gap:
    cross-modal pairs are a SUBSET of that query's within-block pairs at
    the same threshold. Scale shape identical to q_dedup_embedding (one
    groupBy(block) exchange, Arrow+BLAS per cell)."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "side", (F.col("vec_id") % 2).cast("int")
    )
    pairs = S.blocked_cross_modal_pairs(
        e, id_col="vec_id", vec_col="embedding", block_col="label",
        side_col="side", threshold=0.40,
    )
    return pairs.select(
        "id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim")
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# SoftDeDup: dedup-aware example reweighting (weight = 1e6 / cluster size)
# ---------------------------------------------------------------------------


def _softdedup_oracle() -> str:
    from pulsar_lunar_spark.queries.llm import _MINHASH_ORACLE

    pairs = _MINHASH_ORACLE.replace("ORDER BY id_a, id_b", "")
    # MATERIALIZED is load-bearing: DuckDB INLINES plain CTEs per
    # reference, and `edges` is referenced by every recursive step —
    # without it the full LSH replica re-evaluates per iteration
    # (measured 53-55 s at sf0.1; materialized: ~2 s). Same values.
    return f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({pairs}
    ), nodes AS MATERIALIZED (
        SELECT DISTINCT n FROM (
            SELECT id_a AS n FROM pairs UNION ALL SELECT id_b FROM pairs
        )
    ), edges AS MATERIALIZED (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs
    ), reach(node, lab) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node
    ), comp AS MATERIALIZED (
        SELECT node, MIN(lab) AS component FROM reach GROUP BY node
    ), sizes AS (
        SELECT component, COUNT(*) AS sz FROM comp GROUP BY component
    ), w AS (
        SELECT c.node AS doc_id, CAST(1000000 // s.sz AS BIGINT) AS weight_ppm
        FROM comp c JOIN sizes s USING (component)
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(w.doc_id) AS BIGINT) AS n_downweighted,
           CAST(SUM(COALESCE(w.weight_ppm, 1000000)) AS BIGINT) AS sum_weight_ppm,
           CAST(MIN(COALESCE(w.weight_ppm, 1000000)) AS BIGINT) AS min_weight_ppm
    FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id
    GROUP BY d.source ORDER BY d.source
    """


@register(
    "q_softdedup_weights",
    oracle=_softdedup_oracle(),
    tags=("llm", "dedup", "softdedup", "reweighting", "training-prep"),
)
def q_softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDeDup-style example reweighting — keep every duplicate but give
    each member of a near-dup cluster weight 1e6 DIV cluster_size
    micro-units, so a cluster's total training mass stays ~one document
    (the soft alternative to q_dedup_cluster's drop policy; the choice a
    curation team actually debates). Per-source audit view: docs,
    down-weighted docs, exact summed weight, and the strongest
    down-weighting applied.

    Plan: the pair table is the PROCESS-SHARED dedup artifact
    (llm.minhash_pairs_spool — one LSH pipeline build per (session,
    dataset), exactly the persisted-dedup-output shape at 100 TB; r11 —
    previously a fresh per-call pipeline + per-call spool). The
    materialized spool matters doubly here: the connected-components
    loop re-reads edges every round. Components converge in O(cluster
    diameter) rounds; the weight join is keyed on component.
    All-integer weights — no float sums. Oracle: the md5-portable LSH
    SQL replica + recursive-CTE label propagation."""
    from pulsar_lunar_spark.queries.llm import minhash_pairs_spool

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_pairs_spool(spark, sf_dir).select("id_a", "id_b")
    w = D.softdedup_weights(pairs)
    return (
        d.select("doc_id", "source")
        .join(w, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count("weight_ppm").cast("long").alias("n_downweighted"),
            F.sum(F.coalesce("weight_ppm", F.lit(1_000_000)))
            .cast("long")
            .alias("sum_weight_ppm"),
            F.min(F.coalesce("weight_ppm", F.lit(1_000_000)))
            .cast("long")
            .alias("min_weight_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Quality-classifier calibration: reliability buckets + ECE (exact ppm)
# ---------------------------------------------------------------------------


def _clf_p_sql() -> str:
    """Shared oracle prefix: hashed-classifier per-doc score_ppm + the
    n_chars>=300 proxy label, as the CTE chain weights->tok->scored->p
    (p has columns doc_id, score_ppm, pos)."""
    from pulsar_lunar_spark.queries.llm5 import _CLF_BUCKETS, _WORDS, _md5_int_sql

    return f"""weights AS (
        SELECT i AS bucket,
               {_md5_int_sql("CAST(i AS VARCHAR)", 6, "w-")} % 2001 - 1000 AS w
    FROM RANGE({_CLF_BUCKETS}) AS t(i)
    ), tok AS (
        SELECT doc_id, n_chars, UNNEST({_WORDS}) AS word FROM documents
    ), scored AS (
        SELECT t.doc_id, t.n_chars,
               CAST(SUM(w.w) AS BIGINT) AS logit_sum,
               COUNT(*) AS n_tokens
        FROM tok t
        JOIN weights w ON {_md5_int_sql("t.word", 6)} % {_CLF_BUCKETS} = w.bucket
        GROUP BY t.doc_id, t.n_chars
    ), p AS (
        SELECT doc_id,
               CAST(FLOOR(1000000.0
                          / (1.0 + EXP(-(logit_sum * 1.0 / n_tokens) / 100.0))
                          + 0.5) AS BIGINT) AS score_ppm,
               CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS pos
        FROM scored
    )"""


def _clf_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _clf_p_sql's ``p`` CTE: (doc_id, score_ppm BIGINT,
    pos INT) — the hashed bag-of-words classifier score in exact ppm plus
    the n_chars>=300 proxy label. One broadcast weight join + one doc
    aggregate (the q_quality_classifier plan)."""
    from pulsar_lunar_spark.queries.llm5 import _CLF_BUCKETS

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    weights = spark.range(_CLF_BUCKETS).select(
        F.col("id").alias("bucket"),
        (
            C.md5_int(F.col("id").cast("string"), hex_chars=6, salt="w-") % 2001
            - 1000
        ).alias("w"),
    )
    tok = d.select(
        "doc_id",
        "n_chars",
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("word"),
    )
    scored = (
        tok.withColumn("bucket", C.md5_int(F.col("word"), hex_chars=6) % _CLF_BUCKETS)
        .join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "n_chars")
        .agg(
            F.sum("w").cast("long").alias("logit_sum"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    return scored.select(
        "doc_id",
        F.floor(
            1000000.0
            / (1.0 + F.exp(-(F.col("logit_sum") / F.col("n_tokens")) / 100.0))
            + 0.5
        )
        .cast("long")
        .alias("score_ppm"),
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("pos"),
    )


def _calibration_oracle() -> str:
    return f"""
    WITH {_clf_p_sql()}, b AS (
        SELECT LEAST(score_ppm // 100000, 9) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(score_ppm) AS BIGINT) AS ssum,
               CAST(SUM(pos) AS BIGINT) AS npos
        FROM p GROUP BY 1
    ), g AS (
        SELECT bucket, n,
               ssum // n AS mean_pred_ppm,
               (1000000 * npos) // n AS frac_pos_ppm,
               ABS(ssum // n - (1000000 * npos) // n) AS gap_ppm
        FROM b
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, n,
           CAST(mean_pred_ppm AS BIGINT) AS mean_pred_ppm,
           CAST(frac_pos_ppm AS BIGINT) AS frac_pos_ppm,
           CAST(gap_ppm AS BIGINT) AS gap_ppm,
           CAST(SUM(n * gap_ppm) OVER () // SUM(n) OVER () AS BIGINT) AS ece_ppm
    FROM g ORDER BY bucket
    """


@register(
    "q_calibration_ece",
    oracle=_calibration_oracle(),
    tags=("llm", "quality", "classifier", "calibration", "eval"),
)
def q_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + expected calibration error for the hashed
    bag-of-words quality classifier (q_quality_classifier's model): docs
    bucket by predicted probability (10 bins of score ppm), each bucket
    reports exact mean predicted ppm vs empirical positive rate ppm (the
    proxy label: n_chars >= 300, the corpus median split) and their gap;
    ece_ppm = sum(n_b * gap_b) DIV n — the number a team checks before
    trusting classifier scores as sampling weights. The
    classification-eval twin of q_langid_f1, all exact ppm integers
    (BIGINT DIV — partial-sum order cannot flip anything).

    Plan: the broadcast weight-table join from q_quality_classifier (the
    fastText-filter shape), one doc-level aggregate, a <=10-row bucket
    aggregate, and the ECE as a window sum over those <=10 rows (the only
    SinglePartition exchange)."""
    p = _clf_scored(spark, sf_dir)
    b = (
        p.groupBy(
            F.least(F.expr("score_ppm div 100000"), F.lit(9)).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("score_ppm").cast("long").alias("ssum"),
            F.sum("pos").cast("long").alias("npos"),
        )
    )
    g = b.select(
        F.col("bucket").cast("long").alias("bucket"),
        "n",
        F.expr("ssum div n").cast("long").alias("mean_pred_ppm"),
        F.expr("(1000000L * npos) div n").cast("long").alias("frac_pos_ppm"),
        F.abs(
            F.expr("ssum div n") - F.expr("(1000000L * npos) div n")
        )
        .cast("long")
        .alias("gap_ppm"),
    )
    # integer DIV of the two window sums (not `/` + cast: float division
    # could land a hair under the exact quotient and truncate differently
    # than DuckDB's integer `//`)
    return g.select(
        "bucket",
        "n",
        "mean_pred_ppm",
        "frac_pos_ppm",
        "gap_ppm",
        F.expr("sum(n * gap_ppm) over () div sum(n) over ()")
        .cast("long")
        .alias("ece_ppm"),
    ).orderBy("bucket")


# ---------------------------------------------------------------------------
# Classifier operating-point sweep: P/R/F1 at each score threshold
# ---------------------------------------------------------------------------

_SWEEP_THRESHOLDS = (300_000, 400_000, 500_000, 600_000, 700_000)


def _threshold_sweep_oracle() -> str:
    thr = ", ".join(str(t) for t in _SWEEP_THRESHOLDS)
    return f"""
    WITH {_clf_p_sql()}, thr AS (
        SELECT UNNEST([{thr}]) AS thr_ppm
    ), m AS (
        SELECT t.thr_ppm,
               CAST(SUM(CASE WHEN p.score_ppm >= t.thr_ppm THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_flagged,
               CAST(SUM(CASE WHEN p.score_ppm >= t.thr_ppm AND p.pos = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN p.score_ppm >= t.thr_ppm AND p.pos = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN p.score_ppm < t.thr_ppm AND p.pos = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS fn
        FROM p CROSS JOIN thr t GROUP BY t.thr_ppm
    )
    SELECT CAST(thr_ppm AS BIGINT) AS thr_ppm, n_flagged, tp, fp, fn,
           CAST(CASE WHEN tp + fp = 0 THEN 0
                     ELSE (1000000 * tp) // (tp + fp) END AS BIGINT)
               AS precision_ppm,
           CAST(CASE WHEN tp + fn = 0 THEN 0
                     ELSE (1000000 * tp) // (tp + fn) END AS BIGINT)
               AS recall_ppm,
           CAST(CASE WHEN tp = 0 THEN 0
                     ELSE (2 * ((1000000 * tp) // (tp + fp))
                             * ((1000000 * tp) // (tp + fn)))
                          // (((1000000 * tp) // (tp + fp))
                              + ((1000000 * tp) // (tp + fn))) END AS BIGINT)
               AS f1_ppm
    FROM m ORDER BY thr_ppm
    """


@register(
    "q_threshold_sweep",
    oracle=_threshold_sweep_oracle(),
    tags=("llm", "quality", "classifier", "eval", "threshold"),
)
def q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point sweep for the hashed quality classifier: exact
    precision/recall/F1 (ppm integers) at five score thresholds against
    the n_chars>=300 proxy label — the table a curation team reads to
    pick the filter cutoff (alongside q_calibration_ece, which says
    whether the scores can be trusted BETWEEN the operating points).

    Plan: ONE scoring pass (the broadcast weight join) cross-joined with
    the 5-literal threshold array via explode, then a 5-row conditional
    aggregate — the threshold sweep multiplies the per-doc stream 5x
    INSIDE the aggregate's map side, never re-scoring the corpus per
    threshold. F1 is computed from the ppm-floored P and R on both
    engines (identical integer steps => identical hash); all divisions
    guard zero denominators."""
    p = _clf_scored(spark, sf_dir)
    thr = F.explode(
        F.array(*[F.lit(t) for t in _SWEEP_THRESHOLDS])
    ).alias("thr_ppm")
    m = (
        p.select("score_ppm", "pos", thr)
        .groupBy("thr_ppm")
        .agg(
            F.count(F.when(F.col("score_ppm") >= F.col("thr_ppm"), 1))
            .cast("long")
            .alias("n_flagged"),
            F.count(
                F.when((F.col("score_ppm") >= F.col("thr_ppm")) & (F.col("pos") == 1), 1)
            )
            .cast("long")
            .alias("tp"),
            F.count(
                F.when((F.col("score_ppm") >= F.col("thr_ppm")) & (F.col("pos") == 0), 1)
            )
            .cast("long")
            .alias("fp"),
            F.count(
                F.when((F.col("score_ppm") < F.col("thr_ppm")) & (F.col("pos") == 1), 1)
            )
            .cast("long")
            .alias("fn"),
        )
    )
    prec = F.when(F.col("tp") + F.col("fp") == 0, F.lit(0)).otherwise(
        F.expr("(1000000L * tp) div (tp + fp)")
    )
    rec = F.when(F.col("tp") + F.col("fn") == 0, F.lit(0)).otherwise(
        F.expr("(1000000L * tp) div (tp + fn)")
    )
    withpr = m.select(
        F.col("thr_ppm").cast("long").alias("thr_ppm"),
        "n_flagged",
        "tp",
        "fp",
        "fn",
        prec.cast("long").alias("precision_ppm"),
        rec.cast("long").alias("recall_ppm"),
    )
    f1 = F.when(F.col("tp") == 0, F.lit(0)).otherwise(
        F.expr(
            "(2 * precision_ppm * recall_ppm) div (precision_ppm + recall_ppm)"
        )
    )
    return withpr.select(
        "thr_ppm", "n_flagged", "tp", "fp", "fn",
        "precision_ppm", "recall_ppm",
        f1.cast("long").alias("f1_ppm"),
    ).orderBy("thr_ppm")


# ---------------------------------------------------------------------------
# Filter agreement: Cohen's kappa between the rule filter and the classifier
# ---------------------------------------------------------------------------


def _filter_agreement_oracle() -> str:
    from pulsar_lunar_spark.queries.llm5 import _WORDS

    return f"""
    WITH {_clf_p_sql()}, rule AS (
        SELECT doc_id,
               CASE WHEN LEN(words) >= 15
                         AND LEN(LIST_DISTINCT(words)) * 5 >= LEN(words) * 2
                    THEN 1 ELSE 0 END AS a
        FROM (SELECT doc_id, {_WORDS} AS words FROM documents)
    ), both_f AS (
        SELECT r.a, CASE WHEN p.score_ppm >= 500000 THEN 1 ELSE 0 END AS b
        FROM rule r JOIN p ON r.doc_id = p.doc_id
    ), c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
               CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_only_rule,
               CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_only_clf,
               CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
        FROM both_f
    ), m AS (
        SELECT n, n_both, n_only_rule, n_only_clf, n_neither,
               (1000000 * (n_both + n_neither)) // n AS po_ppm,
               (1000000 * (n_both + n_only_rule)) // n AS pa_ppm,
               (1000000 * (n_both + n_only_clf)) // n AS pb_ppm
        FROM c
    ), k AS (
        SELECT n, n_both, n_only_rule, n_only_clf, n_neither, po_ppm,
               (pa_ppm * pb_ppm
                + (1000000 - pa_ppm) * (1000000 - pb_ppm)) // 1000000
                   AS pe_ppm
        FROM m
    )
    SELECT n, n_both, n_only_rule, n_only_clf, n_neither,
           CAST(po_ppm AS BIGINT) AS po_ppm,
           CAST(pe_ppm AS BIGINT) AS pe_ppm,
           CAST(CASE WHEN pe_ppm = 1000000 THEN 0
                     WHEN po_ppm >= pe_ppm
                     THEN (1000000 * (po_ppm - pe_ppm)) // (1000000 - pe_ppm)
                     ELSE -((1000000 * (pe_ppm - po_ppm)) // (1000000 - pe_ppm))
                END AS BIGINT) AS kappa_ppm
    FROM k
    """


@register(
    "q_filter_agreement",
    oracle=_filter_agreement_oracle(),
    tags=("llm", "quality", "eval", "agreement", "kappa"),
)
def q_filter_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two quality filters — the rule filter
    (>=15 words AND distinct/total >= 0.4, integer cross-multiplied) and
    the hashed classifier at its 0.5 operating point. Chance-corrected
    agreement is the number that tells a team whether a cheap rule can
    stand in for the classifier (kappa ~ 1) or the two disagree beyond
    their base rates (kappa ~ 0). All exact ppm integers; the negative
    branch is made explicit (sign * non-negative DIV) because DuckDB's
    // FLOORS while Spark's div truncates toward zero — they agree only
    on non-negative numerators (round-2 lesson). Chance agreement is
    computed from ppm marginals (pa_ppm, pb_ppm first, then
    pe = pa*pb + (1-pa)*(1-pb) in ppm) so no intermediate exceeds 1e12
    — the direct count-product form overflows int64 once n > ~3M docs,
    exactly the scale this query targets (ADVICE r7).

    Plan: the rule flags are a scan-level projection (split + distinct
    size — no shuffle), the classifier side is the shared scoring pass,
    one 60k-row join on doc_id, then a single 1-row aggregate."""
    p = _clf_scored(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    words = F.split(normalize_text(F.col("text")), " ")
    rule = d.select(
        "doc_id",
        F.when(
            (F.size(words) >= 15)
            & (F.size(F.array_distinct(words)) * 5 >= F.size(words) * 2),
            1,
        )
        .otherwise(0)
        .alias("a"),
    )
    joined = rule.join(
        p.select("doc_id", F.when(F.col("score_ppm") >= 500_000, 1).otherwise(0).alias("b")),
        "doc_id",
    )
    c = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when((F.col("a") == 1) & (F.col("b") == 1), 1))
        .cast("long")
        .alias("n_both"),
        F.count(F.when((F.col("a") == 1) & (F.col("b") == 0), 1))
        .cast("long")
        .alias("n_only_rule"),
        F.count(F.when((F.col("a") == 0) & (F.col("b") == 1), 1))
        .cast("long")
        .alias("n_only_clf"),
        F.count(F.when((F.col("a") == 0) & (F.col("b") == 0), 1))
        .cast("long")
        .alias("n_neither"),
    )
    m = c.select(
        "n", "n_both", "n_only_rule", "n_only_clf", "n_neither",
        F.expr("(1000000L * (n_both + n_neither)) div n").alias("po_ppm"),
        F.expr("(1000000L * (n_both + n_only_rule)) div n").alias("pa_ppm"),
        F.expr("(1000000L * (n_both + n_only_clf)) div n").alias("pb_ppm"),
    )
    k = m.select(
        "n", "n_both", "n_only_rule", "n_only_clf", "n_neither", "po_ppm",
        F.expr(
            "(pa_ppm * pb_ppm"
            " + (1000000L - pa_ppm) * (1000000L - pb_ppm)) div 1000000L"
        ).alias("pe_ppm"),
    )
    kappa = (
        F.when(F.col("pe_ppm") == 1_000_000, F.lit(0))
        .when(
            F.col("po_ppm") >= F.col("pe_ppm"),
            F.expr("(1000000L * (po_ppm - pe_ppm)) div (1000000L - pe_ppm)"),
        )
        .otherwise(
            -F.expr("(1000000L * (pe_ppm - po_ppm)) div (1000000L - pe_ppm)")
        )
    )
    return k.select(
        "n", "n_both", "n_only_rule", "n_only_clf", "n_neither",
        F.col("po_ppm").cast("long").alias("po_ppm"),
        F.col("pe_ppm").cast("long").alias("pe_ppm"),
        kappa.cast("long").alias("kappa_ppm"),
    )


# ---------------------------------------------------------------------------
# Token-budget-constrained mixture selection (quota per source, then fill)
# ---------------------------------------------------------------------------

_MIX_BUDGET_TOKENS = 100_000


@register(
    "q_token_budget_mix",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(LEN(STRING_SPLIT(REGEXP_REPLACE(TRIM(LOWER(text)),
                                                    '\\s+', ' ', 'g'), ' '))
                    AS BIGINT) AS n_tokens,
               CAST(CONCAT('0x', SUBSTR(MD5(CONCAT('mix-',
                    CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS priority
        FROM documents
    ), w AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1000) AS BIGINT)
                   AS w_milli
        FROM t GROUP BY source
    ), q AS (
        SELECT source, n_docs, w_milli,
               CAST(({_MIX_BUDGET_TOKENS} * w_milli)
                    // (SELECT SUM(w_milli) FROM w) AS BIGINT) AS quota_tokens
        FROM w
    ), ranked AS (
        SELECT t.source, t.n_tokens,
               SUM(t.n_tokens) OVER (PARTITION BY t.source
                                     ORDER BY t.priority, t.doc_id) AS cum_tokens
        FROM t
    )
    SELECT q.source, q.n_docs, q.w_milli, q.quota_tokens,
           CAST(COALESCE(SUM(CASE WHEN r.cum_tokens <= q.quota_tokens
                                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_selected,
           CAST(COALESCE(SUM(CASE WHEN r.cum_tokens <= q.quota_tokens
                                  THEN r.n_tokens ELSE 0 END), 0) AS BIGINT)
               AS tokens_selected
    FROM q LEFT JOIN ranked r ON r.source = q.source
    GROUP BY q.source, q.n_docs, q.w_milli, q.quota_tokens
    ORDER BY q.source
    """,
    tags=("llm", "mixture", "sampling", "budget", "training-prep"),
)
def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-constrained mixture selection — the step after
    q_temperature_mixture: turn the alpha=0.5 source weights into exact
    per-source TOKEN quotas for a fixed training budget, then fill each
    quota deterministically (docs ordered by a salted md5 priority — the
    q_sample_weighted discipline, no RNG stream) until the next doc would
    overflow it. Output per source: weight, quota, and exactly what the
    greedy fill selected. This is the table a pretraining run's data
    loader is actually built from.

    All-integer: token counts are word counts, weights are
    FLOOR(SQRT(n)*1000) (IEEE sqrt engine-exact), quotas and fills are
    BIGINT DIV / cumulative sums — no float anywhere. Plan: one doc-level
    projection, one per-source count aggregate (broadcast back), one
    per-source cumulative-sum window (shuffles on source). At 100 TB the
    window key is the bounded source dimension, so a single source's
    window sort funnels through one task — the at-scale form is
    partitioning.sharded_group_cumsum (range-sharded per-group running
    sums, value-identical to this window; the swap is locked by
    tests/test_partitioning.py::test_budget_fill_sharded_identical)."""
    from pulsar_lunar_spark.queries.llm5 import _md5_int_sql  # noqa: F401  (oracle twin documented)
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    words = F.split(normalize_text(F.col("text")), " ")
    t = d.select(
        "doc_id",
        "source",
        F.size(words).cast("long").alias("n_tokens"),
        C.md5_int(F.concat(F.lit("mix-"), F.col("doc_id").cast("string")), hex_chars=15)
        .alias("priority"),
    )
    w = t.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    ).select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000)
        .cast("long")
        .alias("w_milli"),
    )
    total_w = w.agg(F.sum("w_milli").alias("__tw"))
    q = w.crossJoin(F.broadcast(total_w)).select(
        "source",
        "n_docs",
        "w_milli",
        F.expr(f"({_MIX_BUDGET_TOKENS}L * w_milli) div __tw")
        .cast("long")
        .alias("quota_tokens"),
    )
    cum = t.select(
        "source",
        "n_tokens",
        F.sum("n_tokens")
        .over(Window.partitionBy("source").orderBy("priority", "doc_id"))
        .alias("cum_tokens"),
    )
    return (
        q.join(cum, "source", "left")
        .groupBy("source", "n_docs", "w_milli", "quota_tokens")
        .agg(
            F.coalesce(
                F.count(F.when(F.col("cum_tokens") <= F.col("quota_tokens"), 1)),
                F.lit(0),
            )
            .cast("long")
            .alias("n_selected"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("cum_tokens") <= F.col("quota_tokens"),
                        F.col("n_tokens"),
                    ).otherwise(F.lit(0))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tokens_selected"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Leakage-safe train/val split (exact-dup groups never span splits)
# ---------------------------------------------------------------------------


@register(
    "q_leakage_safe_split",
    oracle="""
    WITH g AS (
        SELECT doc_id, source,
               MD5(REGEXP_REPLACE(TRIM(LOWER(text)), '\\s+', ' ', 'g')) AS grp
        FROM documents
    ), s AS (
        SELECT doc_id, source, grp,
               CASE WHEN SUBSTR(MD5(CONCAT('split-', grp)), 1, 2) < '1a'
                    THEN 'val' ELSE 'train' END AS split
        FROM g
    ), leak AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_leaky
        FROM (SELECT grp FROM s GROUP BY grp
              HAVING COUNT(DISTINCT split) > 1)
    )
    SELECT s.source, s.split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT s.grp) AS BIGINT) AS n_groups,
           (SELECT n_leaky FROM leak) AS n_leaky_groups
    FROM s GROUP BY s.source, s.split ORDER BY s.source, s.split
    """,
    tags=("llm", "split", "leakage", "eval", "training-prep"),
)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/val split — the GroupShuffleSplit discipline for
    training data: the split decision hashes the DUPLICATE-GROUP key
    (md5 of normalized text — exact-dup groups; at production scale the
    near-dup component id from q_softdedup_weights slots in as the same
    key), so every copy of a document lands in the SAME split and the
    val set cannot leak into train through duplicates. ~10% to val via
    an md5-prefix band (deterministic, no RNG — the q_sample_stratified
    discipline). Output: per-(source, split) doc/group counts plus the
    corpus-wide count of groups spanning both splits — 0 by construction,
    and the oracle proves it rather than assuming it.

    Plan: one scan-level projection (normalize + two md5s — all JVM
    codegen), one aggregate; the leak check is a HAVING over the group
    aggregate (broadcast 1-row back onto the 32-row result)."""
    d = load_table(spark, sf_dir, "documents")
    g = d.select(
        "doc_id",
        "source",
        F.md5(normalize_text(F.col("text"))).alias("grp"),
    )
    s = g.select(
        "source",
        "grp",
        F.when(
            F.substring(F.md5(F.concat(F.lit("split-"), F.col("grp"))), 1, 2)
            < "1a",
            F.lit("val"),
        )
        .otherwise(F.lit("train"))
        .alias("split"),
    )
    leak = (
        s.groupBy("grp")
        .agg(F.countDistinct("split").alias("__ns"))
        .filter(F.col("__ns") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("n_leaky_groups"))
    )
    return (
        s.groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("grp").cast("long").alias("n_groups"),
        )
        .crossJoin(F.broadcast(leak))
        .select("source", "split", "n_docs", "n_groups", "n_leaky_groups")
        .orderBy("source", "split")
    )
