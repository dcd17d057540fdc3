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
  ppm integers — the calibration-eval twin of q_langid_f1.

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
    return f"""
    WITH RECURSIVE pairs AS ({pairs}
    ), nodes AS (
        SELECT DISTINCT n FROM (
            SELECT id_a AS n FROM pairs UNION ALL SELECT id_b FROM pairs
        )
    ), edges AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs
    ), reach(node, lab) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node
    ), comp AS (
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

    Plan: the one shared MinHash-LSH pipeline (O(docs·bands), the
    q_dedup_minhash/q_dedup_source_matrix plan) emits verified pairs,
    spooled ONCE to a per-call tmpfs slot (three consumers: nodes, edges,
    and the connected-components loop re-reads edges every round — an
    unmaterialized pair pipeline would re-run the LSH per consumer);
    components converge in O(cluster diameter) rounds; the weight join is
    keyed on component. All-integer weights — no float sums. Oracle: the
    md5-portable LSH SQL replica + recursive-CTE label propagation."""
    from pulsar_lunar_spark.session import scratch_root, versioned_slot

    d = load_table(spark, sf_dir, "documents")
    raw = D.minhash_dedup_pairs(d, "doc_id", "text", threshold=0.3, hasher="md5")
    slot = versioned_slot(scratch_root("pulsar_lunar_softdedup", sf_dir), "pairs")
    raw.select("id_a", "id_b").write.mode("overwrite").parquet(slot)
    pairs = spark.read.parquet(slot)
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


def _calibration_oracle() -> str:
    from pulsar_lunar_spark.queries.llm5 import _CLF_BUCKETS, _WORDS, _md5_int_sql

    return f"""
    WITH weights AS (
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
        SELECT CAST(FLOOR(1000000.0
                          / (1.0 + EXP(-(logit_sum * 1.0 / n_tokens) / 100.0))
                          + 0.5) AS BIGINT) AS score_ppm,
               CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS pos
        FROM scored
    ), b AS (
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
    p = scored.select(
        F.floor(
            1000000.0
            / (1.0 + F.exp(-(F.col("logit_sum") / F.col("n_tokens")) / 100.0))
            + 0.5
        )
        .cast("long")
        .alias("score_ppm"),
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("pos"),
    )
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
