"""Training-data pipeline queries, batch 7: directional containment
dedup — the boilerplate/excerpt detector that resemblance (Jaccard)
dedup structurally misses.

The synthetic `documents` corpus has no real contained excerpts, so the
query unions a DETERMINISTIC excerpt fixture (for every 11th document,
its first 60% of normalized words as a new doc offset past max(doc_id))
built with identical expressions on both engines — the operator under
test is the df-capped postings containment join, not the fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_lunar_spark.operators import dedup as D
from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import ensure_parallelism, load_table

_NORM = "REGEXP_REPLACE(TRIM(LOWER(text)), '\\s+', ' ', 'g')"

_CONTAINMENT_ORACLE = f"""
WITH w AS (
    SELECT doc_id, STRING_SPLIT({_NORM}, ' ') AS words FROM documents
), corpus AS (
    SELECT doc_id, ARRAY_TO_STRING(words, ' ') AS t FROM w
    UNION ALL
    SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents),
           ARRAY_TO_STRING(
               words[1:CAST(GREATEST((3 * LEN(words)) // 5, 3) AS BIGINT)], ' ')
    FROM w WHERE doc_id % 11 = 0
), sh AS (
    SELECT doc_id,
           LIST_DISTINCT(LIST_TRANSFORM(
               RANGE(1, GREATEST(LEN(STRING_SPLIT(t, ' ')) - 2, 1) + 1),
               i -> ARRAY_TO_STRING(STRING_SPLIT(t, ' ')[i:i+2], ' ')
           )) AS shs
    FROM corpus
), posts AS (
    SELECT DISTINCT doc_id, UNNEST(shs) AS s FROM sh
), sizes AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS size_a FROM posts GROUP BY 1
), capped AS (
    SELECT s FROM posts GROUP BY s HAVING COUNT(*) <= 50
), cp AS (
    SELECT p.doc_id, p.s FROM posts p JOIN capped c ON p.s = c.s
), pairs AS (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS overlap
    FROM cp a JOIN cp b ON a.s = b.s AND a.doc_id != b.doc_id
    GROUP BY 1, 2
)
SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id,
       overlap, size_a,
       CAST((1000000 * overlap) // size_a AS BIGINT) AS containment_ppm
FROM pairs JOIN sizes ON pairs.a_id = sizes.doc_id
WHERE size_a >= 4 AND (1000000 * overlap) // size_a >= 800000
ORDER BY a_id, b_id
"""


@register(
    "q_containment_dedup",
    oracle=_CONTAINMENT_ORACLE,
    tags=("llm", "dedup", "containment"),
)
def q_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment dedup (Broder's containment measure,
    C(a ⊆ b) = |shingles(a) ∩ shingles(b)| / |shingles(a)|): finds every
    document ≥80% contained in another — quoted passages, syndicated
    excerpts, boilerplate wrappers — the asymmetric duplicates whose
    Jaccard resemblance stays low because the union term is dominated by
    the longer side (q_dedup_minhash's family can never flag them).

    Plan (operators/dedup.py::containment_pairs): distinct (doc, shingle)
    postings → document-frequency cap at 50 drops stopword shingles (the
    postings whose pair expansion is quadratic — the cap is the scale
    bound, playing the role the band count plays in LSH) → per-shingle
    pair expansion from ONE aggregate → per-ordered-pair overlap count →
    join the subject's shingle count, threshold at 800000 ppm. Shuffles:
    one on the shingle, one on the (a, b) pair, plus a doc-count-sized
    one for the per-doc shingle sizes — never O(n²) over documents.

    Reference analog: none (the reference moves opaque payloads); this is
    the corpus-curation layer a training pipeline adds.
    """
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    words = F.split(D.normalize_text(F.col("text")), " ")
    m = F.expr("greatest((3 * size(__w)) div 5, 3)").cast("int")
    base = d.select("doc_id", words.alias("__w"))
    # excerpt ids offset past the REAL id range (a fixed literal offset
    # would collide once the corpus passes it); max(doc_id) is a bounded
    # driver scalar, and the oracle derives the same offset by subquery
    offset = int(d.agg(F.max("doc_id")).head()[0]) + 1
    corpus = base.select(
        "doc_id", F.concat_ws(" ", "__w").alias("text")
    ).unionByName(
        base.filter(F.col("doc_id") % 11 == 0).select(
            (F.col("doc_id") + F.lit(offset)).alias("doc_id"),
            F.concat_ws(" ", F.slice(F.col("__w"), 1, m)).alias("text"),
        )
    )
    pairs = D.containment_pairs(corpus, "doc_id", "text", shingle_k=3, df_cap=50)
    return (
        pairs.filter(
            (F.col("size_a") >= 4) & (F.col("containment_ppm") >= 800000)
        )
        .select(
            F.col("a_id").cast("bigint").alias("a_id"),
            F.col("b_id").cast("bigint").alias("b_id"),
            F.col("overlap").cast("bigint").alias("overlap"),
            F.col("size_a").cast("bigint").alias("size_a"),
            F.col("containment_ppm").cast("bigint").alias("containment_ppm"),
        )
        .orderBy("a_id", "b_id")
    )
