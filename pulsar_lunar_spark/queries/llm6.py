"""Training-data pipeline queries, batch 7 (SURVEY §2B north star):
BPE merge training (the tokenizer-fitting step), mergeable HLL distinct
sketches, and approximate quantiles — the sketch family that summarizes
a 100 TB corpus without a second pass.

q_bpe_merges is rows-only (the iterative merge loop has no tractable SQL
twin — REPLACE-style string rewrites break on shared-boundary adjacency);
its exact semantics are pinned by a Python-reference replication test in
tests/test_llm6.py. The sketch queries are rows-only where the sketch
internals are engine-specific; their accuracy contracts are pytest-bound
against exact answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_lunar_spark.operators import corpus as C
from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import ensure_parallelism, load_table


@register("q_bpe_merges", oracle=None, tags=("llm", "tokenizer", "bpe"))
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 BPE merges learned from the document corpus (vocabulary =
    top-300 words by frequency): per round, count adjacent symbol pairs
    weighted by word freq (integer sums), take the argmax (count desc,
    pair asc — fully deterministic), rewrite the vocabulary with the
    merge. Pair counting is O(vocabulary), not O(corpus); see
    corpus.bpe_train. Python-reference replication in tests/test_llm6.py
    pins the exact merge sequence."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    merges = C.bpe_train(d, "text", n_merges=8, top_words=300)
    return spark.createDataFrame(
        [(r, a, b, a + b, n) for (r, a, b, n) in merges],
        "rank int, left string, right string, merged string, weighted_count long",
    )


@register(
    "q_hll_distinct",
    oracle=r"""
    WITH words AS (
        SELECT lang, source, UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS word
        FROM documents
    ), cells AS (
        SELECT lang, source, COUNT(DISTINCT word) AS dc
        FROM words GROUP BY lang, source
    )
    SELECT lang, CAST(SUM(dc) AS BIGINT) AS sum_cell_exact, TRUE AS hll_ok
    FROM cells GROUP BY lang ORDER BY lang
    """,
    tags=("llm", "sketch", "hll"),
)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-word sketches per language: hll_sketch_agg
    (Apache DataSketches HLL) built per (lang, source) cell, then
    hll_union_agg rolls cells up to per-lang estimates — the two-level
    merge tree that counts distinct tokens across a 100 TB corpus in one
    pass with O(lgK) state per cell (contrast: exact countDistinct
    shuffles every word). The sketch estimate has no SQL twin, so the
    oracle checks the exact per-cell sums plus an hll_ok boolean pinning
    the unioned estimate within 5% of the exact per-lang distinct count;
    tighter accuracy bounds in tests/test_llm6.py."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    words = d.select(
        "lang",
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"),
    )
    cell = words.groupBy("lang", "source").agg(
        F.hll_sketch_agg("word").alias("sk"),
        F.countDistinct("word").alias("exact_cell"),
    )
    exact_lang = words.groupBy("lang").agg(F.countDistinct("word").alias("exact_lang"))
    rolled = cell.groupBy("lang").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("approx"),
        F.sum("exact_cell").cast("long").alias("sum_cell_exact"),
    )
    return (
        rolled.join(exact_lang, "lang")
        .select(
            "lang",
            "sum_cell_exact",
            (
                F.abs(F.col("approx") - F.col("exact_lang"))
                <= F.greatest(F.lit(1), F.col("exact_lang") * 0.05)
            ).alias("hll_ok"),
        )
        .orderBy("lang")
    )
