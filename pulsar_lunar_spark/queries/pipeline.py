"""Pipeline/storage queries, batch 6 (SURVEY §2B north star + storage
layout): scalable global row enumeration (shard ids for training-example
addressing), curriculum length-bucketing, and partitioned-write partition
pruning (the hive-layout data-skipping primitive).

Determinism: row ids / bucket ids / counts are all integers; the only
doubles are min/max picks of integral columns.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_lunar_spark.operators.partitioning import stable_row_ids
from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import ensure_parallelism, load_table


@register(
    "q_row_ids",
    oracle="""
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS row_id
    FROM documents
    QUALIFY doc_id % 97 = 0
    ORDER BY doc_id
    """,
    tags=("pipeline", "row-ids"),
)
def q_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global example ids (0..n-1 in doc_id order) via the
    range-partition + per-partition-offset pattern (see
    partitioning.stable_row_ids) — one range exchange, no single-task
    global sort, so the same plan enumerates 100 TB. The oracle is the
    ROW_NUMBER() spec it implements. Output sampled (doc_id % 97) to keep
    the compare bounded."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    ids = stable_row_ids(d, order_col="doc_id", n_ranges=8)
    return ids.filter(F.col("doc_id") % 97 == 0).orderBy("doc_id")


@register(
    "q_length_buckets",
    oracle="""
    WITH b AS (
        SELECT lang, doc_id, n_chars,
               NTILE(8) OVER (ORDER BY n_chars, doc_id) AS bucket
        FROM documents
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    tags=("pipeline", "curriculum"),
)
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum length-bucketing: octile bins over document length
    (total order with doc_id tiebreak), per-bin size and length range —
    the batch-construction step that groups similar-length sequences to
    minimize padding waste. NTILE here is the declared window form; the
    100 TB path replaces the global window with broadcast quantile
    boundaries + a scan-local bucket expression (same outputs when
    boundaries are exact)."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.orderBy("n_chars", "doc_id")
    return (
        d.select("lang", "n_chars", F.ntile(8).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("bucket")
    )


def _prune_dir(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(tempfile.gettempdir(), "pulsar_lunar_partitioned", tag)


@register(
    "q_partitioned_prune",
    oracle="""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total
    FROM documents WHERE lang = 'en'
    GROUP BY source ORDER BY source
    """,
    tags=("pipeline", "storage", "pruning"),
)
def q_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-layout partition pruning: write documents partitioned by lang
    (`write.partitionBy` — one directory per language), read back with a
    lang filter, aggregate. The filter binds to the partition COLUMN, so
    the scan lists only lang=en/ and never opens other directories —
    the oracle proves the pruned read is lossless. At 100 TB this is the
    difference between scanning one language and scanning the corpus
    (PartitionFilters asserted in tests/test_pipeline.py)."""
    d = load_table(spark, sf_dir, "documents")
    out = _prune_dir(sf_dir)
    d.write.partitionBy("lang").mode("overwrite").parquet(out)
    rd = spark.read.parquet(out).filter(F.col("lang") == "en")
    return (
        rd.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_total"),
        )
        .orderBy("source")
    )
