"""Source/sink format coverage: CSV, JSON(lines), ORC round-trips through
real Spark writers/readers (SURVEY §2B scans/sinks row).

Each query writes a dimension table out in the target format (overwrite —
idempotent re-runs), reads it back with an explicit schema, and aggregates
the re-read data joined against parquet-sourced facts. The oracle aggregates
the same tables straight from parquet, so a hash match proves the format
round-trip is lossless *through the declared schema* (CSV/JSON carry no
native types — the explicit read schema is the contract, exactly like a
Pulsar topic schema, /root/reference/src/PulsarApi.proto:25-50).

Scale notes: format conversion is a per-partition streaming rewrite (no
shuffle); the roundtripped table is then a broadcast dimension — the fact
side never leaves parquet.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import load_table

_NATION_AGG_ORACLE = """
SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_nations,
       CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def _roundtrip_dir(sf_dir: str, fmt: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(tempfile.gettempdir(), "pulsar_lunar_formats", tag, fmt)


def _nation_roundtrip(spark: SparkSession, sf_dir: str, fmt: str, **read_opts) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    path = _roundtrip_dir(sf_dir, fmt)
    nation.write.mode("overwrite").format(fmt).options(**read_opts).save(path)
    back = (
        spark.read.format(fmt)
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .options(**read_opts)
        .load(path)
    )
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        back.join(region, back.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nations"),
            F.sum("n_nationkey").cast("bigint").alias("key_sum"),
        )
        .orderBy("r_name")
    )


@register("q_csv_roundtrip", oracle=_NATION_AGG_ORACLE, tags=("format", "csv", "sink", "source"))
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → CSV (header) → read with explicit schema → join/agg; hash
    match vs parquet-direct proves the CSV writer/reader are lossless for
    the declared types."""
    return _nation_roundtrip(spark, sf_dir, "csv", header="true")


@register("q_json_roundtrip", oracle=_NATION_AGG_ORACLE, tags=("format", "json", "sink", "source"))
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → JSON-lines → read with explicit schema → join/agg (the
    reference's payload serde is JSON, /root/reference/src/main.rs:65-73)."""
    return _nation_roundtrip(spark, sf_dir, "json")


@register("q_orc_roundtrip", oracle=_NATION_AGG_ORACLE, tags=("format", "orc", "sink", "source"))
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → ORC → read → join/agg (typed columnar alternative path)."""
    return _nation_roundtrip(spark, sf_dir, "orc")


@register(
    "q_text_roundtrip",
    oracle="""
    SELECT text AS value, LENGTH(text) AS n_chars
    FROM documents WHERE doc_id < 50
    ORDER BY value, n_chars
    """,
    tags=("format", "text", "sink", "source"),
)
def q_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → line-delimited text files → read back → per-line
    stats. The untyped single-column format is the reference's raw
    String/None schema type (/root/reference/src/PulsarApi.proto:26-43):
    payload bytes with no structure, schema applied by the consumer."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    path = _roundtrip_dir(sf_dir, "text")
    docs.select(F.col("text").alias("value")).write.mode("overwrite").text(path)
    back = spark.read.text(path)
    return back.select(
        "value", F.length("value").alias("n_chars")
    ).orderBy("value", "n_chars")
