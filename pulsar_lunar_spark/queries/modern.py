"""Modern Spark SQL surface (Spark 4 additions): XML serde, CSV serde,
VARIANT semi-structured type, LATERAL correlated subqueries, Python UDTF.

These extend the payload-serde story (the reference's app-defined
serialize/deserialize layer, /root/reference/src/message/serde.rs:6-28):
to_xml/from_xml and to_csv/from_csv are alternative envelope payload
codecs alongside the JSON path; VARIANT is the schema-on-read form of the
same decode. Round-trip queries prove serde identity, so the oracle is a
plain projection of the source fields — the same golden-roundtrip pattern
as the reference's codec tests (src/message/codec.rs:254-324).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import load_table, tables


@register(
    "q_xml_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, CAST(n_regionkey AS INT) AS n_regionkey
    FROM nation ORDER BY n_nationkey
    """,
    tags=("format", "xml", "serde"),
)
def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML payload serde identity: struct -> to_xml -> from_xml(schema) ->
    fields must equal the input (the XML twin of the envelope JSON codec).
    The XML string itself is never emitted — only the decoded fields — so
    the oracle is the plain projection."""
    n = load_table(spark, sf_dir, "nation")
    xml = F.to_xml(F.struct("n_nationkey", "n_name", "n_regionkey"))
    parsed = F.from_xml(
        xml, "STRUCT<n_nationkey: INT, n_name: STRING, n_regionkey: INT>"
    )
    return n.select(
        parsed.getField("n_nationkey").alias("n_nationkey"),
        parsed.getField("n_name").alias("n_name"),
        parsed.getField("n_regionkey").alias("n_regionkey"),
    ).orderBy("n_nationkey")


@register(
    "q_csv_funcs",
    oracle="""
    SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 4) AS o_totalprice
    FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey
    """,
    tags=("format", "csv", "serde"),
)
def q_csv_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV payload serde identity: struct -> to_csv -> from_csv(schema) ->
    fields equal the input (delimited flat-record codec for the envelope)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    csv = F.to_csv(F.struct("o_orderkey", "o_orderstatus", "o_totalprice"))
    parsed = F.from_csv(
        csv, "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
    )
    return o.select(
        parsed.getField("o_orderkey").alias("o_orderkey"),
        parsed.getField("o_orderstatus").alias("o_orderstatus"),
        F.round(parsed.getField("o_totalprice"), 4).alias("o_totalprice"),
    ).orderBy("o_orderkey")


@register(
    "q_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_variant,
           json_extract_string(props, '$.k') AS k_string
    FROM events WHERE event_id <= 150 ORDER BY event_id
    """,
    tags=("function", "json", "variant"),
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured decode: parse_json -> variant_get with typed
    extraction paths — schema-on-read over the same props payload the
    from_json path decodes with a declared schema."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 150)
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_variant"),
        F.variant_get(v, "$.k", "string").alias("k_string"),
    ).orderBy("event_id")


_LATERAL_SQL = """
SELECT n.n_name, t.c_name, ROUND(t.c_acctbal, 4) AS c_acctbal
FROM nation n,
     LATERAL (
         SELECT c_name, c_acctbal
         FROM customer
         WHERE c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_name
         LIMIT 2
     ) t
ORDER BY n.n_name, c_acctbal DESC, c_name
"""


@register(
    "q_lateral_topk",
    oracle=_LATERAL_SQL,
    tags=("sql", "lateral", "topk"),
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (SQL surface): per-nation top-2
    customers by balance — the same SQL text runs on both engines.
    Catalyst rewrites the lateral into a window/join, so the physical plan
    is the WindowGroupLimit shape, not a per-row re-execution."""
    tables(spark, sf_dir, names=("customer", "nation"))
    return spark.sql(_LATERAL_SQL)


@udtf(returnType="word string, pos int")
class _SplitWords:
    """Python UDTF (table function): one input string -> one row per word.
    The UDTF surface is the declared row-expanding escape hatch; kept on a
    25-row dimension table (interpreter-speed, same policy as q_python_udf).
    """

    def eval(self, name: str):
        if name is None:
            return
        for i, w in enumerate(name.split("_")):
            yield (w, i)


@register(
    "q_udtf_split",
    oracle="""
    SELECT n_name, UNNEST(STRING_SPLIT(n_name, '_')) AS word,
           CAST(GENERATE_SUBSCRIPTS(STRING_SPLIT(n_name, '_'), 1) - 1 AS INT) AS pos
    FROM nation ORDER BY n_name, pos
    """,
    tags=("udf", "udtf"),
)
def q_udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF invoked as a lateral table function over nation names
    (words split on '_'); the oracle is the UNNEST twin."""
    tables(spark, sf_dir, names=("nation",))
    spark.udtf.register("split_words", _SplitWords)
    return spark.sql(
        """
        SELECT n.n_name, s.word, s.pos
        FROM nation n, LATERAL split_words(n.n_name) s
        ORDER BY n.n_name, s.pos
        """
    )
