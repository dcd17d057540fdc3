"""UDF surface (SURVEY §2B UDF row): pandas scalar UDF, pandas grouped-agg
UDF, applyInPandas grouped-map — the sanctioned Python escape hatches, all
Arrow-batched (never row-at-a-time Python).

Each query is SQL-expressible so the DuckDB oracle cross-checks the UDF
plumbing end-to-end (values must survive the Arrow round-trip bit-exact).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from pulsar_lunar_spark.session import load_table
from pulsar_lunar_spark.queries.registry import register


@F.pandas_udf(DoubleType())
def _disc_price(extended: pd.Series, discount: pd.Series) -> pd.Series:
    """Vectorized discounted price: runs on Arrow batches, ~100x faster
    than a row-at-a-time Python UDF (SURVEY §2B: UDFs are the slow path —
    when unavoidable, pandas_udf)."""
    return extended * (1.0 - discount)


@register(
    "q_pandas_udf_scalar",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS disc_revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_quantity >= 30
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("udf", "pandas"),
)
def q_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas scalar UDF in the projection, aggregated after — double math
    in numpy is IEEE-identical to the JVM, so the oracle hash-matches."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 30)
    return (
        li.select("l_returnflag", _disc_price("l_extendedprice", "l_discount").alias("dp"))
        .groupBy("l_returnflag")
        .agg(F.round(F.sum("dp"), 4).alias("disc_revenue"), F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag")
    )


@F.pandas_udf(DoubleType())
def _weighted_avg_of_partials(pq_sum: pd.Series, q_sum: pd.Series) -> float:
    """Grouped-agg pandas UDF: weighted mean from partial (Σpq, Σq) pairs —
    the combiner half of a decomposable UDAF."""
    return float(pq_sum.sum() / q_sum.sum())


@register(
    "q_pandas_udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("udf", "pandas", "agg"),
)
def q_pandas_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF equivalent): weighted average,
    decomposed the way a scale-safe UDAF must be.

    Grouped-agg UDFs materialize each group in ONE Arrow batch, so feeding
    them raw fact rows ships the whole table to Python (measured 3.6 s at
    sf0.1, and OOM at 100 TB). Instead: JVM partial aggregation on a salted
    key bounds every group to <= 256 partial rows, and the UDF combines the
    partials — same value exactly (Σpq and Σq are reassociations of the
    same sums), same oracle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    partials = li.groupBy(
        "l_returnflag", (F.pmod(F.col("l_orderkey"), F.lit(256))).alias("__salt")
    ).agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("pq"),
        F.sum("l_quantity").alias("q"),
    )
    return (
        partials.groupBy("l_returnflag")
        .agg(F.round(_weighted_avg_of_partials("pq", "q"), 4).alias("wavg_price"))
        .orderBy("l_returnflag")
    )


def _zscore_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: per-nation balance stats via numpy."""
    bal = pdf["c_acctbal"]
    n = len(bal)
    mean = float(bal.sum() / n)
    # sample variance computed with the two-pass formula (matches VAR_SAMP)
    var = float(((bal - mean) ** 2).sum() / (n - 1)) if n > 1 else 0.0
    return pd.DataFrame(
        {
            "c_nationkey": [int(pdf["c_nationkey"].iloc[0])],
            "n_customers": [n],
            "mean_bal": [mean],
            "sd_bal": [var**0.5],
        }
    )


@register(
    "q_apply_in_pandas",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal) / COUNT(*), 4) AS mean_bal,
           ROUND(STDDEV_SAMP(c_acctbal), 4) AS sd_bal
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("udf", "pandas", "grouped-map"),
)
def q_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map (the custom-stateful-operator escape hatch,
    SURVEY §2B): one Arrow batch per group in, one pandas frame out."""
    c = load_table(spark, sf_dir, "customer")
    out = c.groupBy("c_nationkey").applyInPandas(
        _zscore_stats,
        schema="c_nationkey int, n_customers long, mean_bal double, sd_bal double",
    )
    return out.select(
        "c_nationkey",
        "n_customers",
        F.round("mean_bal", 4).alias("mean_bal"),
        F.round("sd_bal", 4).alias("sd_bal"),
    ).orderBy("c_nationkey")


def _tag_batches(it):
    """mapInPandas kernel: pass-through with a derived column, iterator of
    Arrow batches (the multimodal decode plumbing shape)."""
    for pdf in it:
        pdf = pdf.copy()
        pdf["price_band"] = pd.cut(
            pdf["p_retailprice"], bins=[0, 500, 1500, float("inf")], labels=False
        ).astype("int64")
        yield pdf[["p_partkey", "p_retailprice", "price_band"]]


@register(
    "q_map_in_pandas",
    oracle="""
    SELECT p_partkey, ROUND(p_retailprice, 4) AS p_retailprice,
           CASE WHEN p_retailprice <= 500 THEN 0
                WHEN p_retailprice <= 1500 THEN 1
                ELSE 2 END AS price_band
    FROM part
    WHERE p_partkey <= 100
    ORDER BY p_partkey
    """,
    tags=("udf", "pandas", "map-in-pandas"),
)
def q_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas partition-wise transform (the pattern multimodal decode
    UDFs use: iterator of Arrow batches in/out, no per-row Python)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    out = p.mapInPandas(
        _tag_batches, schema="p_partkey long, p_retailprice double, price_band long"
    )
    return out.select(
        "p_partkey", F.round("p_retailprice", 4).alias("p_retailprice"), "price_band"
    ).orderBy("p_partkey")


@register(
    "q_python_udf",
    oracle="""
    SELECT n_name, REVERSE(n_name) AS reversed,
           CAST(LENGTH(n_name) AS INT) AS name_len
    FROM nation
    ORDER BY n_name
    """,
    tags=("udf", "python-row"),
)
def q_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the declared slow path — documented as
    10-100x slower than pandas_udf; kept on a 25-row dimension table where
    the interpreter roundtrip cannot matter)."""
    rev = F.udf(lambda s: s[::-1] if s is not None else None, StringType())
    n = load_table(spark, sf_dir, "nation")
    return (
        n.select(
            "n_name",
            rev("n_name").alias("reversed"),
            F.length("n_name").cast("int").alias("name_len"),
        ).orderBy("n_name")
    )


@register(
    "q_map_in_arrow",
    oracle="""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS chars_total
    FROM documents GROUP BY source ORDER BY source
    """,
    tags=("udf", "arrow"),
)
def q_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy batch transform surface — each input
    RecordBatch is processed with pyarrow.compute kernels (no pandas
    conversion at all), here computing per-doc char counts that the JVM
    then aggregates. Integer outputs -> exact oracle match."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def lens(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("source")),
                    pc.cast(
                        pc.utf8_length(b.column(b.schema.get_field_index("text"))),
                        pa.int64(),
                    ),
                ],
                names=["source", "text_len"],
            )

    d = load_table(spark, sf_dir, "documents").select("source", "text")
    per_doc = d.mapInArrow(lens, "source string, text_len long")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("text_len").alias("chars_total"),
        )
        .orderBy("source")
    )


@register(
    "q_apply_in_arrow",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_total
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("udf", "arrow"),
)
def q_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInArrow grouped-map: each group arrives as one pyarrow.Table;
    the reducer sums integral quantities with pyarrow.compute — the
    grouped-UDF surface without pandas materialization. Integer sums ->
    exact oracle match."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def agg(table: "pa.Table") -> "pa.Table":
        qty = pc.cast(table.column("l_quantity"), pa.int64())
        return pa.table(
            {
                "l_returnflag": [table.column("l_returnflag")[0].as_py()],
                "n": [table.num_rows],
                "qty_total": [pc.sum(qty).as_py()],
            }
        )

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    return (
        li.groupBy("l_returnflag")
        .applyInArrow(agg, "l_returnflag string, n long, qty_total long")
        .orderBy("l_returnflag")
    )
