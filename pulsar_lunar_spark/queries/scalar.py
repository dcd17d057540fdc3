"""Scalar function families (SURVEY §2B): string, date/time, math,
array/map + higher-order functions, JSON, null handling.

Everything is a built-in ``pyspark.sql.functions`` expression — JVM-side,
whole-stage-codegen'd; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from pulsar_lunar_spark.session import load_table, tables
from pulsar_lunar_spark.queries.registry import register


@register(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                                   AS name_upper,
           LOWER(p_brand)                                  AS brand_lower,
           LENGTH(p_name)                                  AS name_len,
           SUBSTRING(p_name, 1, 4)                         AS name_pre,
           CONCAT(p_brand, ':', p_type)                    AS brand_type,
           TRIM('  ' || p_name || ' ')                     AS name_trim,
           REPLACE(p_name, ' ', '_')                       AS name_us,
           LPAD(CAST(p_size AS VARCHAR), 3, '0')           AS size_pad,
           INSTR(p_name, 'bolt')                           AS bolt_pos,
           TRANSLATE(p_brand, '#', '-')                    AS brand_dash,
           REVERSE(p_type)                                 AS type_rev,
           REGEXP_EXTRACT(p_brand, '#(\\d+)', 1)           AS brand_num,
           REGEXP_REPLACE(p_name, '[aeiou]', '*', 'g')     AS name_novowel,
           SPLIT_PART(p_name, ' ', 1)                      AS first_word,
           CONTAINS(p_name, 'red')                         AS has_red,
           STARTS_WITH(p_type, 'STANDARD')                 AS is_standard
    FROM part
    WHERE p_partkey <= 100
    ORDER BY p_partkey
    """,
    tags=("function", "string"),
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family: upper/lower/length/substr/concat/trim/replace/
    lpad/instr/translate/reverse/regexp_extract/regexp_replace/split/contains."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name_pre"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.regexp_replace(F.col("p_name"), " ", "_").alias("name_us"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_pad"),
        F.instr(F.col("p_name"), "bolt").alias("bolt_pos"),
        F.translate(F.col("p_brand"), "#", "-").alias("brand_dash"),
        F.reverse(F.col("p_type")).alias("type_rev"),
        F.regexp_extract(F.col("p_brand"), r"#(\d+)", 1).alias("brand_num"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "*").alias("name_novowel"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.col("p_name").contains("red").alias("has_red"),
        F.col("p_type").startswith("STANDARD").alias("is_standard"),
    ).orderBy("p_partkey")


@register(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           STRFTIME(o_orderdate, '%Y-%m-%d')                          AS d,
           YEAR(o_orderdate)                                          AS y,
           MONTH(o_orderdate)                                         AS m,
           DAY(o_orderdate)                                           AS dom,
           QUARTER(o_orderdate)                                       AS q,
           DAYOFWEEK(o_orderdate) + 1                                 AS dow,
           STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d')     AS month_start,
           DATE_DIFF('day', o_orderdate, TIMESTAMP '2002-01-01')      AS days_to_2002,
           STRFTIME(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d')       AS plus3m,
           STRFTIME(o_orderdate - INTERVAL 7 DAY, '%Y-%m-%d')         AS minus7d,
           CAST(EXTRACT(epoch FROM o_orderdate) AS BIGINT)            AS epoch_s,
           STRFTIME(LAST_DAY(o_orderdate), '%Y-%m-%d')                AS month_end
    FROM orders
    WHERE o_orderkey <= 200
    ORDER BY o_orderkey
    """,
    tags=("function", "datetime"),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract parts, truncation, diff, interval arithmetic,
    epoch, last_day. Output formatted as strings for timezone-proof hashing."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias("days_to_2002"),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus3m"),
        F.date_format(F.date_sub("o_orderdate", 7), "yyyy-MM-dd").alias("minus7d"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
    ).orderBy("o_orderkey")


@register(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 0)                         AS price_r0,
           CAST(FLOOR(l_quantity) AS BIGINT)                 AS qty_floor,
           CAST(CEIL(l_discount * 100) AS BIGINT)            AS disc_pct_ceil,
           ABS(l_quantity - 25)                              AS qty_dev,
           ROUND(POWER(l_quantity, 2), 4)                    AS qty_sq,
           ROUND(SQRT(l_extendedprice), 4)                   AS price_sqrt,
           ROUND(LN(l_extendedprice + 1), 4)                 AS price_ln,
           ROUND(LOG10(l_extendedprice + 1), 4)              AS price_log10,
           ROUND(EXP(l_discount), 4)                         AS disc_exp,
           CAST(l_orderkey % 7 AS BIGINT)                    AS mod7,
           CAST(((l_orderkey - 100) % 7 + 7) % 7 AS BIGINT)  AS pmod7,
           CAST(SIGN(l_quantity - 25) AS BIGINT)             AS qty_sign,
           GREATEST(l_quantity, l_discount * 100)            AS g,
           LEAST(l_quantity, l_discount * 100)               AS l
    FROM lineitem
    WHERE l_orderkey <= 100
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("function", "math"),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/floor/ceil/abs/pow/sqrt/ln/log10/exp/mod/pmod/
    sign/greatest/least."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 0).alias("price_r0"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("price_ln"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 4).alias("price_log10"),
        F.round(F.exp("l_discount"), 4).alias("disc_exp"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("mod7"),
        F.pmod(F.col("l_orderkey") - 100, F.lit(7)).cast("bigint").alias("pmod7"),
        F.signum(F.col("l_quantity") - 25).cast("bigint").alias("qty_sign"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("g"),
        F.least(F.col("l_quantity"), F.col("l_discount") * 100).alias("l"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q_array_funcs",
    oracle="""
    SELECT doc_id,
           LEN(STRING_SPLIT(text, ' '))                                        AS n_words,
           LEN(LIST_DISTINCT(STRING_SPLIT(text, ' ')))                         AS n_distinct_words,
           STRING_SPLIT(text, ' ')[1]                                          AS first_word,
           LIST_CONTAINS(STRING_SPLIT(text, ' '), 'spark')                     AS has_spark,
           LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> LENGTH(w) > 4))       AS n_long_words,
           CAST(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(text, ' '),
                                        w -> LENGTH(w))) AS BIGINT)            AS total_word_chars,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(
               LIST_FILTER(STRING_SPLIT(text, ' '), w -> LENGTH(w) <= 3))), ',') AS short_words
    FROM documents
    WHERE doc_id <= 50
    ORDER BY doc_id
    """,
    tags=("function", "array", "hof"),
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order functions: split/size/array_distinct/element_at/
    array_contains/filter/transform/aggregate/sort/join — all JVM lambdas."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 50)
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        words.getItem(0).alias("first_word"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.size(F.filter(words, lambda w: F.length(w) > 4)).alias("n_long_words"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_word_chars"),
        F.array_join(
            F.sort_array(F.array_distinct(F.filter(words, lambda w: F.length(w) <= 3))), ","
        ).alias("short_words"),
    ).orderBy("doc_id")


@register(
    "q_map_funcs",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("function", "map", "json"),
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + map_keys/map_values + JSON-derived map, reduced to
    a deterministic aggregate (map columns themselves don't hash portably)."""
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(F.lit("k"), F.get_json_object(F.col("props"), "$.k"))
    return (
        e.select(
            "event_type",
            F.element_at(F.map_values(m), 1).cast("int").alias("k_val"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k_val").cast("bigint").alias("sum_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                   AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER)  AS k_int,
           CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k_doubled
    FROM events
    WHERE event_id <= 100
    ORDER BY event_id
    """,
    tags=("function", "json"),
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: get_json_object + from_json with an explicit schema —
    the payload-decode path of the reference's serde layer
    (/root/reference/src/message/serde.rs:6-28, demo src/main.rs:65-73)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 100)
    schema = StructType([StructField("k", IntegerType())])
    parsed = F.from_json(F.col("props"), schema)
    return e.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        (parsed.getField("k") * 2).alias("k_doubled"),
    ).orderBy("event_id")


@register(
    "q_null_handling",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '<masked>')        AS seg_masked,
           (NULLIF(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM NULL)  AS is_building,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE ROUND(c_acctbal, 4) END AS bal_nonneg,
           COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE ROUND(c_acctbal, 4) END, 0.0) AS bal_filled,
           IFNULL(NULLIF(CAST(c_nationkey AS VARCHAR), '0'), 'zero')     AS nation_str
    FROM customer
    WHERE c_custkey <= 100
    ORDER BY c_custkey
    """,
    tags=("function", "null"),
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null family: coalesce / nullif / null-safe equality (<=>) / ifnull."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    seg_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    bal = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.round("c_acctbal", 4))
    return c.select(
        "c_custkey",
        F.coalesce(seg_null, F.lit("<masked>")).alias("seg_masked"),
        seg_null.eqNullSafe(F.lit(None)).alias("is_building"),
        bal.alias("bal_nonneg"),
        F.coalesce(bal, F.lit(0.0)).alias("bal_filled"),
        F.ifnull(F.nullif(F.col("c_nationkey").cast("string"), F.lit("0")), F.lit("zero")).alias(
            "nation_str"
        ),
    ).orderBy("c_custkey")


@register(
    "q_json_tuple",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_val,
           '{"event_id":' || event_id || '}' AS as_json
    FROM events
    WHERE event_id <= 100
    ORDER BY event_id
    """,
    tags=("function", "json", "generator"),
)
def q_json_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_tuple (generator-style multi-field extraction) + to_json
    (struct -> JSON text, the envelope's serialize direction)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 100)
    return (
        e.select(
            "event_id",
            F.json_tuple(F.col("props"), "k").alias("k_val"),
            F.to_json(F.struct("event_id")).alias("as_json"),
        )
        .orderBy("event_id")
    )


@register(
    "q_string_agg",
    oracle="""
    SELECT r_name,
           STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
           STRING_AGG(DISTINCT SUBSTR(n_name, 1, 8), '|' ORDER BY SUBSTR(n_name, 1, 8))
               AS prefixes,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
    tags=("agg", "string", "listagg"),
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG WITHIN GROUP, Spark 4): the
    order clause makes the concatenation deterministic — without it the
    result depends on partial-aggregation arrival order and can never be
    hash-checked. DISTINCT + ORDER BY covered on the second column."""
    tables(spark, sf_dir, names=("nation", "region"))
    return spark.sql(
        """
        SELECT r_name,
               LISTAGG(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
               LISTAGG(DISTINCT SUBSTR(n_name, 1, 8), '|')
                   WITHIN GROUP (ORDER BY SUBSTR(n_name, 1, 8)) AS prefixes,
               CAST(COUNT(*) AS BIGINT) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
        """
    )


@register(
    "q_pagination",
    oracle="""
    SELECT c_custkey, c_name, ROUND(c_acctbal, 4) AS acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 20 OFFSET 40
    """,
    tags=("sort", "limit", "offset", "pagination"),
)
def q_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed pagination (page 3 of 20): ORDER BY ... LIMIT ... OFFSET via
    DataFrame offset()/limit() — the total (acctbal, custkey) order makes
    every page deterministic. Spark executes this as a single
    top-(offset+limit) selection, not a global sort."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_name", F.round("c_acctbal", 4).alias("acctbal"))
        .orderBy(F.desc("acctbal"), F.asc("c_custkey"))
        .offset(40)
        .limit(20)
    )
