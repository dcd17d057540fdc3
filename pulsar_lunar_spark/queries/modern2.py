"""Spark SQL surface breadth, batch 2: Theta set-operation sketches,
aggregate-function breadth (bit/bool/count_if/any_value), the mask()
redaction function, XPath extraction, and the parse_url family.

Each query exercises a function family that had no registered coverage;
oracles are value-exact DuckDB twins (regex/replace replicas for the
Spark-only string functions) or flag-style bounds where the operator is
sketch-approximate by design (theta estimates above the exact-mode
threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import load_table, tables

_THETA_SPARK = """
WITH a AS (SELECT theta_sketch_agg(o_custkey) AS sk FROM orders WHERE o_orderkey % 2 = 0),
     b AS (SELECT theta_sketch_agg(o_custkey) AS sk FROM orders WHERE o_orderkey % 3 = 0),
     est AS (
       SELECT CAST(theta_sketch_estimate(theta_union(a.sk, b.sk)) AS BIGINT) AS u_est,
              CAST(theta_sketch_estimate(theta_intersection(a.sk, b.sk)) AS BIGINT) AS i_est,
              CAST(theta_sketch_estimate(theta_difference(a.sk, b.sk)) AS BIGINT) AS d_est
       FROM a, b
     ),
     exact AS (
       SELECT COUNT(DISTINCT CASE WHEN o_orderkey % 2 = 0 OR o_orderkey % 3 = 0
                                  THEN o_custkey END) AS u_x,
              (SELECT COUNT(*) FROM (
                 SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0
                 INTERSECT
                 SELECT o_custkey FROM orders WHERE o_orderkey % 3 = 0)) AS i_x
       FROM orders
     )
SELECT exact.u_x AS union_exact, exact.i_x AS intersect_exact,
       ABS(est.u_est - exact.u_x) <= GREATEST(5, CAST(exact.u_x * 0.05 AS BIGINT))
           AS union_ok,
       ABS(est.i_est - exact.i_x) <= GREATEST(5, CAST(exact.u_x * 0.05 AS BIGINT))
           AS intersect_ok,
       est.d_est <= est.u_est AS difference_bounded
FROM est, exact
"""


@register(
    "q_theta_sketch_ops",
    oracle="""
    WITH exact AS (
        SELECT COUNT(DISTINCT CASE WHEN o_orderkey % 2 = 0 OR o_orderkey % 3 = 0
                                   THEN o_custkey END) AS u_x,
               (SELECT COUNT(*) FROM (
                  SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0
                  INTERSECT
                  SELECT o_custkey FROM orders WHERE o_orderkey % 3 = 0)) AS i_x
        FROM orders
    )
    SELECT CAST(u_x AS BIGINT) AS union_exact, CAST(i_x AS BIGINT) AS intersect_exact,
           TRUE AS union_ok, TRUE AS intersect_ok, TRUE AS difference_bounded
    FROM exact
    """,
    tags=("sketch", "theta", "set-ops"),
)
def q_theta_sketch_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches (Apache DataSketches): the MERGEABLE SET-ALGEBRA
    sketch family — unlike HLL (union-only, q_hll_distinct), theta
    supports union AND intersection AND difference of distinct-sets, the
    audience-overlap primitive (customers in segment A ∩ segment B
    across a 100 TB log, one pass per segment, sketches merged
    anywhere). Exact mode below k=4096 entries, sampling above; the
    oracle pins the exact union/intersection cardinalities plus 5%-bound
    flags on the estimates (tight at any SF: rse ≈ 1/sqrt(4096))."""
    tables(spark, sf_dir, names=("orders",))
    return spark.sql(_THETA_SPARK)


@register(
    "q_agg_breadth",
    oracle="""
    SELECT o_orderstatus,
           CAST(BIT_AND(o_orderkey) AS BIGINT) AS key_bit_and,
           CAST(BIT_OR(o_orderkey) AS BIGINT) AS key_bit_or,
           CAST(BIT_XOR(o_orderkey) AS BIGINT) AS key_bit_xor,
           BOOL_AND(o_totalprice > 0) AS all_positive,
           BOOL_OR(o_totalprice > 400000) AS any_jumbo,
           CAST(COUNT_IF(o_orderkey % 2 = 0) AS BIGINT) AS n_even,
           ANY_VALUE(o_orderstatus) AS status_again
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("agg", "bitwise", "boolean"),
)
def q_agg_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-function breadth: bitwise AND/OR/XOR folds (the
    permission-mask / parity-audit aggregates), BOOL_AND/BOOL_OR
    (EVERY/SOME), COUNT_IF, and ANY_VALUE — identical names and
    semantics on both engines, all order-insensitive. ANY_VALUE is
    emitted over a column functionally dependent on the group key, the
    only form in which it is deterministic (and exactly the hint it
    gives the optimizer in real queries)."""
    tables(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus,
               BIT_AND(o_orderkey) AS key_bit_and,
               BIT_OR(o_orderkey) AS key_bit_or,
               BIT_XOR(o_orderkey) AS key_bit_xor,
               BOOL_AND(o_totalprice > 0) AS all_positive,
               BOOL_OR(o_totalprice > 400000) AS any_jumbo,
               COUNT_IF(o_orderkey % 2 = 0) AS n_even,
               ANY_VALUE(o_orderstatus) AS status_again
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
        """
    )


@register(
    "q_mask_redact",
    oracle="""
    SELECT c_custkey,
           REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(c_name,
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
               AS masked_default,
           REGEXP_REPLACE(c_name, '[0-9]', '#', 'g') AS masked_digits_only
    FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey
    """,
    tags=("function", "mask", "pii"),
)
def q_mask_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mask() redaction function (the built-in PII scrubber — the
    JVM-codegen sibling of the regex chains in operators/text.py):
    default masking (upper->X, lower->x, digit->n) and a digits-only
    variant that preserves letter structure. The oracle is the exact
    regexp_replace chain, so every masked character position must
    match."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.mask(F.col("c_name")).alias("masked_default"),
        F.mask(
            F.col("c_name"),
            F.lit(None).cast("string"),  # keep uppercase
            F.lit(None).cast("string"),  # keep lowercase
            F.lit("#"),  # digits -> '#'
            F.lit(None).cast("string"),  # keep other chars
        ).alias("masked_digits_only"),
    ).orderBy("c_custkey")


@register(
    "q_xpath_extract",
    oracle="""
    WITH x AS (
        SELECT n_nationkey,
               '<nation><name>' || n_name || '</name><region>'
                   || CAST(n_regionkey AS INT) || '</region></nation>' AS doc
        FROM nation
    )
    SELECT n_nationkey,
           REGEXP_EXTRACT(doc, '<name>(.*?)</name>', 1) AS name_x,
           CAST(REGEXP_EXTRACT(doc, '<region>(.*?)</region>', 1) AS INT) AS region_x
    FROM x ORDER BY n_nationkey
    """,
    tags=("function", "xpath", "xml"),
)
def q_xpath_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath extraction (xpath_string / xpath_int — the path-query layer
    over XML payloads, complementing from_xml's whole-schema decode in
    q_xml_roundtrip): XML docs are built from nation rows, then fields
    are pulled back out by path. The oracle re-extracts the same fields
    with regexes, so a namespace/escaping bug in either direction breaks
    the hash."""
    n = load_table(spark, sf_dir, "nation")
    doc = F.concat(
        F.lit("<nation><name>"), F.col("n_name"),
        F.lit("</name><region>"), F.col("n_regionkey").cast("int").cast("string"),
        F.lit("</region></nation>"),
    )
    x = n.select("n_nationkey", doc.alias("doc"))
    return x.select(
        "n_nationkey",
        F.xpath_string(F.col("doc"), F.lit("/nation/name")).alias("name_x"),
        F.xpath_int(F.col("doc"), F.lit("/nation/region")).alias("region_x"),
    ).orderBy("n_nationkey")


@register(
    "q_url_funcs",
    oracle="""
    WITH u AS (
        SELECT n_nationkey, n_name,
               'https://data.example.org:8443/corpus/' || n_nationkey
                   || '?lang=en&name=' || REPLACE(n_name, ' ', '+') || '#part' AS url
        FROM nation
    )
    SELECT n_nationkey,
           'data.example.org' AS host,
           '/corpus/' || n_nationkey AS path,
           REPLACE(n_name, ' ', '+') AS name_param,
           REPLACE(n_name, ' ', '+') AS encoded,
           n_name AS decoded
    FROM u ORDER BY n_nationkey
    """,
    tags=("function", "url", "parsing"),
)
def q_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parse_url family (HOST/PATH/QUERY-key extraction) plus
    url_encode/url_decode round-trip — the log-ingestion URL toolkit
    (the structured sibling of q_url_domains' regex parsing). Nation
    names are all [A-Z ] so form-encoding is exactly space->'+', which
    the oracle replicates with REPLACE; the decode leg must return the
    original name bit-exactly."""
    n = load_table(spark, sf_dir, "nation")
    url = F.concat(
        F.lit("https://data.example.org:8443/corpus/"),
        F.col("n_nationkey").cast("string"),
        F.lit("?lang=en&name="), F.url_encode(F.col("n_name")), F.lit("#part"),
    )
    u = n.select("n_nationkey", "n_name", url.alias("url"))
    return u.select(
        "n_nationkey",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("name")).alias("name_param"),
        F.url_encode(F.col("n_name")).alias("encoded"),
        F.url_decode(F.url_encode(F.col("n_name"))).alias("decoded"),
    ).orderBy("n_nationkey")


@register(
    "q_kll_quantiles",
    oracle="""
    WITH c AS (SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS v FROM orders)
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(2 * QUANTILE_CONT(v, 0.5) AS BIGINT) AS p50_exact_x2,
           TRUE AS p50_in_envelope, TRUE AS p90_in_envelope
    FROM c
    """,
    tags=("sketch", "kll", "quantile"),
)
def q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketches (Apache DataSketches — the provably-optimal
    streaming quantile family, completing the sketch set next to CMS /
    HLL / GK / theta): per-status sketches built in one pass, merged with
    kll_merge_agg (the two-level rollup a 100 TB percentile dashboard
    maintains), quantiles read from the MERGED sketch. The oracle pins
    the exact count and exact median, plus envelope flags asserting the
    sketch's p50/p90 land within the exact p45-p55 / p85-p95 rank bands
    (KLL default-k rank error ~1.65% at 99% confidence — 5% is generous
    at every SF)."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    cells = o.groupBy("o_orderstatus").agg(
        F.kll_sketch_agg_bigint(cents).alias("sk")
    )
    merged = cells.agg(F.kll_merge_agg_bigint("sk").alias("mk"))
    exact = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(
            "percentile(cast(floor(o_totalprice * 100) as bigint), "
            "array(0.45, 0.5, 0.55, 0.85, 0.9, 0.95))"
        ).alias("px"),
    )
    return (
        merged.crossJoin(exact)
        .select(
            "n",
            # 2x the interpolated median stays integer-exact (midpoint of
            # two ints) — Spark percentile() and DuckDB QUANTILE_CONT share
            # the linear-interpolation definition
            F.expr("cast(2 * px[1] as bigint)").alias("p50_exact_x2"),
            F.expr(
                "kll_sketch_get_quantile_bigint(mk, 0.5)"
                " between cast(px[0] as bigint) and cast(px[2] as bigint)"
            ).alias("p50_in_envelope"),
            F.expr(
                "kll_sketch_get_quantile_bigint(mk, 0.9)"
                " between cast(px[3] as bigint) and cast(px[5] as bigint)"
            ).alias("p90_in_envelope"),
        )
    )


@register(
    "q_regr_aggregates",
    oracle="""
    WITH d AS (
        SELECT o_orderstatus,
               CAST(o_orderkey % 100 AS BIGINT) AS x,
               CAST(FLOOR(o_totalprice) AS BIGINT) AS y
        FROM orders
    )
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx,
           TRUE AS slope_ok, TRUE AS intercept_ok, TRUE AS r2_in_range
    FROM d GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("agg", "regression"),
)
def q_regr_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL linear-regression aggregates (regr_count/slope/intercept/r2 —
    the built-in OLS family, the declarative sibling of
    q_group_regression's hand-built exact-rational slope): fitted per
    order status over integer-valued (key-mod, floor-price) pairs.

    Float regression internals are accumulation-order sensitive, so the
    emitted columns are the EXACT integer moment sums (n, Σx, Σy, Σxy,
    Σx² — value-identical on both engines) plus flags asserting the
    built-in estimates agree with the closed-form rational slope
    (n·Σxy − Σx·Σy)/(n·Σxx − Σx²) to 1e-6 relative and that R² ∈ [0,1].
    The DuckDB twin recomputes the same anchors and emits literal TRUE."""
    tables(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
        WITH d AS (
            SELECT o_orderstatus,
                   CAST(o_orderkey % 100 AS BIGINT) AS x,
                   CAST(FLOOR(o_totalprice) AS BIGINT) AS y
            FROM orders
        )
        SELECT o_orderstatus,
               COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx,
               ABS(regr_slope(y, x)
                   - (COUNT(*) * SUM(x*y) - SUM(x) * SUM(y))
                     / CAST(COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) AS DOUBLE))
                 <= GREATEST(1e-6 * ABS(regr_slope(y, x)), 1e-9) AS slope_ok,
               ABS(regr_intercept(y, x)
                   - (SUM(y) - regr_slope(y, x) * SUM(x)) / COUNT(*))
                 <= GREATEST(1e-6 * ABS(regr_intercept(y, x)), 1e-6) AS intercept_ok,
               regr_r2(y, x) BETWEEN 0.0 AND 1.0 AS r2_in_range
        FROM d GROUP BY o_orderstatus ORDER BY o_orderstatus
        """
    )


@register(
    "q_timezone_convert",
    oracle="""
    SELECT event_id,
           STRFTIME(ts + INTERVAL 330 MINUTE, '%Y-%m-%d %H:%M:%S') AS ist,
           STRFTIME(ts - INTERVAL 480 MINUTE, '%Y-%m-%d %H:%M:%S') AS pst_fixed,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS roundtrip
    FROM events WHERE event_id < 500 ORDER BY event_id
    """,
    tags=("function", "timezone", "datetime"),
)
def q_timezone_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion family (convert_timezone /
    from_utc_timestamp / to_utc_timestamp — the event-time localization
    step of a multi-region pipeline). Fixed numeric offsets keep the
    check deterministic across IANA tzdata versions: the oracle applies
    the equivalent interval shifts, and the to/from round-trip must
    return the original instant bit-exactly. All three are JVM scan
    expressions — zero shuffle."""
    tables(spark, sf_dir, names=("events",))
    return spark.sql(
        """
        SELECT event_id,
               date_format(convert_timezone('UTC', '+05:30', ts),
                           'yyyy-MM-dd HH:mm:ss') AS ist,
               date_format(from_utc_timestamp(ts, '-08:00'),
                           'yyyy-MM-dd HH:mm:ss') AS pst_fixed,
               date_format(to_utc_timestamp(from_utc_timestamp(ts, '+02:00'),
                                            '+02:00'),
                           'yyyy-MM-dd HH:mm:ss') AS roundtrip
        FROM events WHERE event_id < 500 ORDER BY event_id
        """
    )


@register(
    "q_width_bucket",
    oracle="""
    WITH c AS (SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS v FROM orders)
    SELECT CASE WHEN v < 0 THEN 0 WHEN v >= 60000000 THEN 13
                ELSE 1 + (v * 12) // 60000000 END AS bucket,
           COUNT(*) AS n,
           CAST(SUM(v) AS BIGINT) AS sum_cents
    FROM c GROUP BY 1 ORDER BY 1
    """,
    tags=("function", "histogram", "bucketing"),
)
def q_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """width_bucket equi-width histogram assignment (the SQL-standard
    bucketing primitive behind q_value_histogram's hand-rolled floor
    bins): 12 buckets over [0, 600k) cents, with the under/overflow
    buckets 0 and n+1. Integer cents keep the bucket arithmetic exact;
    the oracle replicates width_bucket's exact boundary semantics with
    integer floor division."""
    tables(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
        WITH c AS (SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS v FROM orders)
        SELECT width_bucket(v, 0, 60000000, 12) AS bucket,
               COUNT(*) AS n,
               CAST(SUM(v) AS BIGINT) AS sum_cents
        FROM c GROUP BY 1 ORDER BY 1
        """
    )


@register(
    "q_map_hof",
    oracle="""
    SELECT o_orderkey,
           CAST((o_orderkey % 10) * 2 AS INT) AS c_doubled,
           CAST(CASE WHEN o_orderkey % 10 = 2 THEN 1 ELSE 2 END AS INT) AS n_kept,
           11 AS a_zip,
           4 AS n_ext,
           '2' AS b_up
    FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
    """,
    tags=("function", "map", "hof"),
)
def q_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions (str_to_map, transform_keys/values,
    map_filter, map_zip_with, map_concat — the config/properties
    manipulation toolkit for the envelope's properties column): a
    delimited string parses to a map, values double, entries filter,
    two maps zip, a key upcases — and the emitted scalars extracted from
    each result have closed forms the oracle computes directly
    (c-value = 2·(key mod 10), the filter drops 'b' always and 'c'
    exactly when its value is '2', the zip adds the broadcast literal
    map). Everything is JVM expression territory — no shuffle, no
    Python."""
    tables(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
        WITH m AS (
          SELECT o_orderkey,
                 str_to_map('a:1,b:2,c:' || CAST(o_orderkey % 10 AS STRING),
                            ',', ':') AS kv
          FROM orders WHERE o_orderkey < 500
        ), t AS (
          SELECT o_orderkey,
                 transform_values(kv, (k, v) -> CAST(v AS INT) * 2) AS doubled,
                 map_filter(kv, (k, v) -> v <> '2') AS kept,
                 map_zip_with(kv, map('a', 10, 'b', 20, 'c', 30),
                              (k, v1, v2) -> coalesce(CAST(v1 AS INT), 0)
                                             + coalesce(v2, 0)) AS zipped,
                 map_concat(kv, map('d', '9')) AS extended,
                 transform_keys(kv, (k, v) -> upper(k)) AS upcased
          FROM m
        )
        SELECT o_orderkey,
               element_at(doubled, 'c') AS c_doubled,
               size(kept) AS n_kept,
               element_at(zipped, 'a') AS a_zip,
               size(extended) AS n_ext,
               element_at(upcased, 'B') AS b_up
        FROM t ORDER BY o_orderkey
        """
    )


@register(
    "q_array_hof2",
    oracle="""
    SELECT o_orderkey,
           TRUE AS all_pos,
           (o_orderkey % 5) + 2 >= 3 AS has_mult3,
           CAST((o_orderkey % 5) + 2 AS INT) AS n_zip,
           CAST((o_orderkey % 5) + 2 AS INT) AS n_compact,
           CAST(2 AS BIGINT) AS pos2
    FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
    """,
    tags=("function", "array", "hof"),
)
def q_array_hof2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order breadth beyond transform/filter/aggregate
    (q_array_funcs): forall / exists predicates, arrays_zip struct
    pairing, array_insert + array_compact (null-tolerant editing), and
    array_position — over sequence-generated arrays of key-derived
    length, so every emitted scalar has a closed form the oracle
    computes arithmetically (xs = 1..(key mod 5)+2: always positive, a
    multiple of 3 exists iff len >= 3, the inserted NULL compacts away,
    and 2 sits at position 2). All JVM expressions in the scan."""
    tables(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
        WITH a AS (
          SELECT o_orderkey,
                 sequence(1, CAST(o_orderkey % 5 AS INT) + 2) AS xs
          FROM orders WHERE o_orderkey < 500
        )
        SELECT o_orderkey,
               forall(xs, x -> x > 0) AS all_pos,
               exists(xs, x -> x % 3 = 0) AS has_mult3,
               size(arrays_zip(xs, reverse(xs))) AS n_zip,
               size(array_compact(
                   array_insert(cast(xs AS array<int>), 1, CAST(NULL AS INT))
               )) AS n_compact,
               array_position(xs, 2) AS pos2
        FROM a ORDER BY o_orderkey
        """
    )
