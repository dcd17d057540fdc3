"""Crafted-input tests for batch-4 pipeline operators: PII redaction,
token-window chunking, passage dedup, and the Z-order clustering key."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_lunar_spark.operators import text as T
from pulsar_lunar_spark.operators.corpus import chunk_table, passage_dup_stats
from pulsar_lunar_spark.operators.partitioning import zorder_key, zorder_sql


def test_redact_pii_counts_and_output(spark):
    s = "mail a.b+c@sub.example.com then call +1-555-0042 from 10.1.2.3 ok"
    df = spark.createDataFrame([(s,)], "t string").select(
        T.pii_count(F.col("t"), T.PII_EMAIL).alias("e"),
        T.pii_count(F.col("t"), T.PII_PHONE).alias("p"),
        T.pii_count(F.col("t"), T.PII_IPV4).alias("i"),
        T.redact_pii(F.col("t")).alias("red"),
    )
    r = df.collect()[0]
    assert (r.e, r.p, r.i) == (1, 1, 1)
    assert r.red == "mail [PII] then call [PII] from [PII] ok"


def test_redact_pii_clean_text_untouched(spark):
    s = "no personal data here just words"
    r = (
        spark.createDataFrame([(s,)], "t string")
        .select(T.redact_pii(F.col("t")).alias("red"))
        .collect()[0]
    )
    assert r.red == s


def test_chunk_table_windows_and_overlap(spark):
    words = [f"w{i:02d}" for i in range(50)]
    df = spark.createDataFrame([(1, " ".join(words))], "id long, text string")
    rows = chunk_table(df, "id", "text", window=32, stride=24).orderBy("chunk_idx").collect()
    assert [r.start for r in rows] == [0, 24, 48]
    assert [r.n_tokens for r in rows] == [32, 26, 2]
    # overlap: chunk 1 starts 8 tokens before chunk 0 ends
    assert rows[1].chunk_text.split(" ")[:8] == words[24:32]
    assert rows[2].chunk_text == "w48 w49"


def test_chunk_table_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "only three words"), (2, "")], "id long, text string")
    rows = {r["__id"]: r for r in chunk_table(df, "id", "text").collect()}
    assert rows[1].n_tokens == 3 and rows[1].chunk_idx == 0
    assert rows[2].n_tokens == 1  # split('') -> [''] — one empty token, like DuckDB


def test_passage_dup_stats_planted_share(spark):
    shared = " ".join(f"s{i}" for i in range(8))
    df = spark.createDataFrame(
        [
            (1, shared + " " + " ".join(f"a{i}" for i in range(8)), "en"),
            (2, shared + " " + " ".join(f"b{i}" for i in range(8)), "en"),
            (3, " ".join(f"c{i}" for i in range(8)), "fr"),
        ],
        "id long, text string, lang string",
    )
    out = {r.grp: r for r in passage_dup_stats(df, "id", "text", "lang").collect()}
    assert out["en"].dup_passages == 1 and out["en"].docs_sharing == 2
    assert out["en"].distinct_passages == 3
    assert out["fr"].dup_passages == 0


def _py_zorder(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_and_sql(spark, duck):
    pts = [(0, 0), (1, 0), (0, 1), (3, 5), (1234, 567), (65535, 65535)]
    df = spark.createDataFrame(pts, "x long, y long").select(
        "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
    )
    for r in df.collect():
        assert r.z == _py_zorder(r.x, r.y), (r.x, r.y)
    sql = f"SELECT {zorder_sql('x', 'y')} AS z FROM (VALUES (1234, 567)) t(x, y)"
    assert duck.sql(sql).fetchone()[0] == _py_zorder(1234, 567)


def test_zorder_locality_bounds_both_dims(spark):
    # 32x32 grid: any 1024-cell z-bucket (>>10) spans at most a 32x32 tile,
    # i.e. both dimension ranges are bounded by 31 — the data-skipping win.
    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, "x long, y long").select(
        "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
    )
    agg = (
        df.groupBy(F.shiftright("z", 10).alias("b"))
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .collect()
    )
    assert agg and all(r.dx <= 31 and r.dy <= 31 for r in agg)


def test_kmeans_keep_dist_zero_for_centroid_seed(spark):
    # 4 well-separated points, each its own init centroid -> every vector
    # is its own cluster center, distance exactly 0 after any #iterations.
    rows = [(i, [float(10 * i), 0.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from pulsar_lunar_spark.operators.ml import kmeans_fit

    out = kmeans_fit(df, "vec_id", "embedding", init_ids=[0, 1, 2, 3],
                     iterations=2, keep_dist=True).collect()
    assert {r.cluster for r in out} == {0, 1, 2, 3}
    assert all(r.dist == 0.0 for r in out)


def test_unigram_surprisal_micronat_quantization(spark):
    # The per-token micro-nat expression must match python math.log exactly
    # after FLOOR quantization, and a rare word must outscore a common one.
    import math

    df = spark.createDataFrame([(3, 4), (1, 4)], "tf long, n_tok long")
    wmic = F.floor(
        -F.log(F.col("tf").cast("double") / F.col("n_tok")) * 1000000 + 0.5
    ).cast("bigint")
    got = {r.tf: r.w for r in df.select("tf", wmic.alias("w")).collect()}
    want = {tf: math.floor(-math.log(tf / 4) * 1000000 + 0.5) for tf in (3, 1)}
    assert got == want
    assert got[1] > got[3]
