"""Batch-8 operator semantics: DSIR hashed n-gram importance (target-slice
monotonicity, posterior bounds) and deterministic shard assignment
(stability, coverage, balance arithmetic)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from pulsar_lunar_spark.operators import corpus as C
from pulsar_lunar_spark.queries import all_queries


# ---------------------------------------------------------------------------
# hashed_ngram_importance
# ---------------------------------------------------------------------------


def _importance(spark, rows):
    df = spark.createDataFrame([Row(**r) for r in rows])
    out = C.hashed_ngram_importance(
        df, id_col="doc_id", text_col="text", target=F.col("is_t")
    )
    return {r["doc_id"]: (r["n_ngrams"], r["avg_importance"]) for r in out.collect()}


def test_dsir_target_vocab_scores_above_raw_vocab(spark):
    # Target slice speaks "alpha beta gamma"; raw slice speaks "delta
    # epsilon zeta". Two unlabeled probes, one per dialect: the
    # target-dialect probe must outrank the raw-dialect probe.
    rows = [
        {"doc_id": 0, "text": "alpha beta gamma alpha beta", "is_t": True},
        {"doc_id": 1, "text": "beta gamma alpha beta gamma", "is_t": True},
        {"doc_id": 2, "text": "delta epsilon zeta delta epsilon", "is_t": False},
        {"doc_id": 3, "text": "epsilon zeta delta epsilon zeta", "is_t": False},
        {"doc_id": 10, "text": "alpha beta gamma alpha", "is_t": False},
        {"doc_id": 11, "text": "delta epsilon zeta delta", "is_t": False},
    ]
    scores = _importance(spark, rows)
    assert scores[10][1] > scores[11][1]
    # every posterior-mean lands in the ppm probability range
    for n, avg in scores.values():
        assert n >= 1 and 0 <= avg <= 1_000_000


def test_dsir_short_docs_excluded_and_counts_exact(spark):
    rows = [
        {"doc_id": 0, "text": "one two three", "is_t": True},  # 2 bigrams
        {"doc_id": 1, "text": "solo", "is_t": False},  # < 2 words: excluded
        {"doc_id": 2, "text": "a b", "is_t": False},  # exactly 1 bigram
    ]
    scores = _importance(spark, rows)
    assert set(scores) == {0, 2}
    assert scores[0][0] == 2 and scores[2][0] == 1


def test_dsir_query_leaves_no_new_cached_rdds(spark, sf_dir):
    """q_dsir_select ships the zero-cache two-pass form (the persist+spool
    variant measured a wash and was rejected — see its docstring); this
    guard pins that it STAYS cache-free, so a future persist regression
    that forgets the unpersist fails here (set difference, not a count
    compare — the ContextCleaner may reap an earlier test's cache
    concurrently)."""

    def rdd_ids():
        it = spark.sparkContext._jsc.getPersistentRDDs().keySet().iterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    before = rdd_ids()
    all_queries()["q_dsir_select"].fn(spark, sf_dir).collect()
    leaked = rdd_ids() - before
    assert not leaked, f"new cached RDDs after dsir query: {leaked}"


# ---------------------------------------------------------------------------
# setsim_prefix_join
# ---------------------------------------------------------------------------


def test_setsim_prefix_matches_bruteforce(spark, sf_dir):
    """Prefix filtering must be COMPLETE: the pair set equals brute-force
    all-pairs exact Jaccard on the same corpus (parity can't catch a
    broken filter because both engines share it — this test is the
    ground truth)."""
    from pulsar_lunar_spark.operators.dedup import setsim_prefix_join, shingles
    from pulsar_lunar_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    # plant one near-dup so the qualifying set is non-empty
    planted = d.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.slice(F.split(F.col("text"), " "), 1,
                    F.expr("greatest((9 * size(split(text, ' '))) div 10, 3)").cast("int")),
        ).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(planted)
    got = {
        (r["id_a"], r["id_b"])
        for r in setsim_prefix_join(corpus, "doc_id", "text", threshold_ppm=600_000).collect()
    }
    sh = corpus.select(F.col("doc_id").alias("i"), shingles(F.col("text")).alias("sh"))
    a = sh.select(F.col("i").alias("id_a"), F.col("sh").alias("sa"))
    b = sh.select(F.col("i").alias("id_b"), F.col("sh").alias("sb"))
    brute = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.expr(
                "(1000000 * size(array_intersect(sa, sb))) div size(array_union(sa, sb))"
            ).alias("ppm"),
        )
        .filter(F.col("ppm") >= 600_000)
    )
    want = {(r["id_a"], r["id_b"]) for r in brute.collect()}
    assert got == want and want  # complete, and the fixture is non-trivial


def test_setsim_query_leaves_no_new_cached_rdds(spark, sf_dir):
    """q_setsim_prefix_join persists its shingle table internally; the
    spool + blocking-unpersist lifecycle must pin nothing after return
    (same invariant as containment/dsir; set difference, not a count
    compare)."""

    def rdd_ids():
        it = spark.sparkContext._jsc.getPersistentRDDs().keySet().iterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    before = rdd_ids()
    all_queries()["q_setsim_prefix_join"].fn(spark, sf_dir).collect()
    leaked = rdd_ids() - before
    assert not leaked, f"new cached RDDs after setsim query: {leaked}"


# ---------------------------------------------------------------------------
# q_shard_assignment
# ---------------------------------------------------------------------------


def test_shard_assignment_stable_and_covering(spark, sf_dir, duck):
    fn = all_queries()["q_shard_assignment"].fn
    a = fn(spark, sf_dir).collect()
    b = fn(spark, sf_dir).collect()
    assert a == b  # deterministic across runs
    total_docs = duck.sql("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert sum(r["n_docs"] for r in a) == total_docs  # every doc in a shard
    assert all(0 <= r["shard"] < 16 for r in a)
    for r in a:
        assert r["share_ppm"] == (1_000_000 * r["n_docs"]) // total_docs
        assert r["min_doc"] <= r["max_doc"]


def test_curriculum_serve_rank_is_dense_and_order_consistent(spark, sf_dir):
    """Value invariant backing the plan-level ReusedExchange assert
    (ADVICE r6): if the offsets branch and the local-rank branch ever
    observed DIFFERENT range exchanges (a reuse regression under AQE
    re-planning), serve_rank would misalign silently. Lock the data
    contract instead of only the plan text: the returned head is a dense
    1..N rank sequence AND its order equals the declared total order
    (pos, source, doc_id)."""
    from pulsar_lunar_spark.queries import all_queries

    rows = all_queries()["q_curriculum_interleave"].fn(spark, sf_dir).collect()
    assert [r["serve_rank"] for r in rows] == list(range(1, len(rows) + 1))
    keys = [(r["pos"], r["source"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)
