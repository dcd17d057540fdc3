"""Batch-9 operator semantics: MMR diversity selection (diversity actually
traded against relevance), repetition scoring (constructed repetitive vs
clean docs), and temperature mixture (small sources up-weighted)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pulsar_lunar_spark.queries import all_queries
from pulsar_lunar_spark.session import load_table


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _cos(a, b):
    return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))


def test_mmr_rank1_is_global_max_and_diversity_improves(spark, sf_dir):
    """MMR invariants: the first pick is the plain relevance argmax, the
    selection is 8 distinct pool members, and the selected set's maximum
    pairwise similarity is <= the plain top-8-by-relevance set's (that
    inequality IS the point of MMR)."""
    out = all_queries()["q_mmr_select"].fn(spark, sf_dir).collect()
    assert [r["mmr_rank"] for r in out] == list(range(1, 9))
    ids = [int(r["vec_id"]) for r in out]
    assert len(set(ids)) == 8

    emb = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    q = emb[0]
    rel = {
        i: _cos(v, q) for i, v in emb.items() if i != 0
    }
    top_by_rel = sorted(rel, key=lambda i: (-rel[i], i))[:8]
    # rank 1 == plain argmax
    assert ids[0] == top_by_rel[0]

    def max_pair_sim(sel):
        return max(
            _cos(emb[a], emb[b]) for a in sel for b in sel if a < b
        )

    assert max_pair_sim(ids) <= max_pair_sim(top_by_rel) + 1e-12


def test_repetition_scores_constructed_docs(spark):
    """A doc that repeats one phrase scores high duplicate-bigram ppm; a
    doc of all-distinct bigrams scores 0."""
    from pulsar_lunar_spark.operators import text as T

    df = spark.createDataFrame(
        [
            (1, "spam ham spam ham spam ham spam ham"),
            (2, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    words = F.split(T.normalize_text(F.col("text")), " ")
    staged = df.select("doc_id", words.alias("__w"))
    r = staged.select(
        "doc_id",
        F.expr(
            "transform(sequence(1, size(__w) - 1),"
            " i -> concat(element_at(__w, i), ' ', element_at(__w, i + 1)))"
        ).alias("__b"),
    ).select(
        "doc_id",
        F.expr(
            "(1000000 * (size(__b) - size(array_distinct(__b)))) div size(__b)"
        ).alias("rep_ppm"),
    )
    got = {r_["doc_id"]: r_["rep_ppm"] for r_ in r.collect()}
    # 7 bigrams, 2 distinct ("spam ham", "ham spam") -> 5/7 duplicates
    assert got[1] == (1_000_000 * 5) // 7
    assert got[2] == 0


def test_temperature_mixture_upweights_small_sources(spark, sf_dir):
    """alpha=0.5 scaling: every source's temp share moves toward uniform —
    sources below the proportional mean gain share, sources above lose."""
    out = all_queries()["q_temperature_mixture"].fn(spark, sf_dir).collect()
    n = len(out)
    mean_ppm = 1_000_000 // n
    for r in out:
        if r["uniform_ppm"] < mean_ppm:
            assert r["temp_ppm"] >= r["uniform_ppm"], r
        elif r["uniform_ppm"] > mean_ppm:
            assert r["temp_ppm"] <= r["uniform_ppm"], r
    # shares sum to ~1e6 (integer floor division loses < n ppm)
    for col in ("uniform_ppm", "temp_ppm"):
        s = sum(r[col] for r in out)
        assert 1_000_000 - n <= s <= 1_000_000


def test_span_corruption_reconstructs_original(spark, sf_dir):
    """Splicing each target span back over its sentinel in the input must
    reproduce the original normalized document exactly — the lossless
    invariant a denoising objective depends on."""
    from pulsar_lunar_spark.operators import text as T

    out = all_queries()["q_span_corruption"].fn(spark, sf_dir).collect()
    assert out
    originals = {
        r["doc_id"]: r["norm"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") <= 40)
        .select("doc_id", T.normalize_text(F.col("text")).alias("norm"))
        .collect()
    }
    for r in out:
        spans = {}
        toks = r["target_text"].split(" ")
        # target = <X_k> w1 w2 w3 repeated
        for j in range(0, len(toks), 4):
            spans[toks[j]] = toks[j + 1 : j + 4]
        assert len(spans) == r["n_spans"]
        rebuilt = []
        for t in r["input_text"].split(" "):
            rebuilt.extend(spans[t] if t in spans else [t])
        assert " ".join(rebuilt) == originals[r["doc_id"]], r["doc_id"]


def test_epoch_shuffle_orders_differ_and_are_stable(spark, sf_dir):
    """Epochs 1 and 2 are different permutations; re-running returns the
    identical heads (no rand stream anywhere)."""
    fn = all_queries()["q_epoch_shuffle"].fn
    a = fn(spark, sf_dir).collect()
    b = fn(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert [r["epoch1_doc"] for r in a] != [r["epoch2_doc"] for r in a]


def test_source_matrix_shuffled_path_matches_broadcast_path(spark, sf_dir):
    """The pair-list broadcast is bounded by _PAIR_BROADCAST_CAP (VERDICT
    r6 watch item): above the cap the joins run shuffled. Force the
    shuffled path (cap=0) and assert it is value-identical to the
    broadcast path, so the guard can never silently change results."""
    from pulsar_lunar_spark.queries import llm9

    fn = all_queries()["q_dedup_source_matrix"].fn
    fast = [tuple(r) for r in fn(spark, sf_dir).collect()]
    old = llm9._PAIR_BROADCAST_CAP
    llm9._PAIR_BROADCAST_CAP = 0
    try:
        slow = [tuple(r) for r in fn(spark, sf_dir).collect()]
    finally:
        llm9._PAIR_BROADCAST_CAP = old
    assert fast == slow and fast
