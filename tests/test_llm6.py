"""Batch-7 semantics: BPE merge sequence pinned against an exact Python
replication, and HLL sketch accuracy bound against exact distinct counts."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from pulsar_lunar_spark.operators import corpus as C
from pulsar_lunar_spark.queries import all_queries
from pulsar_lunar_spark.session import load_table

SPECS = all_queries()


def _bpe_reference(texts, n_merges=8, top_words=300):
    freq = Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t.strip().lower()).split(" "):
            if w:
                freq[w] += 1
    vocab = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:top_words]
    syms = [(list(w), f) for w, f in vocab]
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for s, f in syms:
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, n))
        new_syms = []
        for s, f in syms:
            out = []
            for tok in s:
                if out and out[-1] == a and tok == b:
                    out[-1] = a + b
                else:
                    out.append(tok)
            new_syms.append((out, f))
        syms = new_syms
    return merges


def test_bpe_matches_python_reference(spark, sf_dir):
    texts = [r.text for r in load_table(spark, sf_dir, "documents").select("text").collect()]
    want = _bpe_reference(texts, n_merges=8, top_words=300)
    got = C.bpe_train(
        load_table(spark, sf_dir, "documents"), "text", n_merges=8, top_words=300
    )
    assert got == want


def test_bpe_merge_adjacent_nonoverlapping(spark):
    # "aaaa" under merge (a,a) -> [aa, aa]; "aaa" -> [aa, a] (left-to-right)
    df = spark.createDataFrame([(["a", "a", "a", "a"],), (["a", "a", "a"],)], ["syms"])
    got = [r.m for r in df.select(C._merge_adjacent(F.col("syms"), "a", "a").alias("m")).collect()]
    assert got == [["aa", "aa"], ["aa", "a"]]


def test_bpe_single_char_words_no_pairs(spark):
    df = spark.createDataFrame([("x x y",)], ["text"])
    # vocabulary = {x, y}, all 1-char: no adjacent pairs, no merges
    assert C.bpe_train(df, "text", n_merges=4) == []


def test_hll_estimate_within_bound(spark, sf_dir):
    """q_hll_distinct itself emits an hll_ok flag for the oracle; this test
    recomputes the raw HLL union estimate and checks the tight bound."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "lang",
        "source",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"),
    )
    rows = (
        words.groupBy("lang", "source")
        .agg(F.hll_sketch_agg("w").alias("sk"), F.countDistinct("w").alias("ec"))
        .groupBy("lang")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("approx_distinct"),
            F.sum("ec").cast("long").alias("sum_cell_exact"),
        )
        .collect()
    )
    exact = {
        r.lang: r.n
        for r in words.groupBy("lang").agg(F.countDistinct("w").alias("n")).collect()
    }
    assert rows
    for r in rows:
        assert abs(r.approx_distinct - exact[r.lang]) <= max(2, 0.05 * exact[r.lang])
        # the union estimate can never exceed the sum of per-cell exacts
        assert r.approx_distinct <= r.sum_cell_exact * 1.05
    # and the registered query's flags must all be green
    assert all(r.hll_ok for r in SPECS["q_hll_distinct"].fn(spark, sf_dir).collect())


def test_pq_adc_matches_numpy_reference(spark, sf_dir):
    """q_pq_adc_topk must equal an exact numpy replication of the PQ
    pipeline: per-label subvector-mean codebooks, nearest-sub-centroid
    codes, ADC score = sum of per-subspace query-dot lookups."""
    import numpy as np

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    labels = np.array([r.label for r in rows])
    V = np.array([[float(x) for x in r.embedding] for r in rows])  # n x 64
    q = V[ids == 0][0]
    m, d_sub = 4, 16
    scores = np.zeros(len(ids))
    for s in range(m):
        sl = slice(s * d_sub, (s + 1) * d_sub)
        cb = {
            lab: V[labels == lab, sl].mean(axis=0) for lab in np.unique(labels)
        }
        labs = sorted(cb)
        C = np.array([cb[lab] for lab in labs])  # k x 16
        qdot = C @ q[sl]
        codes = np.argmin(
            ((V[:, sl][:, None, :] - C[None, :, :]) ** 2).sum(axis=2), axis=1
        )
        scores += qdot[codes]
    order = sorted(zip(ids, scores), key=lambda t: (-np.floor(t[1] * 1e6 + 0.5) / 1e6, t[0]))
    want = [(int(i), np.floor(sc * 1e6 + 0.5) / 1e6) for i, sc in order[:10]]
    got = [
        (r.vec_id, r.adc_score)
        for r in SPECS["q_pq_adc_topk"].fn(spark, sf_dir).collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-6, (g, w)


def test_duplicate_spans_counts_match_python(spark, sf_dir):
    """Every reported span must actually occur in >= n_docs distinct
    documents; cross-check the top span's counts against a pure-python
    scan of the normalized corpus."""
    import re

    rows = SPECS["q_duplicate_spans"].fn(spark, sf_dir).collect()
    assert rows, "corpus has no cross-document 8-token span at all?"
    for r in rows:
        assert r.n_docs >= 2
        assert r.n_occurrences >= r.n_docs
    top = rows[0]
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    n_docs = n_occ = 0
    for d in docs:
        norm = re.sub(r"\s+", " ", (d.text or "").strip().lower())
        toks = [w for w in norm.split(" ") if w]
        hits = sum(
            1
            for i in range(len(toks) - 7)
            if " ".join(toks[i : i + 8]) == top.span
        )
        if hits:
            n_docs += 1
            n_occ += hits
    assert (n_docs, n_occ) == (top.n_docs, top.n_occurrences)
