"""Batch-14 operator semantics vs pure-Python brute force: maximal
duplicate spans (Lee et al. shingle runs), Stupid-backoff trigram
scoring, bitext precision@k against the planted pairs, and the
per-source excess-loss attribution leaderboard."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pandas as pd

from pulsar_lunar_spark.queries import all_queries
from pulsar_lunar_spark.queries.llm14 import (
    _BP_KS,
    _SB_TOPN,
    _SPAN_K,
    _SPAN_MIN_TOKENS,
    _SPAN_TOPN,
)


def _norm_words(text: str) -> list[str]:
    return [
        w
        for w in re.sub(r"\s+", " ", text.strip().lower()).split(" ")
        if w
    ]


def _max_spans_brute(docs: pd.DataFrame) -> list[tuple[int, int, int]]:
    """Pure-Python maximal-run reference: flag every position whose
    K-shingle appears in >= 2 distinct docs, then merge consecutive
    flagged positions into runs."""
    shingles: dict[str, set[int]] = defaultdict(set)
    per_doc: dict[int, list[tuple[int, str]]] = {}
    for r in docs.itertuples():
        w = _norm_words(r.text)
        if len(w) < _SPAN_K:
            continue
        rows = []
        for i in range(len(w) - _SPAN_K + 1):
            span = " ".join(w[i : i + _SPAN_K])
            rows.append((i + 1, span))
            shingles[span].add(r.doc_id)
        per_doc[r.doc_id] = rows
    out = []
    for doc_id, rows in per_doc.items():
        flagged = sorted(p for p, s in rows if len(shingles[s]) >= 2)
        run_start = None
        prev = None
        for p in flagged + [None]:
            if run_start is None:
                run_start = p
            elif p is None or p != prev + 1:
                length = prev - run_start + 1 + (_SPAN_K - 1)
                if length >= _SPAN_MIN_TOKENS:
                    out.append((doc_id, run_start, length))
                run_start = p
            prev = p
    out.sort(key=lambda t: (-t[2], t[0], t[1]))
    return out[:_SPAN_TOPN]


def test_max_dup_span_matches_brute_force(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = _max_spans_brute(docs)
    got = [
        (r.doc_id, r.start_pos, r.span_tokens)
        for r in all_queries()["q_max_dup_span"].fn(spark, sf_dir).collect()
    ]
    assert got == want
    # every reported span is genuinely >= the threshold and inside its doc
    lengths = {r_id: len(_norm_words(t)) for r_id, t in zip(docs.doc_id, docs.text)}
    for doc_id, start, ln in got:
        assert ln >= _SPAN_MIN_TOKENS
        assert start >= 1
        assert start + ln - 1 <= lengths[doc_id]


def test_max_dup_span_reported_runs_are_maximal(spark, sf_dir):
    """The run cannot be extended: the shingle just before the start and
    the one just after the end are NOT cross-doc duplicated."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    shingles: dict[str, set[int]] = defaultdict(set)
    words = {}
    for r in docs.itertuples():
        w = _norm_words(r.text)
        words[r.doc_id] = w
        for i in range(len(w) - _SPAN_K + 1):
            shingles[" ".join(w[i : i + _SPAN_K])].add(r.doc_id)

    def dup(doc_id: int, pos: int) -> bool:  # pos is 1-based shingle start
        w = words[doc_id]
        if pos < 1 or pos + _SPAN_K - 1 > len(w):
            return False
        return len(shingles[" ".join(w[pos - 1 : pos + _SPAN_K - 1])]) >= 2

    rows = all_queries()["q_max_dup_span"].fn(spark, sf_dir).collect()
    assert rows, "expected at least one >=50-token duplicated span"
    for r in rows:
        last_shingle = r.start_pos + (r.span_tokens - _SPAN_K)
        assert dup(r.doc_id, r.start_pos)
        assert dup(r.doc_id, last_shingle)
        assert not dup(r.doc_id, r.start_pos - 1)
        assert not dup(r.doc_id, last_shingle + 1)


def _sb_brute(docs: pd.DataFrame) -> dict[int, tuple[int, int]]:
    tri: Counter = Counter()
    for r in docs.itertuples():
        if r.doc_id % 2 != 0:
            continue
        w = _norm_words(r.text)
        for i in range(len(w) - 2):
            tri[(w[i], w[i + 1], w[i + 2])] += 1
    c12: Counter = Counter()
    c23: Counter = Counter()
    c2: Counter = Counter()
    c3: Counter = Counter()
    n = 0
    for (w1, w2, w3), c in tri.items():
        c12[(w1, w2)] += c
        c23[(w2, w3)] += c
        c2[w2] += c
        c3[w3] += c
        n += c
    out = {}
    for r in docs.itertuples():
        if r.doc_id % 2 != 1:
            continue
        w = _norm_words(r.text)
        if len(w) < 3:
            continue
        sups = []
        for i in range(len(w) - 2):
            t = (w[i], w[i + 1], w[i + 2])
            if t in tri:
                s = max((1_000_000 * tri[t]) // c12[(w[i], w[i + 1])], 1)
            elif (w[i + 1], w[i + 2]) in c23:
                s = max(
                    (2_000_000 * c23[(w[i + 1], w[i + 2])])
                    // (5 * c2[w[i + 1]]),
                    1,
                )
            elif w[i + 2] in c3:
                s = max((4_000_000 * c3[w[i + 2]]) // (25 * n), 1)
            else:
                s = 1
            sups.append(math.floor(-math.log(s / 1_000_000.0) * 1_000_000 + 0.5))
        out[r.doc_id] = (len(sups), sum(sups) // len(sups))
    return out


def test_stupid_backoff_matches_brute_force(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want_all = _sb_brute(docs)
    want = sorted(
        ((m, -d, n) for d, (n, m) in want_all.items()), reverse=True
    )[:_SB_TOPN]
    want = [(-d, n, m) for m, d, n in want]
    got = [
        (r.doc_id, r.n_trigrams, r.mean_surprisal_micro)
        for r in all_queries()["q_stupid_backoff"].fn(spark, sf_dir).collect()
    ]
    assert got == want
    # surprisal of an OOV-floor trigram is the maximum possible value
    assert all(m <= math.floor(-math.log(1e-6) * 1e6 + 0.5) for _, _, m in got)


def test_bitext_precision_matches_planted_pairs(spark, sf_dir):
    rows = all_queries()["q_bitext_precision"].fn(spark, sf_dir).collect()
    assert [r.k for r in rows] == sorted(_BP_KS)
    n_anchors = rows[0].n_anchors
    assert all(r.n_anchors == n_anchors for r in rows)
    # hits monotone non-decreasing in k; precision consistent with hits
    hits = [r.n_hits for r in rows]
    assert hits == sorted(hits)
    for r in rows:
        assert 0 <= r.n_hits <= r.n_anchors
        assert r.precision_ppm == (1_000_000 * r.n_hits) // r.n_anchors


def test_source_attribution_accounts_every_document(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = all_queries()["q_source_attribution"].fn(spark, sf_dir).collect()
    # every source accounted, doc counts exact, learnable <= docs
    want_counts = docs.groupby("source").size().to_dict()
    got_counts = {r.source: r.n_docs for r in rows}
    assert got_counts == want_counts
    for r in rows:
        assert 0 <= r.n_learnable <= r.n_docs
    # leaderboard order is (mean DESC, source)
    keys = [(-r.mean_excess_micro, r.source) for r in rows]
    assert keys == sorted(keys)
