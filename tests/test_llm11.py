"""Batch-11 operator semantics: DoReMi multiplicative-update arithmetic
(hand-replicated integer loop), span-level decontamination vs a
pure-Python brute force, and bootstrap-CI ordering/determinism
invariants."""

from __future__ import annotations

import math
import re

import pandas as pd

from pulsar_lunar_spark.queries import all_queries
from pulsar_lunar_spark.queries.llm11 import (
    _BOOTSTRAP_B,
    _DOREMI_ITERATIONS,
    _POIS_CDF,
)


def test_doremi_weights_invariants(spark, sf_dir):
    rows = all_queries()["q_doremi_weights"].fn(spark, sf_dir).collect()
    n = len(rows)
    assert n >= 2
    # uniform shares are exact integer ppm of the source count
    assert all(r.uniform_ppm == 1_000_000 // n for r in rows)
    # weights stay a (truncation-tolerant) distribution: each step floors
    # at most 1 ppm per source in the normalize and 1 in the smooth
    total = sum(r.doremi_ppm for r in rows)
    assert 1_000_000 - 4 * n <= total <= 1_000_000
    assert all(0 <= r.doremi_ppm <= 1_000_000 for r in rows)
    # multiplicative updates move weight TOWARD high-excess-loss sources:
    # the max-loss source must not lose weight vs uniform, the min-loss
    # source must not gain (ties can keep them equal)
    by_loss = sorted(rows, key=lambda r: (r.loss_milli, r.source))
    assert by_loss[-1].doremi_ppm >= by_loss[-1].uniform_ppm
    assert by_loss[0].doremi_ppm <= by_loss[0].uniform_ppm


def test_doremi_update_replicates_in_python(spark, sf_dir):
    """Re-run the exact integer loop in Python from the emitted
    (loss_milli, uniform_ppm) state; the only engine-dependent op is
    exp(), so allow a +-2 ppm slack per source for a possible 1-ulp
    libm difference (everything else must match exactly)."""
    rows = sorted(
        all_queries()["q_doremi_weights"].fn(spark, sf_dir).collect(),
        key=lambda r: r.source,
    )
    loss = [r.loss_milli for r in rows]
    u = rows[0].uniform_ppm
    w = [u] * len(rows)
    for _ in range(_DOREMI_ITERATIONS):
        wavg = sum(wi * li for wi, li in zip(w, loss))
        raw = []
        for wi, li in zip(w, loss):
            arg = min(max((li * 1_000_000 - wavg) / 2_000_000_000.0, -2.0), 2.0)
            raw.append(wi * int(math.floor(math.exp(arg) * 1_000_000 + 0.5)))
        tot = sum(raw)
        w = [(990_000 * ((1_000_000 * ri) // tot) + 10_000 * u) // 1_000_000 for ri in raw]
    for r, want in zip(rows, w):
        assert abs(r.doremi_ppm - want) <= 2, (r.source, r.doremi_ppm, want)


def _py_spans(text: str) -> set[str]:
    words = [w for w in re.sub(r"\s+", " ", text.strip().lower()).split(" ") if w]
    if len(words) < 8:
        return set()
    return {" ".join(words[i : i + 8]) for i in range(len(words) - 7)}


def test_span_decontamination_matches_brute_force(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    spans = {int(r.doc_id): _py_spans(r.text) for r in docs.itertuples()}
    bench = {i: s for i, s in spans.items() if i < 10}
    train = {i: s for i, s in spans.items() if i >= 10}
    want = {}
    for b, bs in bench.items():
        hit_docs, hit_spans, hits = set(), set(), 0
        for t, ts in train.items():
            shared = bs & ts
            if shared:
                hit_docs.add(t)
                hit_spans |= shared
                hits += len(shared)
        want[b] = (len(hit_docs), len(hit_spans), hits)
    got = {
        r.bench_id: (r.n_train_docs, r.n_shared_spans, r.n_span_hits)
        for r in all_queries()["q_span_decontamination"].fn(spark, sf_dir).collect()
    }
    assert got == want
    assert set(got) == set(bench)  # zero-hit bench docs still emitted


def test_bootstrap_ci_ordering_and_determinism(spark, sf_dir):
    fn = all_queries()["q_bootstrap_ci"].fn
    r1 = fn(spark, sf_dir).collect()[0]
    r2 = fn(spark, sf_dir).collect()[0]
    assert r1 == r2  # md5 draws: bit-identical replay
    assert r1.n_resamples == _BOOTSTRAP_B
    assert 0 <= r1.boot_lo_ppm <= r1.boot_median_ppm <= r1.boot_hi_ppm <= 1_000_000
    assert 0 <= r1.point_acc_ppm <= 1_000_000
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert r1.n_docs == len(docs)


def test_poisson_cdf_thresholds_exact():
    # the embedded literals must be the Poisson(1) CDF scaled to 2^24
    acc = 0.0
    for k, t in enumerate(_POIS_CDF):
        acc += math.exp(-1.0) / math.factorial(k)
        assert t == int(acc * (1 << 24))
    assert _POIS_CDF == sorted(_POIS_CDF)
    assert _POIS_CDF[-1] < (1 << 24)  # weight-5 tail is reachable


def test_pass_at_k_literals_and_monotonicity(spark, sf_dir):
    from pulsar_lunar_spark.queries.llm11 import _PASSK_N, _passk_ppm

    # the embedded CASE literals are the exact unbiased estimator
    # 1 - C(n-c,k)/C(n,k), floored at ppm with big-int arithmetic
    for k in (1, 5, 10):
        for c in range(_PASSK_N + 1):
            fail_num = math.comb(_PASSK_N - c, k) if _PASSK_N - c >= k else 0
            want = 1_000_000 - (1_000_000 * fail_num) // math.comb(_PASSK_N, k)
            assert _passk_ppm(c, k) == want
        assert _passk_ppm(0, k) < 1_000_000  # all-fail task never reads 100%
        assert _passk_ppm(_PASSK_N, k) == 1_000_000
    rows = {r.k: r for r in all_queries()["q_pass_at_k"].fn(spark, sf_dir).collect()}
    assert set(rows) == {1, 5, 10}
    # pass@k is monotone non-decreasing in k for every c, hence in the mean
    assert (
        rows[1].mean_pass_ppm <= rows[5].mean_pass_ppm <= rows[10].mean_pass_ppm
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert all(r.n_tasks == len(docs) for r in rows.values())


def test_pass_at_k_replicates_in_python(spark, sf_dir):
    import hashlib

    from pulsar_lunar_spark.queries.llm11 import _PASSK_N, _passk_ppm

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per_k = {1: [], 5: [], 10: []}
    for doc_id in docs["doc_id"]:
        c = 0
        for r in range(_PASSK_N):
            h = int(hashlib.md5(f"att-{doc_id}:{r}".encode()).hexdigest()[:6], 16)
            c += 1 if h % 100 < 30 else 0
        for k in per_k:
            per_k[k].append(_passk_ppm(c, k))
    want = {k: sum(v) // len(v) for k, v in per_k.items()}
    got = {
        r.k: r.mean_pass_ppm
        for r in all_queries()["q_pass_at_k"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_psi_drift_invariants(spark, sf_dir):
    from pulsar_lunar_spark.queries.llm11 import _PSI_BUCKETS

    rows = all_queries()["q_psi_drift"].fn(spark, sf_dir).collect()
    assert [r.bucket for r in rows] == list(range(_PSI_BUCKETS))  # full spine
    total = rows[0].psi_total_micro
    assert all(r.psi_total_micro == total for r in rows)
    assert total == sum(r.psi_contrib_micro for r in rows)
    # (p-q) and ln(p/q) share a sign -> every contribution is >= 0
    assert all(r.psi_contrib_micro >= 0 for r in rows)
    # Laplace-smoothed shares are a near-distribution (truncation only)
    for col in ("p_ppm", "q_ppm"):
        s = sum(getattr(r, col) for r in rows)
        assert 1_000_000 - _PSI_BUCKETS <= s <= 1_000_000
        assert all(getattr(r, col) > 0 for r in rows)  # smoothing: LN-safe


def test_vocab_coverage_matches_brute_force(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    from collections import Counter

    per_source: dict[str, Counter] = {}
    global_tf: Counter = Counter()
    for r in docs.itertuples():
        words = re.sub(r"\s+", " ", r.text.strip().lower()).split(" ")
        per_source.setdefault(r.source, Counter()).update(words)
        global_tf.update(words)
    vocab = {
        t
        for t, _ in sorted(global_tf.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    }
    want = {}
    for src, cnt in per_source.items():
        n = sum(cnt.values())
        oov = sum(c for t, c in cnt.items() if t not in vocab)
        want[src] = (n, oov, (1_000_000 * oov) // n)
    got = {
        r.source: (r.n_tokens, r.n_oov, r.oov_ppm)
        for r in all_queries()["q_vocab_coverage"].fn(spark, sf_dir).collect()
    }
    assert got == want
