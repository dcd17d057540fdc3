"""Batch-15 operator semantics vs pure-Python brute force: conformal
threshold/coverage accounting, ARI pair combinatorics, and per-source
KL divergence."""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd

from pulsar_lunar_spark.queries import all_queries
from pulsar_lunar_spark.queries.llm15 import _CONF_ALPHAS_PPM


def _norm_words(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.strip().lower()).split(" ")


def test_conformal_threshold_guarantee_and_accounting(spark, sf_dir):
    rows = all_queries()["q_conformal_threshold"].fn(spark, sf_dir).collect()
    assert [r.alpha_ppm for r in rows] == sorted(_CONF_ALPHAS_PPM)
    for r in rows:
        assert r.coverage_ppm == (1_000_000 * r.n_covered) // r.n_eval
        assert 0 <= r.n_covered <= r.n_eval
    # smaller alpha -> larger (or equal) threshold and coverage
    by_alpha = sorted(rows, key=lambda r: r.alpha_ppm)
    for hi, lo in zip(by_alpha, by_alpha[1:]):
        assert hi.threshold_micro >= lo.threshold_micro
        assert hi.coverage_ppm >= lo.coverage_ppm
        assert hi.k_rank >= lo.k_rank
    # the conformal guarantee holds on the synthetic corpus at every
    # scale we test (exchangeable split; slack is one discrete step)
    for r in rows:
        assert r.coverage_ppm >= 1_000_000 - r.alpha_ppm - 50_000


def test_conformal_k_rank_formula(spark, sf_dir):
    rows = all_queries()["q_conformal_threshold"].fn(spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    n_cal = int((docs.doc_id % 2 == 0).sum())
    for r in rows:
        want = math.ceil((n_cal + 1) * (1_000_000 - r.alpha_ppm) / 1_000_000)
        assert r.k_rank == want


def _ari_brute(pairs: list[tuple[str, str]]) -> tuple[int, int, int, int]:
    cells = Counter(pairs)
    a = Counter(p[0] for p in pairs)
    b = Counter(p[1] for p in pairs)
    c2 = lambda x: x * (x - 1) // 2  # noqa: E731
    return (
        sum(c2(v) for v in cells.values()),
        sum(c2(v) for v in a.values()),
        sum(c2(v) for v in b.values()),
        len(pairs),
    )


def test_partition_ari_matches_brute_force(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    sij, sa, sb, n = _ari_brute(list(zip(docs.lang, docs.source)))
    [r] = all_queries()["q_partition_ari"].fn(spark, sf_dir).collect()
    assert (r.sij, r.sa, r.sb, r.n_docs) == (sij, sa, sb, n)
    cn2 = n * (n - 1) / 2
    expected = sa * sb / cn2
    want = math.floor(
        1_000_000 * (sij - expected) / ((sa + sb) / 2 - expected) + 0.5
    )
    assert r.ari_ppm == want
    assert -1_000_000 <= r.ari_ppm <= 1_000_000


def test_source_kl_matches_brute_force(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cells: Counter = Counter()
    for r in docs.itertuples():
        for w in _norm_words(r.text):
            cells[(r.source, w)] += 1
    cw: Counter = Counter()
    ns: Counter = Counter()
    n = 0
    for (s, w), c in cells.items():
        cw[w] += c
        ns[s] += c
        n += c
    want = {}
    for s in ns:
        kl = 0
        cnt = 0
        for (s2, w), c in cells.items():
            if s2 != s:
                continue
            ps = max((1_000_000 * c) // ns[s], 1)
            pc = max((1_000_000 * cw[w]) // n, 1)
            kl += math.floor(ps * math.log(ps / pc) + 0.5)
            cnt += 1
        want[s] = (ns[s], cnt, kl)
    got = {
        r.source: (r.n_tokens, r.vocab_cells, r.kl_micro)
        for r in all_queries()["q_source_kl"].fn(spark, sf_dir).collect()
    }
    assert got == want
