"""Batch-16 operator semantics vs pure-Python brute force: green-list
watermark z-scores and Fleiss' kappa accounting."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pandas as pd

from pulsar_lunar_spark.queries import all_queries
from pulsar_lunar_spark.queries.llm16 import (
    _FK_CATS,
    _FK_NOISE_PCT,
    _FK_RATERS,
    _WM_FLAG_MILLI,
    _WM_TOPN,
)


def _norm_words(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.strip().lower()).split(" ")


def _md5_int(s: str, hex_chars: int = 6) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:hex_chars], 16)


def test_watermark_detect_matches_brute_force(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = []
    for r in docs.itertuples():
        w = _norm_words(r.text)
        n = len(w)
        g = sum(1 for t in w if _md5_int("g-" + t) % 2 == 0)
        z = math.floor(1000 * (2 * g - n) / math.sqrt(n) + 0.5)
        want.append((r.doc_id, n, g, z, z >= _WM_FLAG_MILLI))
    want.sort(key=lambda t: (-t[3], t[0]))
    want = want[:_WM_TOPN]
    got = [
        (r.doc_id, r.n_tokens, r.n_green, r.z_milli, r.flagged)
        for r in all_queries()["q_watermark_detect"].fn(spark, sf_dir).collect()
    ]
    assert got == want


def _fk_rater_cat(doc_id: int, n_chars: int, rater: int) -> int:
    if _md5_int(f"fkr{rater}-{doc_id}") % 100 < _FK_NOISE_PCT:
        return _md5_int(f"fkc{rater}-{doc_id}") % _FK_CATS
    return min(n_chars // 300, _FK_CATS - 1)


def test_fleiss_kappa_matches_brute_force(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    sum_ss = 0
    cat_tot = Counter()
    n_items = 0
    for r in docs.itertuples():
        votes = Counter(
            _fk_rater_cat(r.doc_id, r.n_chars, j) for j in range(_FK_RATERS)
        )
        sum_ss += sum(v * v for v in votes.values())
        cat_tot.update(votes)
        n_items += 1
    sum_cv2 = sum(v * v for v in cat_tot.values())
    n = _FK_RATERS
    p_bar = (sum_ss - n_items * n) / (n_items * n * (n - 1))
    p_e = sum_cv2 / (n_items * n_items * n * n)
    want = math.floor(1_000_000 * (p_bar - p_e) / (1 - p_e) + 0.5)
    [r] = all_queries()["q_fleiss_kappa"].fn(spark, sf_dir).collect()
    assert (r.n_items, r.sum_ss, r.sum_cv2) == (n_items, sum_ss, sum_cv2)
    assert r.kappa_ppm == want
    # the 80%-shared-signal construction must land well inside (0, 1)
    assert 100_000 < r.kappa_ppm < 1_000_000
