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


def test_ivf_nprobe_sweep_monotone_and_exact_at_full_probe(spark, sf_dir):
    from pulsar_lunar_spark.queries.llm16 import _IVF_NPROBES, _IVF_TOPK

    rows = all_queries()["q_ivf_nprobe_sweep"].fn(spark, sf_dir).collect()
    assert [r.nprobe for r in rows] == sorted(_IVF_NPROBES)
    # more cells probed => scanned and recall monotone non-decreasing
    scanned = [r.n_scanned for r in rows]
    overlaps = [r.overlap10 for r in rows]
    assert scanned == sorted(scanned)
    assert overlaps == sorted(overlaps)
    for r in rows:
        assert 0 <= r.overlap10 <= _IVF_TOPK
        assert r.recall_ppm == (1_000_000 * r.overlap10) // _IVF_TOPK
    # nprobe=1 must match q_ivf_topk's cell: its top-10 overlap vs exact
    # equals the overlap of q_ivf_topk's result with the exact top-10
    import pandas as pd  # noqa: F401

    ivf1 = {
        r.vec_id
        for r in all_queries()["q_ivf_topk"].fn(spark, sf_dir).collect()
    }
    # exact top-10 via brute force on the parquet
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    import numpy as np

    v = np.stack(emb.embedding.to_numpy()).astype("float64")
    qv = v[emb.vec_id.to_numpy() == 0][0]
    cos = (v @ qv) / (np.linalg.norm(v, axis=1) * np.linalg.norm(qv))
    order = sorted(
        zip(np.round(cos, 6), -emb.vec_id.to_numpy()),
        key=lambda t: (t[0], t[1]),
        reverse=True,
    )[:_IVF_TOPK]
    exact = {-int(neg_id) for _, neg_id in order}
    assert rows[0].overlap10 == len(ivf1 & exact)
