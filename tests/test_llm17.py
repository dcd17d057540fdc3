"""Batch-17 operator semantics vs pure-Python brute force: the trainable
LR classifier's training loop is replayed token-by-token in plain Python
(hashlib md5, integer sigmoid, truncating updates) and must reproduce the
engine's per-epoch weight L1s and accuracies EXACTLY — the same discipline
as the PCA/label-propagation brute-force pins."""

from __future__ import annotations

import hashlib
import math

import pytest

from pulsar_lunar_spark.queries import all_queries

pytestmark = pytest.mark.usefixtures("spark")


def _norm(t: str) -> str:
    import re

    return re.sub(r"\s+", " ", t.strip().lower())


def _md5i(s: str, n: int = 6, salt: str = "") -> int:
    return int(hashlib.md5((salt + s).encode()).hexdigest()[:n], 16)


def _tdiv(a: int, b: int) -> int:
    return a // b if a >= 0 else -((-a) // b)


def _p_ppm(lg: int) -> int:
    x = max(min(lg, 13_000_000), -13_000_000)
    e = math.floor(math.exp(-x / 1_000_000) * 1_000_000 + 0.5)
    return (1_000_000 * 1_000_000) // (1_000_000 + e)


def _brute_lr(docs: list[tuple[int, str]]):
    from pulsar_lunar_spark.queries.llm17 import (
        _LR_BIAS_CNT,
        _LR_BUCKETS,
        _LR_EPOCHS,
        _LR_ETA,
        _LR_MIN_WORDS,
    )

    feats: dict[int, dict[int, int]] = {}
    labels: dict[int, int] = {}
    for did, t in docs:
        ws = [w for w in _norm(t).split(" ") if w]
        d = {_LR_BUCKETS: _LR_BIAS_CNT}
        for w in ws:
            b = _md5i(w) % _LR_BUCKETS
            d[b] = d.get(b, 0) + 1
        feats[did] = d
        labels[did] = 1 if len(ws) >= _LR_MIN_WORDS else 0
    train = [d for d in feats if d % 2 == 0]
    ev = [d for d in feats if d % 2 == 1]
    ntr = len(train)
    w = [0] * (_LR_BUCKETS + 1)
    out = []

    def acc(wv, split):
        c = sum(
            (1 if sum(wv[b] * n for b, n in feats[d].items()) >= 0 else 0)
            == labels[d]
            for d in split
        )
        return 1_000_000 * c // len(split)

    wfix = [
        _md5i(str(b), 6, "w-") % 2001 - 1000 for b in range(_LR_BUCKETS)
    ] + [0]
    for ep in range(1, _LR_EPOCHS + 1):
        grad = [0] * (_LR_BUCKETS + 1)
        for d in train:
            lg = sum(w[b] * n for b, n in feats[d].items())
            err = _p_ppm(lg) - 1_000_000 * labels[d]
            for b, n in feats[d].items():
                grad[b] += err * n
        w = [
            w[b] - _tdiv(_tdiv(_LR_ETA * grad[b], ntr), 1_000_000)
            for b in range(_LR_BUCKETS + 1)
        ]
        out.append(
            (
                ep,
                sum(abs(x) for x in w),
                acc(w, train),
                acc(w, ev),
                acc(wfix, ev),
            )
        )
    return out


def test_train_quality_lr_matches_bruteforce(spark, sf_dir):
    from pulsar_lunar_spark.session import load_table

    docs = [
        (int(r["doc_id"]), r["text"])
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    ]
    expected = _brute_lr(docs)
    rows = all_queries()["q_train_quality_lr"].fn(spark, sf_dir).collect()
    got = [
        (
            int(r["epoch"]),
            int(r["w_l1_micro"]),
            int(r["train_acc_ppm"]),
            int(r["eval_acc_ppm"]),
            int(r["fixed_eval_acc_ppm"]),
        )
        for r in rows
    ]
    assert got == expected


def test_train_quality_lr_retrains_per_call(spark, sf_dir):
    """r12 (VERDICT r11 item 1): the training query must never serve a
    memoised model. Poison the process-level model artifact and verify a
    fresh call RETRAINS (bit-identical result, not the poison) and
    overwrites the artifact for downstream consumers."""
    from pulsar_lunar_spark.queries import llm17

    q = all_queries()["q_train_quality_lr"]
    base = q.fn(spark, sf_dir).collect()
    assert llm17._LR_MODEL_ARTIFACT  # artifact published for consumers
    poisoned = {
        tag: [[v + 1_000 for v in w] for w in ws]
        for tag, ws in llm17._LR_MODEL_ARTIFACT.items()
    }
    llm17._LR_MODEL_ARTIFACT.update(poisoned)
    again = q.fn(spark, sf_dir).collect()
    assert again == base  # retrained from scratch — poison never served
    assert all(
        llm17._LR_MODEL_ARTIFACT[tag] != poisoned[tag] for tag in poisoned
    )  # artifact refreshed by the training pass


def test_train_quality_lr_learns_past_fixed_baseline(spark, sf_dir):
    rows = all_queries()["q_train_quality_lr"].fn(spark, sf_dir).collect()
    last = rows[-1]
    # the point of the query: training beats the fixed-weight classifier
    # on the held-out split (by a wide margin on this separable gate)
    assert int(last["eval_acc_ppm"]) > int(last["fixed_eval_acc_ppm"])
    assert int(last["eval_acc_ppm"]) >= 800_000
    # weights moved and epochs are in order
    assert [int(r["epoch"]) for r in rows] == list(range(1, len(rows) + 1))
    assert all(int(r["w_l1_micro"]) > 0 for r in rows)


# ---------------------------------------------------------------------------
# Scene cuts + audio fingerprints vs pure-python brute force
# ---------------------------------------------------------------------------


def _scene_brute(did: int):
    w, h, n = did % 13 + 2, did % 11 + 2, did % 8 + 4
    # per-pixel delta between consecutive frames is exactly
    # 3 + 60 * (scene jumped); cut when mean per-pixel delta > 30
    cuts = [t for t in range(1, n) if t in (3, 7)]
    bounds = [0] + cuts + [n]
    shots = [b - a for a, b in zip(bounds, bounds[1:])]
    return (n, len(cuts), len(cuts) + 1, max(shots))


def test_scene_cuts_matches_bruteforce(spark, sf_dir):
    rows = all_queries()["q_scene_cuts"].fn(spark, sf_dir).collect()
    assert rows, "no video rows"
    for r in rows:
        did = int(r["media_id"][1:])
        n, n_cuts, n_shots, longest = _scene_brute(did)
        got = (
            int(r["n_frames"]),
            int(r["n_cuts"]),
            int(r["n_shots"]),
            int(r["longest_shot_frames"]),
        )
        assert got == (n, n_cuts, n_shots, longest), (r, (n, n_cuts, n_shots, longest))


def _afp_samples(did: int, variant: bool):
    n = did % 128 + 96
    s = [((did * 7919 + 7 * i * i + did * i) % 20011) % 201 - 100 for i in range(n)]
    if variant:
        s[40] = 0
    return s


def _afp_fps(samples):
    n_w = len(samples) // 32
    out = []
    for w_i in range(n_w):
        x = samples[w_i * 32 : (w_i + 1) * 32]
        bands = []
        while len(x) > 1:
            bands.append(sum(abs(x[2 * j] - x[2 * j + 1]) for j in range(len(x) // 2)))
            x = [x[2 * j] + x[2 * j + 1] for j in range(len(x) // 2)]
        bands.append(abs(x[0]))
        out.append(",".join(str(b) for b in bands))
    return out


def test_audio_fingerprint_pairs_match_bruteforce(spark, sf_dir):
    from pulsar_lunar_spark.session import load_table

    dids = [
        int(r["doc_id"])
        for r in load_table(spark, sf_dir, "documents")
        .filter("doc_id % 3 = 1")
        .select("doc_id")
        .collect()
    ]
    # brute force: exact fingerprint multimaps, pair when >= 60% of the
    # shorter clip's windows match at the same index
    clips = {}
    for did in dids:
        clips[f"m{did}"] = _afp_fps(_afp_samples(did, False))
        if did % 5 == 1:
            clips[f"m{did}v"] = _afp_fps(_afp_samples(did, True))
    ids = sorted(clips)
    expected = set()
    index = {}
    for cid in ids:
        for w_i, fp in enumerate(clips[cid]):
            index.setdefault((w_i, fp), []).append(cid)
    cand = {}
    for (w_i, fp), members in index.items():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = sorted((members[i], members[j]))
                cand[(a, b)] = cand.get((a, b), 0) + 1
    for (a, b), m in cand.items():
        if 1_000_000 * m // min(len(clips[a]), len(clips[b])) >= 600_000:
            expected.add((a, b, m))
    rows = all_queries()["q_audio_fingerprint_dedup"].fn(spark, sf_dir).collect()
    got = {(r["id_a"], r["id_b"], int(r["n_match"])) for r in rows}
    assert got == expected
    # every planted variant pair is found
    planted = {
        (f"m{d}", f"m{d}v") for d in dids if d % 5 == 1
    }
    assert planted <= {(a, b) for a, b, _ in got}


# ---------------------------------------------------------------------------
# ROUGE-L vs a true O(n*m) DP LCS
# ---------------------------------------------------------------------------


def _lcs_dp(a: list, b: list) -> int:
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(max(prev[j], cur[j - 1], prev[j - 1] + (x == y)))
        prev = cur
    return prev[-1]


def test_rouge_overlap_equals_true_dp_lcs(spark, sf_dir):
    from pulsar_lunar_spark.session import load_table

    docs = {
        int(r["doc_id"]): [w for w in _norm(r["text"]).split(" ") if w]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    rows = all_queries()["q_rouge_overlap"].fn(spark, sf_dir).collect()
    assert rows, "no rouge pairs"
    for r in rows:
        words = docs[int(r["doc_id"])]
        n = len(words)
        assert int(r["doc_id"]) % 7 == 3 and n >= 25
        n5 = n // 5
        cand = (
            words[0 : n5 + 1]
            + ["zqxnoise1"]
            + words[2 * n5 : 3 * n5]
            + ["zqxnoise2"]
            + words[4 * n5 : n]
        )
        assert int(r["cand_tokens"]) == len(cand)
        assert int(r["ref_tokens"]) == n
        # the engine's 5-gram span coverage must equal the true DP LCS in
        # the block-extractive regime
        assert int(r["lcs_tokens"]) == _lcs_dp(words, cand), r["doc_id"]


# ---------------------------------------------------------------------------
# Image dHash dedup vs pure-python brute force
# ---------------------------------------------------------------------------


def _dhash_px(did: int):
    import numpy as np

    w, h = did % 31 + 2, did % 17 + 2
    y, x = np.mgrid[0:h, 0:w]
    return (3 * x + 2 * y + ((x * y) % 16) * 8).astype(np.int64)


def _dhash(src):
    import numpy as np

    h, w = src.shape
    yi = (np.arange(8) * h) // 8
    xi = (np.arange(9) * w) // 9
    grid = src[np.ix_(yi, xi)]
    bits = (grid[:, :-1] < grid[:, 1:]).astype(np.int64)
    return tuple(
        int((bits[2 * k : 2 * k + 2].reshape(-1) << np.arange(16)).sum())
        for k in range(4)
    )


def test_image_phash_pairs_match_bruteforce(spark, sf_dir):
    from pulsar_lunar_spark.session import load_table

    dids = [
        int(r["doc_id"])
        for r in load_table(spark, sf_dir, "documents")
        .filter("doc_id % 3 = 0")
        .select("doc_id")
        .collect()
    ]
    hashes = {}
    for did in dids:
        hashes[f"m{did}"] = _dhash(_dhash_px(did))
        if did % 15 == 0:
            # +2 brightness: dHash compares neighbors, hash is identical
            hashes[f"m{did}v"] = _dhash(_dhash_px(did) + 2)
            assert hashes[f"m{did}v"] == hashes[f"m{did}"]
    index = {}
    for cid, hs in hashes.items():
        for k, bv in enumerate(hs):
            index.setdefault((k, bv), []).append(cid)
    cand = set()
    for members in index.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                cand.add(tuple(sorted((members[i], members[j]))))
    expected = set()
    for a, b in cand:
        ham = sum(
            bin(x ^ y).count("1") for x, y in zip(hashes[a], hashes[b])
        )
        if ham <= 6:
            expected.add((a, b, ham))
    rows = all_queries()["q_image_phash_dedup"].fn(spark, sf_dir).collect()
    got = {(r["id_a"], r["id_b"], int(r["hamming"])) for r in rows}
    assert got == expected
    planted = {(f"m{d}", f"m{d}v") for d in dids if d % 15 == 0}
    assert planted <= {(a, b) for a, b, _ in got}


# ---------------------------------------------------------------------------
# Matryoshka eval + hubness vs numpy brute force
# ---------------------------------------------------------------------------


def test_matryoshka_eval_matches_bruteforce(spark, sf_dir):
    import numpy as np

    from pulsar_lunar_spark.session import load_table

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([int(r["vec_id"]) for r in rows])
    mat = np.floor(
        np.array([r["embedding"] for r in rows], dtype=np.float64) * 1000 + 0.5
    ).astype(np.int64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    expected = set()
    for qid in range(4):
        qv = mat[ids == qid][0]

        def topk(dims):
            s = mat[:, :dims] @ qv[:dims]
            mask = ids != qid
            cand = sorted(
                zip(-s[mask], ids[mask])
            )  # score desc, vec_id asc
            return {int(v) for _, v in cand[:10]}

        full = topk(64)
        for d in (16, 32):
            expected.add((qid, d, len(full & topk(d))))
    got = {
        (int(r["qid"]), int(r["trunc_dim"]), int(r["overlap10"]))
        for r in all_queries()["q_matryoshka_eval"].fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_ann_hubness_matches_bruteforce(spark, sf_dir):
    import numpy as np

    from pulsar_lunar_spark.session import load_table

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array(sorted(int(r["vec_id"]) for r in rows))
    by_id = {int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64) for r in rows}
    mat = np.stack([by_id[i] for i in ids])
    norms = np.sqrt((mat * mat).sum(axis=1))
    counts: dict[int, int] = {}
    for qid in ids[ids % 10 == 0]:
        qv = by_id[int(qid)]
        cos = np.round(
            (mat @ qv) / (norms * np.sqrt((qv * qv).sum())), 6
        )
        mask = ids != qid
        cand = sorted(zip(-cos[mask], ids[mask]))[:10]
        for _, v in cand:
            counts[int(v)] = counts.get(int(v), 0) + 1
    expected = sorted(
        ((v, c) for v, c in counts.items()), key=lambda t: (-t[1], t[0])
    )[:20]
    got = [
        (int(r["vec_id"]), int(r["k_occurrence"]))
        for r in all_queries()["q_ann_hubness"].fn(spark, sf_dir).collect()
    ]
    assert got == expected


# ---------------------------------------------------------------------------
# Audio silence segmentation vs pure-python brute force
# ---------------------------------------------------------------------------


def test_audio_silence_segments_match_bruteforce(spark, sf_dir):
    from pulsar_lunar_spark.session import load_table

    dids = [
        int(r["doc_id"])
        for r in load_table(spark, sf_dir, "documents")
        .filter("doc_id % 3 = 1")
        .select("doc_id")
        .collect()
    ]
    expected = {}
    for did in dids:
        n = did % 128 + 96
        s = [
            0
            if (64 <= i < 96) or (128 <= i < 160)
            else ((did * 7919 + 7 * i * i + did * i) % 20011) % 201 - 100
            for i in range(n)
        ]
        n_w = n // 32
        energies = [
            sum(abs(x) for x in s[w * 32 : (w + 1) * 32]) for w in range(n_w)
        ]
        flags = [e >= 100 for e in energies]
        segs = []
        run = 0
        for f in flags + [False]:
            if f:
                run += 1
            elif run:
                segs.append(run)
                run = 0
        expected[f"m{did}"] = (
            n_w,
            n_w - sum(segs),
            len(segs),
            max(segs),
        )
    rows = (
        all_queries()["q_audio_silence_segments"].fn(spark, sf_dir).collect()
    )
    got = {
        r["media_id"]: (
            int(r["n_windows"]),
            int(r["n_silent"]),
            int(r["n_segments"]),
            int(r["longest_speech_windows"]),
        )
        for r in rows
    }
    assert got == expected
    # every clip has at least one planted silent window; clips with five
    # or more windows split around the mid-clip gap into >= 2 segments
    # (3-window clips end ON the silent window -> a single segment)
    assert all(v[1] >= 1 for v in got.values())
    assert all(v[2] >= 2 for v in got.values() if v[0] >= 5)
