"""Round-11 operator tests: the unigram-LM tokenizer family pinned
against independent brute-force references (exhaustive-segmentation
Viterbi check, hand-replicated EM bookkeeping), plus encode-path UNK
fallback semantics."""

from __future__ import annotations

import itertools
import math

import pytest

from pulsar_lunar_spark.operators.corpus import (
    UNK_COST_MICRO,
    _unigram_costs_micro,
    _unigram_probs_ppm,
    unigram_lm_train,
    unigram_viterbi,
)


def _all_segmentations(word: str, max_len: int):
    """Every way to split word into pieces of length <= max_len."""
    n = len(word)
    if n == 0:
        yield ()
        return
    for first in range(1, min(max_len, n) + 1):
        for rest in _all_segmentations(word[first:], max_len):
            yield (word[:first],) + rest


def test_viterbi_matches_exhaustive_enumeration():
    # costs over a tiny vocabulary; every char present so any word segments
    pieces = ["a", "b", "c", "ab", "bc", "abc", "ca"]
    cost = {p: (i + 1) * 700_000 + len(p) * 13 for i, p in enumerate(pieces)}
    for word in ["a", "abc", "abca", "cabcab", "aaabbbccc", "bcbcbc"]:
        got = unigram_viterbi(word, cost, max_piece_len=3)
        best = min(
            (
                (sum(cost[p] for p in seg), len(seg), seg)
                for seg in _all_segmentations(word, 3)
                if all(p in cost for p in seg)
            ),
        )
        assert got == best, word


def test_viterbi_deterministic_tiebreak():
    # two segmentations tie on cost AND piece count -> lexicographic pick
    cost = {"a": 100, "b": 100, "ab": 200, "ba": 200, "ab_": 1, "abab": 400}
    got = unigram_viterbi("abab", cost, max_piece_len=2)
    # cost 400 paths of 2 pieces: (ab, ab); 400 of 1: none at max_len 2;
    # (a, b, a, b) costs 400 with 4 pieces -> loses on count
    assert got == (400, 2, ("ab", "ab"))


def test_viterbi_unk_fallback_only_when_enabled():
    cost = {"a": 100}
    with pytest.raises(ValueError):
        unigram_viterbi("ax", cost, max_piece_len=2)
    c, n, seg = unigram_viterbi("ax", cost, max_piece_len=2, unk_chars=True)
    assert (n, seg) == (2, ("a", "x"))
    assert c == 100 + UNK_COST_MICRO
    # known pieces always beat UNK where both exist
    assert UNK_COST_MICRO > math.log(1_000_000) * 1_000_000


def test_probs_ppm_exact_and_bounded():
    counts = {"a": 3, "b": 1, "zz": 0}
    pieces = ["a", "b", "zz"]
    p = _unigram_probs_ppm(counts, pieces)
    assert p == {"a": 750_000, "b": 250_000, "zz": 1}
    assert sum(p.values()) <= 1_000_000 + len(pieces)
    cost = _unigram_costs_micro(p)
    # -ln(0.75)*1e6 floored + 0.5
    assert cost["a"] == int(math.floor(-math.log(0.75) * 1e6 + 0.5))


def test_unigram_train_replicates_python_reference(spark):
    """Full trainer vs an independent in-test replication of the spec:
    seed substring counts, epoch-0 Viterbi-EM, prune, epoch costs."""
    import pandas as pd

    rows = pd.DataFrame(
        {
            "text": [
                "the cat sat",
                "the cat ran",
                "the bat sat sat",
                "a cab",
            ]
            * 3
        }
    )
    df = spark.createDataFrame(rows)
    vocab_size, seed_multis, n_iters, maxlen, topw = 12, 20, 3, 4, 300
    p_ppm, pieces, chars, seed, epoch_cost = unigram_lm_train(
        df, "text", vocab_size=vocab_size, seed_multis=seed_multis,
        n_iters=n_iters, top_words=topw, max_piece_len=maxlen,
    )
    # reference: word freqs (every word <= 3 chars here, freqs * 3)
    words = {}
    for t in rows["text"]:
        for w in t.split():
            words[w] = words.get(w, 0) + 1
    ref_words = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:topw]
    ref_seed = {}
    for w, f in ref_words:
        for i in range(len(w)):
            for ln in range(1, maxlen + 1):
                if i + ln <= len(w):
                    p = w[i : i + ln]
                    ref_seed[p] = ref_seed.get(p, 0) + f
    assert seed == ref_seed
    ref_chars = sorted(p for p in ref_seed if len(p) == 1)
    assert chars == ref_chars
    ref_multis = sorted(
        (p for p in ref_seed if len(p) > 1), key=lambda p: (-ref_seed[p], p)
    )[:seed_multis]
    # epoch loop replicated independently
    ref_pieces = ref_chars + ref_multis
    ref_p = _unigram_probs_ppm(ref_seed, ref_pieces)
    ref_costs = []
    for it in range(n_iters):
        c = _unigram_costs_micro(ref_p)
        tot, cnt = 0, {}
        for w, f in ref_words:
            wc, _n, seg = unigram_viterbi(w, c, maxlen)
            tot += f * wc
            for p in seg:
                cnt[p] = cnt.get(p, 0) + f
        ref_costs.append(tot)
        if it == 0:
            keep = max(vocab_size - len(ref_chars), 0)
            ref_pieces = ref_chars + sorted(
                ref_multis, key=lambda p: (-cnt.get(p, 0), p)
            )[:keep]
        ref_p = _unigram_probs_ppm(cnt, ref_pieces)
    assert epoch_cost == ref_costs
    assert pieces == ref_pieces
    assert p_ppm == ref_p
    assert len(pieces) == min(vocab_size, len(ref_chars) + len(ref_multis))
    # invariant flags the registered query asserts
    assert sum(p_ppm.values()) <= 1_000_000 + len(pieces)
    assert epoch_cost[-1] <= epoch_cost[1] + 1_000
