"""Batch-12 operator semantics: dedup-Pareto accounting identities vs a
pure-Python brute force, and RHO excess-loss selection invariants
(loss reconstruction, ranking order, weak-model coarseness)."""

from __future__ import annotations

import math
import re

import pandas as pd

from pulsar_lunar_spark.queries import all_queries
from pulsar_lunar_spark.queries.llm12 import _PREFIX_CHARS, _RHO_TOPK


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text.strip().lower())


def test_dedup_pareto_matches_brute_force(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    groups: dict[str, list[tuple[int, int]]] = {}
    for r in docs.itertuples():
        groups.setdefault(_norm(r.text)[:_PREFIX_CHARS], []).append(
            (int(r.doc_id), int(r.n_chars))
        )
    by_size: dict[int, list[int]] = {}
    for members in groups.values():
        s = len(members)
        total = sum(c for _, c in members)
        kept = min(members)[1]  # min doc_id's n_chars
        by_size.setdefault(s, [0, 0, 0, 0])
        row = by_size[s]
        row[0] += 1
        row[1] += s
        row[2] += total
        row[3] += kept
    want = {
        s: (v[0], v[1], v[2], v[3], (1_000_000 * (v[2] - v[3])) // v[2])
        for s, v in by_size.items()
    }
    got = {
        r.dup_size: (
            r.n_groups, r.n_docs, r.total_chars, r.chars_after_keep1,
            r.savings_ppm,
        )
        for r in all_queries()["q_dedup_pareto"].fn(spark, sf_dir).collect()
    }
    assert got == want
    # accounting identities: singleton groups save nothing
    if 1 in got:
        assert got[1][4] == 0 and got[1][2] == got[1][3]


def test_rho_select_ordering_and_loss_reconstruction(spark, sf_dir):
    rows = all_queries()["q_rho_select"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= _RHO_TOPK
    # excess = weak - strong, descending, doc_id tiebreak
    for r in rows:
        assert r.excess_micro == r.loss_weak_micro - r.loss_strong_micro
        assert r.loss_weak_micro >= 0 and r.loss_strong_micro >= 0
    keys = [(-r.excess_micro, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    # the bounded-logit construction keeps every loss finite and within
    # -ln(p_min), p_min = sigmoid(-10) => loss < 10.1e6 micro
    lim = int(-math.log(1.0 / (1.0 + math.exp(10.0))) * 1e6) + 1
    for r in rows:
        assert r.loss_weak_micro <= lim and r.loss_strong_micro <= lim


def test_rho_select_deterministic(spark, sf_dir):
    fn = all_queries()["q_rho_select"].fn
    assert fn(spark, sf_dir).collect() == fn(spark, sf_dir).collect()


def test_perplexity_filter_matches_brute_force(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    from collections import Counter

    tok = {
        int(r.doc_id): (r.source, _norm(r.text).split(" "))
        for r in docs.itertuples()
    }
    ref: Counter = Counter()
    for src, words in tok.values():
        if src == "src0":
            ref.update(words)
    n_ref, v = sum(ref.values()), len(ref) + 1
    per_source: dict[str, list[int]] = {}
    for src, words in tok.values():
        total = sum(
            int(math.floor(-math.log((ref.get(w, 0) + 1) / (n_ref + v)) * 1e6 + 0.5))
            for w in words
        )
        per_source.setdefault(src, []).append(total // len(words))
    want = {}
    for src, means in per_source.items():
        kept = sum(1 for m in means if m <= 3_420_000)
        want[src] = (
            len(means),
            sum(means) // len(means),
            kept,
            (1_000_000 * kept) // len(means),
        )
    got = {
        r.source: (r.n_docs, r.avg_surprisal_micro, r.n_kept, r.kept_ppm)
        for r in all_queries()["q_perplexity_filter"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_dataset_card_matches_brute_force(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per_source: dict[str, dict] = {}
    for r in docs.itertuples():
        s = per_source.setdefault(
            r.source, {"n": 0, "chars": 0, "words": 0, "langs": {}}
        )
        s["n"] += 1
        s["chars"] += int(r.n_chars)
        s["words"] += len(_norm(r.text).split(" "))
        s["langs"][r.lang] = s["langs"].get(r.lang, 0) + 1
    want = {}
    for src, s in per_source.items():
        shares = [(1_000_000 * n) // s["n"] for n in s["langs"].values()]
        ent = sum(
            int(
                math.floor(
                    -(p / 1_000_000) * math.log(p / 1_000_000) * 1_000_000 + 0.5
                )
            )
            for p in shares
        )
        want[src] = (
            s["n"], s["chars"], s["words"], s["chars"] // s["n"],
            len(s["langs"]), max(shares), ent,
        )
    got = {
        r.source: (
            r.n_docs, r.total_chars, r.total_words, r.mean_chars,
            r.n_langs, r.top_lang_ppm, r.lang_entropy_micro,
        )
        for r in all_queries()["q_dataset_card"].fn(spark, sf_dir).collect()
    }
    assert got == want
    # entropy sanity: 0 for a monolingual source would be exact 0; always
    # bounded by ln(n_langs) in micro-nats (+1 per-term rounding slack)
    for r in all_queries()["q_dataset_card"].fn(spark, sf_dir).collect():
        assert 0 <= r.lang_entropy_micro <= int(math.log(max(r.n_langs, 1)) * 1e6) + r.n_langs
