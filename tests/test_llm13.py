"""Batch-13 operator semantics vs pure-Python brute force: k-anonymity
risk sweep accounting, DP noisy top-k noise reconstruction, bitext
margin scoring, centroid silhouette, Kneser-Ney probabilities, and the
Zipf OLS slope."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pandas as pd

from pulsar_lunar_spark.queries import all_queries
from pulsar_lunar_spark.queries.llm13 import (
    _BT_ANCHOR_CAP,
    _BT_K,
    _DP_B,
    _DP_SUPPORT,
    _DP_TOPK,
    _KANON_KS,
    _KN_TOPK,
    _ZIPF_TOPK,
)


def _norm_words(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.strip().lower()).split(" ")


def _tdiv(a: int, b: int) -> int:
    """Truncating (toward-zero) integer division — the sign-separated
    semantics both query engines are pinned to."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_k_anonymity_matches_brute_force(spark, sf_dir):
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    sizes = Counter(
        (r.c_mktsegment, r.c_nationkey, math.floor(r.c_acctbal / 1000))
        for r in cust.itertuples()
    )
    total = sum(sizes.values())
    want = {}
    for k in _KANON_KS:
        rows = sum(s for s in sizes.values() if s < k)
        groups = sum(1 for s in sizes.values() if s < k)
        want[k] = (rows, groups, (1_000_000 * (total - rows)) // total, total)
    got = {
        r.k: (r.rows_at_risk, r.groups_at_risk, r.safe_ppm, r.total_rows)
        for r in all_queries()["q_k_anonymity"].fn(spark, sf_dir).collect()
    }
    assert got == want
    # risk is monotone non-decreasing in k; safe share non-increasing
    ks = sorted(got)
    for lo, hi in zip(ks, ks[1:]):
        assert got[lo][0] <= got[hi][0]
        assert got[lo][2] >= got[hi][2]


def _dp_noise(token: str) -> int:
    u = int(hashlib.md5(f"dp|{token}".encode()).hexdigest()[:6], 16) % 1_000_000
    support = [0]
    for k in range(1, _DP_SUPPORT + 1):
        support.extend((k, -k))
    total = sum(math.exp(-abs(z) / _DP_B) for z in support)
    cum = 0.0
    for z in support[:-1]:
        cum += math.exp(-abs(z) / _DP_B) / total
        if u < int(cum * 1_000_000):
            return z
    return support[-1]


def test_dp_noisy_topk_noise_reconstruction(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    counts = Counter(w for t in docs.text for w in _norm_words(t))
    rows = all_queries()["q_dp_noisy_topk"].fn(spark, sf_dir).collect()
    assert len(rows) == min(_DP_TOPK, len(counts))
    ranked = sorted(
        ((c + _dp_noise(t), t) for t, c in counts.items()),
        key=lambda x: (-x[0], x[1]),
    )
    for i, r in enumerate(rows):
        assert r.rank == i + 1
        assert r.true_count == counts[r.token]
        assert r.noise == _dp_noise(r.token)
        assert r.noisy_count == r.true_count + r.noise
        assert abs(r.noise) <= _DP_SUPPORT
        assert (r.noisy_count, r.token) == ranked[i]


def _quant(v: float) -> int:
    return math.floor(v * 1_000_000 + 0.5)


def test_bitext_mining_matches_brute_force(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        int(r.vec_id): [_quant(float(x)) for x in r.embedding]
        for r in emb.itertuples()
    }
    anchors = sorted(v for v in vecs if v % 2 == 0 and v < _BT_ANCHOR_CAP)
    cands = sorted(v for v in vecs if v % 2 == 1)
    assert anchors and len(cands) >= _BT_K

    def sim(a, b):
        qa, qb = vecs[a], vecs[b]
        dot = sum(x * y for x, y in zip(qa, qb))
        na = sum(x * x for x in qa)
        nb = sum(x * x for x in qb)
        return math.floor(
            (dot / (math.sqrt(na) * math.sqrt(nb))) * 1_000_000 + 0.5
        )

    sims = {(a, b): sim(a, b) for a in anchors for b in cands}
    t4a = {
        a: sum(
            sorted(((sims[(a, b)], -b) for b in cands), reverse=True)[
                : _BT_K
            ][i][0]
            for i in range(min(_BT_K, len(cands)))
        )
        for a in anchors
    }
    t4b = {
        b: sum(
            sorted(((sims[(a, b)], -a) for a in anchors), reverse=True)[
                : _BT_K
            ][i][0]
            for i in range(min(_BT_K, len(anchors)))
        )
        for b in cands
    }
    got = all_queries()["q_bitext_mining"].fn(spark, sf_dir).collect()
    assert len(got) == len(anchors)
    for r in got:
        a = r.anchor_id
        best = max(cands, key=lambda b: (sims[(a, b)], -b))
        assert r.cand_id == best
        assert r.sim_micro == sims[(a, best)]
        assert r.top4_anchor_sum == t4a[a]
        assert r.top4_cand_sum == t4b[best]
        denom = max(t4a[a] + t4b[best], 1)
        assert r.margin_ppm == _tdiv(8_000_000 * r.sim_micro, denom)


def test_silhouette_matches_brute_force(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    pts = [
        (int(r.label), [_quant(float(x)) for x in r.embedding])
        for r in emb.itertuples()
    ]
    labels = sorted({l for l, _ in pts})
    dim = len(pts[0][1])
    cent = {}
    for lab in labels:
        members = [v for l, v in pts if l == lab]
        cent[lab] = [
            _tdiv(sum(v[i] for v in members), len(members))
            for i in range(dim)
        ]
    per_label: dict[int, list[int]] = {lab: [] for lab in labels}
    for lab, v in pts:
        dists = {
            cl: math.floor(
                math.sqrt(sum((x - c) ** 2 for x, c in zip(v, cent[cl])))
                + 0.5
            )
            for cl in labels
        }
        a = dists[lab]
        b = min(d for cl, d in dists.items() if cl != lab)
        per_label[lab].append(_tdiv(1000 * (b - a), max(max(a, b), 1)))
    got = {
        r.label: (r.n_points, r.mean_sil_milli, r.n_negative)
        for r in all_queries()["q_silhouette"].fn(spark, sf_dir).collect()
    }
    want = {
        lab: (
            len(s),
            _tdiv(sum(s), len(s)),
            sum(1 for x in s if x < 0),
        )
        for lab, s in per_label.items()
    }
    assert got == want


def test_kneser_ney_matches_brute_force(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    bigrams: Counter = Counter()
    for t in docs.text:
        ws = _norm_words(t)
        bigrams.update(zip(ws, ws[1:]))
    c1: Counter = Counter()
    nfoll: Counter = Counter()
    nprec: Counter = Counter()
    for (w1, w2), c in bigrams.items():
        c1[w1] += c
        nfoll[w1] += 1
        nprec[w2] += 1
    nbi = len(bigrams)
    rows = all_queries()["q_kneser_ney"].fn(spark, sf_dir).collect()
    assert len(rows) == min(_KN_TOPK, nbi)
    top = sorted(bigrams.items(), key=lambda kv: (-kv[1], kv[0]))[:_KN_TOPK]
    for r, ((w1, w2), c12) in zip(rows, top):
        assert (r.w1, r.w2, r.c12) == (w1, w2, c12)
        assert r.c1 == c1[w1]
        pcont = (1_000_000 * nprec[w2]) // nbi
        want = max(
            (1_000_000 * (4 * c12 - 3)) // (4 * c1[w1])
            + (3 * nfoll[w1] * pcont) // (4 * c1[w1]),
            1,
        )
        assert r.p_kn_ppm == want
        # a probability: strictly positive, never above 1
        assert 0 < r.p_kn_ppm <= 1_000_000


def test_zipf_fit_matches_brute_force(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    counts = Counter(w for t in docs.text for w in _norm_words(t))
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_ZIPF_TOPK]
    lrs = [
        math.floor(math.log(i + 1) * 1000 + 0.5) for i in range(len(top))
    ]
    lfs = [math.floor(math.log(c) * 1000 + 0.5) for _, c in top]
    n = len(top)
    sx, sy = sum(lrs), sum(lfs)
    sxx = sum(x * x for x in lrs)
    sxy = sum(x * y for x, y in zip(lrs, lfs))
    slope = _tdiv(1_000_000 * (n * sxy - sx * sy), max(n * sxx - sx * sx, 1))
    [r] = all_queries()["q_zipf_fit"].fn(spark, sf_dir).collect()
    assert r.n_terms == n
    assert r.total_occurrences == sum(c for _, c in top)
    assert r.top_freq == top[0][1]
    assert r.slope_micro == slope
    assert r.mean_lnf_milli == sy // n
    # a token histogram is Zipf-ish: the fitted slope must be negative
    assert r.slope_micro < 0


def test_kn_doc_surprisal_matches_brute_force(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    bigrams: Counter = Counter()
    per_doc: dict[int, tuple[str, list[tuple[str, str]]]] = {}
    for r in docs.itertuples():
        ws = _norm_words(r.text)
        bgs = list(zip(ws, ws[1:]))
        if bgs:
            per_doc[int(r.doc_id)] = (r.source, bgs)
            bigrams.update(bgs)
    c1: Counter = Counter()
    nfoll: Counter = Counter()
    nprec: Counter = Counter()
    for (w1, w2), c in bigrams.items():
        c1[w1] += c
        nfoll[w1] += 1
        nprec[w2] += 1
    nbi = len(bigrams)

    def p_ppm(w1: str, w2: str) -> int:
        c12 = bigrams[(w1, w2)]
        pcont = (1_000_000 * nprec[w2]) // nbi
        return max(
            (1_000_000 * (4 * c12 - 3)) // (4 * c1[w1])
            + (3 * nfoll[w1] * pcont) // (4 * c1[w1]),
            1,
        )

    doc_mean: dict[int, tuple[str, int]] = {}
    for doc_id, (source, bgs) in per_doc.items():
        ss = [
            math.floor(-math.log(p_ppm(w1, w2) / 1_000_000.0) * 1_000_000 + 0.5)
            for w1, w2 in bgs
        ]
        doc_mean[doc_id] = (source, sum(ss) // len(ss))
    mu = sum(m for _, m in doc_mean.values()) // len(doc_mean)
    want: dict[str, list[int]] = {}
    for source, m in doc_mean.values():
        row = want.setdefault(source, [0, 0, 0])
        row[0] += 1
        row[1] += m
        row[2] += 1 if m < mu else 0
    got = {
        r.source: (r.n_docs, r.avg_surprisal_micro, r.n_below_corpus_mean)
        for r in all_queries()["q_kn_doc_surprisal"].fn(spark, sf_dir).collect()
    }
    assert got == {
        s: (v[0], v[1] // v[0], v[2]) for s, v in want.items()
    }
    # surprisal is -ln of a probability <= 1: every mean is non-negative
    assert all(v[1] >= 0 for v in got.values())


def test_pca_power_matches_brute_force(spark, sf_dir):
    from pulsar_lunar_spark.queries.llm13 import (
        _PCA_DIMS_OUT,
        _PCA_ITERATIONS,
        _PCA_V0_MILLI,
    )

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    xs = [
        [math.floor(float(x) * 1000 + 0.5) for x in r.embedding]
        for r in emb.itertuples()
    ]
    dim = len(xs[0])
    v = [_PCA_V0_MILLI] * dim

    def step(v_in):
        w = [0] * dim
        for row in xs:
            s = sum(a * b for a, b in zip(row, v_in))
            s_red = _tdiv(s, 1024)
            for j, a in enumerate(row):
                w[j] += a * s_red
        n2 = 0.0
        for x in w:
            n2 += float(x * x)
        nrm = math.sqrt(n2)
        return [math.floor(1000 * (float(x) / nrm) + 0.5) for x in w]

    for _ in range(_PCA_ITERATIONS):
        v = step(v)
    got = {
        r.pos: r.loading_milli
        for r in all_queries()["q_pca_power"].fn(spark, sf_dir).collect()
    }
    assert got == {j: v[j] for j in range(_PCA_DIMS_OUT)}
    # the full direction is (quantized) unit-norm
    n2 = sum(x * x for x in v)
    assert 900_000 <= n2 <= 1_100_000
    # power iteration must not decrease the Rayleigh quotient vs the seed
    def rayleigh(u):
        num = sum(
            (sum(a * b for a, b in zip(row, u))) ** 2 for row in xs
        )
        den = sum(x * x for x in u)
        return num / den

    assert rayleigh(v) >= rayleigh([_PCA_V0_MILLI] * dim)


def test_mutual_info_matches_brute_force(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    j = Counter(zip(docs.source, docs.lang))
    ns = Counter(docs.source)
    nl = Counter(docs.lang)
    n = len(docs)
    want = {}
    for (s, l), k in j.items():
        cell = math.floor(
            (k / n) * math.log((k * n) / (ns[s] * nl[l])) * 1_000_000 + 0.5
        )
        want[(s, l)] = (k, cell)
    total = sum(c for _, c in want.values())
    rows = all_queries()["q_mutual_info"].fn(spark, sf_dir).collect()
    got = {(r.source, r.lang): (r.n_sl, r.mi_cell_micro) for r in rows}
    assert got == want
    assert all(r.mi_total_micro == total for r in rows)
    # MI of a real joint distribution is non-negative (up to micro
    # rounding of the cell floors)
    assert total >= -len(want)


def test_char_entropy_matches_brute_force(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per_source: dict[str, list[int]] = {}
    for r in docs.itertuples():
        text = re.sub(r"\s+", " ", r.text.strip().lower())
        k = Counter(text)
        L = sum(k.values())
        h = sum(
            math.floor(-(c / L) * math.log(c / L) * 1_000_000 + 0.5)
            for c in k.values()
        )
        per_source.setdefault(r.source, []).append(h)
    want = {
        s: (len(v), sum(v) // len(v), min(v), max(v))
        for s, v in per_source.items()
    }
    got = {
        r.source: (
            r.n_docs,
            r.avg_entropy_micro,
            r.min_entropy_micro,
            r.max_entropy_micro,
        )
        for r in all_queries()["q_char_entropy"].fn(spark, sf_dir).collect()
    }
    assert got == want
    # entropy of a 27-ish symbol alphabet is bounded by ln(|alphabet|)
    for _, (_, avg, mn, mx) in got.items():
        assert 0 <= mn <= avg <= mx <= math.ceil(math.log(64) * 1_000_000)


def test_skyline_matches_brute_force(spark, sf_dir):
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    pts = [
        (
            int(r.p_partkey),
            math.floor(float(r.p_retailprice) * 100 + 0.5),
            int(r.p_size),
        )
        for r in part.itertuples()
    ]
    want = sorted(
        (
            (c, -s, k)
            for k, c, s in pts
            if not any(
                a_c <= c and a_s >= s and (a_c < c or a_s > s)
                for _, a_c, a_s in pts
            )
        ),
    )
    got = [
        (r.cents, -r.size, r.p_partkey)
        for r in all_queries()["q_skyline"].fn(spark, sf_dir).collect()
    ]
    assert got == want
    # skyline invariant: strictly decreasing size along increasing price
    # (among distinct prices)
    by_price = {}
    for c, negs, _ in got:
        by_price.setdefault(c, set()).add(-negs)
    prices = sorted(by_price)
    for lo, hi in zip(prices, prices[1:]):
        assert min(by_price[hi]) > max(by_price[lo])


def test_label_propagation_matches_brute_force(spark, sf_dir):
    from pulsar_lunar_spark.queries.llm13 import _LP_ITERATIONS, _LP_SEEDS

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cu = pd.read_parquet(f"{sf_dir}/customer.parquet")
    su = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    na = pd.read_parquet(f"{sf_dir}/nation.parquet")
    m = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cu, left_on="o_custkey", right_on="c_custkey")
        .merge(su, left_on="l_suppkey", right_on="s_suppkey")
    )
    raw = Counter(
        (int(a), int(b))
        for a, b in zip(m.c_nationkey, m.s_nationkey)
        if a != b
    )
    edges: Counter = Counter()
    for (a, b), w in raw.items():
        edges[(a, b)] += w
        edges[(b, a)] += w
    labels = {
        int(r.n_nationkey): (
            int(r.n_regionkey) if r.n_nationkey < _LP_SEEDS else None
        )
        for r in na.itertuples()
    }
    for _ in range(_LP_ITERATIONS):
        votes: dict[int, Counter] = {}
        for (src, dst), w in edges.items():
            if labels[src] is not None:
                votes.setdefault(dst, Counter())[labels[src]] += w
        new = {}
        for node, lab in labels.items():
            if node < _LP_SEEDS:
                new[node] = lab
            elif node in votes:
                new[node] = min(
                    votes[node], key=lambda l: (-votes[node][l], l)
                )
            else:
                new[node] = lab
        labels = new
    names = {int(r.n_nationkey): r.n_name for r in na.itertuples()}
    want = {
        names[n]: (labels[n], n < _LP_SEEDS) for n in labels
    }
    got = {
        r.nation: (r.label, r.is_seed)
        for r in all_queries()["q_label_propagation"].fn(spark, sf_dir).collect()
    }
    assert got == want
    # seeds keep their region label verbatim
    for r0 in na.itertuples():
        if r0.n_nationkey < _LP_SEEDS:
            assert got[r0.n_name] == (int(r0.n_regionkey), True)


def test_hits_scores_matches_brute_force(spark, sf_dir):
    from pulsar_lunar_spark.queries.llm13 import _HITS_ITERATIONS

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cu = pd.read_parquet(f"{sf_dir}/customer.parquet")
    su = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    na = pd.read_parquet(f"{sf_dir}/nation.parquet")
    m = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cu, left_on="o_custkey", right_on="c_custkey")
        .merge(su, left_on="l_suppkey", right_on="s_suppkey")
    )
    edges = Counter(
        (int(a), int(b))
        for a, b in zip(m.c_nationkey, m.s_nationkey)
        if a != b
    )
    nodes = sorted(int(r.n_nationkey) for r in na.itertuples())
    h = {n: 1_000_000 for n in nodes}
    a = {}
    for _ in range(_HITS_ITERATIONS):
        raw_a = {n: 0 for n in nodes}
        for (s, d), w in edges.items():
            raw_a[d] += w * h[s]
        mx = max(max(raw_a.values()), 1)
        a = {n: (1_000_000 * v) // mx for n, v in raw_a.items()}
        raw_h = {n: 0 for n in nodes}
        for (s, d), w in edges.items():
            raw_h[s] += w * a[d]
        mx = max(max(raw_h.values()), 1)
        h = {n: (1_000_000 * v) // mx for n, v in raw_h.items()}
    names = {int(r.n_nationkey): r.n_name for r in na.itertuples()}
    want = {names[n]: (h[n], a[n]) for n in nodes}
    got = {
        r.nation: (r.hub_ppm, r.auth_ppm)
        for r in all_queries()["q_hits_scores"].fn(spark, sf_dir).collect()
    }
    assert got == want
    # normalization invariant: some node holds the 1e6 max on each side
    assert max(v[0] for v in got.values()) == 1_000_000
    assert max(v[1] for v in got.values()) == 1_000_000
