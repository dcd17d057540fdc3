"""Batch-5 operator semantics: SemDeDup planted duplicates, bloom-filter
no-false-negatives + FP bound, hashed-classifier exactness vs a Python
reference, weighted-priority monotonicity, and PageRank on a known graph
(hand-replicated integer arithmetic)."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from pulsar_lunar_spark.operators import corpus as C
from pulsar_lunar_spark.operators import graph as G
from pulsar_lunar_spark.operators import ml as M
from pulsar_lunar_spark.operators import similarity as S


def _md5_int(s: str, hex_chars: int = 6) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:hex_chars], 16)


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


def test_semdedup_drops_planted_near_identical(spark):
    # Two tight groups far apart; ids 1/2 duplicate 0, id 11 duplicates 10.
    rows = [
        Row(vec_id=0, v=[1.0, 0.0, 0.0]),
        Row(vec_id=1, v=[0.999, 0.001, 0.0]),
        Row(vec_id=2, v=[0.998, 0.002, 0.0]),
        Row(vec_id=10, v=[0.0, 1.0, 0.0]),
        Row(vec_id=11, v=[0.0, 0.999, 0.001]),
        Row(vec_id=20, v=[0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows)
    assigned = M.kmeans_fit(df, "vec_id", "v", init_ids=[0, 10], iterations=2)
    with_cell = df.join(assigned.withColumnRenamed("__id", "vec_id"), "vec_id")
    pairs = S.blocked_cosine_pairs(
        with_cell, id_col="vec_id", vec_col="v", block_col="cluster", threshold=0.99
    )
    dropped = {r.id_b for r in pairs.select("id_b").distinct().collect()}
    assert dropped == {1, 2, 11}  # keep-lowest-id survivors: 0, 10, 20


# ---------------------------------------------------------------------------
# Bloom membership
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_fp_bound(spark):
    hist_texts = [f"historical document number {i} alpha beta" for i in range(200)]
    probe_dup = hist_texts[::4]  # 50 true members
    probe_new = [f"fresh unseen text {i} gamma delta" for i in range(200)]
    hist = spark.createDataFrame([(t,) for t in hist_texts], ["text"])
    probe = spark.createDataFrame(
        [(t, True) for t in probe_dup] + [(t, False) for t in probe_new],
        ["text", "is_member"],
    )
    pos = C.bloom_positions(F.col("text"), n_hashes=3, n_bits=1 << 16)
    hist_pos = hist.select(F.explode(pos).alias("pos")).distinct()
    hits = (
        probe.select("text", "is_member", F.explode(pos).alias("pos"))
        .join(hist_pos, "pos", "left_semi")
        .groupBy("text", "is_member")
        .agg(F.count(F.lit(1)).alias("n_set"))
    )
    flagged = (
        probe.join(hits.drop("is_member"), "text", "left")
        .select("text", "is_member", (F.coalesce("n_set", F.lit(0)) == 3).alias("hit"))
        .collect()
    )
    members = [r for r in flagged if r.is_member]
    nonmembers = [r for r in flagged if not r.is_member]
    assert all(r.hit for r in members)  # bloom guarantee: no false negatives
    # 600 set bits of 65536 -> per-probe FP rate ~ (600/65536)^3 ~ 8e-7
    assert sum(r.hit for r in nonmembers) == 0


def test_bloom_positions_deterministic(spark):
    df = spark.createDataFrame([("same text",)], ["text"])
    a = df.select(C.bloom_positions(F.col("text")).alias("p")).first().p
    b = df.select(C.bloom_positions(F.col("text")).alias("p")).first().p
    assert a == b and len(a) == 3 and all(0 <= x < (1 << 20) for x in a)


# ---------------------------------------------------------------------------
# md5_int + hashed classifier
# ---------------------------------------------------------------------------


def test_md5_int_matches_python(spark):
    df = spark.createDataFrame([("spark",), ("query",), ("",)], ["s"])
    got = {r.s: r.h for r in df.select("s", C.md5_int(F.col("s"), 6).alias("h")).collect()}
    for s in ("spark", "query", ""):
        assert got[s] == _md5_int(s)


def test_classifier_logit_matches_python_reference(spark):
    texts = [(1, "alpha beta gamma"), (2, "alpha alpha delta epsilon")]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    tok = df.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    weights = spark.range(4096).select(
        F.col("id").alias("bucket"),
        (C.md5_int(F.col("id").cast("string"), 6, salt="w-") % 2001 - 1000).alias("w"),
    )
    got = {
        r.doc_id: r.s
        for r in tok.withColumn("bucket", C.md5_int(F.col("word"), 6) % 4096)
        .join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("w").alias("s"))
        .collect()
    }

    def w_of(word: str) -> int:
        bucket = _md5_int(word) % 4096
        return _md5_int(f"w-{bucket}") % 2001 - 1000

    for doc_id, text in texts:
        assert got[doc_id] == sum(w_of(t) for t in text.split())


# ---------------------------------------------------------------------------
# Weighted priority sampling
# ---------------------------------------------------------------------------


def test_weighted_priority_monotone_in_weight(spark):
    # Same id-hash, different weights: priority strictly increases.
    df = spark.createDataFrame([(7, 100), (7, 200)], ["doc_id", "w"])
    pri = df.select(
        (C.md5_int(F.col("doc_id").cast("string"), 6, salt="s-") * F.col("w"))
        .cast("long")
        .alias("p")
    ).collect()
    assert pri[1].p == 2 * pri[0].p > 0


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def _pr_reference(nodes, edges, iterations=3):
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(iterations):
        inc = {n: 0 for n in nodes}
        for s, d, w in edges:
            inc[d] += rank[s] * w // out_w[s]
        rank = {n: 150_000 + 85 * inc[n] // 100 for n in nodes}
    return rank


def test_pagerank_matches_integer_reference(spark):
    nodes = [0, 1, 2, 3]
    edges = [(0, 1, 3), (0, 2, 1), (1, 2, 2), (2, 0, 1), (3, 2, 5)]
    ndf = spark.createDataFrame([(n,) for n in nodes], ["node"])
    edf = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {r.node: r.rank for r in G.pagerank(ndf, edf, iterations=3).collect()}
    assert got == _pr_reference(nodes, edges)
    # sink-heavy node 2 must outrank pure-source node 3
    assert got[2] > got[3]


def test_pagerank_checkpoint_edges_off_is_value_identical(spark):
    nodes = [0, 1, 2, 3]
    edges = [(0, 1, 3), (0, 2, 1), (1, 2, 2), (2, 0, 1), (3, 2, 5)]
    ndf = spark.createDataFrame([(n,) for n in nodes], ["node"])
    edf = spark.createDataFrame(edges, ["src", "dst", "w"])
    on = {r.node: r.rank for r in G.pagerank(ndf, edf, iterations=3).collect()}
    off = {
        r.node: r.rank
        for r in G.pagerank(
            ndf, edf, iterations=3, checkpoint_edges=False
        ).collect()
    }
    assert on == off


def test_trade_edges_spools_once_per_process(spark, sf_dir):
    """The shared trade-edge artifact (round-9): second call must reuse
    the same spool path, and the rows must equal the direct 4-join build."""
    import pulsar_lunar_spark.operators.graph as G2
    from pulsar_lunar_spark.session import load_table

    e1 = G2.trade_edges(spark, sf_dir)
    path1 = next(iter(e1.inputFiles()), None)
    e2 = G2.trade_edges(spark, sf_dir)
    path2 = next(iter(e2.inputFiles()), None)
    assert path1 == path2

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    direct = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .groupBy(
            F.col("c_nationkey").cast("long").alias("src"),
            F.col("s_nationkey").cast("long").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    got = {(r.src, r.dst): r.w for r in e1.collect()}
    want = {(r.src, r.dst): r.w for r in direct.collect()}
    assert got == want


def test_pagerank_isolated_node_keeps_teleport_mass(spark):
    ndf = spark.createDataFrame([(0,), (1,), (9,)], ["node"])
    edf = spark.createDataFrame([(0, 1, 1)], ["src", "dst", "w"])
    got = {r.node: r.rank for r in G.pagerank(ndf, edf, iterations=2).collect()}
    assert got[9] == 150_000  # no in-edges: teleport mass only
    assert got[1] > got[0] == 150_000


def _tri_brute(edges: list[tuple[int, int]]) -> int:
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    tri = 0
    nodes = sorted(nbrs)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            if v not in nbrs[u]:
                continue
            for w in nodes:
                if w > v and w in nbrs[u] and w in nbrs[v]:
                    tri += 1
    return tri


def test_orient_edges_one_row_per_edge_and_acyclic(spark):
    # star + path: hub 0 has degree 4, leaves 1; every edge must point
    # AWAY from the lower-(degree, id) endpoint, so all star edges point
    # INTO the hub (leaf -> hub), bounding the hub's out-adjacency at 0
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2)]
    edf = spark.createDataFrame(edges, ["src", "dst"])
    got = [(r.a, r.b) for r in G.orient_edges(edf).collect()]
    assert len(got) == len(edges) == len(set(got))
    out_deg: dict[int, int] = {}
    for a, b in got:
        out_deg[a] = out_deg.get(a, 0) + 1
        assert a != b
    assert out_deg.get(0, 0) == 0  # the hub is a pure sink after orientation


def test_triangle_forms_agree_with_brute_force(spark):
    # K4 plus a pendant edge: 4 triangles; also exercises the pure-sink
    # left-join path in the edge-iterator (the pendant's head)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    edf = spark.createDataFrame(edges, ["src", "dst"])
    want = _tri_brute(edges)
    assert want == 4
    oriented = G.orient_edges(edf)
    wedge = G.triangle_count_oriented(oriented).collect()[0]
    assert wedge.n_triangles == want
    it = G.triangle_count_adjacency(G.oriented_adjacency(oriented)).collect()[0]
    assert it.n_triangles == want
    assert it.n_edges == len(edges)
    assert G.triangle_count(edf).collect()[0].n_triangles == want


def test_triangle_adjacency_empty_graph_yields_zero(spark):
    # contract parity with the other forms: an edgeless input is (0, 0),
    # not (NULL, 0) — SUM over zero rows is NULL without the coalesce
    empty = spark.createDataFrame([], "a long, nb array<long>")
    row = G.triangle_count_adjacency(empty).collect()[0]
    assert row.n_triangles == 0
    assert row.n_edges == 0
