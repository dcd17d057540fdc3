"""Graph operators over relational edge lists (SURVEY §2B north star,
corpus-curation family): integer-arithmetic PageRank for link/host-graph
ranking — the quality prior a web-scale curation pipeline assigns to
domains before sampling documents from them.

Complements `corpus.connected_components` (dup clustering): components
answer "which nodes are the same", PageRank answers "which nodes matter".

Determinism discipline: ranks are kept in integer micro-units (1e6 = 1.0)
and every per-iteration update is BIGINT multiply + floor division, so
Spark and any SQL oracle agree bit-for-bit regardless of partial-sum
order — no floating accumulation anywhere.

Scale notes (100 TB): each iteration is one join of the rank vector onto
the edge list (rank side is O(nodes) — broadcast when nodes are hosts,
shuffle-join on src when nodes are pages) plus one groupBy(dst) integer
sum. Cost per iteration is O(edges) shuffle bytes; the rank vector is
localCheckpoint-ed per round so the logical plan stays constant-size
(see memory: iterative loops double the plan otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000  # rank fixed-point scale: 1e6 micro-units = rank 1.0


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank in integer micro-units.

    nodes: (node BIGINT) — the full vertex set (isolated nodes keep the
    teleport mass). edges: (src, dst, w BIGINT) positive integer weights.
    Returns (node, rank BIGINT micro-units).

    Update rule (all BIGINT, `DIV` = floor division on non-negatives):
        contrib(e)   = rank[src] * w  DIV  out_w[src]
        rank'[node]  = (100 - damping_pct) * MICRO DIV 100
                       + damping_pct * sum(contrib into node) DIV 100
    Dangling-node mass is dropped (documented deviation — standard for
    fixed-iteration curation scoring; totals are not renormalized).
    """
    n = nodes.select(F.col("node").cast("long").alias("node"))
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    ew = (
        edges.join(out_w, "src")
        .select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            F.col("w").cast("long").alias("w"),
            F.col("out_w").cast("long").alias("out_w"),
        )
        .localCheckpoint(eager=True)
    )
    base = (100 - damping_pct) * MICRO // 100
    ranks = n.select("node", F.lit(MICRO).cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = (
            ew.join(ranks, ew.src == ranks.node)
            .select(
                F.col("dst"),
                F.expr("rank * w DIV out_w").cast("long").alias("contrib"),
            )
        )
        incoming = contrib.groupBy("dst").agg(F.sum("contrib").alias("inc"))
        ranks = (
            n.join(incoming, n.node == incoming.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"{damping_pct}L * coalesce(inc, 0L) DIV 100")
                )
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact triangle count via degree-ordered edge orientation.

    `edges`: undirected distinct pairs, one row per edge (either
    direction, no duplicates). Each edge is re-oriented from its lower
    (degree, id) endpoint to the higher, so every triangle is counted
    exactly once as a directed wedge u->v, v->w closed by u->w — the
    classic trick that bounds the join fan-out by the MAX OUT-DEGREE,
    which orientation keeps near sqrt(edges) even on power-law graphs
    (a hub's adjacency never explodes: its edges all point INTO it).
    Three hash equi-joins, no cartesian; returns a 1-row DataFrame
    (n_triangles BIGINT).
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionAll(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    ranked = (
        sym.join(deg.withColumnRenamed("a", "x").withColumnRenamed("d", "da"),
                 F.col("a") == F.col("x"))
        .drop("x")
        .join(deg.withColumnRenamed("a", "y").withColumnRenamed("d", "db"),
              F.col("b") == F.col("y"))
        .drop("y")
    )
    oriented = ranked.filter(
        (F.col("da") < F.col("db"))
        | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    ).select("a", "b")
    e1 = oriented.select(F.col("a").alias("u"), F.col("b").alias("v"))
    e2 = oriented.select(F.col("a").alias("v"), F.col("b").alias("w"))
    e3 = oriented.select(F.col("a").alias("u"), F.col("b").alias("w"))
    wedges = e1.join(e2, "v").select("u", "w")
    return wedges.join(e3, ["u", "w"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
