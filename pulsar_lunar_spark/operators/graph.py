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
