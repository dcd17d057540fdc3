"""Embedding-pipeline ML operators (SURVEY §2B north star, similarity
family): deterministic random projection (JL-style dimensionality
reduction feeding ANN) and k-means Lloyd iterations (the IVF
centroid-training step) — both pure DataFrame ops, no MLlib dependency.

Scale notes (100 TB): projection is a per-row JVM expression inside the
scan (no shuffle). Each k-means iteration is one broadcast-join assign
pass + one O(n·dim) exploded mean-update aggregation; centroids (K·dim
doubles) always stay broadcast-small. Lineage per iteration is truncated
the same way `corpus.connected_components` does it.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def projection_matrix(in_dim: int, out_dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Rademacher-style (+1/-1)/sqrt(out_dim) projection
    matrix as plain literals — the same numbers are injected into the
    Spark expression and any SQL oracle, so results are engine-portable
    (no per-engine RNG stream)."""
    rng = random.Random(seed)
    scale = 1.0 / (out_dim ** 0.5)
    return [
        [scale if rng.random() < 0.5 else -scale for _ in range(in_dim)]
        for _ in range(out_dim)
    ]


def dot_literal(vec: Column, weights: list[float]) -> Column:
    """Sequential-order dot product of an array column with a literal
    vector (left-to-right fold, matching DuckDB's LIST_INNER_PRODUCT
    evaluation order so double sums agree bit-for-bit)."""
    w = F.array(*[F.lit(float(x)) for x in weights])
    return F.aggregate(
        F.zip_with(vec, w, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def random_project(vec: Column, matrix: list[list[float]]) -> Column:
    """Project an array<numeric> column to len(matrix) dims: one JVM
    expression per output dim, all inside the scan's codegen stage."""
    return F.array(*[dot_literal(vec, row) for row in matrix])


def _sq_dist(vec: Column, centroid: Column) -> Column:
    """Squared euclidean distance between two array<double> columns."""
    return F.aggregate(
        F.zip_with(vec, centroid, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign each vector to its nearest centroid (squared euclidean;
    tiebreak: lowest centroid id).

    vectors: (__id, __v array<double>); centroids: (cid, cv array<double>).
    The centroid side is broadcast (K·dim doubles); the argmin is a
    MIN(struct(dist, cid)) aggregate — no window, no shuffle of scores.
    """
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        "__id",
        "__v",
        F.struct(
            _sq_dist(F.col("__v"), F.col("cv")).alias("dist"),
            F.col("cid").alias("cid"),
        ).alias("dc"),
    )
    return (
        scored.groupBy("__id")
        .agg(F.min("dc").alias("best"), F.first("__v").alias("__v"))
        .select(
            "__id",
            "__v",
            F.col("best.cid").alias("cluster"),
            F.col("best.dist").alias("dist"),
        )
    )


def kmeans_update(assigned: DataFrame) -> DataFrame:
    """Recompute centroids as the element-wise mean of assigned vectors:
    posexplode by dimension -> (cluster, dim) mean -> re-assemble arrays.
    Shuffle carries (cluster, dim, partial sum) — O(K·dim) reduce output."""
    by_dim = assigned.select(
        "cluster", F.posexplode("__v").alias("dim", "val")
    )
    means = by_dim.groupBy("cluster", "dim").agg(F.avg("val").alias("m"))
    return (
        means.groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
        .select(
            F.col("cluster").alias("cid"),
            F.transform("dm", lambda s: s.getField("m")).alias("cv"),
        )
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    init_ids: list[int],
    iterations: int = 2,
    keep_dist: bool = False,
) -> DataFrame:
    """Lloyd's k-means with deterministic init (centroids = the vectors of
    ``init_ids``), run for a fixed number of iterations. Returns the final
    (__id, cluster) assignment — plus the squared distance to the assigned
    centroid when ``keep_dist`` (the outlier-filtering signal).

    Fixed-iteration + fixed-init keeps the whole computation reproducible
    and SQL-expressible (the oracle unrolls the same two passes). Each
    round is localCheckpoint-ed so the logical plan stays constant-size
    (same iterative-join hazard as connected_components).
    """
    vectors = df.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    ).localCheckpoint(eager=True)
    centroids = (
        vectors.filter(F.col("__id").isin([int(i) for i in init_ids]))
        .select(F.col("__id").cast("int").alias("cid"), F.col("__v").alias("cv"))
        .localCheckpoint(eager=True)
    )
    assigned = None
    for it in range(iterations):
        assigned = kmeans_assign(vectors, centroids)
        if it < iterations - 1:
            # checkpointing the UPDATED CENTROIDS truncates the lineage for
            # the next round (both kmeans_assign inputs are then
            # checkpoints), so a separate checkpoint of `assigned` is a
            # wasted job — the update's aggregate consumes it exactly once
            centroids = kmeans_update(assigned).localCheckpoint(eager=True)
    cols = ["__id", "cluster", "dist"] if keep_dist else ["__id", "cluster"]
    return assigned.select(*cols)
