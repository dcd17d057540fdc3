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


def kmeans_assign_literal(
    vectors: DataFrame, centroid_rows: list[tuple[int, list[float]]]
) -> DataFrame:
    """Zero-exchange assign: the centroids are embedded as LITERAL arrays
    and the argmin is ``array_min`` over a per-row array of (dist, cid)
    structs — the whole assignment is one projection inside the scan's
    stage, no crossJoin, no groupBy, no shuffle of the corpus.

    Value-identical to :func:`kmeans_assign` (same left-to-right distance
    fold, same (dist, cid) struct ordering => same lowest-cid tiebreak);
    pinned by tests/test_ml.py::test_kmeans_assign_literal_matches_join.

    This is the 100 TB path whenever K·dim is expression-sized (the
    codegen budget comfortably takes ~64k literal doubles): a Lloyd pass
    then touches the corpus exactly once with NO exchange — only the
    O(K·dim) mean-update reduce shuffles. For K·dim beyond that, fall
    back to the broadcast-join form."""
    dcs = F.array(
        *[
            F.struct(
                _sq_dist(
                    F.col("__v"), F.array(*[F.lit(float(x)) for x in cv])
                ).alias("dist"),
                F.lit(int(cid)).alias("cid"),
            )
            for cid, cv in centroid_rows
        ]
    )
    return vectors.select(
        "__id",
        "__v",
        F.array_min(dcs).alias("best"),
    ).select(
        "__id",
        "__v",
        F.col("best.cid").alias("cluster"),
        F.col("best.dist").alias("dist"),
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
    keep_vec: bool = False,
) -> DataFrame:
    """Lloyd's k-means with deterministic init (centroids = the vectors of
    ``init_ids``), run for a fixed number of iterations. Returns the final
    (__id, cluster) assignment — plus the squared distance to the assigned
    centroid when ``keep_dist`` (the outlier-filtering signal), and the
    double-cast vector itself as ``__v`` when ``keep_vec`` (lets a
    downstream pair/GEMM stage consume the assignment directly instead of
    joining back to the source table).

    Fixed-iteration + fixed-init keeps the whole computation reproducible
    and SQL-expressible (the oracle unrolls the same two passes).

    Assign path: when K·dim fits the expression budget (<= 65536 literal
    doubles — any sane IVF codebook) the centroids travel as LITERALS in
    a zero-exchange argmin projection (:func:`kmeans_assign_literal`),
    so each Lloyd pass shuffles ONLY the O(K·dim) mean update, never the
    corpus; the per-iteration centroid collect is K rows — bounded by
    design, like the BPE vocab. Literal centroids also end the iterative
    plan-growth hazard (every round's plan is projection(checkpointed
    vectors) — constant size, no per-round checkpoint jobs). Beyond the
    budget the broadcast-join assign + checkpoint loop takes over.
    """
    vectors = df.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    ).localCheckpoint(eager=True)
    init = vectors.filter(F.col("__id").isin([int(i) for i in init_ids])).select(
        F.col("__id").cast("int").alias("cid"), F.col("__v").alias("cv")
    )
    cent_rows = sorted(
        ((int(r["cid"]), list(r["cv"])) for r in init.collect()),
        key=lambda t: t[0],
    )
    dim = len(cent_rows[0][1]) if cent_rows else 0
    assigned = None
    if len(cent_rows) * dim <= 65536:
        for it in range(iterations):
            assigned = kmeans_assign_literal(vectors, cent_rows)
            if it < iterations - 1:
                cent_rows = sorted(
                    (
                        (int(r["cid"]), list(r["cv"]))
                        for r in kmeans_update(assigned).collect()
                    ),
                    key=lambda t: t[0],
                )
    else:
        centroids = init.localCheckpoint(eager=True)
        for it in range(iterations):
            assigned = kmeans_assign(vectors, centroids)
            if it < iterations - 1:
                # checkpointing the UPDATED CENTROIDS truncates the lineage
                # for the next round (both kmeans_assign inputs are then
                # checkpoints), so a separate checkpoint of `assigned` is a
                # wasted job — the update's aggregate consumes it once
                centroids = kmeans_update(assigned).localCheckpoint(eager=True)
    cols = ["__id", "cluster"]
    if keep_dist:
        cols.append("dist")
    if keep_vec:
        cols.append("__v")
    return assigned.select(*cols)
