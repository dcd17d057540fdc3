"""ML operator tests: k-means on crafted points with known clusters,
random-projection determinism and shape. Oracle parity for the end-to-end
queries (q_embed_project, q_kmeans_clusters) lives in test_parity.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pulsar_lunar_spark.operators import ml as M


def test_kmeans_separates_obvious_clusters(spark):
    # two tight blobs around (0,0) and (10,10); init one centroid in each
    pts = [
        (0, [0.0, 0.1]),
        (1, [10.0, 10.1]),
        (2, [0.2, -0.1]),
        (3, [0.1, 0.2]),
        (4, [9.9, 10.0]),
        (5, [10.2, 9.8]),
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    out = {
        r["__id"]: r["cluster"]
        for r in M.kmeans_fit(df, "vec_id", "embedding", init_ids=[0, 1], iterations=2).collect()
    }
    assert out[0] == out[2] == out[3] == 0
    assert out[1] == out[4] == out[5] == 1


def test_kmeans_assign_tiebreak_lowest_cid(spark):
    # point equidistant from both centroids -> lowest cid wins
    vectors = spark.createDataFrame(
        [(7, [5.0])], "__id long, __v array<double>"
    )
    centroids = spark.createDataFrame(
        [(0, [4.0]), (1, [6.0])], "cid int, cv array<double>"
    )
    rows = M.kmeans_assign(vectors, centroids).collect()
    assert rows[0]["cluster"] == 0


def test_kmeans_assign_literal_matches_join(spark):
    """The zero-exchange literal-argmin assign must be value-identical to
    the broadcast-join assign — same distance fold, same lowest-cid
    tiebreak — and its plan must contain NO Exchange."""
    import random

    rng = random.Random(7)
    pts = [(i, [rng.uniform(-5, 5) for _ in range(4)]) for i in range(50)]
    # plus an exact-tie probe
    vectors = spark.createDataFrame(
        pts + [(99, [5.0, 0.0, 0.0, 0.0])], "__id long, __v array<double>"
    )
    cent_rows = [(0, [4.0, 0.0, 0.0, 0.0]), (1, [6.0, 0.0, 0.0, 0.0]),
                 (2, [0.0, 0.0, 0.0, 0.0])]
    centroids = spark.createDataFrame(cent_rows, "cid int, cv array<double>")
    via_join = {
        r["__id"]: (r["cluster"], r["dist"])
        for r in M.kmeans_assign(vectors, centroids).collect()
    }
    lit_df = M.kmeans_assign_literal(vectors, cent_rows)
    via_lit = {r["__id"]: (r["cluster"], r["dist"]) for r in lit_df.collect()}
    assert via_join == via_lit
    assert via_lit[99][0] == 0  # equidistant -> lowest cid
    plan = lit_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_projection_matrix_deterministic_and_scaled():
    a = M.projection_matrix(64, 8, seed=42)
    b = M.projection_matrix(64, 8, seed=42)
    assert a == b
    assert len(a) == 8 and len(a[0]) == 64
    assert all(abs(abs(x) - 1 / math.sqrt(8)) < 1e-12 for row in a for x in row)
    assert M.projection_matrix(64, 8, seed=7) != a


def test_random_project_matches_manual_dot(spark):
    mat = [[1.0, 0.0, -1.0], [0.5, 0.5, 0.5]]
    df = spark.createDataFrame([(1, [2.0, 4.0, 6.0])], "id long, v array<double>")
    row = df.select(M.random_project(F.col("v"), mat).alias("p")).head()
    assert row["p"][0] == 2.0 - 6.0
    assert row["p"][1] == (2.0 + 4.0 + 6.0) * 0.5
