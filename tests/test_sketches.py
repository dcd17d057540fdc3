"""Count-min sketch: estimates bound true counts (never under, bounded
over) and heavy hitters surface the true top keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_lunar_spark.operators.sketches import (
    cms_lookup,
    count_min_sketch,
    heavy_hitters,
)
from pulsar_lunar_spark.session import load_table


def test_cms_never_undercounts_and_bounds_overcount(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    total = e.count()
    sketch = count_min_sketch(e, "k", depth=5, width=8192)
    truth = e.groupBy("k").agg(F.count(F.lit(1)).alias("true_count"))
    est = cms_lookup(sketch, truth.select("k"), "k", depth=5, width=8192)
    joined = truth.join(est, "k")
    bad_under = joined.filter(F.col("est_count") < F.col("true_count")).count()
    assert bad_under == 0  # CMS never underestimates
    # overcount bounded: eps*N with eps ~ e/width; allow 3x slack
    eps_n = 3 * 2.72 * total / 8192 + 1
    bad_over = joined.filter(
        F.col("est_count") > F.col("true_count") + F.lit(eps_n)
    ).count()
    assert bad_over == 0


def test_heavy_hitters_match_exact_top(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("k")
    )
    hh = {r["k"] for r in heavy_hitters(e, "k", k=3).collect()}
    exact = {
        r["k"]
        for r in e.groupBy("k").count().orderBy(F.desc("count"), "k").limit(3).collect()
    }
    assert hh == exact  # tiny key domain: sketch must agree with exact


def test_sketch_size_is_bounded(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    sketch = count_min_sketch(e, "k", depth=5, width=256)
    assert sketch.count() <= 5 * 256
