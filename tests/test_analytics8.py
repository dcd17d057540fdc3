"""Semantic pins for the time-series regularization + snapshot-diff
queries beyond the oracle hash-match: interpolation convexity/anchoring,
time-weighted-average bounds, and diff-class partition laws — invariants
that must hold at ANY scale, checked inside Spark itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_lunar_spark.queries import all_queries
from pulsar_lunar_spark.session import load_table

SPECS = all_queries()


def test_interpolate_grid_is_hourly_and_convex(spark, sf_dir):
    """Every emitted grid point is on an exact hour boundary, and every
    interpolated value lies within the user's observed [min, max] band
    (linear interpolation between two observations can never leave their
    envelope; endpoint back/forward fill can't either)."""
    out = SPECS["q_events_interpolate"].fn(spark, sf_dir)
    assert out.filter(F.col("t_s") % 3600 != 0).count() == 0
    obs = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 10)
        .groupBy("user_id")
        .agg(
            F.min(F.floor(F.col("value") * 1_000_000)).alias("lo"),
            F.max(F.floor(F.col("value") * 1_000_000)).alias("hi"),
        )
    )
    violated = (
        out.join(obs, "user_id")
        .filter((F.col("interp_u") < F.col("lo")) | (F.col("interp_u") > F.col("hi")))
        .count()
    )
    assert violated == 0


def test_interpolate_anchors_at_observations(spark, sf_dir):
    """A grid point landing exactly on an observation second must emit
    that observation's value (delta-time 0 => prev point wins exactly)."""
    out = SPECS["q_events_interpolate"].fn(spark, sf_dir)
    obs = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 10)
        .select(
            "user_id",
            F.unix_timestamp("ts").alias("t_s"),
            F.floor(F.col("value") * 1_000_000).cast("bigint").alias("v_u"),
        )
    )
    # observations exactly on an hour boundary (may be none at tiny SF —
    # the assertion is vacuous then, which is fine: the equality law is
    # what's pinned, not the fixture's phase)
    on_grid = obs.filter(F.col("t_s") % 3600 == 0)
    # ties within one second: the ordering picks the max v_u as "prev"
    anchored = on_grid.groupBy("user_id", "t_s").agg(F.max("v_u").alias("v_u"))
    mismatches = (
        anchored.join(out, ["user_id", "t_s"])
        .filter(F.col("interp_u") != F.col("v_u"))
        .count()
    )
    assert mismatches == 0


def test_twa_bounded_by_value_envelope(spark, sf_dir):
    """The LOCF time-weighted average is a convex combination of observed
    values, so twa_u must lie in the user's [min, max] micro-value band
    and twa_den must equal the observed span exactly."""
    out = SPECS["q_time_weighted_avg"].fn(spark, sf_dir)
    obs = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.unix_timestamp("ts").alias("t_s"),
            F.floor(F.col("value") * 1_000_000).cast("bigint").alias("v_u"),
        )
        .groupBy("user_id")
        .agg(
            F.min("v_u").alias("lo"),
            F.max("v_u").alias("hi"),
            (F.max("t_s") - F.min("t_s")).alias("span"),
        )
    )
    j = out.join(obs, "user_id")
    assert j.filter(F.col("twa_den") != F.col("span")).count() == 0
    # integer floor-division can undershoot the true mean by <1 unit
    assert j.filter(
        (F.col("twa_u") < F.col("lo") - 1) | (F.col("twa_u") > F.col("hi"))
    ).count() == 0


def test_snapshot_diff_partitions_key_space(spark, sf_dir):
    """added/removed/changed/unchanged must partition the union of both
    versions' key sets: n(v1) = removed + changed + unchanged, n(v2) =
    added + changed + unchanged, and only 'changed' rows may carry a
    nonzero delta."""
    rows = {r["status"]: r for r in SPECS["q_snapshot_diff"].fn(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    n_v1 = o.filter(F.col("o_orderkey") % 5 != 0).count()
    n_v2 = o.filter(F.col("o_orderkey") % 7 != 0).count()

    def n(status):
        return rows[status]["n_rows"] if status in rows else 0

    assert n_v1 == n("removed") + n("changed") + n("unchanged")
    assert n_v2 == n("added") + n("changed") + n("unchanged")
    if "unchanged" in rows:
        assert rows["unchanged"]["sum_delta_c"] == 0
    if "changed" in rows:
        # every changed row was perturbed by exactly +1 cent
        assert rows["changed"]["sum_delta_c"] == rows["changed"]["n_rows"]
