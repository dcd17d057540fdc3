"""Batch-6 pipeline/storage semantics: stable row-id contiguity and
window-equivalence, partition pruning in the physical plan, and Arrow
UDF surfaces (value checks ride the DuckDB oracle; these tests cover the
properties the oracle can't see)."""

from __future__ import annotations

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from pulsar_lunar_spark.operators.partitioning import stable_row_ids
from pulsar_lunar_spark.plans.inspect import plan_text
from pulsar_lunar_spark.queries import all_queries
from pulsar_lunar_spark.session import load_table

SPECS = all_queries()


def test_stable_row_ids_match_window_enumeration(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    got = stable_row_ids(d, order_col="doc_id", n_ranges=8)
    want = d.select(
        "doc_id", (F.row_number().over(Window.orderBy("doc_id")) - 1).alias("row_id")
    )
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_stable_row_ids_contiguous_on_skewed_input(spark):
    # Heavy duplication in the order column: ties must still enumerate
    # contiguously (ties split arbitrarily but ids stay a permutation).
    rows = [Row(k=1)] * 50 + [Row(k=2)] * 3 + [Row(k=9)] * 47
    df = spark.createDataFrame(rows)
    ids = sorted(r.row_id for r in stable_row_ids(df, "k", n_ranges=4).collect())
    assert ids == list(range(100))


def test_partitioned_prune_plan_prunes(spark, sf_dir):
    df = SPECS["q_partitioned_prune"].fn(spark, sf_dir)
    txt = plan_text(df)
    assert "PartitionFilters" in txt and "lang" in txt.split("PartitionFilters", 1)[1][:200]


def test_apply_in_arrow_single_group_batch(spark):
    # Each group must arrive as ONE pyarrow table (contract of the API).
    import pyarrow as pa

    df = spark.createDataFrame([(1, 10), (1, 20), (2, 5)], ["k", "v"])

    def agg(t: "pa.Table") -> "pa.Table":
        return pa.table({"k": [t.column("k")[0].as_py()], "s": [sum(t.column("v").to_pylist())]})

    got = {r.k: r.s for r in df.groupBy("k").applyInArrow(agg, "k long, s long").collect()}
    assert got == {1: 30, 2: 5}


def test_curation_funnel_is_monotone(spark, sf_dir):
    """Stage counts must shrink monotonically per source, and every stage
    must keep at least one document somewhere (the fixtures contain valid
    en/de/fr docs)."""
    rows = SPECS["q_curation_funnel"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_total >= r.n_lang >= r.n_len >= r.n_quality >= r.n_unique >= 0
    assert sum(r.n_unique for r in rows) > 0


def test_dynamic_partition_pruning_in_plan(spark, sf_dir):
    """q_dynamic_partition_prune must carry a dynamicpruning subquery in
    the fact scan's PartitionFilters — runtime pruning from the join, not
    a static literal."""
    from pulsar_lunar_spark.plans.inspect import plan_text

    txt = plan_text(SPECS["q_dynamic_partition_prune"].fn(spark, sf_dir))
    assert "dynamicpruning" in txt


def test_bloom_filter_join_injected(spark, sf_dir):
    """Under the scoped confs, the shuffle join must carry a
    bloom_filter_agg creation and a might_contain application — the
    runtime row-level prefilter."""
    from pulsar_lunar_spark.queries.pipeline import _BLOOM_CONFS, _bloom_join_df
    from pulsar_lunar_spark.plans.inspect import plan_text

    prev = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        txt = plan_text(_bloom_join_df(spark, sf_dir))
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "bloom_filter_agg" in txt
    assert "might_contain" in txt


def test_aqe_skew_join_split(spark, sf_dir):
    """After execution, the final adaptive plan must contain a skewed
    AQEShuffleRead — proof the hot partition was actually split."""
    from pulsar_lunar_spark.queries.pipeline import _SKEW_CONFS, _skew_join_df

    prev = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        df = _skew_join_df(spark, sf_dir)
        df.collect()  # AQE decides at runtime; inspect the FINAL plan
        txt = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "skewed" in txt
