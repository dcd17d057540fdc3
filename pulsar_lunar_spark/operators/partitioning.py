"""Partitioning strategies for 100 TB joins: bucketed (shuffle-free) joins
and salted (skew-proof) joins.

The reference's data plane shards by key hash at produce time
(/root/reference/src/entity/producer.rs:295-312 partition routing;
src/PulsarApi.proto:286-295 Key_Shared hash ranges). These helpers apply
the same idea to the analytic layer:

- **Bucketing** = hash-sharding persisted at write time. Two tables
  bucketed by the same key/count join with ZERO exchanges — at 100 TB that
  deletes the dominant cost of every fact-fact join that repeats per day.
- **Salting** = splitting a hot key into N synthetic sub-keys so one
  reducer doesn't receive the whole key's data. AQE's skew-join handles
  sort-merge skew automatically; explicit salting is the portable fallback
  (e.g. for aggregations, or broadcast-ineligible hot keys).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist a table hash-bucketed (and optionally sorted) by join key.

    Spark records bucketing in the catalog; a later equi-join between two
    tables bucketed by the same columns into the same bucket count is
    planned WITHOUT an Exchange on either side (SortMergeJoin reads
    co-located buckets). At 100 TB, bucket so each bucket is ~128-512 MB.
    With ``path`` the table is EXTERNAL (data at the given location, e.g.
    a per-process scratch dir); bucketing metadata is still recorded.
    """
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables — plans with no shuffle.

    Verify with .explain(): no Exchange above either scan (asserted in
    tests/test_partitioning.py).
    """
    return spark.table(left_table).join(spark.table(right_table), list(on), how)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: split every key of the big side into n_salts
    sub-keys; replicate the small side n_salts times so every sub-key finds
    its match. The hot key's rows spread over n_salts reducers instead
    of one.

    Cost model: small side shuffles n_salts×(its size) — use only when the
    small side is modest but above the broadcast threshold, or when a hot
    key would otherwise dominate a reducer (the #1 practical cause of
    10×-slower-than-expected joins at scale). For dimension-sized small
    sides prefer F.broadcast; for SMJ skew AQE's skewJoin handles it.
    """
    b = big.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = b.join(s, [key, "__salt"], how)
    return out.drop("__salt")


def repartition_by_key_range(
    df: DataFrame, cols: Sequence[str | Column], num_partitions: int
) -> DataFrame:
    """Range partitioning (repartitionByRange): totally-ordered partitions
    for window-heavy or sorted-output workloads — the sort inside each
    partition is then local, no global sort exchange."""
    return df.repartitionByRange(num_partitions, *cols)


# ---------------------------------------------------------------------------
# Z-order clustering key (multi-column data-skipping layout)
# ---------------------------------------------------------------------------

def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton/Z-order interleave of the low `bits` bits of two non-negative
    integer keys -> one BIGINT clustering key.

    Writing a table sorted by this key co-locates rows that are close in
    EITHER dimension, so parquet row-group min/max stats prune scans
    filtered on x OR y — the standard multi-column data-skipping layout
    (Delta/Iceberg OPTIMIZE ZORDER BY). Pure bit arithmetic, codegen'd in
    the scan projection; the only cost at write time is the global sort.
    Disjoint bit positions mean `+` == `|`, which keeps the same expression
    valid SQL in any oracle dialect (see zorder_sql).
    """
    xl, yl = x.cast("long"), y.cast("long")
    term = F.lit(0).cast("long")
    for i in range(bits):
        term = term + F.shiftleft(F.shiftright(xl, i).bitwiseAND(1), 2 * i)
        term = term + F.shiftleft(F.shiftright(yl, i).bitwiseAND(1), 2 * i + 1)
    return term


def zorder_sql(x: str, y: str, bits: int = 16) -> str:
    """ANSI-ish SQL twin of zorder_key (DuckDB / any dialect with >> & <<):
    the identical unrolled bit-interleave expression, for oracle checks."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def stable_row_ids(df: DataFrame, order_col: str, n_ranges: int = 8) -> DataFrame:
    """Globally contiguous, deterministic row ids 0..n-1 in `order_col`
    order — WITHOUT a single-node global sort.

    Plan: range-repartition on the order column (sampled boundaries →
    n_ranges roughly equal shards), sort within each partition, count rows
    per partition (tiny driver collect, O(n_ranges)), then enumerate each
    partition locally adding its exclusive-prefix-sum offset. This is the
    zipWithIndex pattern expressed on DataFrames: total shuffle is one
    range exchange; nothing ever funnels through one task, so it holds at
    100 TB where ROW_NUMBER() OVER (ORDER BY ...) (one giant partition)
    does not. The partitioned/sorted stage is localCheckpoint-ed so the
    count pass and the enumerate pass see the SAME materialized partitions
    (range boundaries are sampled — never recompute them twice).

    Returns df's columns plus `row_id BIGINT`.
    """
    import pandas as pd

    part = (
        df.repartitionByRange(n_ranges, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["__pid"]: r["n"]
        for r in part.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in part.schema.fields if f.name != "__pid"
    ) + ", row_id long"

    def enumerate_part(batches):
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            off = offsets[int(pdf["__pid"].iloc[0])]
            out = pdf.drop(columns=["__pid"])
            out["row_id"] = range(off + seen, off + seen + len(pdf))
            seen += len(pdf)
            yield out

    return part.mapInPandas(enumerate_part, out_schema)


def sharded_group_cumsum(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "cum",
    n_ranges: int = 8,
) -> DataFrame:
    """Inclusive per-group cumulative sum of `value_col` in `order_cols`
    order — WITHOUT a per-group single-partition sort.

    The plain form, ``SUM(v) OVER (PARTITION BY group ORDER BY ...)``,
    funnels EVERY row of a group through one task; when groups are a
    small dimension (data sources, languages) a single group is the
    whole corpus slice, so at 100 TB the window sort is the bottleneck
    (the caveat documented on q_token_budget_mix). This is the
    zipWithIndex pattern generalized from `stable_row_ids` to keyed
    running sums:

    1. range-repartition on (group, *order) and sort within partitions —
       each group's rows are totally ordered ACROSS shards, split over
       up to n_ranges of them;
    2. per-(shard, group) subtotal aggregate — at most
       n_ranges * n_groups rows, collected to the driver and turned into
       exclusive prefix offsets per (shard, group). This collect is the
       operator's scale contract: it is bounded by the SHARD x GROUP
       grid, not by data volume — use this form exactly when groups are
       few and huge (the regime where the window form dies); a
       high-cardinality group column needs no sharding in the first
       place (its per-group slices are small, the window form is fine);
    3. one mapInPandas running-sum pass over the already-sorted shards,
       carrying per-group state across Arrow batches within a shard and
       seeding each group at its (shard, group) offset. No second
       full-width exchange: the only data-bearing shuffle is the range
       repartition in step 1.

    The partitioned/sorted stage is localCheckpoint-ed so the subtotal
    pass and the running-sum pass see the SAME materialized shards
    (range boundaries are sampled — never recompute them twice).

    Returns df's columns plus `out_col BIGINT` (value_col must be
    integral; sums are exact int64). Value-identical to the window form
    — locked by tests/test_partitioning.py against both a crafted frame
    and the q_token_budget_mix fill.
    """
    part = (
        df.repartitionByRange(n_ranges, F.col(group_col), *[F.col(c) for c in order_cols])
        .sortWithinPartitions(group_col, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sub = (
        part.groupBy("__pid", group_col)
        .agg(F.sum(value_col).cast("long").alias("__sub"))
        .collect()
    )
    # exclusive prefix sum of shard subtotals per group, in shard order
    offsets: dict[tuple[int, object], int] = {}
    acc_by_group: dict[object, int] = {}
    for r in sorted(sub, key=lambda r: (str(r[group_col]), r["__pid"])):
        key = r[group_col]
        offsets[(int(r["__pid"]), key)] = acc_by_group.get(key, 0)
        acc_by_group[key] = acc_by_group.get(key, 0) + int(r["__sub"])

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in part.schema.fields
        if f.name != "__pid"
    ) + f", {out_col} long"

    def running_sum(batches):
        state: dict[object, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["__pid"].iloc[0])
            cums = []
            for g, v in zip(pdf[group_col], pdf[value_col]):
                if g not in state:
                    state[g] = offsets[(pid, g)]
                state[g] += int(v)
                cums.append(state[g])
            out = pdf.drop(columns=["__pid"])
            out[out_col] = cums
            yield out

    return part.mapInPandas(running_sum, out_schema)
