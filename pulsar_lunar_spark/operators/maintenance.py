"""Table-maintenance operators for the 100 TB pipeline: small-file
compaction and keyed MERGE-style upsert over plain parquet.

A long-running ingest (micro-batched streaming sink, hourly mixture
drops) accretes thousands of KB-sized files; scan cost then becomes
file-open-bound, not byte-bound. Compaction rewrites a directory to
~target-sized files. Upsert gives the CDC/dedup-by-key write path that
table formats call MERGE INTO, built from a full-outer join + atomic
directory swap — no Delta/Iceberg dependency, same semantics for the
"latest record per key wins" case (the reference's compacted-topic model,
/root/reference/src/PulsarApi.proto:317-319 `readCompacted`, applied to
storage instead of a broker).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def plan_compaction(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> tuple[int, int]:
    """Return (current_file_count, target_file_count) for a parquet dir.

    Target = ceil(total_bytes / target_bytes) — the partition count a
    compaction rewrite should coalesce to (128 MB default ≈ one HDFS/S3
    block per file, the scan-friendly size).
    """
    total = 0
    n = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
                n += 1
    return n, max(1, -(-total // target_bytes))


def compact_files(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> int:
    """Rewrite a parquet directory to ~target_bytes files; returns the new
    file count. Uses coalesce (no shuffle — merges existing splits) and an
    atomic tmp-dir swap so readers never observe a half-written table.
    """
    n_now, n_target = plan_compaction(spark, path, target_bytes)
    if n_now <= n_target:
        return n_now
    tmp = f"{path.rstrip('/')}.__compact_{uuid.uuid4().hex[:8]}"
    spark.read.parquet(path).coalesce(n_target).write.mode("overwrite").parquet(tmp)
    old = f"{path.rstrip('/')}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return sum(
        1
        for _root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str | None = None,
) -> None:
    """MERGE INTO for plain parquet: rows in ``updates`` replace target
    rows with the same key; unmatched update rows are inserted.

    With ``version_col``, the higher version wins regardless of side
    (idempotent under replayed/out-of-order batches — the log-compaction
    guarantee). Implemented as union + one per-key max-struct aggregate:
    the target is hash-partitioned by key once; at scale, pre-bucketing
    the target by the key makes the rewrite shuffle-free
    (partitioning.write_bucketed). Atomic directory swap as in
    compact_files.
    """
    target = spark.read.parquet(target_path)
    cols = target.columns
    if set(cols) != set(updates.columns):
        raise ValueError(f"schema mismatch: {cols} vs {updates.columns}")
    # precedence: updates > target; encode as (version, side) struct max
    side_tag = F.lit(1)
    ver = F.col(version_col) if version_col else F.lit(0)
    tagged = target.select(*cols).withColumn("__pri", F.struct(ver.alias("v"), F.lit(0).alias("s"))).unionByName(
        updates.select(*cols).withColumn("__pri", F.struct(ver.alias("v"), side_tag.alias("s")))
    )
    payload = [c for c in cols if c not in key_cols]
    merged = (
        tagged.groupBy(*key_cols)
        .agg(
            F.max(
                F.struct(F.col("__pri"), *[F.col(c) for c in payload])
            ).alias("__win")
        )
        .select(*key_cols, *[F.col(f"__win.{c}").alias(c) for c in payload])
    )
    tmp = f"{target_path.rstrip('/')}.__merge_{uuid.uuid4().hex[:8]}"
    merged.select(*cols).write.mode("overwrite").parquet(tmp)
    old = f"{target_path.rstrip('/')}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(target_path, old)
    os.rename(tmp, target_path)
    shutil.rmtree(old)
