"""Compacted-topic read: latest value per key.

Pulsar's ``read_compacted`` subscription option
(``/root/reference/src/PulsarApi.proto:325``) exposes only the newest
message per key. Spark realization (SURVEY §2C): row_number over
(key, order desc) = 1 — Catalyst turns the rn=1 filter into a
WindowGroupLimit, so the shuffle carries one row per key per map
partition, not the whole log.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def compacted_latest_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_by: Sequence[str | Column],
) -> DataFrame:
    """Latest row per key under ``order_by`` (ascending => last wins, so we
    order descending internally). Include a unique tiebreak in ``order_by``
    for determinism."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.desc(c) if isinstance(c, str) else c for c in order_by]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
