"""Per-group top-k operator.

Spark-first: a row_number window + filter. Catalyst (Spark >= 3.5) rewrites
``row_number() <= k`` into ``WindowGroupLimit``, which keeps only k rows per
group per partition BEFORE the shuffle — so at 100 TB the shuffle carries
O(groups * k) rows, not the full table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[str | Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = True,
) -> DataFrame:
    """Keep the top ``k`` rows of each group under ``order_by``.

    ``order_by`` should be a total order (include a unique tiebreak column)
    for deterministic results.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)
