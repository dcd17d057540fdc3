"""Operator library: DataFrame-level operators beyond raw built-ins.

All operators are composition of built-in Spark primitives (SURVEY §4:
no custom Catalyst rules needed); each is designed for 100 TB scale —
no crossJoin on big tables, no unbounded collect, LSH-bounded shuffles.
"""

from pulsar_lunar_spark.operators.topk import top_k_per_group
from pulsar_lunar_spark.operators.asof import asof_join
from pulsar_lunar_spark.operators.compaction import compacted_latest_by_key

__all__ = ["top_k_per_group", "asof_join", "compacted_latest_by_key"]
