"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``pulsar_lunar_spark.queries`` — the declared query
registry (one entry per implemented operator from SURVEY.md §2B, each
with its DuckDB oracle SQL where SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pulsar_lunar_spark.queries import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    specs = all_queries()
    return specs["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
