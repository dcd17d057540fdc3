"""Declared query registry — the t2 correctness contract.

Every operator in SURVEY.md §2B is exercised by at least one registered
query; each query carries its DuckDB-oracle SQL (or None for genuinely
non-SQL-expressible ops, which get a rows-only check).
"""

from pulsar_lunar_spark.queries.registry import QuerySpec, all_queries, register

__all__ = ["QuerySpec", "all_queries", "register"]
