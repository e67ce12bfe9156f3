"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``energydatalake_spark.plans.registry``: the driver
runs ``entry(spark)`` as a smoke check, each ``queries()[name]`` at
sf=0.01 against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from energydatalake_spark.plans.registry import QUERIES, entry_query, oracle_sql_map

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    return entry_query(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM-data
    pipeline extensions). Each callable takes (spark, sf_dir)."""
    return {name: q.build for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL oracle per query (omitted for the handful of
    non-SQL-expressible ops, which get the driver's rows-only check)."""
    return oracle_sql_map()
