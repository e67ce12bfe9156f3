"""Bucketed warehouse tables (SURVEY.md §4 "partitioning & shuffle"):
pre-shuffle a table ONCE at write time so every later equi-join or
aggregation on the bucket key runs with NO exchange.

At 100 TB the fact-to-fact join (lineitem ⨝ orders on orderkey) is the
dominant shuffle; two tables bucketed into the same bucket count on
the join key co-locate matching rows per bucket file, and Spark's
bucketed scan feeds SortMergeJoin directly — `tests/test_plans.py`
pins the no-Exchange plan. This is the static twin of AQE's runtime
re-planning: AQE sizes shuffles it cannot avoid; bucketing removes the
shuffle for keys you commit to at layout time.

Bucketed writes go through ``saveAsTable`` (bucket metadata lives in
the session catalog / metastore — a plain ``save(path)`` silently
drops bucket info, which is why this module exists instead of a flag
on ``writers.append_table``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally per-bucket sorted)
    parquet table. ``sort_cols`` defaulting to the bucket key lets the
    bucketed SortMergeJoin skip its sort as well."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucket metadata only survives through the table
    identifier, never a path read."""
    return spark.table(table)
