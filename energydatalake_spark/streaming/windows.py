"""Windowed streaming aggregates (SURVEY.md §2.9: the streaming variant
of A4/A5 — tumbling event-time windows with watermarked late data).

The reference has no streaming; its hourly/monthly aggregates are
BigQuery batch SQL. These builders give the same aggregates streaming
semantics: ``hourly_rollup`` is a 1-hour tumbling window on event time
with a configurable watermark bounding state for late arrivals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_rollup(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling 1-hour window: count + sum + avg of ``value_col`` per
    (window, *keys). Watermark bounds state: rows later than it are
    dropped once the window closes — the explicit late-data contract
    the reference's process-whatever-arrived cron never states."""
    keys = keys or []
    w = stream.withWatermark(ts_col, watermark)
    return (
        w.groupBy(F.window(ts_col, "1 hour").alias("win"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(value_col).alias("sum_value"),
            F.avg(value_col).alias("avg_value"),
        )
        .select(
            F.col("win.start").alias("hour_start"),
            *keys,
            "n_rows",
            "sum_value",
            "avg_value",
        )
    )


def run_stream_to_memory(
    spark: SparkSession,
    stream: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Drive a (bounded) streaming DataFrame to completion through a
    memory sink and return the result table — the local test harness
    for streaming plans (AvailableNow semantics via processAllAvailable)."""
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
