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
    timeout_sec: float = 180.0,
    attempts: int = 2,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Drive a (bounded) streaming DataFrame to completion through a
    memory sink and return the result table — the local test harness
    for streaming plans.

    Hardened for unattended harnesses (unique memory-table name and
    explicit throwaway checkpoint per attempt, ``availableNow`` trigger
    so the query self-terminates, bounded ``awaitTermination`` with one
    retry on failure/timeout): a stateful sink must not be able to hang
    or collide its way out of a correctness run.

    ``shuffle_partitions`` (optional) scopes
    ``spark.sql.shuffle.partitions`` to this stream: stateful operators
    allocate one state store per shuffle partition at query start, so a
    32/200-partition conf pays 32/200 state-store setups for a
    test-scale stream. The previous conf value is restored afterwards.
    """
    import shutil
    import tempfile
    import uuid

    conf_key = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(conf_key) if shuffle_partitions is not None else None
    if shuffle_partitions is not None:
        spark.conf.set(conf_key, str(shuffle_partitions))
    last_err: Exception | None = None
    try:
        for _attempt in range(max(1, attempts)):
            name = f"{query_name}_{uuid.uuid4().hex[:8]}"
            ckpt = tempfile.mkdtemp(prefix=f"ckpt_{query_name}_")
            q = None
            try:
                q = (
                    stream.writeStream.format("memory")
                    .queryName(name)
                    .outputMode(output_mode)
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                finished = q.awaitTermination(timeout_sec)
                if not finished:
                    raise TimeoutError(
                        f"stream {name!r} still running after {timeout_sec}s"
                    )
                return spark.table(name)
            except Exception as exc:  # retry once with a fresh checkpoint
                last_err = exc
            finally:
                if q is not None:
                    try:
                        q.stop()
                    except Exception:
                        pass
                shutil.rmtree(ckpt, ignore_errors=True)
        assert last_err is not None
        raise last_err
    finally:
        if prev_parts is not None:
            spark.conf.set(conf_key, prev_parts)
