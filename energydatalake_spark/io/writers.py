"""Sinks (SURVEY.md §2.1 S4-S6).

The reference appends to BigQuery via a staging bucket
(``PySpark Scripts/pyspark_ercot_merge_fm_load_latest_BQ_archive_csv.py:115-119``)
and overwrites one table (``mergeHistoricalWeather.py:100-105``). The
native sink here is partitioned Parquet under a warehouse dir (Delta is
the intended production format; its jars aren't in this image, so the
Delta writer is gated behind an import-try and falls back to Parquet).

Partitioning: time-series tables partition by event date derived from
the interval start (SURVEY.md §4 "partition pruning") so that the four
analytics queries prune to the touched dates instead of scanning 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # Delta is optional; not present in this image.
    from delta.tables import DeltaTable  # noqa: F401

    _HAVE_DELTA = True
except Exception:  # pragma: no cover
    _HAVE_DELTA = False


def _fmt() -> str:
    return "delta" if _HAVE_DELTA else "parquet"


def append_table(
    df: DataFrame,
    path: str,
    partition_date_col: str | None = None,
) -> None:
    """Warehouse append (S4). ``partition_date_col`` names a timestamp
    column; rows land under ``dt=YYYY-MM-DD`` partitions derived from it."""
    writer = df
    if partition_date_col is not None:
        writer = df.withColumn("dt", F.to_date(F.col(partition_date_col)))
        writer.write.format(_fmt()).mode("append").partitionBy("dt").save(path)
    else:
        df.write.format(_fmt()).mode("append").save(path)


def upsert_table(
    df: DataFrame,
    path: str,
    keys: list[str],
    partition_date_col: str | None = None,
) -> None:
    """Idempotent warehouse append: insert-only MERGE on ``keys``
    (SURVEY.md §2.9 "idempotent Delta MERGE for true exactly-once").

    Re-delivered files — the reference's crons racing on a shared GCS
    prefix (README.md:143-148), or a pipeline re-run after a crash
    between sink-write and archive — must not duplicate rows. The
    folder-level archive queue gives once-per-FILE; this gives
    once-per-ROW.

    With Delta available this is ``MERGE ... WHEN NOT MATCHED INSERT``
    (file-skipping on the key condition). The Parquet fallback is the
    same shape made partition-aware: read back ONLY the ``dt``
    partitions the batch touches (partition pruning — at 100 TB a
    re-run touches hours, not history), left-anti join the batch
    against their keys, append the survivors. Single-writer semantics,
    matching the reference's Scheduler-serialized jobs.
    """
    import os

    spark = df.sparkSession
    if partition_date_col is not None:
        df = df.withColumn("dt", F.to_date(F.col(partition_date_col)))
    exists = os.path.isdir(path) and any(
        not n.startswith((".", "_")) for n in os.listdir(path)
    )
    if not exists:
        writer = df.write.format(_fmt()).mode("append")
        if partition_date_col is not None:
            writer = writer.partitionBy("dt")
        writer.save(path)
        return
    if _HAVE_DELTA:  # pragma: no cover - Delta jars absent in this image
        from delta.tables import DeltaTable

        cond = " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in keys)
        (
            DeltaTable.forPath(spark, path)
            .alias("t")
            .merge(df.alias("s"), cond)
            .whenNotMatchedInsertAll()
            .execute()
        )
        return
    existing = spark.read.parquet(path)
    if partition_date_col is not None:
        # Tiny driver list (distinct event DATES in this batch) that
        # prunes the read-back to the touched partitions.
        dts = [r[0] for r in df.select("dt").distinct().collect()]
        existing = existing.filter(F.col("dt").isin(dts))
    fresh = df.join(existing.select(*keys).distinct(), keys, "left_anti")
    writer = fresh.write.format("parquet").mode("append")
    if partition_date_col is not None:
        writer = writer.partitionBy("dt")
    writer.save(path)


def overwrite_table(df: DataFrame, path: str) -> None:
    """Warehouse overwrite (S5, mergeHistoricalWeather.py:100-105)."""
    df.write.format(_fmt()).mode("overwrite").save(path)


def write_csv(df: DataFrame, path: str) -> None:
    """CSV export with header, overwrite (S6, mergeHistoricalWeather.py:62-66)."""
    df.write.format("csv").option("header", "true").mode("overwrite").save(path)
