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


def overwrite_table(df: DataFrame, path: str) -> None:
    """Warehouse overwrite (S5, mergeHistoricalWeather.py:100-105)."""
    df.write.format(_fmt()).mode("overwrite").save(path)


def write_csv(df: DataFrame, path: str) -> None:
    """CSV export with header, overwrite (S6, mergeHistoricalWeather.py:62-66)."""
    df.write.format("csv").option("header", "true").mode("overwrite").save(path)
