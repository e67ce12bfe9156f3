"""Sources (SURVEY.md §2.1 S1-S3).

The reference reads every CSV under a folder prefix with an all-string
inferred schema (S1: ``PySpark Scripts/pyspark_ercot_load_latest_BQ_archive_csv.py:37``)
and, in one script, reads files one-by-one and unions them (S2:
``PySpark Scripts/mergeHistoricalWeather.py:33-44``) — N driver-sequenced
tiny jobs. Here:

- one directory-level scan per source — Spark parallelizes over files
  natively, so S2 collapses into S1;
- schemas are *explicit* (`schema=`), never inferred: inference costs an
  extra full pass over 100 TB and silently drifts; explicit schemas fail
  loudly (SURVEY.md §1.2 rebuild decision);
- the empty-folder guard (S3, ``...merge...py:29-32``) becomes a clean
  no-op instead of the reference's NameError-on-empty bug.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def folder_has_files(path: str, suffix: str = "") -> bool:
    """Emptiness guard (S3). Local-FS variant; on HDFS/objstore the same
    check is one LIST call via the Hadoop FS API."""
    if not os.path.isdir(path):
        return False
    return any(
        name.endswith(suffix) and not name.startswith(("_", "."))
        for name in os.listdir(path)
    )


def read_csv_folder(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
) -> DataFrame | None:
    """CSV folder scan (S1). Returns None when the folder has no CSVs —
    callers treat that as a clean pipeline no-op (fixes the reference's
    empty-source NameError, merge:35-51).

    With ``schema=None`` all columns arrive as strings, matching the
    reference's read exactly (header-driven, no inferSchema); production
    callers pass the explicit schema from ``schemas.py``.
    """
    if not folder_has_files(path, ".csv"):
        return None
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark 4 rejects them
    outright unless ``spark.sql.legacy.parquet.nanosAsLong`` is on, in
    which case they surface as epoch-nanos LongType. Footer-only check
    (no data read)."""
    try:
        import pyarrow.parquet as pq

        first = path
        if os.path.isdir(path):
            members = [m for m in sorted(os.listdir(path)) if m.endswith(".parquet")]
            if not members:
                return []
            first = os.path.join(path, members[0])
        schema = pq.read_schema(first)
        import pyarrow as pa

        return [
            n
            for n, t in zip(schema.names, schema.types)
            if pa.types.is_timestamp(t) and t.unit == "ns"
        ]
    except Exception:  # pragma: no cover - pyarrow always present here
        return []


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet table scan — the engine's native columnar source.

    Columnar + predicate pushdown + column pruning is the storage-side
    half of the 100 TB story; the testdata layout is one parquet file
    (or directory) per table under ``sf_dir``.

    Nanosecond-precision timestamp columns (pandas-written parquet) are
    transparently read as epoch nanos and rebuilt as TimestampType at
    microsecond precision, matching how DuckDB/pyarrow consumers see
    the same instant.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _nanos_timestamp_cols(path)
    if ns_cols:
        # The conf is consulted only while spark.read.parquet converts
        # the footer schema (verified: execution of the returned plan
        # succeeds after restore) — so scope it to this call instead of
        # mutating the shared session permanently: a later direct
        # spark.read.parquet of nanos files should fail loudly, not
        # silently surface LongType columns.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(path)
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        for c in ns_cols:
            # Integer division — epoch nanos overflow double precision.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables=TESTDATA_TABLES) -> None:
    """Register every test table as a temp view for spark.sql queries."""
    for name in tables:
        if glob.glob(os.path.join(sf_dir, f"{name}.parquet*")):
            read_table(spark, sf_dir, name).createOrReplaceTempView(name)
