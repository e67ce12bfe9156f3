"""Streaming tests: exactly-once file queue + windowed rollups."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from energydatalake_spark.io.readers import read_table
from energydatalake_spark.pipelines.fixtures import generate_all
from energydatalake_spark.streaming.file_queue import stream_folder_to_table
from energydatalake_spark.streaming.windows import hourly_rollup, run_stream_to_memory

from tests.conftest import SF_SMOKE

LOAD_SCHEMA = "`Time` string, `Interval Start` string, `Interval End` string, `Load` string"


def test_file_queue_exactly_once(spark, tmp_path):
    layout = generate_all(str(tmp_path / "src"))
    src = layout["load_latest"]
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    n_csv_rows = sum(
        len(open(f).readlines()) - 1 for f in glob.glob(os.path.join(src, "*.csv"))
    )

    stream_folder_to_table(spark, src, LOAD_SCHEMA, sink, ckpt)
    assert spark.read.parquet(sink).count() == n_csv_rows

    # Second pass with the same checkpoint: files already consumed → no
    # duplicate appends (the upgrade over the reference's archive loop).
    stream_folder_to_table(spark, src, LOAD_SCHEMA, sink, ckpt)
    assert spark.read.parquet(sink).count() == n_csv_rows

    # A new file arrives → only its rows are appended.
    extra = os.path.join(src, "late_arrival.csv")
    with open(extra, "w") as f:
        f.write("Time,Interval Start,Interval End,Load\n")
        f.write("2024-03-02 00:00:00,2024-03-02 00:00:00,2024-03-02 00:05:00,41000.5\n")
    stream_folder_to_table(spark, src, LOAD_SCHEMA, sink, ckpt)
    assert spark.read.parquet(sink).count() == n_csv_rows + 1


def test_file_queue_archive(spark, tmp_path):
    layout = generate_all(str(tmp_path / "src"))
    src = layout["load_latest"]
    archive = str(tmp_path / "archived")
    n_src = len(glob.glob(os.path.join(src, "*.csv")))
    stream_folder_to_table(
        spark,
        src,
        LOAD_SCHEMA,
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
        archive_dir=archive,
        max_files_per_trigger=1,
    )
    import time

    time.sleep(2)  # cleaner thread
    remaining = glob.glob(os.path.join(src, "*.csv"))
    archived = glob.glob(os.path.join(archive, "**", "*.csv"), recursive=True)
    # Spark archives batch N's files when batch N+1 starts → everything
    # except the final batch's file is moved within one pass.
    assert len(archived) == n_src - 1, (archived, remaining)
    assert len(remaining) == 1
    # A later pass (with a new file to process) sweeps the remainder.
    with open(os.path.join(src, "next_tick.csv"), "w") as f:
        f.write("Time,Interval Start,Interval End,Load\n")
        f.write("2024-03-02 00:00:00,2024-03-02 00:00:00,2024-03-02 00:05:00,41000.5\n")
    stream_folder_to_table(
        spark,
        src,
        LOAD_SCHEMA,
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
        archive_dir=archive,
        max_files_per_trigger=1,
    )
    time.sleep(2)
    assert len(glob.glob(os.path.join(archive, "**", "*.csv"), recursive=True)) == n_src


def test_hourly_rollup_matches_batch(spark):
    raw = read_table(spark, SF_SMOKE, "events")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema
    stream = spark.readStream.schema(schema).parquet(f"{SF_SMOKE}/events.parquet*")
    stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    roll = hourly_rollup(stream, "ts", "value", keys=["event_type"])
    got = run_stream_to_memory(spark, roll, "t_roll", "complete")
    batch = (
        raw.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .collect()
    )
    expect = {(r.hour_start, r.event_type): r.n_rows for r in batch}
    actual = {(r.hour_start, r.event_type): r.n_rows for r in got.collect()}
    assert actual == expect and len(actual) > 100
