"""Streaming replacement for the reference's cron + archive file queue
(SURVEY.md §2.9).

The reference gets incremental processing by cron-firing a batch job
that reads ALL files under a prefix, appends to the warehouse, then
copies each file to an archive folder and deletes the original
(merge:125-161) — write-then-archive, so a crash between the two means
a duplicate append (at-least-once).

Structured Streaming's file source is the built-in 1:1 replacement:
the checkpoint records exactly which files each batch consumed
(exactly-once at the file level even across crashes), and
``cleanSource=archive`` performs the reference's copy+delete natively.
``Trigger.AvailableNow`` reproduces "process everything present, then
stop" — i.e. one cron tick.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def stream_folder_to_table(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType | str,
    sink_path: str,
    checkpoint_dir: str,
    archive_dir: str | None = None,
    transform=None,
    max_files_per_trigger: int | None = None,
) -> int:
    """One AvailableNow pass: CSV folder → (transform) → parquet append.

    Returns the number of batches executed. Re-running with the same
    checkpoint is a no-op for already-seen files — the exactly-once
    upgrade over the reference's archive loop.

    Archival caveat: Spark's file-source cleaner moves a batch's files
    when a LATER batch starts, so the last batch of a pass leaves its
    files in place until the next pass processes something. Bound batch
    size with ``max_files_per_trigger`` to keep the queue draining.
    """
    reader = (
        spark.readStream.schema(schema)
        .option("header", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if archive_dir is not None:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    stream = reader.csv(source_dir)
    if transform is not None:
        stream = transform(stream)

    n_batches = 0

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # Idempotent-by-batch: each epoch owns a batch=<id> directory and
        # OVERWRITES it. A crash between this write and the checkpoint
        # commit replays the same epoch into the same directory — no
        # duplicate rows, closing the write-then-commit gap a plain
        # append would reopen (the reference's at-least-once failure
        # mode). Delta/Iceberg get the same via txn-id'd appends.
        nonlocal n_batches
        n_batches += 1
        batch_df.write.mode("overwrite").parquet(
            os.path.join(sink_path, f"batch={epoch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches


def stream_folder_upsert(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType | str,
    sink_path: str,
    checkpoint_dir: str,
    keys: list[str],
    partition_date_col: str | None = None,
    transform=None,
) -> int:
    """One AvailableNow pass with a MERGE sink: CSV folder →
    (transform) → insert-only upsert on ``keys``.

    The checkpoint gives exactly-once per FILE; the per-batch
    ``upsert_table`` adds exactly-once per ROW — re-delivered content
    under NEW file names (which the checkpoint rightly treats as new
    files: the reference's racing crons, a producer retry, a manual
    backfill) cannot duplicate warehouse rows. This is SURVEY §2.9's
    "idempotent MERGE for true exactly-once" as a streaming sink.
    """
    from energydatalake_spark.io.writers import upsert_table

    stream = (
        spark.readStream.schema(schema).option("header", "true").csv(source_dir)
    )
    if transform is not None:
        stream = transform(stream)

    n_batches = 0

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        upsert_table(batch_df, sink_path, keys, partition_date_col)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches


def stream_cdc_apply(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType | str,
    sink_path: str,
    checkpoint_dir: str,
    keys: list[str],
    op_col: str = "op",
    seq_col: str | None = None,
    partition_date_col: str | None = None,
) -> int:
    """One AvailableNow pass with a DELETE-CAPABLE CDC sink: a JSONL
    change feed (``op_col`` ∈ {'I','U','D'}, the Debezium/DMS envelope
    shape) applied per micro-batch through ``apply_cdc_batch`` — the
    streaming completion of ``stream_folder_upsert`` (whose MERGE is
    insert-only). The checkpoint gives exactly-once per FILE; the
    latest-per-key batch semantics plus keyed replace give
    exactly-once per ROW even when a retrying producer re-ships a
    change batch under a new file name.

    Micro-batch ordering is the stream's file order — each batch's
    changes land before the next batch is read, so cross-batch
    ordering needs no ``seq_col``; within a batch the usual CDC
    contract applies (pass ``seq_col`` when one file can carry several
    changes for a key). Scale shape inherits from apply_cdc_batch:
    only touched dt partitions rewrite.
    """
    from energydatalake_spark.io.writers import apply_cdc_batch

    stream = spark.readStream.schema(schema).json(source_dir)
    n_batches = 0

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        nonlocal n_batches
        if batch_df.isEmpty():
            return
        n_batches += 1
        apply_cdc_batch(
            batch_df,
            sink_path,
            keys,
            op_col=op_col,
            seq_col=seq_col,
            partition_date_col=partition_date_col,
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches
