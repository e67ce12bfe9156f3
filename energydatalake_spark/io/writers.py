"""Sinks (SURVEY.md §2.1 S4-S6).

The reference appends to BigQuery via a staging bucket
(``PySpark Scripts/pyspark_ercot_merge_fm_load_latest_BQ_archive_csv.py:115-119``)
and overwrites one table (``mergeHistoricalWeather.py:100-105``). The
contractual sink here is partitioned Parquet under a warehouse dir:
``upsert_table`` implements the insert-only-MERGE exactly-once
contract directly on Parquet (batch dedup + null-safe anti-join +
dynamic partition pruning), so the semantics do not depend on a table
format's transaction log. On a Delta/Iceberg deployment the same
call-site maps 1:1 onto ``MERGE ... WHEN NOT MATCHED INSERT`` — a
format swap, not a semantics change.

Partitioning: time-series tables partition by event date derived from
the interval start (SURVEY.md §4 "partition pruning") so that the four
analytics queries prune to the touched dates instead of scanning 100 TB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def append_table(
    df: DataFrame,
    path: str,
    partition_date_col: str | None = None,
) -> None:
    """Warehouse append (S4). ``partition_date_col`` names a timestamp
    column; rows land under ``dt=YYYY-MM-DD`` partitions derived from it."""
    if partition_date_col is not None:
        writer = df.withColumn("dt", F.to_date(F.col(partition_date_col)))
        writer.write.format("parquet").mode("append").partitionBy("dt").save(path)
    else:
        df.write.format("parquet").mode("append").save(path)


def upsert_table(
    df: DataFrame,
    path: str,
    keys: list[str],
    partition_date_col: str | None = None,
) -> None:
    """Idempotent warehouse append: insert-only MERGE on ``keys``
    (SURVEY.md §2.9 "idempotent MERGE for true exactly-once").

    Re-delivered files — the reference's crons racing on a shared GCS
    prefix (README.md:143-148), or a pipeline re-run after a crash
    between sink-write and archive — must not duplicate rows. The
    folder-level archive queue gives once-per-FILE; this gives
    once-per-ROW, including:

    - duplicates WITHIN one batch (two identical files drained by a
      single AvailableNow trigger): the batch is key-deduped before
      writing;
    - null-valued keys: the anti-join matches with ``eqNullSafe``, so
      a null-key row inserts exactly once instead of on every rerun.

    Scale shape: the read-back is restricted to the ``dt`` partitions
    the batch touches via a broadcast semi-join on the batch's distinct
    dates — dynamic partition pruning keys the scan off that frame, so
    nothing rides the driver (at 100 TB × years of partitions a driver
    ``collect``+``isin`` list would not). Single-writer semantics,
    matching the reference's Scheduler-serialized jobs.
    """
    import os

    spark = df.sparkSession
    if partition_date_col is not None:
        df = df.withColumn("dt", F.to_date(F.col(partition_date_col)))
    # once-per-row within the batch itself (keep-any on key ties)
    df = df.dropDuplicates(keys)
    exists = os.path.isdir(path) and any(
        not n.startswith((".", "_")) for n in os.listdir(path)
    )
    if not exists:
        writer = df.write.format("parquet").mode("append")
        if partition_date_col is not None:
            writer = writer.partitionBy("dt")
        writer.save(path)
        return
    # The merge plan consumes the batch twice (partition-pruning side +
    # anti-join side). Persist it — bounded by BATCH size, not table
    # size — so the upstream source computes once; this also keeps any
    # caller-attached df.observe metrics single-counted.
    df = df.persist()
    try:
        existing = spark.read.parquet(path)
        if partition_date_col is not None:
            existing = _pruned_readback(existing, df)
        fresh = _fresh_rows(df, existing, keys)
        writer = fresh.write.format("parquet").mode("append")
        if partition_date_col is not None:
            writer = writer.partitionBy("dt")
        writer.save(path)
    finally:
        df.unpersist()


def _pruned_readback(existing: DataFrame, batch: DataFrame) -> DataFrame:
    """Restrict the target read-back to the ``dt`` partitions the batch
    touches, without a driver round-trip: broadcast the batch's
    distinct dates and semi-join on the partition column — dynamic
    partition pruning keys the parquet scan off the broadcast result.

    The sanity bound on ``dt`` exists for the optimizer, not the data:
    DPP only fires when the pruning side carries a likely-selective
    predicate (``isnotnull`` does not qualify), and without DPP this
    semi-join would scan every partition of the target.

    Rows outside that bound — null ``dt`` (unparseable source
    timestamp) or pre-1900 dates — would be silently dropped from the
    read-back by the semi-join, breaking exactly-once for exactly those
    rows on redelivery. They are unioned back unconditionally: such
    partitions are pathological by construction (a healthy feed has
    none), so the extra scan is zero-to-tiny while correctness holds
    for every partition."""
    import datetime

    epoch0 = F.lit(datetime.date(1900, 1, 1))
    batch_dts = batch.select("dt").distinct().filter(F.col("dt") >= epoch0)
    pruned = existing.join(F.broadcast(batch_dts), "dt", "left_semi")
    odd = existing.filter(F.col("dt").isNull() | (F.col("dt") < epoch0))
    return pruned.unionByName(odd)


def _fresh_rows(df: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of ``df`` whose key tuple is absent from ``existing`` —
    null-safe, so a null-valued key matches its prior insertion and is
    not re-inserted on every rerun."""
    target_keys = existing.select(*[F.col(f"`{k}`") for k in keys]).distinct()
    cond = reduce(
        lambda a, b: a & b,
        [df[f"`{k}`"].eqNullSafe(target_keys[f"`{k}`"]) for k in keys],
    )
    return df.join(target_keys, cond, "left_anti")


def overwrite_table(df: DataFrame, path: str) -> None:
    """Warehouse overwrite (S5, mergeHistoricalWeather.py:100-105)."""
    df.write.format("parquet").mode("overwrite").save(path)


def write_csv(df: DataFrame, path: str) -> None:
    """CSV export with header, overwrite (S6, mergeHistoricalWeather.py:62-66)."""
    df.write.format("csv").option("header", "true").mode("overwrite").save(path)


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """JSON-Lines export (LLM-corpus interchange twin of the jsonl
    reader). Gzip by default: jsonl text compresses ~10×, and the
    format stays line-splittable per FILE — shard count (= input
    partitions) is the parallelism unit downstream, so repartition
    before writing if consumers need more/fewer shards."""
    writer = df.write.format("json").mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.save(path)


def apply_cdc_batch(
    df: DataFrame,
    path: str,
    keys: list[str],
    op_col: str = "op",
    seq_col: str | None = None,
    partition_date_col: str | None = None,
) -> None:
    """Full CDC MERGE on the parquet warehouse: apply a change batch of
    inserts/updates/deletes (``op_col`` ∈ {'I','U','D'}) keyed on
    ``keys`` — the delete-capable completion of ``upsert_table``'s
    insert-only MERGE. Maps 1:1 onto Delta/Iceberg
    ``MERGE ... WHEN MATCHED [AND op='D'] THEN DELETE / UPDATE /
    WHEN NOT MATCHED THEN INSERT`` — same call-site, same semantics.

    Semantics: within the batch, the LATEST change per key wins
    (``seq_col`` order — a key inserted then deleted in one batch nets
    to absent); then existing rows for batch keys are replaced by the
    surviving I/U images and dropped for D. ``seq_col`` must be unique
    per key within a batch (every real CDC stream's LSN/offset is) —
    two same-key rows with EQUAL seq have no defined winner.

    Plain parquet has no row-level update, so the rewrite unit is the
    PARTITION: only ``dt`` partitions the batch touches are read back,
    merged, and atomically swapped via dynamic partition overwrite
    (``partitionOverwriteMode=dynamic`` — untouched partitions are
    not listed, read, or rewritten; at 100 TB × years that is the
    difference between a merge and a table rewrite). Requires the
    key→partition mapping to be stable (event-date-keyed tables, the
    reference's shape); a key that MOVES partitions needs a
    format-level MERGE (Delta) or a two-phase delete+insert.
    Unpartitioned tables rewrite the whole folder (documented
    degenerate case — partition them).

    Single-writer, like every sink here (Scheduler-serialized jobs).
    """
    import os

    from energydatalake_spark.operators.clean import dedup_latest

    spark = df.sparkSession
    # Validate the batch's op domain up front (ADVICE r7): a NULL op
    # would silently behave as a DELETE (null predicate fails the
    # op != 'D' filter yet the key still anti-joins existing rows) and
    # any other string as an upsert. Malformed batches fail loudly.
    bad_op = (
        df.filter(
            F.col(op_col).isNull() | ~F.col(op_col).isin("I", "U", "D")
        )
        .limit(1)
        .collect()
    )
    if bad_op:
        raise ValueError(
            f"apply_cdc_batch: {op_col!r} must be one of 'I','U','D' "
            f"and non-null; got {bad_op[0][op_col]!r}"
        )
    if partition_date_col is not None:
        df = df.withColumn("dt", F.to_date(F.col(partition_date_col)))
    if seq_col is not None:
        df = dedup_latest(df, keys, seq_col, tiebreak=keys)
    else:
        df = df.dropDuplicates(keys)
    df = df.persist()  # batch-sized; feeds partition list, anti-join, union
    try:
        survivors = df.filter(F.col(op_col) != F.lit("D")).drop(op_col)
        exists = os.path.isdir(path) and any(
            not n.startswith((".", "_")) for n in os.listdir(path)
        )
        if not exists:
            writer = survivors.write.format("parquet").mode("append")
            if partition_date_col is not None:
                writer = writer.partitionBy("dt")
            writer.save(path)
            return
        existing = spark.read.parquet(path)
        if partition_date_col is not None:
            # only the touched partitions ride the merge (null/pre-1900
            # dt rows are unioned back by the same guard as upsert_table)
            existing = _pruned_readback(existing, df)
        batch_keys = df.select(*[F.col(f"`{k}`") for k in keys]).distinct()
        anti_cond = reduce(
            lambda a, b: a & b,
            [existing[f"`{k}`"].eqNullSafe(batch_keys[f"`{k}`"]) for k in keys],
        )
        # null-safe, same as _fresh_rows: a delete for a null key must
        # match the null-key row it targets
        kept = existing.join(batch_keys, anti_cond, "left_anti")
        merged = kept.unionByName(survivors.select(*kept.columns))
        # The merge READS the path it overwrites — materialize before
        # the write (touched-partitions-sized, not table-sized; the
        # unpartitioned degenerate case is table-sized, as documented).
        merged = merged.localCheckpoint()
        prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            writer = merged.write.format("parquet").mode("overwrite")
            if partition_date_col is not None:
                writer = writer.partitionBy("dt")
            writer.save(path)
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev_mode
            )
        if partition_date_col is not None:
            # Dynamic overwrite cannot write an EMPTY partition: a dt
            # whose every row was deleted is absent from `merged` and
            # its stale directory would survive. The touched-dt list is
            # batch-sized by construction — remove the emptied ones.
            # Null dt participates too (ADVICE r7): its rows live under
            # dt=__HIVE_DEFAULT_PARTITION__, which _pruned_readback
            # deliberately carries for exactly-once — so a delete batch
            # that empties it must also remove the directory, or the
            # pre-delete images resurrect.
            import shutil

            touched = {r.dt for r in df.select("dt").distinct().collect()}
            remaining = {
                r.dt for r in merged.select("dt").distinct().collect()
            }
            emptied = touched - remaining
            for d in sorted(
                emptied, key=lambda d: "" if d is None else d.isoformat()
            ):
                part_name = (
                    "dt=__HIVE_DEFAULT_PARTITION__"
                    if d is None
                    else f"dt={d.isoformat()}"
                )
                part_dir = os.path.join(path, part_name)
                if os.path.isdir(part_dir):
                    shutil.rmtree(part_dir)
    finally:
        df.unpersist()
