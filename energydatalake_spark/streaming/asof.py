"""Streaming as-of enrichment (SURVEY.md §2.9): the reference's
fm + load as-of merge re-expressed as a watermarked stream-stream join.

Reference analogue: ``PySpark Scripts/
pyspark_ercot_merge_fm_load_latest_BQ_archive_csv.py:59-79`` — a batch
``pd.merge_asof`` of the fuel-mix feed against the load feed. The
streaming form differs from batch as-of in one essential: the backward
lookback must be BOUNDED by a tolerance, because "any earlier match,
however old" would force both join states to be retained forever. A
tolerance is also what the physical feeds mean — a 5-minute feed whose
latest match is days old is a dead feed, not an enrichment.

Shape (100 TB): a watermarked event-time interval join — Spark bounds
each side's state to watermark + tolerance and drops it as the
watermark advances, so state is O(arrival rate × tolerance), not
O(history). The join emits CANDIDATE pairs (every in-window right row
per left row); the per-left "latest right" reduction is a bounded
window over the join output. On an unbounded pipeline that reduction
runs wherever the enriched rows land (the warehouse MERGE sink or a
downstream batch view): append-mode chained stateful aggregation after
a stream-stream join cannot flush its final group on a bounded replay
(the last watermark never passes it), so the engine keeps the stateful
streaming part — the interval join — in the stream and the terminal
argmax in the sink, which is exactly what the memory-sink harness
does too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def streaming_asof_candidates(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    tolerance: str = "2 days",
    watermark: str = "1 hour",
    right_ts_alias: str = "right_ts",
) -> DataFrame:
    """Watermarked stream-stream interval join: every right row with
    ``right.on ∈ [left.on - tolerance, left.on]`` and matching ``by``
    key. Inner semantics — a left row with no in-window right row drops
    (the batch as-of's tolerance behaves identically).

    Both sides carry event-time watermarks and the join condition
    bounds both event times, so Spark can age out join state — the
    property that keeps this runnable forever at firehose rates.
    """
    lw = left.withWatermark(on, watermark)
    rw = (
        right.withColumnRenamed(on, right_ts_alias)
        .withColumnRenamed(by, "__r_by")
        .withWatermark(right_ts_alias, watermark)
    )
    cond = (
        (F.col(by) == F.col("__r_by"))
        & (F.col(right_ts_alias) <= F.col(on))
        & (
            F.col(right_ts_alias)
            >= F.col(on) - F.expr(f"INTERVAL {tolerance}")
        )
    )
    return lw.join(rw, cond, "inner").drop("__r_by")


def asof_reduce(
    candidates: DataFrame,
    left_id: str,
    right_ts_alias: str = "right_ts",
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Per-left "latest right" reduction over the candidate pairs —
    the terminal step of the streaming as-of, run batch-side on the
    (bounded) join output. ``tie_break`` columns order descending after
    the right timestamp so equal-timestamp candidates resolve
    deterministically in any engine."""
    order = [F.desc(right_ts_alias)] + [F.desc(c) for c in (tie_break or [])]
    w = Window.partitionBy(left_id).orderBy(*order)
    return (
        candidates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
