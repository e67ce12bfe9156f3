"""Time-series resample: regular-grid rollup + forward fill (the
"hypertable rollup" / gap-fill operator timeseries stores ship natively;
the reference's 5-minute ERCOT feeds imply exactly this when a feed
drops intervals — README.md:216-300 dashboards assume a dense hourly
axis).

Semantics: bucket irregular observations onto a fixed grid (one row per
key × bucket between the key's first and last observation), aggregate
within each bucket, and forward-fill buckets that received no
observation with the last earlier bucket's value (LOCF). Empty leading
buckets stay null (nothing to carry).

Scale shape (100 TB):
- The bucket aggregate collapses the input FIRST — everything after
  runs on ~(keys × buckets) rows, not raw observations.
- The grid is generated per key from that key's own [min, max] bucket
  range via ``sequence`` + ``explode`` — map-side generation, no
  driver-side date loop, no cross join against a global calendar.
- The forward fill is one ``last(ignorenulls)`` window per key — the
  same single shuffle the aggregate already partitioned by key, so
  AQE reuses the partitioning.
- Guard: a key spanning years at 1-minute grain generates its range
  bucket count; ``max_buckets_per_key`` fails loudly instead of letting
  ``sequence`` materialize a runaway array (Spark hard-caps sequence
  length; we fail with a better message and a knob). The guard is a
  ``raise_error`` expression INSIDE the grid stage — checked on the
  same single pass as the real computation, not via a separate
  guard-only job that would double the heaviest scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def resample_locf(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
    max_buckets_per_key: int = 2_000_000,
) -> DataFrame:
    """Regular-grid resample with last-observation-carried-forward.

    Returns one row per (key, bucket_start) over each key's observed
    time span: ``n_obs`` (0 for gap buckets), ``bucket_avg`` (null for
    gap buckets), ``filled_avg`` (bucket_avg, forward-filled across
    gaps). The bucket average is computed as an exact decimal sum over
    doubles divided by the count, so it is engine-portable.

    ``bucket`` ∈ {minute, hour, day, week, month, year} — the
    ``date_trunc`` units whose grid ``sequence`` can step (month/year
    steps are calendar-aware in both Spark and DuckDB). Anything else
    raises immediately.

    A key whose span exceeds ``max_buckets_per_key`` fails at execution
    time (``raise_error`` in the grid stage, message contains
    ``max_buckets_per_key``) — the check rides the query's own pass
    instead of running a separate guard job over the input.
    """
    supported = ("minute", "hour", "day", "week", "month", "year")
    if bucket not in supported:
        raise ValueError(
            f"resample_locf: unsupported bucket {bucket!r}; "
            f"expected one of {supported}"
        )
    step = F.expr(f"interval 1 {bucket}")
    ts = F.col(ts_col)
    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        ts = ts.cast("timestamp")
    agg = df.groupBy(
        F.col(key_col), F.date_trunc(bucket, ts).alias("bucket_start")
    ).agg(
        F.count(F.lit(1)).alias("n_obs"),
        (
            F.sum(F.col(value_col).cast("decimal(25,8)")).cast("double")
            / F.count(F.lit(1))
        ).alias("bucket_avg"),
    )
    spans = agg.groupBy(key_col).agg(
        F.min("bucket_start").alias("lo"),
        F.max("bucket_start").alias("hi"),
        F.count(F.lit(1)).alias("n_buckets_observed"),
    )
    # Span in buckets: fixed-width units via epoch arithmetic;
    # month/year via months_between (exact integers on truncated
    # bucket starts).
    if bucket == "month":
        span = F.months_between(F.col("hi"), F.col("lo")) + 1
    elif bucket == "year":
        span = F.months_between(F.col("hi"), F.col("lo")) / 12 + 1
    else:
        unit_sec = {
            "minute": 60, "hour": 3600, "day": 86400, "week": 604800,
        }[bucket]
        span = (
            F.unix_timestamp("hi") - F.unix_timestamp("lo")
        ) / F.lit(unit_sec) + 1
    # Loud guard before sequence() materializes anything — evaluated on
    # the SAME pass as the grid (raise_error short-circuits the stage),
    # never as a separate driver-side pre-scan of the input.
    guard_msg = F.format_string(
        "resample_locf: key %s spans %s " + bucket + " buckets > "
        f"max_buckets_per_key={max_buckets_per_key}; widen the bucket or "
        "raise the cap deliberately",
        F.col(key_col).cast("string"),
        span.cast("bigint").cast("string"),
    )
    hi_guarded = F.when(
        span > F.lit(max_buckets_per_key),
        F.raise_error(guard_msg).cast("timestamp"),
    ).otherwise(F.col("hi"))
    grid = spans.select(
        F.col(key_col),
        F.explode(
            F.sequence(F.col("lo"), hi_guarded, step)
        ).alias("bucket_start"),
    )
    dense = grid.join(agg, [key_col, "bucket_start"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        F.col(key_col),
        F.col("bucket_start"),
        F.coalesce(F.col("n_obs"), F.lit(0)).cast("bigint").alias("n_obs"),
        F.col("bucket_avg"),
        F.last("bucket_avg", ignorenulls=True).over(w).alias("filled_avg"),
    )


def resample_locf_sql(
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
) -> str:
    """DuckDB twin of :func:`resample_locf` (identical bucket math and
    fill rule; DuckDB's generate_series is end-inclusive like Spark's
    sequence)."""
    return f"""
WITH agg AS (
  SELECT {key_col},
         date_trunc('{bucket}', {ts_col}) AS bucket_start,
         COUNT(*) AS n_obs,
         CAST(SUM(CAST({value_col} AS DECIMAL(25,8))) AS DOUBLE) / COUNT(*)
           AS bucket_avg
  FROM {table}
  GROUP BY 1, 2
), spans AS (
  SELECT {key_col}, MIN(bucket_start) AS lo, MAX(bucket_start) AS hi
  FROM agg GROUP BY 1
), grid AS (
  SELECT {key_col}, UNNEST(generate_series(lo, hi, INTERVAL 1 {bucket}))
           AS bucket_start
  FROM spans
)
SELECT g.{key_col},
       g.bucket_start,
       CAST(COALESCE(a.n_obs, 0) AS BIGINT) AS n_obs,
       a.bucket_avg,
       last_value(a.bucket_avg IGNORE NULLS)
         OVER (PARTITION BY g.{key_col} ORDER BY g.bucket_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_avg
FROM grid g LEFT JOIN agg a
  ON g.{key_col} = a.{key_col} AND g.bucket_start = a.bucket_start
"""
