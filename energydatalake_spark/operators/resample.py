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
  length; we fail with a better message and a knob).
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

    ``bucket`` is any ``date_trunc`` unit (hour/day/week/...).
    """
    step = {
        "minute": F.expr("interval 1 minute"),
        "hour": F.expr("interval 1 hour"),
        "day": F.expr("interval 1 day"),
        "week": F.expr("interval 1 week"),
    }[bucket]
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
    # Loud guard before sequence() materializes anything.
    unit_sec = {"minute": 60, "hour": 3600, "day": 86400, "week": 604800}[bucket]
    spans = spans.withColumn(
        "__span",
        (F.unix_timestamp("hi") - F.unix_timestamp("lo")) / F.lit(unit_sec) + 1,
    )
    overflow = spans.filter(F.col("__span") > max_buckets_per_key).limit(1)
    bad = overflow.collect()  # 0-or-1 row by construction
    if bad:
        r = bad[0]
        raise ValueError(
            f"resample_locf: key {r[0]!r} spans {int(r['__span'])} {bucket} "
            f"buckets > max_buckets_per_key={max_buckets_per_key}; widen the "
            f"bucket or raise the cap deliberately"
        )
    grid = spans.select(
        F.col(key_col),
        F.explode(F.sequence(F.col("lo"), F.col("hi"), step)).alias("bucket_start"),
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
