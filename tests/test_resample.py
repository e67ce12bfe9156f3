"""Gap-fill resample: dense grid, LOCF semantics, runaway-span guard."""

from __future__ import annotations

import datetime

import pytest

from energydatalake_spark.operators.resample import resample_locf


def _ts(h, m=0):
    return datetime.datetime(2024, 3, 1, h, m)


def test_resample_fills_gaps_with_locf(spark):
    df = spark.createDataFrame(
        [
            ("a", _ts(0, 10), 1.0),
            ("a", _ts(0, 50), 3.0),  # hour 0: avg 2.0
            ("a", _ts(3, 0), 7.0),  # hours 1-2 are gaps
            ("b", _ts(5, 0), 10.0),  # key spans differ per key
        ],
        "event_type string, ts timestamp, value double",
    )
    out = {
        (r.event_type, r.bucket_start.hour): (r.n_obs, r.bucket_avg, r.filled_avg)
        for r in resample_locf(df).collect()
    }
    # dense per-key grid: a covers hours 0-3, b exactly hour 5
    assert set(out) == {("a", 0), ("a", 1), ("a", 2), ("a", 3), ("b", 5)}
    assert out[("a", 0)] == (2, 2.0, 2.0)
    assert out[("a", 1)] == (0, None, 2.0)  # gap: no obs, carried forward
    assert out[("a", 2)] == (0, None, 2.0)
    assert out[("a", 3)] == (1, 7.0, 7.0)
    assert out[("b", 5)] == (1, 10.0, 10.0)


def test_resample_leading_gap_stays_null(spark):
    # first bucket of a key has data by construction (grid starts at the
    # key's min observed bucket), so nulls can only be interior — pin
    # that the fill never invents a value before the first observation
    # by checking filled_avg is non-null everywhere on a dense grid.
    df = spark.createDataFrame(
        [("a", _ts(1), 5.0), ("a", _ts(4), 6.0)],
        "event_type string, ts timestamp, value double",
    )
    rows = resample_locf(df).collect()
    assert len(rows) == 4  # hours 1..4 inclusive
    assert all(r.filled_avg is not None for r in rows)


def test_resample_span_guard_raises(spark):
    df = spark.createDataFrame(
        [("a", _ts(0), 1.0), ("a", datetime.datetime(2024, 3, 9, 0), 2.0)],
        "event_type string, ts timestamp, value double",
    )
    # The guard is a raise_error INSIDE the grid stage (single-pass, no
    # separate guard job) — so it fires at execution, not at build.
    out = resample_locf(df, max_buckets_per_key=100)  # 8 days > 100 hours
    with pytest.raises(Exception, match="max_buckets_per_key"):
        out.collect()


def test_resample_rejects_unknown_bucket(spark):
    df = spark.createDataFrame(
        [("a", _ts(0), 1.0)], "event_type string, ts timestamp, value double"
    )
    with pytest.raises(ValueError, match="unsupported bucket"):
        resample_locf(df, bucket="fortnight")


def test_resample_month_bucket(spark):
    """Calendar-aware month grid: Jan..Apr inclusive with a Feb-Mar gap
    forward-filled."""
    df = spark.createDataFrame(
        [
            ("a", datetime.datetime(2024, 1, 10), 2.0),
            ("a", datetime.datetime(2024, 4, 20), 8.0),
        ],
        "event_type string, ts timestamp, value double",
    )
    rows = sorted(
        resample_locf(df, bucket="month").collect(),
        key=lambda r: r.bucket_start,
    )
    assert [r.bucket_start.month for r in rows] == [1, 2, 3, 4]
    assert [r.n_obs for r in rows] == [1, 0, 0, 1]
    assert [r.filled_avg for r in rows] == [2.0, 2.0, 2.0, 8.0]


def test_resample_ntz_axis(spark, tmp_path):
    """A timezone-naive parquet time axis (TIMESTAMP_NTZ) must work —
    the r4 testdata shape."""
    import pandas as pd

    p = str(tmp_path / "ntz.parquet")
    pdf = pd.DataFrame(
        {
            "event_type": ["a", "a"],
            "ts": pd.to_datetime(["2024-03-01 00:00", "2024-03-01 02:00"]),
            "value": [1.0, 2.0],
        }
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(p)
    df = spark.read.parquet(p)
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
    rows = resample_locf(df).collect()
    assert len(rows) == 3 and sorted(r.n_obs for r in rows) == [0, 1, 1]
