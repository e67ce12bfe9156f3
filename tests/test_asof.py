"""As-of join edge cases (SURVEY.md §7 Phase 2: the subtle operator).

Semantics under test = pd.merge_asof defaults (backward, inclusive),
the reference's driver-side merge (merge:59-79).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from energydatalake_spark.io.readers import read_table
from energydatalake_spark.operators.asof import asof_join, asof_join_pandas

from tests.conftest import SF_SMOKE


def ts(s: float):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def make(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def tiny(spark):
    left = make(
        spark,
        [(1, 1, ts(10.0)), (2, 1, ts(20.0)), (3, 1, ts(5.0)), (4, 2, ts(10.0))],
        "id int, k int, t timestamp",
    )
    right = make(
        spark,
        [(1, ts(10.0), 100.0), (1, ts(15.0), 150.0), (2, ts(11.0), 200.0)],
        "k int, t timestamp, v double",
    )
    return left, right


def test_keyed_backward_inclusive(spark, tiny):
    left, right = tiny
    got = {r.id: r.v for r in asof_join(left, right, on="t", by=["k"]).collect()}
    assert got == {
        1: 100.0,  # exact tie matches (inclusive)
        2: 150.0,  # most recent earlier row
        3: None,  # before all right rows → null (dropna downstream)
        4: None,  # key 2: right row is later than left → null
    }


def test_right_ts_alias(spark, tiny):
    left, right = tiny
    got = {
        r.id: r.matched_t
        for r in asof_join(
            left, right, on="t", by=["k"], right_ts_alias="matched_t"
        ).collect()
    }
    assert got[2] == ts(15.0) and got[3] is None


def test_tolerance(spark, tiny):
    left, right = tiny
    got = {
        r.id: r.v
        for r in asof_join(
            left, right, on="t", by=["k"], tolerance_seconds=4.0
        ).collect()
    }
    # id=2 at t=20 matched t=15 (5s gap) → outside 4s tolerance.
    assert got == {1: 100.0, 2: None, 3: None, 4: None}


def test_collision_raises(spark, tiny):
    left, right = tiny
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("v", "id"), on="t", by=["k"])


def test_global_matches_keyed_single_key(spark, tiny):
    left, right = tiny
    l1 = left.filter("k = 1").drop("k")
    r1 = right.filter("k = 1").drop("k")
    got = {r.id: r.v for r in asof_join(l1, r1, on="t").collect()}
    assert got == {1: 100.0, 2: 150.0, 3: None}


def test_empty_right(spark, tiny):
    left, right = tiny
    out = asof_join(left, right.filter("1=0"), on="t", by=["k"]).collect()
    assert len(out) == 4 and all(r.v is None for r in out)


def test_native_matches_pandas_oracle(spark):
    e = read_table(spark, SF_SMOKE, "events")
    clicks = e.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    purchases = e.filter("event_type = 'purchase'").select(
        "user_id", "ts", F.col("value").alias("pv")
    )
    native = sorted(
        map(tuple, asof_join(clicks, purchases, on="ts", by=["user_id"]).collect())
    )
    oracle = sorted(
        map(
            tuple,
            asof_join_pandas(clicks, purchases, on="ts", by=["user_id"]).collect(),
        )
    )
    assert native == oracle and len(native) > 100


def test_global_asof_on_events(spark):
    """Keyless path (range-bucketed) must equal the trivial 1-key path."""
    e = read_table(spark, SF_SMOKE, "events")
    clicks = e.filter("event_type = 'click'").select("event_id", "ts")
    purchases = e.filter("event_type = 'purchase'").select(
        "ts", F.col("value").alias("pv")
    )
    global_out = sorted(
        map(tuple, asof_join(clicks, purchases, on="ts", time_buckets=16).collect())
    )
    keyed_out = sorted(
        map(
            tuple,
            asof_join(
                clicks.withColumn("g", F.lit(1)),
                purchases.withColumn("g", F.lit(1)),
                on="ts",
                by=["g"],
            )
            .drop("g")
            .select("event_id", "ts", "pv")
            .collect(),
        )
    )
    assert global_out == keyed_out


def test_keyed_bucketed_ntz_axis_matches_keyed_window(spark, tiny):
    """The r18 low-cardinality tier on a TIMESTAMP_NTZ axis (the r4+
    testdata shape raw reads yield) must equal the plain keyed window
    path — the bucket arithmetic routes NTZ through session-tz cast
    before the double cast, same as the keyless tier."""
    left, right = tiny
    l_ntz = left.withColumn("t", F.col("t").cast("timestamp_ntz"))
    r_ntz = right.withColumn("t", F.col("t").cast("timestamp_ntz"))
    assert l_ntz.schema["t"].dataType.typeName() == "timestamp_ntz"
    plain = {
        r.id: (r.v, r.rts)
        for r in asof_join(
            l_ntz, r_ntz, on="t", by=["k"], right_ts_alias="rts"
        ).collect()
    }
    bucketed = {
        r.id: (r.v, r.rts)
        for r in asof_join(
            l_ntz,
            r_ntz,
            on="t",
            by=["k"],
            right_ts_alias="rts",
            time_buckets=3,
            bucket_by_time=True,
        ).collect()
    }
    assert plain == bucketed
    assert bucketed[1] == (100.0, ts(10.0))  # inclusive backward match
    assert bucketed[4][0] is None  # key 2: only later right rows -> null


def test_keyed_bucketed_null_key_cross_bucket(spark):
    """r18 review finding (confirmed live pre-fix): a NULL by-key match
    whose right row lives in an EARLIER time bucket was dropped by the
    bucketed tier, because the carry-grid equi-join was not null-safe —
    while the same match in the SAME bucket survived (window
    partitionBy groups NULLs). Both must match the plain keyed path."""
    left = spark.createDataFrame(
        [(1, None, 100), (2, "a", 100)], "id int, k string, t bigint"
    )
    right = spark.createDataFrame(
        [(None, 10, 7), ("a", 10, 8)], "k string, t bigint, rv int"
    )
    for buckets in (1, 4, 16):  # 16 forces (10, 100) into distant buckets
        got = {
            r.id: r.rv
            for r in asof_join(
                left,
                right,
                on="t",
                by=["k"],
                time_buckets=buckets,
                bucket_by_time=True,
            ).collect()
        }
        plain = {
            r.id: r.rv
            for r in asof_join(
                left, right, on="t", by=["k"], bucket_by_time=False
            ).collect()
        }
        assert got == plain == {1: 7, 2: 8}, buckets


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_auto_dispatch_boundary(spark, tiny):
    """r19 (VERDICT r18 #2): the low-cardinality tier self-dispatches.
    The probe counts right-side keys; below the conf threshold the
    bucketed plan (its ``__asof_bucket`` partition column) runs,
    at-or-above it the plain keyed window does. Pinned at the exact
    boundary: 2 distinct right keys vs thresholds 3 and 2."""
    left, right = tiny  # right has keys {1, 2}
    try:
        spark.conf.set("spark.graft.asof.autoBucketMaxKeys", "3")
        assert "__asof_bucket" in _plan(asof_join(left, right, on="t", by=["k"]))
        spark.conf.set("spark.graft.asof.autoBucketMaxKeys", "2")
        assert "__asof_bucket" not in _plan(asof_join(left, right, on="t", by=["k"]))
        # An explicit argument always wins over the probe verdict.
        spark.conf.set("spark.graft.asof.autoBucketMaxKeys", "3")
        assert "__asof_bucket" not in _plan(
            asof_join(left, right, on="t", by=["k"], bucket_by_time=False)
        )
        spark.conf.set("spark.graft.asof.autoBucketMaxKeys", "0")  # 0 = auto off
        assert "__asof_bucket" not in _plan(asof_join(left, right, on="t", by=["k"]))
        assert "__asof_bucket" in _plan(
            asof_join(left, right, on="t", by=["k"], bucket_by_time=True)
        )
    finally:
        spark.conf.unset("spark.graft.asof.autoBucketMaxKeys")


def test_auto_dispatch_default_threshold_and_streaming_guard(spark, tiny):
    """Default threshold = the session's shuffle partitions (its own
    notion of target parallelism); streaming inputs skip the probe (an
    aggregate job on an unstarted stream is illegal) and take the
    plain path."""
    from energydatalake_spark.operators.dispatch import (
        ASOF_AUTO_CONF,
        auto_key_threshold,
        keys_below_threshold,
    )

    assert auto_key_threshold(spark, ASOF_AUTO_CONF) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    left, right = tiny
    stream = spark.readStream.format("rate").load()
    assert keys_below_threshold(stream, right, ["k"], ASOF_AUTO_CONF) is False
    assert keys_below_threshold(left, stream, ["value"], ASOF_AUTO_CONF) is False
