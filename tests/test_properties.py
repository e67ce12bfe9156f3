"""Property tests (SURVEY.md §5 rebuild strategy): hypothesis-generated
inputs against independent oracles for the operators where correctness
is subtle — above all the distributed as-of join, whose keyless path
(range buckets + carry table) must equal pd.merge_asof on ANY input,
including empty sides, duplicate timestamps, and left rows preceding
every right row.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from energydatalake_spark.operators.asof import asof_join
from energydatalake_spark.operators.band import band_join
from energydatalake_spark.operators.clean import dedup

TS = st.integers(min_value=0, max_value=500)
KEY = st.sampled_from(["a", "b"])

_prop_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _pandas_asof(left_ts, right_rows, by=None):
    """merge_asof oracle on plain ints (backward, inclusive)."""
    lp = pd.DataFrame({"ts": sorted(left_ts)})
    rp = pd.DataFrame(right_rows, columns=["ts", "rv"]).sort_values(["ts", "rv"])
    # tie on right ts: merge_asof takes the LAST sorted row; our window
    # fill does the same (later rows overwrite), provided a defined
    # order among equal timestamps — so dedupe right ts keeping max rv.
    rp = rp.groupby("ts", as_index=False)["rv"].max()
    if len(rp):
        merged = pd.merge_asof(lp, rp, on="ts")
    else:
        merged = lp.assign(rv=None)
    return sorted(
        (int(t), None if pd.isna(v) else int(v))
        for t, v in zip(merged["ts"], merged["rv"])
    )


@given(
    left=st.lists(TS, min_size=1, max_size=30),
    right=st.lists(st.tuples(TS, st.integers(0, 100)), max_size=30),
)
@_prop_settings
def test_keyless_asof_matches_merge_asof(spark, left, right):
    ldf = spark.createDataFrame([(t,) for t in left], "ts bigint")
    if right:
        rdf = spark.createDataFrame(
            [(t, v) for t, v in right], "ts bigint, rv bigint"
        )
    else:
        rdf = spark.createDataFrame([], "ts bigint, rv bigint")
    # mirror the oracle's tie rule deterministically: keep max rv per ts
    rdf = rdf.groupBy("ts").agg(F.max("rv").alias("rv"))
    got = sorted(
        (r.ts, r.rv)
        for r in asof_join(ldf, rdf, on="ts", time_buckets=4).collect()
    )
    assert got == _pandas_asof(left, right)


@given(
    left=st.lists(st.tuples(KEY, TS), min_size=1, max_size=25),
    right=st.lists(st.tuples(KEY, TS, st.integers(0, 100)), max_size=25),
)
@_prop_settings
def test_keyed_asof_matches_merge_asof(spark, left, right):
    ldf = spark.createDataFrame(left, "k string, ts bigint")
    if right:
        rdf = spark.createDataFrame(right, "k string, ts bigint, rv bigint")
    else:
        rdf = spark.createDataFrame([], "k string, ts bigint, rv bigint")
    rdf = rdf.groupBy("k", "ts").agg(F.max("rv").alias("rv"))
    got = sorted(
        (r.k, r.ts, r.rv)
        for r in asof_join(ldf, rdf, on="ts", by=["k"]).collect()
    )
    expect = []
    for k in {k for k, _ in left}:
        lts = [t for kk, t in left if kk == k]
        rrows = [(t, v) for kk, t, v in right if kk == k]
        expect += [(k, t, v) for t, v in _pandas_asof(lts, rrows)]
    assert got == sorted(expect)


@given(rows=st.lists(st.tuples(KEY, st.integers(0, 3)), max_size=40))
@_prop_settings
def test_dedup_idempotent_and_set_equal(spark, rows):
    df = spark.createDataFrame(rows, "k string, v int") if rows else (
        spark.createDataFrame([], "k string, v int")
    )
    once = dedup(df)
    got = sorted((r.k, r.v) for r in once.collect())
    again = sorted((r.k, r.v) for r in dedup(once).collect())
    assert got == again == sorted(set(rows))


@given(
    points=st.lists(st.tuples(KEY, TS), min_size=1, max_size=20),
    intervals=st.lists(
        st.tuples(KEY, TS, st.integers(0, 50)), min_size=1, max_size=20
    ),
)
@_prop_settings
def test_band_join_equals_filtered_cross(spark, points, intervals):
    pdf = spark.createDataFrame(points, "k string, ts bigint")
    idf = spark.createDataFrame(
        [(k, s, s + w) for k, s, w in intervals], "k string, lo bigint, hi bigint"
    )
    got = sorted(
        (r.k, r.ts, r.lo, r.hi)
        for r in band_join(
            pdf, idf, left_ts="ts", right_start="lo", right_end="hi", on=["k"]
        ).collect()
    )
    expect = sorted(
        (k, t, lo, hi)
        for (k, t) in points
        for (k2, lo, hi) in ((k2, s, s + w) for k2, s, w in intervals)
        if k == k2 and lo <= t <= hi
    )
    assert got == expect
