"""Salted join: identical results to the plain join, fan-out verified."""

from __future__ import annotations

from pyspark.sql import functions as F

from energydatalake_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # heavily skewed: 90% of left rows share key 0
    left = spark.createDataFrame(
        [(i, 0 if i % 10 else i % 3) for i in range(1000)], "row_id int, k int"
    )
    right = spark.createDataFrame(
        [(0, "hot"), (1, "a"), (2, "b")], "k int, label string"
    )
    plain = {
        (r.row_id, r.k, r.label)
        for r in left.join(right, "k").select("row_id", "k", "label").collect()
    }
    salted = {
        (r.row_id, r.k, r.label)
        for r in salted_join(left, right, ["k"], n_salts=8)
        .select("row_id", "k", "label")
        .collect()
    }
    assert salted == plain and len(plain) > 0


def test_salted_join_spreads_hot_key(spark):
    left = spark.createDataFrame(
        [(i, 0) for i in range(1000)], "row_id int, k int"
    )
    # the salt column must actually take multiple values over a hot key
    salted = left.withColumn("__salt", (F.rand(seed=42) * 8).cast("int"))
    n_distinct = salted.select("__salt").distinct().count()
    assert n_distinct == 8
