"""Deterministic split / stratified sample / chunking operators."""

from __future__ import annotations

import pytest

from energydatalake_spark.text.sampling import (
    chunk_documents,
    hash_split,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(10 + i % 5)), ["en", "fr"][i % 2])
            for i in range(400)]
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_hash_split_fractions_and_partition(spark, docs):
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 400  # a partition: every row exactly once
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert 0.6 < counts["train"] / 400 < 0.95  # ~0.8 with hash variance


def test_hash_split_is_partitioning_invariant(spark, docs):
    """Membership must be a pure function of (salt, id) — rand()-based
    splits fail exactly this (partition-seeded)."""
    w = {"train": 0.9, "test": 0.1}
    one = {r.doc_id: r.split for r in hash_split(docs.coalesce(1), w).collect()}
    many = {r.doc_id: r.split for r in hash_split(docs.repartition(13), w).collect()}
    assert one == many


def test_hash_split_salt_changes_assignment(spark, docs):
    w = {"a": 0.5, "b": 0.5}
    s1 = {r.doc_id: r.split for r in hash_split(docs, w, salt="v1").collect()}
    s2 = {r.doc_id: r.split for r in hash_split(docs, w, salt="v2").collect()}
    assert s1 != s2  # different salt, different (valid) partition


def test_hash_split_rejects_bad_weights(spark, docs):
    with pytest.raises(ValueError):
        hash_split(docs, {"a": 0.9, "b": 0.9})


def test_stratified_sample_respects_fractions(spark, docs):
    out = stratified_sample(docs, "lang", {"en": 1.0, "fr": 0.25})
    kept = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    assert kept["en"] == 200  # fraction 1.0 keeps every row
    assert 20 < kept.get("fr", 0) < 90  # ~50 of 200 with hash variance


def test_stratified_sample_default_drops_unlisted(spark, docs):
    out = stratified_sample(docs, "lang", {"en": 1.0})  # default 0.0
    assert out.filter("lang = 'fr'").count() == 0


def test_stratified_sample_is_subset_and_stable(spark, docs):
    a = sorted(r.doc_id for r in stratified_sample(docs, "lang", {"en": 0.5}).collect())
    b = sorted(r.doc_id for r in stratified_sample(docs, "lang", {"en": 0.5}).collect())
    assert a == b and len(a) > 0
    # growing the fraction only ADDS members (nested samples, a property
    # of threshold-on-bucket designs that rand() resampling lacks)
    bigger = sorted(
        r.doc_id for r in stratified_sample(docs, "lang", {"en": 0.8}).collect()
    )
    assert set(a) <= set(bigger)


def test_chunk_documents_known_answer(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{j}" for j in range(10))), (2, "a b c")],
        "doc_id bigint, text string",
    )
    rows = sorted(
        map(tuple, chunk_documents(df, max_tokens=4).collect())
    )
    assert rows == [
        (1, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 4, "t4 t5 t6 t7"),
        (1, 2, 2, "t8 t9"),
        (2, 0, 3, "a b c"),
    ]


def test_chunks_reassemble_to_document(spark, docs):
    from pyspark.sql import functions as F

    chunks = chunk_documents(docs, max_tokens=7)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "chunk_text"))
                ).getField("chunk_text"),
                " ",
            ).alias("text")
        )
    )
    diff = rebuilt.alias("r").join(docs.alias("d"), "doc_id").filter(
        F.col("r.text") != F.col("d.text")
    )
    assert diff.count() == 0


def test_pack_chunks_respects_budget_intervals(spark):
    from pyspark.sql import functions as F

    from energydatalake_spark.text.sampling import pack_chunks

    rows = [(d, c, 40) for d in range(8) for c in range(3)]  # 24 chunks x 40 toks
    df = spark.createDataFrame(rows, "doc_id bigint, chunk_id int, n_chunk_tokens bigint")
    out = pack_chunks(df, budget=100, n_shards=2).collect()
    # bin = floor(start_offset / budget) within the shard's (doc, chunk) order
    by_shard = {}
    for r in sorted(out, key=lambda r: (r.shard, r.doc_id, r.chunk_id)):
        start = by_shard.get(r.shard, 0)
        assert r.bin_id == start // 100, r
        by_shard[r.shard] = start + r.n_chunk_tokens
    # deterministic across partitioning
    again = pack_chunks(df.repartition(7), budget=100, n_shards=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_pack_chunks_bins_never_cross_shards(spark):
    from energydatalake_spark.text.sampling import pack_chunks

    rows = [(d, 0, 10) for d in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, chunk_id int, n_chunk_tokens bigint")
    out = pack_chunks(df, budget=30, n_shards=4).collect()
    assert {r.shard for r in out} == {0, 1, 2, 3}
    for r in out:
        assert r.shard == r.doc_id % 4


def test_normalize_text_masks_and_collapses(spark):
    from energydatalake_spark.text.normalize_text import normalize_text

    df = spark.createDataFrame(
        [
            (1, "Contact Bob.Smith+x@corp.example.COM  now"),
            (2, "see https://a.example.com/p?q=1 \t twice\n\nok"),
            (3, "call 555 123-4567 ext 9"),
            (4, "plain   text"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.text_norm for r in normalize_text(df).collect()}
    assert got[1] == "contact <email> now"
    assert got[2] == "see <url> twice ok"
    assert got[3] == "call <num> ext 9"
    assert got[4] == "plain text"


def test_weighted_upsample_mix(spark):
    from pyspark.sql import functions as F

    from energydatalake_spark.text.sampling import weighted_upsample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh") for i in range(200)],
        "doc_id bigint, lang string",
    )
    up = weighted_upsample(df, {"en": 3.0, "zh": 0.5}, domain_col="lang")
    by_lang = {
        r.lang: r
        for r in up.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("d"),
            F.max("copy_idx").alias("mx"),
        )
        .collect()
    }
    # en: every doc exactly 3 copies (integer weight)
    assert by_lang["en"].n == 300 and by_lang["en"].mx == 3
    # zh: ~half the docs kept once, deterministic hash choice
    assert 20 <= by_lang["zh"].n <= 80 and by_lang["zh"].mx == 1
    # reproducible row-for-row
    again = weighted_upsample(df, {"en": 3.0, "zh": 0.5}, domain_col="lang")
    assert sorted(map(tuple, up.collect())) == sorted(map(tuple, again.collect()))
    # zero weight drops the domain entirely
    none = weighted_upsample(df, {"zh": 0.0}, domain_col="lang", default=0.0)
    assert none.count() == 0
    with pytest.raises(ValueError, match=">= 0"):
        weighted_upsample(df, {"en": -1.0}, domain_col="lang")


def test_shuffle_shards_deterministic_permutation(spark):
    from pyspark.sql import functions as F

    from energydatalake_spark.text.sampling import shuffle_shards

    df = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id bigint"
    )
    a = shuffle_shards(df, n_shards=8).select(
        "doc_id", "shard", "shard_pos"
    )
    b = shuffle_shards(df.repartition(11), n_shards=8).select(
        "doc_id", "shard", "shard_pos"
    )
    ra, rb = sorted(map(tuple, a.collect())), sorted(map(tuple, b.collect()))
    assert ra == rb  # partitioning-invariant permutation
    # every shard position is a dense 1..n sequence
    per_shard = (
        a.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.max("shard_pos").alias("mx"))
        .collect()
    )
    assert all(r.n == r.mx for r in per_shard)
    assert sum(r.n for r in per_shard) == 500
    # order decorrelates from doc_id: the first shard's sequence is not
    # simply sorted by id
    first = [
        r.doc_id
        for r in a.filter(F.col("shard") == 0)
        .orderBy("shard_pos")
        .collect()
    ]
    assert first != sorted(first)
    # a new salt is a fresh epoch permutation
    c = shuffle_shards(df, n_shards=8, salt="epoch2").select(
        "doc_id", "shard", "shard_pos"
    )
    assert sorted(map(tuple, c.collect())) != ra
