"""Persisted-index incremental ingestion (pipelines/incremental.py).

The inline registry query ``corpus_increment`` is oracle-checked; these
tests pin the production twin: index bootstrap, verdict parity on
clear-cut cases, the scans-index-not-corpus claim (the whole point of
persisting), and append-then-reingest behavior.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

BASE = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "spark shuffles hash partitions across the cluster ring buffer"),
    (3, "completely different third document about parquet row groups"),
]


def _corpus_df(spark):
    return spark.createDataFrame(BASE, "doc_id bigint, text string")


@pytest.fixture()
def index_path(spark, tmp_path):
    from energydatalake_spark.pipelines.incremental import build_minhash_index

    p = str(tmp_path / "mh_index")
    build_minhash_index(_corpus_df(spark), p)
    return p


def test_incremental_ingest_verdicts(spark, index_path):
    from energydatalake_spark.pipelines.incremental import incremental_ingest

    batch = spark.createDataFrame(
        [
            (101, BASE[0][1]),  # exact copy of doc 1
            # near-dup of doc 2: one word changed out of nine
            (102, "spark shuffles hash partitions across the cluster ring pool"),
            (103, "an entirely novel document mentioning z order clustering"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.verdict, r.matched_doc_id)
        for r in incremental_ingest(batch, index_path, append=False).collect()
    }
    assert got[101] == ("exact", 1)
    assert got[102] == ("near_dup", 2)
    assert got[103] == ("accept", None)


def test_incremental_ingest_scans_index_not_corpus(spark, tmp_path):
    """VERDICT r7 #4's done-condition: the second increment's verdict
    plan reads the signature tables, NOT the raw corpus text. The
    corpus here lives in its own parquet file; its path must not
    appear in any scan of the verdict plan, while all three index
    tables must."""
    from energydatalake_spark.pipelines.incremental import (
        build_minhash_index,
        incremental_ingest,
    )

    corpus_p = str(tmp_path / "corpus_docs")
    _corpus_df(spark).write.parquet(corpus_p)
    index_p = str(tmp_path / "mh_index")
    build_minhash_index(spark.read.parquet(corpus_p), index_p)

    batch = spark.createDataFrame(
        [(201, "first increment totally fresh text about watermarks")],
        "doc_id bigint, text string",
    )
    incremental_ingest(batch, index_p)  # increment 1 (appends doc 201)

    batch2 = spark.createDataFrame(
        [
            (202, "first increment totally fresh text about watermarks"),
            (203, "yet another brand new document body"),
        ],
        "doc_id bigint, text string",
    )
    verdicts = incremental_ingest(batch2, index_p, append=False)
    files = verdicts.inputFiles()
    assert files, "expected file-backed scans in the verdict plan"
    assert not any(corpus_p in f for f in files), (
        "second increment re-scanned corpus text"
    )
    for sub in ("exact", "sig", "buckets"):
        assert any(f"mh_index/{sub}" in f for f in files), (
            f"index table {sub} not scanned"
        )
    got = {r.doc_id: r.verdict for r in verdicts.collect()}
    # 202 duplicates a doc admitted by increment 1 — only the INDEX
    # knows it, so this also proves the append took effect.
    assert got == {202: "exact", 203: "accept"}


def test_incremental_ingest_append_and_reingest(spark, index_path):
    from energydatalake_spark.pipelines.incremental import incremental_ingest

    batch = spark.createDataFrame(
        [(301, "some fresh text that should be accepted and indexed")],
        "doc_id bigint, text string",
    )
    first = {r.doc_id: r.verdict for r in incremental_ingest(batch, index_path).collect()}
    assert first == {301: "accept"}
    # Redelivery of the same batch: everything is now an exact dup of
    # the previously admitted copy.
    again = {
        (r.doc_id): (r.verdict, r.matched_doc_id)
        for r in incremental_ingest(batch, index_path).collect()
    }
    assert again == {301: ("exact", 301)}
    # And a rejected redelivery must NOT have re-appended: index holds
    # exactly one signature row for doc 301.
    sig = spark.read.parquet(index_path + "/sig")
    assert sig.filter(F.col("doc_id") == 301).count() == 1


def test_signature_space_matches_inline_minhash(spark):
    """The persisted index and the inline ``minhash_pairs`` must live
    in the SAME signature space (shared helpers): estimated Jaccard
    from `minhash_signatures` components must be high exactly where
    minhash_pairs reports a pair."""
    from energydatalake_spark.text.dedup import (
        minhash_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (2, "alpha beta gamma delta epsilon zeta eta theta kappa"),
            (3, "unrelated words entirely separate content here now"),
        ],
        "doc_id bigint, text string",
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 2) in pairs and not any(3 in p for p in pairs)
    sigs = {r.doc_id: r.sig for r in minhash_signatures(docs).collect()}
    k = len(sigs[1])
    est12 = sum(a == b for a, b in zip(sigs[1], sigs[2])) / k
    est13 = sum(a == b for a, b in zip(sigs[1], sigs[3])) / k
    assert est12 >= 0.5 > est13


def test_incremental_ingest_intra_batch_duplicates(spark, index_path):
    """ADVICE r8: co-arriving duplicates are the common production
    case. N identical docs in one batch must yield ONE accept (the
    smallest id) with the rest marked exact against it; intra-batch
    NEAR dups resolve the same way; and the append path must add
    exactly one index row for the cluster."""
    from energydatalake_spark.pipelines.incremental import incremental_ingest

    novel = "an entirely novel document mentioning z order clustering"
    near = "an entirely novel document mentioning z order sorting"
    batch = spark.createDataFrame(
        [(201, novel), (202, novel), (203, novel), (204, near)],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.verdict, r.matched_doc_id)
        for r in incremental_ingest(batch, index_path, append=True).collect()
    }
    assert got[201] == ("accept", None)
    assert got[202] == ("exact", 201)
    assert got[203] == ("exact", 201)
    assert got[204] == ("near_dup", 201)
    # Exactly one index row appended for the whole cluster.
    import os

    exact_tbl = spark.read.parquet(os.path.join(index_path, "exact"))
    new_ids = {
        r.doc_id for r in exact_tbl.filter(F.col("doc_id") >= 200).collect()
    }
    assert new_ids == {201}


def test_incremental_ingest_saturation_presignal(spark, index_path):
    """VERDICT r12 #3: the index path pins band geometry static, so a
    saturated batch must fail LOUDLY — SaturatedBatchWarning fires on
    a tiny-vocabulary batch (every 3-gram shared by every doc), stays
    silent on a healthy one, and the verdicts are identical with the
    pre-signal on or off."""
    import warnings as _w

    from energydatalake_spark.pipelines.incremental import (
        SaturatedBatchWarning,
        incremental_ingest,
    )

    # 30 docs over a 3-word vocabulary: the 3-gram universe holds a
    # handful of distinct shingles shared corpus-wide → mean df >> 8.
    words = ["alpha", "beta", "gamma"]
    sat_rows = [
        (300 + i, " ".join(words[(i + j) % 3] for j in range(12)))
        for i in range(30)
    ]
    saturated = spark.createDataFrame(sat_rows, "doc_id bigint, text string")
    with pytest.warns(SaturatedBatchWarning, match="mean shingle df"):
        with_sig = incremental_ingest(saturated, index_path, append=False)
        rows_on = {tuple(r) for r in with_sig.collect()}

    # Healthy batch: distinct vocabularies per doc → mean df ~1.
    healthy = spark.createDataFrame(
        [
            (401, "unique first document discussing watermark propagation"),
            (402, "second body covering adaptive query execution plans"),
        ],
        "doc_id bigint, text string",
    )
    with _w.catch_warnings():
        _w.simplefilter("error", SaturatedBatchWarning)
        incremental_ingest(healthy, index_path, append=False).collect()

    # Verdicts are observation-only: presignal off produces the same rows.
    rows_off = {
        tuple(r)
        for r in incremental_ingest(
            saturated, index_path, append=False, presignal=False
        ).collect()
    }
    assert rows_on == rows_off
    assert len(rows_on) == 30


def test_incremental_ingest_presignal_once_mode(spark, index_path):
    """ADVICE r13: presignal="once" probes only the FIRST batch per
    (session, index) — the warning fires for a saturated first batch,
    then a saturated second batch is admitted without re-running the
    pre-signal aggregate (no warning), and verdicts are unchanged."""
    import warnings as _w

    from energydatalake_spark.pipelines import incremental as inc

    words = ["alpha", "beta", "gamma"]
    sat_rows = [
        (500 + i, " ".join(words[(i + j) % 3] for j in range(12)))
        for i in range(20)
    ]
    saturated = spark.createDataFrame(sat_rows, "doc_id bigint, text string")

    inc._PRESIGNALED_INDEXES.discard(index_path)
    with pytest.warns(inc.SaturatedBatchWarning, match="mean shingle df"):
        first = inc.incremental_ingest(
            saturated, index_path, append=False, presignal="once"
        ).collect()
    with _w.catch_warnings():
        _w.simplefilter("error", inc.SaturatedBatchWarning)
        second = inc.incremental_ingest(
            saturated, index_path, append=False, presignal="once"
        ).collect()
    assert {tuple(r) for r in first} == {tuple(r) for r in second}
    inc._PRESIGNALED_INDEXES.discard(index_path)


def test_incremental_ingest_presignal_rejects_unknown_strings(spark, index_path):
    """Self-review r14: any string other than 'once' raises — a typo
    must not silently run the per-batch aggregate the caller thought
    they disabled."""
    from energydatalake_spark.pipelines.incremental import incremental_ingest

    batch = spark.createDataFrame(
        [(900, "some fresh document text")], "doc_id bigint, text string"
    )
    for bad in ("off", "Once", "never"):
        with pytest.raises(ValueError, match="presignal"):
            incremental_ingest(batch, index_path, append=False, presignal=bad)
