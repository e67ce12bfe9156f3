"""Persisted-index incremental corpus ingestion (VERDICT r7 #4).

The registry query ``corpus_increment`` (plans/llm_ops.py) replays the
whole admit-or-reject decision as one self-contained expression so the
DuckDB oracle can check it — which means it recomputes the existing
corpus's MinHash signatures every batch. At 100 TB that recompute is a
full corpus scan per increment. This module is the production loop the
query's docstring promises: the corpus's exact hashes, MinHash
signatures, and LSH band buckets are PERSISTED as parquet warehouse
tables, each increment reads the index (never the corpus text), and the
admitted batch's rows are appended so the index stays current.

Index layout under ``index_path``::

    exact/    (doc_id, h)                 -- md5 of text, exact tier
    sig/      (doc_id, sig array<bigint>) -- MinHash signature matrix
    buckets/  (band, band_hash, doc_id)   -- LSH probe table

The near-dup tier verifies candidates by SIGNATURE-estimated Jaccard
(fraction of matching minhash components — the textbook unbiased
estimator), not exact shingle Jaccard: the index deliberately does not
carry shingle sets (corpus-sized), and at 128 components the estimator's
σ ≈ 0.044 at j=0.5. The inline query keeps exact verification because it
still holds the text; the two tiers agree on candidates (same
signatures, same band rule — ``text.dedup.minhash_signatures`` /
``signature_band_buckets`` are shared with ``minhash_pairs``'s space).

Reference parity: the reference's incremental surface is archive-once
file ingestion (README.md:143-148); it has no dedup index. This is the
LLM-corpus extension of the same "don't reprocess what you already
ingested" contract.

Concurrency contract: SINGLE WRITER per index, the same contract the
path-based warehouse documents (io/writers.py) — two concurrent
increments could each miss the other's in-flight appends and both
admit the same document. Serialize ingests (the production loop is a
sequential micro-batch consumer); a multi-writer deployment needs a
transactional table format underneath (the Delta MERGE path, blocked
offline — see SURVEY ledger).

Scale shape: every increment shuffles batch-sized frames only; the
index side of the bucket probe is an equi-join on (band, band_hash)
that AQE plans as broadcast when the batch's bucket set is small; the
appends are partition-append parquet writes. The one full-index scan
per increment (the probe join's build side) is signatures-sized —
~(8+8·k) bytes/doc, three orders of magnitude under corpus text — and
a real deployment prunes it further by bucketing the table on
band_hash.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from energydatalake_spark.text.dedup import (
    MH_SATURATION_MEAN_DF,
    _exploded_shingles,
    minhash_signatures,
    signature_band_buckets,
)

#: Default parameters — same as the inline registry query's
#: (plans/llm_ops.py MH_*), so the two paths score identically.
N_SHINGLE, BANDS, ROWS, THRESHOLD = 3, 16, 2, 0.5


class SaturatedBatchWarning(UserWarning):
    """An incoming batch's shingle universe is saturated while the
    persisted index pins the band geometry static."""


#: index paths whose first batch already ran the saturation pre-signal
#: this session (``presignal="once"`` mode — ADVICE r13 steady-state
#: opt-down; process-local by design, a new session re-probes).
_PRESIGNALED_INDEXES: set[str] = set()


def _warn_if_saturated(
    batch: DataFrame, text_col: str, id_col: str, n: int
) -> float:
    """Stage-1 breaker pre-signal on the INDEX path (VERDICT r12 #3).

    The persisted-signature index deliberately keeps band geometry
    static — an escalation would orphan every signature and bucket
    already on disk — so the inline breaker
    (``text.dedup._auto_band_rows``) cannot run here. Its cheap
    stage-1 pre-signal still can: ONE aggregate over the batch's
    shingle explode measuring mean shingle document-frequency
    (total/approx-distinct). A Heaps-law batch sits at ~1-3; a
    saturated batch (boilerplate-heavy shard, tiny vocabulary — the
    r11 x100 probe corpus measures ~870) sends near-tier candidate
    mass quadratic at the pinned geometry, and previously did so
    SILENTLY (the trade-off lived only in a doc note). Now it fails
    loudly: a ``SaturatedBatchWarning`` names the measured mean df
    and the re-bootstrap remedy. Batch-sized, one extra scan of the
    increment (never the index or corpus); returns the measured mean
    df so callers can export it as a metric."""
    pre = (
        _exploded_shingles(batch, text_col, id_col, n)
        .agg(
            F.count(F.lit(1)).alias("t"),
            F.approx_count_distinct("shingle").alias("u"),
        )
        .collect()[0]
    )
    mean_df = pre.t / max(pre.u, 1)
    if pre.t and mean_df > MH_SATURATION_MEAN_DF:
        warnings.warn(
            f"incremental_ingest: batch shingle universe is saturated "
            f"(mean shingle df {mean_df:.1f} > "
            f"{MH_SATURATION_MEAN_DF}); the persisted index pins band "
            f"geometry static (bands/rows fixed at bootstrap), so LSH "
            f"candidate mass for this batch can grow quadratically. "
            f"Consider re-bootstrapping the index at a harder geometry "
            f"(build_minhash_index with larger rows) or pre-filtering "
            f"boilerplate from the batch.",
            SaturatedBatchWarning,
            stacklevel=3,
        )
    return mean_df


def _tables(index_path: str) -> tuple[str, str, str]:
    return (
        os.path.join(index_path, "exact"),
        os.path.join(index_path, "sig"),
        os.path.join(index_path, "buckets"),
    )


def build_minhash_index(
    docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = N_SHINGLE,
    bands: int = BANDS,
    rows: int = ROWS,
) -> None:
    """One-time index bootstrap: scan the existing corpus ONCE and
    write the three index tables. After this, increments never touch
    the corpus text again."""
    exact_p, sig_p, buckets_p = _tables(index_path)
    docs.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("h")
    ).write.mode("overwrite").parquet(exact_p)
    sigs = minhash_signatures(
        docs, text_col=text_col, id_col=id_col, n=n, bands=bands, rows=rows
    ).select(F.col(id_col).alias("doc_id"), "sig")
    sigs.write.mode("overwrite").parquet(sig_p)
    spark = docs.sparkSession
    signature_band_buckets(
        spark.read.parquet(sig_p), id_col="doc_id", bands=bands, rows=rows
    ).write.mode("overwrite").parquet(buckets_p)


def incremental_ingest(
    batch: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = N_SHINGLE,
    bands: int = BANDS,
    rows: int = ROWS,
    threshold: float = THRESHOLD,
    append: bool = True,
    presignal: bool | str = True,
) -> DataFrame:
    """Admit one batch against the persisted index. Returns the
    verdict frame ``(doc_id, verdict ∈ {exact, near_dup, accept},
    matched_doc_id)`` — same contract as the registry query — and,
    when ``append`` is true, appends the ACCEPTED docs' exact/sig/
    bucket rows so the next increment sees them.

    Intra-batch duplicates (ADVICE r8): co-arriving duplicates are the
    common production case, so each batch doc is ALSO judged against
    every SMALLER-id doc in the same batch — exact tier by md5
    self-join, near tier by batch-internal band collisions — with the
    same greedy min-id rule as ``minhash_pairs``'s ``id_a < id_b``.
    ``matched_doc_id`` is the smallest matching id across both the
    index and the batch; only the cluster's smallest-id batch doc can
    be admitted, so N identical co-arriving docs append exactly one
    index row. (A doc can match a batch doc that was itself rejected —
    the chain still identifies one representative per cluster.)

    The verdict plan reads the three index tables and the batch —
    never the corpus text (pinned by
    test_incremental_ingest_scans_index_not_corpus).

    ``presignal`` (default on) runs the breaker's stage-1 saturation
    pre-signal over the batch and emits a ``SaturatedBatchWarning``
    when the static index geometry is at quadratic-candidate risk —
    see ``_warn_if_saturated``. Verdicts are unaffected either way.
    The signal is one extra shingle-explode aggregate over the batch
    — roughly the batch's own scan cost again, which callers ingesting
    MANY tiny batches pay on every call (ADVICE r13). ``"once"``
    probes only the FIRST batch per (session, index) and skips the
    aggregate on subsequent calls — the steady-state opt-down for
    known-healthy streams that still smoke-checks the stream's shape
    at startup; ``False`` skips it entirely."""
    spark = batch.sparkSession
    exact_p, sig_p, buckets_p = _tables(index_path)
    if isinstance(presignal, str) and presignal != "once":
        # only the exact mode string is meaningful — any other string
        # would fall into the truthy branch and run the per-batch
        # aggregate the caller thought they were turning off/down
        raise ValueError(
            f"presignal must be True, False or 'once'; got {presignal!r}"
        )
    if presignal == "once":
        if index_path not in _PRESIGNALED_INDEXES:
            # mark AFTER the probe succeeds: a transient failure must
            # not permanently disable the first-batch smoke-check
            _warn_if_saturated(batch, text_col, id_col, n)
            _PRESIGNALED_INDEXES.add(index_path)
    elif presignal:
        _warn_if_saturated(batch, text_col, id_col, n)

    batch_exact = batch.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("h")
    )
    # Batch-sized and read by four stages (index probe, intra-batch
    # self-join, append) — materialize once instead of re-hashing.
    batch_exact = batch_exact.localCheckpoint(eager=False)
    idx_exact = spark.read.parquet(exact_p).select(
        F.col("doc_id").alias("old_id"), "h"
    )
    intra_exact = batch_exact.join(
        batch_exact.select(F.col("doc_id").alias("old_id"), "h"), "h"
    ).filter(F.col("old_id") < F.col("doc_id"))
    exact = (
        batch_exact.join(idx_exact, "h")
        .select("doc_id", "old_id")
        .unionByName(intra_exact.select("doc_id", "old_id"))
        .groupBy("doc_id")
        .agg(F.min("old_id").alias("exact_id"))
    )

    batch_sigs = minhash_signatures(
        batch, text_col=text_col, id_col=id_col, n=n, bands=bands, rows=rows
    ).select(F.col(id_col).alias("doc_id"), "sig")
    # Batch-sized and read by three stages (buckets, verify, append) —
    # materialize once instead of re-shingling per consumer.
    batch_sigs = batch_sigs.localCheckpoint(eager=False)
    batch_buckets = signature_band_buckets(
        batch_sigs, id_col="doc_id", bands=bands, rows=rows
    )
    idx_buckets = spark.read.parquet(buckets_p).select(
        F.col("doc_id").alias("old_id"), "band", "band_hash"
    )
    intra_cand = (
        batch_buckets.join(
            batch_buckets.select(
                F.col("doc_id").alias("old_id"), "band", "band_hash"
            ),
            ["band", "band_hash"],
        )
        .filter(F.col("old_id") < F.col("doc_id"))
        .select("doc_id", "old_id")
    )
    cand = (
        batch_buckets.join(idx_buckets, ["band", "band_hash"])
        .select("doc_id", "old_id")
        .unionByName(intra_cand)
        .distinct()
    )
    idx_sigs = spark.read.parquet(sig_p).select(
        F.col("doc_id").alias("old_id"), F.col("sig").alias("sig_old")
    )
    # Near-tier signature lookup must resolve BATCH old_ids too — the
    # candidate generation already enforced old_id < doc_id for the
    # intra-batch pairs, so a plain union is sufficient.
    old_sigs = idx_sigs.unionByName(
        batch_sigs.select(
            F.col("doc_id").alias("old_id"), F.col("sig").alias("sig_old")
        )
    )
    k = bands * rows
    est = (
        cand.join(batch_sigs, "doc_id")
        .join(old_sigs, "old_id")
        .select(
            "doc_id",
            "old_id",
            (
                F.aggregate(
                    F.zip_with(
                        "sig", "sig_old", lambda a, b: (a == b).cast("int")
                    ),
                    F.lit(0),
                    lambda acc, x: acc + x,
                ).cast("double")
                / F.lit(float(k))
            ).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )
    near = est.groupBy("doc_id").agg(F.min("old_id").alias("near_id"))

    verdicts = (
        batch.select(F.col(id_col).alias("doc_id"))
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("exact_id").isNotNull(), F.lit("exact"))
            .when(F.col("near_id").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("accept"))
            .alias("verdict"),
            F.coalesce("exact_id", "near_id").alias("matched_doc_id"),
        )
    )
    if not append:
        return verdicts

    # Materialize verdicts BEFORE appending: the append rewrites tables
    # the verdict plan reads, and a lazily-evaluated verdict frame
    # collected after the append would see its own batch.
    verdicts = verdicts.localCheckpoint()
    accepted = verdicts.filter(F.col("verdict") == "accept").select("doc_id")
    adm_exact = batch_exact.join(accepted, "doc_id", "left_semi")
    adm_exact.write.mode("append").parquet(exact_p)
    adm_sigs = batch_sigs.join(accepted, "doc_id", "left_semi")
    adm_sigs.write.mode("append").parquet(sig_p)
    signature_band_buckets(
        adm_sigs, id_col="doc_id", bands=bands, rows=rows
    ).write.mode("append").parquet(buckets_p)
    return verdicts
