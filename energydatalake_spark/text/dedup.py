"""Deduplication operators for LLM-data pipelines: exact, MinHash+LSH,
SimHash, and n-gram-Jaccard near-dup detection.

Scale design (the whole point of these ops is the 100 TB corpus):

- **exact_dedup** shuffles only (md5, doc_id) pairs — a 48-byte row per
  document regardless of document size, thanks to pre-hashing.
- **minhash_pairs** is the classic shingle→MinHash→band→bucket-join
  pipeline: signatures are fixed-size (k longs) per doc; the LSH
  self-join joins on (band index, band hash), so candidate generation
  never compares non-colliding documents. Verification computes exact
  shingle Jaccard only for candidates.
- **simhash** reduces each document to one 32-bit value via bit votes;
  near-dup buckets come from Hamming distance (bit_count of xor).

Everything is built-in expressions (md5/conv/explode/groupBy) — the
hash primitive ``first-8-hex-of-md5 → bigint`` is portable to the
DuckDB oracle, so even these ops get full value-hash correctness
checks, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from energydatalake_spark.portable import cached_expr
from energydatalake_spark.text.stats import _hex8_to_long as _hash_long
from energydatalake_spark.text.stats import shingles


def _perm_constants(k: int, seed: int = 7) -> tuple[list[int], list[int]]:
    """Deterministic multiply-shift permutation constants for MinHash:
    h_i(x) = (a_i * x + b_i) mod 2^32, a_i odd < 2^29 (keeps a_i * x
    < 2^61 — no BIGINT overflow in either engine). One md5 per shingle
    plus k integer ops replaces k md5 calls per shingle (~k× less
    hashing on the scan side)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    a = (rng.integers(1, 1 << 28, size=k) * 2 + 1).tolist()
    b = rng.integers(0, 1 << 32, size=k).tolist()
    return [int(x) for x in a], [int(x) for x in b]


PERM_MASK = (1 << 32) - 1


def _pinned_doc_partitions(df: DataFrame, target_bytes: int = 4 * 1024 * 1024) -> int:
    """Partition count for a doc-keyed window exchange, derived from
    the SOURCE size instead of drawn from AQE's coalescing lottery:
    max(session shuffle width, source bytes / target_bytes). The r11
    x100 probe measured substring_dedup's wall time swinging 24.7 →
    97.2 s across identical runs purely on whether the coalesced sort
    partitions spilled; an explicit numPartitions repartition is
    exempt from AQE coalescing, so the regime is chosen, not drawn.
    ``target_bytes`` is per-partition SOURCE (compressed parquet)
    bytes — token rows explode ~5-10× in the sort buffer, so 4 MB of
    source keeps a window sort partition ~tens of MB, far from
    spill. Size comes from the optimizer's plan statistics (file-size
    sum, any filesystem); falls back to the session shuffle width if
    the plan has no stats (e.g. a local relation)."""
    import math

    spark = df.sparkSession
    base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j hands scala.math.BigInt back as a Python int on current
        # Spark; older bridges return a JavaObject needing toString()
        # (r14: the unconditional .toString() raised AttributeError on
        # the int path, silently pinning EVERY caller to the session
        # base width — the x300 probe's window sorts then held 3× the
        # intended rows per partition, the spill-lottery source).
        size = raw if isinstance(raw, int) else int(raw.toString())
    except Exception:
        return base
    if size <= 0 or size > (1 << 50):  # default/unknown stats sentinel
        return base
    return max(base, math.ceil(size / target_bytes))


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups: md5-hash the text, keep the minimum id
    per group as canonical. One shuffle of (hash, id) pairs."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _exploded_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    return df.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("shingle")
    )


#: Persisted per-invocation scratch frames: shingle/line/token explodes
#: and tf aggregates that feed two or more consumers whose canonical
#: subplans differ (so exchange reuse cannot dedupe them — r20 verified
#: this never fires across column-pruned branches under AQE). The
#: persist is load-bearing (each registered frame has 2-3 consumers),
#: but a long-lived session accumulating cached partitions across many
#: invocations would exhaust executor storage — callers that loop over
#: corpora call release_shingle_cache() between actions (bench does).
_SHINGLE_CACHE: list[DataFrame] = []


def _persist_shingles(ex: DataFrame) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    ex = ex.persist(StorageLevel.MEMORY_AND_DISK)
    _SHINGLE_CACHE.append(ex)
    return ex


def release_shingle_cache(blocking: bool = False) -> int:
    """Unpersist every shingle explosion cached by prior near-dup
    invocations; returns how many were released."""
    n = 0
    while _SHINGLE_CACHE:
        _SHINGLE_CACHE.pop().unpersist(blocking)
        n += 1
    return n


def shared_shingle_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """ONE persisted shingle explosion serving BOTH near-dup tiers
    (r20, VERDICT r19 #2): ``(id_col, h0, sh)`` where ``h0`` is the
    32-bit multiply-shift input minhash_pairs permutes and ``sh`` the
    60-bit verify/join key — both views of the same per-shingle md5,
    and ``sh`` is byte-identical to the ``shingle`` column
    ngram_jaccard_pairs derives on its own. An evaluation that runs
    both tiers over the same corpus (dedup_recall) used to pay the
    scan → shingle → explode → md5 chain twice and hold two caches of
    the same 16-byte rows; pass this frame to both via their
    ``shingle_frame`` kwarg and the chain runs once (guide §5: one
    materialization, every consumer reuses it). Registered in the
    shingle cache — released with :func:`release_shingle_cache`."""
    from energydatalake_spark.text.stats import _hex15_to_long

    md = F.md5(F.col("shingle"))
    return _persist_shingles(
        _exploded_shingles(df, text_col, id_col, n).select(
            F.col(id_col),
            _hash_long(md).alias("h0"),
            _hex15_to_long(md).alias("sh"),
        )
    )


def min_sig_agree(bands: int, rows: int, threshold: float) -> int:
    """Signature-agreement prefilter cutoff between LSH candidate
    generation and the exact-Jaccard verify: a candidate pair must
    agree on at least ``floor(k·threshold/2)`` of its k minhash
    components before the engine pays the shingle-level intersection
    join. E[agree] = k·j, so the cutoff sits at HALF the threshold's
    expectation — at k=32, t=0.5 a true borderline pair (j exactly
     0.5) is dropped with probability P(Bin(32,.5) < 8) ≈ 1e-3 and
    stronger pairs exponentially less, while a random saturated-vocab
    pair (j ~ 1e-3) passes with probability ≈ 0. One formula feeds
    BOTH engines (the DuckDB mirror derives the same constant), so
    the filter is deterministic and cross-engine exact.

    Why it exists: exact-verify cost is (candidates × shingles-per-
    doc) join rows. Candidates are band-collision mass — on a corpus
    whose shingle universe saturates (r11 x100 probe: 17.8M
    candidates, 1,018 true pairs) the verify join is ~1.8e9 rows of
    which 99.99% fail. The agreement test reads only the signatures
    already riding the band rows (k ints), map-side, before the
    pair-dedup shuffle."""
    return int(bands * rows * threshold / 2)


def _minhash_sig_cols(k: int) -> list[Column]:
    """The k multiply-shift MinHash min-aggregates over the persisted
    ``h0`` column — shared by the main signature pass and the
    band-geometry probe so a given k always means the same
    permutations (``_perm_constants`` is deterministic in k; probing
    geometry r measures exactly the signatures the main pipeline
    would build at that r)."""
    perm_a, perm_b = _perm_constants(k)
    # Rendered as ONE SQL expression per signature component instead of
    # ~6 element-wise Column calls each: at k=32 the element-wise form
    # cost ~0.85 s of py4j round trips per minhash_pairs build
    # (measured r19 optimization round, guide §7.3 driver-side work).
    # All constants carry the L suffix so the arithmetic is the same
    # all-BIGINT chain the analyzer produced from the lit() form.
    return [
        cached_expr(
            f"min((({perm_a[i]}L * h0) + {perm_b[i]}L) & {PERM_MASK}L) AS m{i}"
        )
        for i in range(k)
    ]


def _band_hash_structs(bands: int, rows: int) -> list[Column]:
    """One (band, band_hash) struct per band over signature columns
    m0..m{bands*rows-1} — the LSH bucket keys, shared by the main
    pipeline and the geometry probe. Rendered SQL (one py4j call per
    band, not one per field — see _minhash_sig_cols)."""
    return [
        cached_expr(
            f"struct({b} AS band, md5(concat_ws(','"
            + "".join(
                f", CAST(m{i} AS STRING)"
                for i in range(b * rows, (b + 1) * rows)
            )
            + ")) AS band_hash)"
        )
        for b in range(bands)
    ]


#: Mean shingle document-frequency above which the exact band-mass
#: probe runs. Heaps-law corpora sit at ~1-3 (most shingles appear in
#: few documents); a saturated shingle universe (boilerplate-heavy
#: shard, tiny vocabulary) sends it to the hundreds — the r11 x100
#: probe corpus measures ~870. The pre-signal is ONE aggregate over
#: the already-persisted 16-byte shingle rows, so healthy corpora pay
#: ~nothing for the circuit breaker.
MH_SATURATION_MEAN_DF = 8.0


def _auto_band_rows(
    ex: DataFrame,
    id_col: str,
    bands: int,
    rows: int,
    rows_max: int,
    max_cand_per_doc: float,
    first_sig: DataFrame | None = None,
) -> int:
    """Band-geometry circuit breaker (VERDICT r11 #4): pick the
    smallest ``rows`` ≤ ``rows_max`` whose expected LSH candidate
    mass stays ≤ ``max_cand_per_doc`` candidates per document.

    Band-collision candidate mass is quadratic in corpus size on a
    SATURATED shingle universe (random-pair Jaccard stops shrinking
    once the vocabulary stops growing — the r11 x100 probe measured
    3.4k/186k/17.8M candidates against 8/97/1018 true pairs) while
    raising ``rows`` crushes random collisions ≈ j₀ per step at the
    documented recall cost for true pairs (P(found | j) =
    1-(1-j^rows)^bands). Strategy:

    1. Pre-signal: mean shingle df (total/approx-distinct) from one
       aggregate over the persisted explode — healthy corpora return
       immediately with the static geometry.
    2. Exact probe: build the CURRENT geometry's (band, band_hash)
       table — one map-side-combining signature pass over the cached
       explode — and histogram bucket sizes: Σ c·(c-1)/2 is the exact
       pre-dedup candidate count. No model, no underestimating skew.
    3. Escalate ``rows`` one step and re-probe while the mass per doc
       exceeds the bound, capping at ``rows_max`` (recall floor).

    A saturated corpus pays one extra signature pass per escalation
    step (realistically one); the caller passes its own (persisted)
    starting-geometry signature frame as ``first_sig`` so the
    no-escalation case — armed but healthy enough — probes the frame
    the main pipeline will reuse instead of computing signatures
    twice (the sf1 bench measured the throwaway pass at ~3 s / +26%).
    The decision is deterministic (exact counts over deterministic
    hashes), so reruns pick the same geometry."""
    import sys

    pre = ex.agg(
        F.count(F.lit(1)).alias("t"),
        F.approx_count_distinct("sh").alias("u"),
        F.approx_count_distinct(id_col).alias("d"),
    ).collect()[0]
    if pre.d == 0 or pre.t / max(pre.u, 1) <= MH_SATURATION_MEAN_DF:
        return rows
    # Decisions go to stderr (r15, VERDICT r14 #5): at cluster scale
    # the chosen geometry is the difference between a linear and a
    # quadratic run — operators need to SEE each escalation, and the
    # scale probes record it as ladder evidence.
    print(
        f"# minhash breaker armed: mean_df "
        f"{pre.t / max(pre.u, 1):.1f} > {MH_SATURATION_MEAN_DF} "
        f"(docs={pre.d}, shingles={pre.u}); probing from rows={rows}",
        file=sys.stderr,
    )
    r = rows
    while r < rows_max:
        sig = (
            first_sig
            if r == rows and first_sig is not None
            else ex.groupBy(id_col).agg(*_minhash_sig_cols(bands * r))
        )
        probe = (
            sig.select(F.explode(F.array(*_band_hash_structs(bands, r))).alias("bh"))
            .groupBy("bh")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("mass"))
            .collect()[0]
        )
        mass_per_doc = (probe.mass or 0.0) / pre.d
        if mass_per_doc <= max_cand_per_doc:
            print(
                f"# minhash breaker: rows={r} holds "
                f"{mass_per_doc:.1f} cands/doc <= {max_cand_per_doc}",
                file=sys.stderr,
            )
            return r
        print(
            f"# minhash breaker: rows={r} gives {mass_per_doc:.1f} "
            f"cands/doc > {max_cand_per_doc}; escalating",
            file=sys.stderr,
        )
        r += 1
    print(
        f"# minhash breaker: capped at rows_max={rows_max} "
        f"(recall floor)", file=sys.stderr,
    )
    return r


def minhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bands: int = 16,
    rows: int = 2,
    threshold: float = 0.5,
    auto_rows_max: int | None = None,
    max_cand_per_doc: float = 16.0,
    sig_prefilter: bool = True,
    shingle_frame: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH + exact-Jaccard verify.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥
    threshold, jaccard computed exactly on distinct shingle sets for
    LSH candidates that pass the ``min_sig_agree`` signature
    prefilter (see its docstring for the recall bound).
    ``sig_prefilter=False`` restores the pre-r11 full-verify recall
    contract — every band-colliding pair reaches the exact-Jaccard
    verify, at its cost (ADVICE r11 #2: the prefilter drops a
    borderline pair at j = threshold with P ≈ 1e-3; callers that need
    that last 0.1% can buy it back here).

    ``auto_rows_max`` arms the band-geometry circuit breaker
    (:func:`_auto_band_rows`): on a corpus whose shingle universe is
    saturated, ``rows`` escalates (up to the cap, ``bands`` fixed)
    until expected candidates/doc ≤ ``max_cand_per_doc``, keeping
    candidate mass linear in corpus size instead of quadratic. Leave
    it ``None`` (the default) wherever the static geometry is part of
    the contract — value-hash oracles, or signature-index
    compatibility (pipelines/incremental.py persists signatures at a
    fixed geometry; a geometry switch would orphan the index).

    ``shingle_frame`` (optional) is a precomputed
    :func:`shared_shingle_frame` over the SAME (df, text_col, id_col,
    n) — callers that also run the exact tier (dedup_recall) pass it
    so the explode chain is computed and cached once for both.
    """
    # Explode + shingle building is the expensive scan-side work and is
    # reused by three downstream stages (signatures, set sizes, exact
    # verify) — persist it instead of recomputing the lineage. What
    # persists is one md5 reduced to two integer views of the shingle
    # (h0: 32-bit, for the multiply-shift permutations; sh: 60-bit, the
    # verify join key) — shuffles and cache carry 16 bytes, never the
    # shingle text. At cluster scale the same role is played by a
    # checkpoint/shuffle reuse; MEMORY_AND_DISK spills instead of OOMing.
    ex = (
        shingle_frame
        if shingle_frame is not None
        else shared_shingle_frame(df, text_col, id_col, n)
    )
    # The signature aggregate also emits the doc's distinct-shingle
    # count (ex rows are distinct by construction — shingles() wraps
    # array_distinct): carrying |A| through the band pipeline lets the
    # final Jaccard read set sizes off the candidate pair itself,
    # eliminating the separate sizes aggregate AND both per-side size
    # joins the verify stage used to pay (8 extra bytes per band row
    # vs one exchange + two joins; measured r10: ~0.5 s at sf0.1).
    def build_sig(k: int) -> DataFrame:
        return ex.groupBy(id_col).agg(
            *_minhash_sig_cols(k),
            F.count(F.lit(1)).alias("n_shingles"),
        )

    sig = None
    if auto_rows_max is not None and auto_rows_max > rows:
        # Persist the starting-geometry signatures and probe THEM: in
        # the no-escalation case (armed but healthy — e.g. the sf1
        # replicated corpus, probe fires, mass under bound) the main
        # pipeline reuses the materialized frame, so the breaker costs
        # one histogram instead of a second full signature pass
        # (measured ~3 s / +26% at sf1 before this reuse). Registered
        # in the shingle cache so callers release it with the explode.
        from pyspark.storagelevel import StorageLevel

        sig0 = build_sig(bands * rows).persist(StorageLevel.MEMORY_AND_DISK)
        _SHINGLE_CACHE.append(sig0)
        chosen = _auto_band_rows(
            ex, id_col, bands, rows, auto_rows_max, max_cand_per_doc,
            first_sig=sig0,
        )
        if chosen == rows:
            sig = sig0
        else:
            rows = chosen
    k = bands * rows
    if sig is None:
        sig = build_sig(k)
    # One row per (doc, band) with the band's hash — the LSH bucket key.
    # A single generator expression, NOT a bands-way union: a union of N
    # selects over the same aggregate makes Catalyst plan the upstream N
    # times (exchange reuse is best-effort), an N× scan at scale.
    band_structs = _band_hash_structs(bands, rows)
    # The full k-component signature rides each band row alongside
    # n_shingles (k ints — linear payload through the one bucket
    # exchange) so the agreement prefilter below runs MAP-SIDE on the
    # exploded pair, before the pair-dedup shuffle ever sees a false
    # candidate.
    buckets = sig.select(
        F.col(id_col),
        F.col("n_shingles"),
        cached_expr("array(" + ",".join(f"m{i}" for i in range(k)) + ") AS ms"),
        F.explode(F.array(*band_structs)).alias("bh"),
    ).select(
        F.col(id_col),
        F.col("n_shingles"),
        F.col("ms"),
        F.col("bh.band").alias("band"),
        F.col("bh.band_hash").alias("band_hash"),
    )
    # Candidate pairs per bucket WITHOUT a self-join: group the bucket's
    # ids and explode ordered pairs map-side. One shuffle of (band,
    # band_hash, id) instead of two join-side shuffles of the same rows;
    # the per-pair distinct (a pair colliding in several bands) stays —
    # it is the band-merge, and it runs on far fewer rows than the join
    # output did. This reshape pays off HERE because 64-bit band hashes
    # keep buckets thin (pair expansion is near-linear); measured at
    # sf0.1: 4.2 s vs 4.5 s self-join. For fat buckets the trade flips —
    # see simhash_pairs, which keeps the codegen'd self-join on
    # measurement.
    grouped = (
        buckets.groupBy("band", "band_hash")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(id_col).alias("id"), "n_shingles", "ms")
                )
            ).alias("ids")
        )
        .filter(F.size("ids") > 1)
    )
    # Ordered pairs exploded map-side, each carrying BOTH set sizes —
    # the Jaccard denominator needs nothing beyond the intersection
    # count after this point. The signature-agreement prefilter
    # (min_sig_agree) also runs HERE, on the two signatures the pair
    # already carries: candidates whose estimated Jaccard is far
    # below threshold never reach the pair-dedup shuffle or the
    # shingle-intersection join. Filter-then-distinct equals
    # distinct-then-filter for a per-pair-deterministic predicate, so
    # the DuckDB mirror may apply it after its DISTINCT.
    agree_min = F.lit(
        min_sig_agree(bands, rows, threshold) if sig_prefilter else 0
    )
    left = grouped.select(F.explode("ids").alias("ia"), F.col("ids"))
    cand = (
        left.select(
            F.col("ia.id").alias("id_a"),
            F.col("ia.n_shingles").alias("n_a"),
            F.col("ia.ms").alias("ms_a"),
            F.explode(
                F.filter("ids", lambda x: x["id"] > F.col("ia.id"))
            ).alias("ib"),
        )
        .filter(
            F.size(
                F.filter(
                    F.zip_with("ms_a", F.col("ib.ms"), lambda x, y: x == y),
                    lambda v: v,
                )
            )
            >= agree_min
        )
        .select(
            "id_a",
            "n_a",
            F.col("ib.id").alias("id_b"),
            F.col("ib.n_shingles").alias("n_b"),
        )
        .distinct()
    )
    ea = ex.select(F.col(id_col).alias("id_a"), F.col("sh"))
    eb = ex.select(F.col(id_col).alias("id_b"), F.col("sh"))
    inter = (
        cand.join(ea, "id_a")
        .join(eb, ["id_b", "sh"])
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = inter.select(
        "id_a",
        "id_b",
        (
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)
    return jac.select("id_a", "id_b", "jaccard")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 1000,
    max_input_rows: int | None = 1_000_000,
    shingle_frame: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs. Candidate pairs = any
    shared shingle with document frequency ≤ ``max_doc_freq``; the
    Jaccard itself is then computed on the FULL shingle sets for
    candidates only, so the cap never distorts a reported value.

    The cap is the standard stopword-shingle guard: without it, one
    boilerplate shingle shared by d documents contributes d² join rows
    — quadratic detonation on license headers / navigation chrome. A
    pair sharing ONLY >cap shingles is skipped (its Jaccard is
    dominated by boilerplate anyway); every pair sharing ≥1 rare
    shingle is scored exactly. Pass ``max_doc_freq=None`` to disable.
    Still the precision baseline — prefer minhash_pairs at scale.

    Scan-side the shingle strings are immediately reduced to 60-bit
    hashes (``_hex15_to_long``): every shuffle (frequency agg,
    self-join, intersection count) moves 8-byte longs, not text. The
    oracle applies the same hash, so the two engines agree bit-for-bit
    even on the ~1e-11 collision.

    ``max_input_rows`` (default 1M docs) refuses larger corpora: even
    doc-freq-capped, the shingle self-join grows quadratically with
    shingle co-occurrence, and a 100 TB caller should be on
    minhash_pairs. Pass ``max_input_rows=None`` to force the exact
    tier deliberately.

    ``shingle_frame`` (optional) is a precomputed
    :func:`shared_shingle_frame` over the SAME (df, text_col, id_col,
    n); its ``sh`` column IS this function's 60-bit ``shingle`` hash
    (one md5, two integer views), so passing it skips a second explode
    chain + cache when the banded tier runs over the same corpus."""
    from energydatalake_spark.text.stats import _hex15_to_long

    if max_input_rows is not None:
        n_in = df.count()
        if n_in > max_input_rows:
            raise ValueError(
                f"ngram_jaccard_pairs is an exact quadratic tier; input has "
                f"{n_in} rows > max_input_rows={max_input_rows}. Use "
                f"minhash_pairs (banded LSH) at this scale, or pass "
                f"max_input_rows=None to force the exact plan."
            )

    ex = (
        shingle_frame.select(F.col(id_col), F.col("sh").alias("shingle"))
        if shingle_frame is not None
        else _persist_shingles(
            _exploded_shingles(df, text_col, id_col, n).select(
                F.col(id_col),
                _hex15_to_long(F.md5(F.col("shingle"))).alias("shingle"),
            )
        )
    )
    sizes = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    if max_doc_freq is None:
        ea = ex.select(F.col(id_col).alias("id_a"), "shingle")
        eb = ex.select(F.col(id_col).alias("id_b"), "shingle")
        inter = (
            ea.join(eb, "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        # Split shingles at the doc-frequency cap. The self-join runs on
        # RARE shingles only (each contributes ≤ cap² join rows); the
        # few COMMON (boilerplate) shingles then top up the intersection
        # count for the candidate pairs found — so every candidate's
        # Jaccard is exact over the FULL sets, and when nothing exceeds
        # the cap this degenerates to the uncapped single-join plan plus
        # one cheap frequency aggregate.
        common = (
            ex.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("doc_freq"))
            .filter(F.col("doc_freq") > max_doc_freq)
            .select("shingle")
        )
        rare_ex = ex.join(common, "shingle", "left_anti")
        ra = rare_ex.select(F.col(id_col).alias("id_a"), "shingle")
        rb = rare_ex.select(F.col(id_col).alias("id_b"), "shingle")
        rare_inter = (
            ra.join(rb, "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_rare"))
        )
        common_ex = ex.join(common, "shingle")  # docs × boilerplate shingles
        ca = common_ex.select(F.col(id_col).alias("id_a"), "shingle")
        cb = common_ex.select(F.col(id_col).alias("id_b"), "shingle")
        common_inter = (
            rare_inter.select("id_a", "id_b")
            .join(ca, "id_a")
            .join(cb, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        inter = rare_inter.join(common_inter, ["id_a", "id_b"], "left").select(
            "id_a",
            "id_b",
            (F.col("n_rare") + F.coalesce(F.col("n_common"), F.lit(0))).alias(
                "n_inter"
            ),
        )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _sql_simhash_vote(src: str, j: int) -> str:
    """One per-bit ±1 vote aggregate as SQL text (the rendered twin of
    ``sum(when(shiftright(src, j) & 1 == 1, 1).otherwise(-1))``)."""
    return f"sum(CASE WHEN (shiftright({src}, {j}) & 1) = 1 THEN 1 ELSE -1 END)"


def _sql_simhash_fold(prefix: str, bits: int) -> str:
    """Bit-recombination fold as SQL text: sign of each vote column
    ``{prefix}{j}`` sets bit j. All-BIGINT arithmetic, same values as
    the element-wise Column chain it replaces."""
    terms = " + ".join(
        f"(CASE WHEN {prefix}{j} > 0 THEN {1 << j}L ELSE 0L END)"
        for j in range(bits)
    )
    return f"CAST(0L + {terms} AS BIGINT)"


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    n: int | None = None,
) -> DataFrame:
    """SimHash: per-feature portable hash, per-bit ±1 votes summed over
    the document's features, sign of each vote = fingerprint bit.
    Near-dup = small Hamming distance (see simhash_pairs). ``bits`` ≤
    32 draws the feature hash from md5's first 8 hex chars (the
    original form); 33-60 bits draw 15 hex chars — both
    engine-portable.

    ``n`` selects the feature set. ``None`` = the unigram token
    MULTISET (Charikar's original toy form — every token occurrence
    votes). ``n = k`` = DISTINCT word k-gram shingles, one vote each —
    Manku et al.'s production form (phrase features). The distinction
    is load-bearing at scale: on a zipf-headed corpus the unigram
    votes are dominated by the handful of head tokens every document
    shares, so fingerprints collapse toward each other and the
    hamming-≤d pair set itself goes QUADRATIC (measured r13 on the
    Heaps-law probe corpus: ~93 partners per doc at 5k docs, 14M
    pairs at 50k — pair-count α ≈ 1.78; the x100 probe died
    collecting the result). Distinct k-gram features restore
    discrimination because the zipf head explodes into diverse
    in-context phrases, each voting once. Documents shorter than
    ``n`` words have no features and no fingerprint row."""
    from energydatalake_spark.text.stats import _hex15_to_long

    if bits > 60:
        raise ValueError(f"simhash: bits={bits} > 60 (portable-hash width)")
    tok_hash = _hash_long if bits <= 32 else _hex15_to_long
    if n is None:
        toks = df.select(
            F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
        )
    else:
        toks = _exploded_shingles(df, text_col, id_col, n).select(
            F.col(id_col), F.col("shingle").alias("tok")
        )
    h = toks.select(F.col(id_col), tok_hash(F.md5(F.col("tok"))).alias("hv"))
    # Vote aggregates and the bit-recombination fold are rendered SQL
    # (one py4j call per vote column / one per fingerprint) — the
    # element-wise Column form cost ~0.5 s of driver round trips per
    # build at bits=60 (r19 optimization round). Same expressions, same
    # integer arithmetic, same values.
    votes = h.groupBy(id_col).agg(
        *[cached_expr(_sql_simhash_vote("hv", j) + f" AS v{j}") for j in range(bits)]
    )
    return votes.select(
        F.col(id_col),
        cached_expr(_sql_simhash_fold("v", bits) + " AS simhash"),
    )


def simhash_wide(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int | None = None,
) -> DataFrame:
    """120-bit two-slice SimHash: ``(id, simhash_lo, simhash_hi)``.

    The portable 60-bit fingerprint caps ``band_bits`` at 15 under the
    pigeonhole constraint (max_hamming ≤ 3 needs ≥ 4 bands), which
    pins the bucket space at 2¹⁵ — candidate mass ~n²·n_bands/2¹⁶, the
    documented simhash_pairs ceiling. This tier doubles the
    fingerprint instead of the band count: two INDEPENDENT 60-bit
    slices of the same md5 (hex chars 1-15 and 16-30 — disjoint bits
    of one digest, so one hash pass per feature) each run Charikar's
    per-bit vote, giving 120 bits → 30-bit bands, 4 bands, pigeonhole
    intact, bucket space 2³⁰. Same feature semantics as
    :func:`simhash` (``n`` = distinct word n-gram shingles vs unigram
    multiset); ONE exchange (the vote groupBy computes both words in a
    single 120-column aggregate).

    WHEN TO FLIP (r15 e2e measurement, BENCHHEAVY
    ``simhash_wide_x100_e2e``): only when 15-bit-band candidate mass
    actually dominates — at 500k saturated docs the 60-bit geometry's
    16.5M candidates (~33/doc) verify in noise time and the doubled
    vote aggregate makes 120-bit 2.0× SLOWER end-to-end (65.5 s vs
    132.2 s, identical 1,018 output pairs). The wide tier wins once
    candidate mass passes roughly 100× the corpus size (pairs/doc
    ≳ 100, where verification rivals the ~1×-corpus fingerprint
    cost); on saturated shingle universes mass grows ~n², so that is
    ~1.5M docs of this profile. Check the candidate-mass pre-signal
    before flipping; the default stays 60-bit.

    Why "identical 1,018 pairs" holds even though the probe compares
    only counts: the 120-bit lo word IS the 60-bit fingerprint
    (pinned by the lo-word identity test), so hamming≤3 over 120
    bits implies hamming≤3 over the lo 60 — every 120-bit pair is a
    60-bit pair (both bandings are exhaustive for their hamming
    bound by pigeonhole). Subset + equal counts ⇒ equal sets. NOTE
    this argument needs the two-slice construction and uniform
    bands; a variant that breaks the lo-word identity must re-verify
    set-parity, not just counts."""
    from energydatalake_spark.text.stats import _hex15_to_long

    if n is None:
        toks = df.select(
            F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
        )
    else:
        toks = _exploded_shingles(df, text_col, id_col, n).select(
            F.col(id_col), F.col("shingle").alias("tok")
        )
    md = F.md5(F.col("tok"))
    h = toks.select(
        F.col(id_col),
        _hex15_to_long(md).alias("h1"),
        # second slice: the NEXT 15 hex chars — disjoint digest bits,
        # so the two 60-bit feature hashes are independent
        F.conv(F.substring(md, 16, 15), 16, 10).cast("bigint").alias("h2"),
    )

    # Rendered SQL votes/folds (see simhash): one py4j call per column
    # instead of ~6 — at 120 vote columns the element-wise form was
    # ~1 s of driver round trips per build.
    votes = h.groupBy(id_col).agg(
        *[
            cached_expr(_sql_simhash_vote(src, j) + f" AS {src}v{j}")
            for src in ("h1", "h2")
            for j in range(60)
        ]
    )
    return votes.select(
        F.col(id_col),
        cached_expr(_sql_simhash_fold("h1v", 60) + " AS simhash_lo"),
        cached_expr(_sql_simhash_fold("h2v", 60) + " AS simhash_hi"),
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    band_bits: int = 8,
    n: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidate generation uses the pigeonhole trick: split the
    fingerprint into bits/band_bits bands; any pair within distance d <
    #bands must agree exactly on ≥1 band, so the self-join runs on
    (band index, band value), never all-pairs.

    SIZE ``band_bits`` WITH THE CORPUS (Manku et al., the same rule as
    the embedding LSH's n_planes): expected bucket occupancy is
    n/2^band_bits per band, and candidate rows grow as
    n_bands·n²/2^band_bits — band_bits must track log2(n) to keep the
    join linear. The r9 measurement: 8-bit bands at a 50k-doc corpus
    put ~195 docs in every bucket (α ≈ 1.3 across the sf0.1→sf1
    decade); 15-bit bands over a 60-bit fingerprint (4 bands, pigeonhole
    still exact for max_hamming ≤ 3) hold occupancy ~1.5 there.

    ``n`` picks the simhash feature set (see :func:`simhash`): pass a
    shingle width on any corpus with a heavy token-frequency head —
    unigram fingerprints collapse there and the qualifying PAIR SET
    itself is quadratic, which no banding can fix (the output is the
    output).

    Honest mass accounting (r13 measurement): with well-spread
    fingerprints the band-collision candidate mass is
    ``n²·n_bands/(2·2^band_bits)`` — quadratic over a FIXED bucket
    count. At 60 bits the pigeonhole constraint (n_bands >
    max_hamming) caps band_bits at 15 for hamming ≤ 3, so the mass is
    ~n²/16k: 16.6M candidates at 500k docs (measured, vs 1,018 true
    pairs), 137M at 1.5M — fine for a partition-group, not for a
    planetary corpus. That wider tier EXISTS (r14): ``bits=120`` with
    ``band_bits=30`` routes through :func:`simhash_wide` — two
    independent md5 slices, 4 bands over 2³⁰ buckets, pigeonhole
    intact for max_hamming ≤ 3, candidate mass ~n²·4/2³¹ (32k× fewer
    collisions than the 15-bit bucket space). At 100 TB you would
    also shard the banding by a corpus partition key the way the
    minhash index does."""
    if bits > 60:
        # Two-slice wide tier: pairs of 60-bit words, banded uniformly.
        if bits != 120:
            raise ValueError(
                f"simhash_pairs: bits must be ≤ 60 (single portable "
                f"hash) or exactly 120 (two md5 slices); got {bits}"
            )
        if 60 % band_bits:
            raise ValueError(
                f"simhash_pairs: the 120-bit tier needs band_bits "
                f"dividing 60; got {band_bits}"
            )
        fps = simhash_wide(df, text_col, id_col, n=n)
        words = [("simhash_lo", 60), ("simhash_hi", 60)]
    else:
        fps = simhash(df, text_col, id_col, bits, n=n)
        words = [("simhash", bits)]
    nb = sum(wbits // band_bits for _, wbits in words)
    if max_hamming >= nb:
        # Pigeonhole guarantee requires distance < number of bands —
        # otherwise a pair can differ in every band and never collide.
        raise ValueError(
            f"max_hamming={max_hamming} needs < {nb} bands "
            f"(bits={bits}, band_bits={band_bits}); lower band_bits"
        )
    mask = (1 << band_bits) - 1
    # Single generator explode (see minhash_pairs: an nb-way union would
    # re-plan the vote aggregation nb times).
    band_structs = [
        cached_expr(
            f"struct({wi * 64 + b} AS band, "
            f"(shiftright({wcol}, {b * band_bits}) & {mask}L) AS band_val)"
        )
        for wi, (wcol, wbits) in enumerate(words)
        for b in range(wbits // band_bits)
    ]
    wcols = [wcol for wcol, _ in words]
    bands = fps.select(
        F.col(id_col), *wcols, F.explode(F.array(*band_structs)).alias("bv")
    ).select(
        F.col(id_col),
        *wcols,
        F.col("bv.band").alias("band"),
        F.col("bv.band_val").alias("band_val"),
    )
    # Pair generation stays a bucket SELF-JOIN here — measured, not
    # assumed: simhash buckets are fat (8-bit band values over a corpus
    # with correlated fingerprints; hundreds of docs per bucket), and
    # the groupBy→collect_list→explode-pairs reshape that wins for
    # minhash_pairs (thin buckets) loses here because quadratic
    # per-bucket pair expansion runs in interpreted array expressions
    # while the hash join is whole-stage-codegen'd. sf0.1 isolated
    # pair-gen: self-join 0.49 s vs posexplode+slice 0.85 s vs
    # array-filter lambda 2.09 s (end-to-end 2.1 s vs 3.2 s).
    a = bands.alias("a")
    b_ = bands.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            *[F.col(f"a.{w}").alias(f"{w}_a") for w in wcols],
            *[F.col(f"b.{w}").alias(f"{w}_b") for w in wcols],
        )
        .distinct()
    )
    ham: Column = F.lit(0)
    for w in wcols:
        ham = ham + F.bit_count(F.col(f"{w}_a").bitwiseXOR(F.col(f"{w}_b")))
    return (
        cand.select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    max_df: int = 1,
    out_col: str = "text_kept",
) -> DataFrame:
    """CCNet-style corpus line deduplication: split each document into
    lines on ``sep`` (a regex for the split; also the literal joiner on
    reassembly), compute each distinct line's corpus doc-frequency, and
    drop every occurrence of lines appearing in more than ``max_df``
    documents (headers, footers, cookie banners, licence blocks — the
    line-structured sibling of the shingle-based boilerplate filter).
    Surviving lines are reassembled in original order.

    Returns one row per input document: ``(id_col, n_lines, n_kept,
    out_col)`` — a document whose every line is boilerplate survives
    with ``out_col = ''``, so the caller decides the drop policy.

    Scale shape: lines shuffle as 60-bit md5-reduced longs, never
    strings, and the doc-frequency table aggregates map-side. The drop
    set (lines with df > max_df) is boilerplate-sized — bounded by
    total_lines / max_df and in practice tiny next to the corpus — so
    it broadcasts and the per-line keep decision is a broadcast left
    join, not a corpus-vs-corpus shuffle. If a degenerate corpus ever
    overflows the broadcast, removing the hint falls back to a shuffle
    join with identical semantics. Reassembly groups a single document
    per task (a document fits in memory by definition).
    """
    from energydatalake_spark.text.stats import _hex15_to_long

    # Persisted (minhash precedent, released via release_caches): the
    # line explode feeds TWO consumers — the doc-frequency aggregate
    # and the keep-join stream side — and the broadcast drop-set join
    # leaves no exchange for reuse to latch onto, so without the cache
    # the split+explode+md5 chain (and any caller-side line-structuring
    # expression upstream of it) runs twice (r20 plan audit).
    lines = _persist_shingles(
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
        ).withColumn("lh", _hex15_to_long(F.md5(F.col("line"))))
    )
    dfreq = (
        lines.select("lh", id_col)
        .distinct()
        .groupBy("lh")
        .agg(F.count(F.lit(1)).alias("line_df"))
    )
    drop = dfreq.filter(F.col("line_df") > max_df).select(
        "lh", F.lit(True).alias("is_boiler")
    )
    flagged = lines.join(F.broadcast(drop), "lh", "left")
    keep = F.col("is_boiler").isNull()
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(keep.cast("long")).alias("n_kept"),
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(keep, F.struct("pos", "line")))
                ),
                lambda x: x["line"],
            ),
        ).alias(out_col),
    )


def substring_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    max_df: int = 1,
    out_col: str = "text_kept",
    window_partitions: int | None = None,
) -> DataFrame:
    """Exact duplicate-span removal (the Lee-et-al "Deduplicating
    Training Data" tier): remove every run of ≥``k`` consecutive tokens
    that also appears in more than ``max_df`` documents, without
    requiring line structure — the sliding-window sibling of
    ``line_dedup``. A token survives iff NO duplicated ``k``-gram
    window covers it; overlapping matched windows merge into one
    removed span for free (coverage is a running max over matched
    window starts).

    The reference's corpus ops have no dedup at all (it is a
    warehouse/merge engine — pyspark_ercot_merge_fm_load_latest
    _BQ_archive_csv.py:59-79 is its closest rewrite-shaped op); this
    is the standard large-corpus span-dedup stage layered on the same
    documents model.

    Returns one row per input document: ``(id_col, n_tokens, n_kept,
    out_col)`` — a fully-duplicated document survives with
    ``out_col = ''`` so the caller decides the drop policy, and a
    document whose text tokenizes to ZERO tokens (empty/whitespace)
    still gets its row (``n_tokens = 0``, ``out_col = ''``) via a
    final left join from the input ids — the id-side scan is
    column-pruned to ``id_col`` only.

    Scale shape: k-grams shuffle as 60-bit md5-reduced longs (built
    from ``k-1`` lead() columns sharing ONE window over (doc, pos) —
    no per-window re-tokenize); the doc-frequency aggregate is
    map-side-combining on the hash; the duplicated-gram set is
    bounded by total_grams/(max_df+1) — boilerplate-sized on healthy
    corpora but CORPUS-sized on saturated vocabularies (20.8M grams
    at the r14 x300 probe), so the per-token match carries no join
    hint: AQE broadcasts it when runtime stats say it is small and
    falls back to a gh-keyed shuffle join when it is not (the forced
    broadcast was the adjudicated x300 spill lottery — 68.6 vs
    177.1 s across identical runs); the coverage decision is a
    running max over the already doc-partitioned frame (no new
    exchange); reassembly groups one document per task.

    The gram window's exchange width is PINNED (``window_partitions``,
    default :func:`_pinned_doc_partitions` from the source size) —
    left to AQE coalescing, the sort partitions at the r11 x100 probe
    sat exactly at the spill boundary and identical runs drew 24.7 s
    or 97.2 s depending on whether the external sorter engaged; the
    explicit numPartitions repartition is exempt from coalescing, so
    the in-memory regime is chosen, not drawn. The window, coverage
    pass, and per-doc reassembly all reuse the one pinned hash
    partitioning — still a single doc-keyed exchange.
    """
    from pyspark.sql import Window

    from energydatalake_spark.text.stats import _hex15_to_long

    n_parts = (
        window_partitions
        if window_partitions is not None
        else _pinned_doc_partitions(df)
    )
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(F.trim(F.col(text_col)), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("pos", "tok"),
    ).repartition(n_parts, F.col(id_col))
    w = Window.partitionBy(id_col).orderBy("pos")
    # k-1 lead columns + the validity probe share one WindowExec; the
    # gram is null (and joins nothing) when fewer than k tokens remain.
    gram = F.concat_ws(
        " ", F.col("tok"), *[F.lead("tok", j).over(w) for j in range(1, k)]
    )
    # The gram frame feeds the df aggregate and the dup-join stream
    # side; the WindowExec above the (exchange-reused) repartition
    # re-executes per consumer. An r20 persist A/B over 3 alternating
    # pairs measured no reliable win (raw medians 1.21 vs 1.25 s at
    # sf0.1; worse after noise-marker normalization — the cache
    # barrier cancels the saved window pass), so the recompute stays.
    grams = toks.select(
        id_col,
        "pos",
        "tok",
        F.when(
            F.lead("tok", k - 1).over(w).isNotNull(),
            _hex15_to_long(F.md5(gram)),
        ).alias("gh"),
    )
    dfreq = (
        grams.filter(F.col("gh").isNotNull())
        .select("gh", id_col)
        .distinct()
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("gram_df"))
    )
    dup = dfreq.filter(F.col("gram_df") > max_df).select(
        "gh", F.lit(True).alias("is_dup")
    )
    # NO broadcast hint (r14): the "dup set is boilerplate-sized"
    # assumption fails on saturated-vocabulary corpora — the x300
    # probe measured 20.8M duplicated grams, and the forced-broadcast
    # hash relation per task was the adjudicated spill lottery (x300
    # wall time drew 68.6–177.1 s across identical fresh-JVM runs).
    # AQE's runtime stats pick broadcast when dup is actually small
    # (oracle scales) and a gh-keyed shuffle join when it is
    # corpus-sized — the regime is chosen from measured bytes.
    flagged = grams.join(dup, "gh", "left")
    # Coverage: token i is inside a removed span iff some duplicated
    # window starts at p ∈ [i-k+1, i]; with starts visited in order the
    # running max of matched starts decides it in one pass.
    w_cov = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last_dup_start = F.max(
        F.when(F.col("is_dup"), F.col("pos"))
    ).over(w_cov)
    keep = ~F.coalesce(
        last_dup_start >= F.col("pos") - F.lit(k - 1), F.lit(False)
    )
    per_doc = (
        flagged.withColumn("keep", keep)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct("pos", "tok"))
                        )
                    ),
                    lambda x: x["tok"],
                ),
            ).alias(out_col),
        )
    )
    # Zero-token documents produce no posexplode rows; restore them so
    # the one-row-per-input-document contract holds.
    return df.select(F.col(id_col)).join(per_doc, [id_col], "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce(out_col, F.lit("")).alias(out_col),
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bands: int = 16,
    rows: int = 2,
) -> DataFrame:
    """Per-document MinHash signature as ONE array column — the
    persistable form of the signature matrix ``minhash_pairs`` builds
    inline (same shingles, same multiply-shift permutations, so the
    two signature spaces are identical and index lookups match inline
    runs). One row per document with ≥1 shingle: ``(id_col,
    sig: array<bigint> length bands*rows)``.

    Scale shape: identical to minhash_pairs' signature stage — one
    shingle explode shuffled as 32-bit hash ints, one
    map-side-combining min-aggregate per permutation."""
    k = bands * rows
    ex = _exploded_shingles(df, text_col, id_col, n).select(
        F.col(id_col), _hash_long(F.md5(F.col("shingle"))).alias("h0")
    )
    agg = ex.groupBy(id_col).agg(*_minhash_sig_cols(k))
    return agg.select(
        F.col(id_col),
        cached_expr("array(" + ",".join(f"m{i}" for i in range(k)) + ") AS sig"),
    )


def signature_band_buckets(
    sigs: DataFrame, id_col: str = "doc_id", bands: int = 16, rows: int = 2
) -> DataFrame:
    """LSH band buckets from a signature frame: one row per (doc,
    band) with the band's hash — the same ``md5(concat_ws(','))`` rule
    minhash_pairs uses, so buckets from a persisted index collide with
    buckets from a live batch. Input: ``(id_col, sig array<bigint>)``.
    Output: ``(id_col, band, band_hash)``."""
    band_structs = [
        cached_expr(
            f"struct({b} AS band, md5(concat_ws(','"
            + "".join(
                f", CAST(element_at(sig, {i + 1}) AS STRING)"
                for i in range(b * rows, (b + 1) * rows)
            )
            + ")) AS band_hash)"
        )
        for b in range(bands)
    ]
    return sigs.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bh")
    ).select(
        F.col(id_col),
        F.col("bh.band").alias("band"),
        F.col("bh.band_hash").alias("band_hash"),
    )
