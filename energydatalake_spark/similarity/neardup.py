"""Embedding-cosine near-duplicate detection (the vector-space member
of the dedup family: exact / minhash / simhash / ngram — see
``energydatalake_spark.text.dedup`` — plus this one).

Semantics: all pairs (id_a < id_b) whose cosine similarity ≥ threshold.

Scale design — two tiers, both fully distributed (no driver
materialization of the corpus anywhere):

- ``embedding_near_dup`` — EXACT all-pairs via a block-pair join: each
  vector lands in one of B blocks (``pmod(id, B)``); every unordered
  block pair (bi ≤ bj) becomes one ``applyInPandas`` group scoring
  block-bi rows against block-bj rows with a NumPy BLAS product. One
  shuffle of n·B rows; per-task memory is ~2n/B vectors, tuned by
  ``n_blocks``. The O(n²) compute is the operator's semantics (exact
  threshold recall); the implementation distributes it evenly and never
  routes vectors through the driver.
- ``embedding_near_dup_lsh`` — the sub-quadratic scale path: sign-LSH
  bucketing (same hyperplanes as ``search.lsh_topk``) + Hamming-1
  multiprobe generates candidates, then exact JVM-side cosine rerank
  only inside colliding buckets. Recall < 1 by design (documented);
  deterministic, so it still carries a full value-hash oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAIR_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ]
)

# Quantized (id, qv, qe) frames persisted by compact-rerank invocations
# (see embedding_near_dup_lsh). NOTE (r15 self-review): a persisted
# SQL frame is pinned by the JVM CacheManager until unpersist() — GC
# of the Python object does NOT free the blocks, so this module list
# is the ONLY release path short of session end. Each new compact
# invocation therefore evicts every PRIOR invocation's frame (safe:
# persist keeps lineage, so a still-unconsumed older result silently
# recomputes), and callers can release eagerly via
# release_quantized_cache() once a result is consumed (bench and the
# probe tools do).
_QUANTIZED_CACHE: list[DataFrame] = []


def release_quantized_cache(blocking: bool = False) -> int:
    """Unpersist every quantized-vector frame cached by prior
    compact-rerank invocations; returns how many were released.
    Call after the returned pair DataFrame has been fully consumed —
    long-lived sessions making repeated ``compact_rerank`` calls
    otherwise accumulate cached blocks until the driver GCs the
    frames (ADVICE r14)."""
    n = 0
    while _QUANTIZED_CACHE:
        _QUANTIZED_CACHE.pop().unpersist(blocking)
        n += 1
    return n


def _normalized_matrix(rows_ids, rows_vecs) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(rows_ids, dtype=np.int64)
    if len(ids) == 0:
        return ids, np.zeros((0, 0))
    m = np.asarray([np.asarray(v, dtype=np.float64) for v in rows_vecs])
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0.0] = 1.0  # zero vectors match nothing at any t > 0
    return ids, m / norms[:, None]


def embedding_near_dup(
    df: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int = 8,
    max_input_rows: int | None = 100_000,
) -> DataFrame:
    """Exact cosine near-dup pairs: (id_a, id_b, cosine), id_a < id_b,
    cosine ≥ threshold. Deterministic output (float64 throughout).

    Distributed block-pair join: row with block i is exploded to the
    B unordered block pairs it participates in, shuffled on
    (bi, bj), and each group scores its bi-side against its bj-side
    (upper triangle by id when bi == bj). Exact — every pair meets in
    exactly one group — with per-task memory bounded by ~2n/B vectors.
    Pick ``n_blocks`` so a block fits executor memory (n_blocks scales
    with corpus size; shuffle volume is n·B rows).

    This is the EXACT tier: O(n²) cosine evaluations is its semantics,
    which no partitioning makes sub-quadratic. ``max_input_rows``
    (default 100k ≈ 5·10⁹ scored pairs) refuses larger inputs so a
    100 TB caller cannot invoke the quadratic plan by accident — route
    bulk near-dup through ``embedding_near_dup_lsh`` and keep this tier
    for bounded reranks/oracles. Pass ``max_input_rows=None`` to
    override deliberately.
    """
    if max_input_rows is not None:
        n_in = df.count()
        if n_in > max_input_rows:
            raise ValueError(
                f"embedding_near_dup is the exact O(n²) tier; input has "
                f"{n_in} rows > max_input_rows={max_input_rows}. Use "
                f"embedding_near_dup_lsh (sub-quadratic) for corpora this "
                f"size, or pass max_input_rows=None to force the exact plan."
            )
    b_count = max(1, n_blocks)
    base = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
    ).withColumn("blk", F.pmod(F.col("id"), F.lit(b_count)).cast("int"))
    # One struct per partner block: (least, greatest) so both members of
    # a block pair shuffle to the same group, each exactly once.
    pair_keys = [
        F.struct(
            F.least(F.col("blk"), F.lit(j)).alias("bi"),
            F.greatest(F.col("blk"), F.lit(j)).alias("bj"),
        )
        for j in range(b_count)
    ]
    exploded = base.select(
        "id", "vec", "blk", F.explode(F.array(*pair_keys)).alias("bp")
    ).select("id", "vec", "blk", F.col("bp.bi").alias("bi"), F.col("bp.bj").alias("bj"))

    def score_block_pair(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = key
        a = pdf[pdf["blk"] == bi]
        ids_a, mat_a = _normalized_matrix(a["id"].values, a["vec"])
        if bi == bj:
            ids_b, mat_b = ids_a, mat_a
        else:
            b = pdf[pdf["blk"] == bj]
            ids_b, mat_b = _normalized_matrix(b["id"].values, b["vec"])
        if len(ids_a) == 0 or len(ids_b) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        sims = mat_a @ mat_b.T  # (|bi|, |bj|) block product, BLAS
        if bi == bj:
            # Same block: both sides are the same set — upper triangle.
            keep = (sims >= threshold) & (ids_b[None, :] > ids_a[:, None])
        else:
            # Cross block: each unordered pair meets exactly once (one
            # member per side), but side membership is by block, not by
            # id order — keep all, orient (min, max) below.
            keep = sims >= threshold
        li, ri = np.nonzero(keep)
        left, right = ids_a[li], ids_b[ri]
        return pd.DataFrame(
            {
                "id_a": np.minimum(left, right),
                "id_b": np.maximum(left, right),
                "cosine": sims[li, ri],
            }
        )

    return exploded.groupBy("bi", "bj").applyInPandas(score_block_pair, PAIR_SCHEMA)


def embedding_near_dup_lsh(
    df: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 4,
    seed: int = 42,
    broadcast_vectors: bool = False,
    compact_rerank: bool = False,
    compact_bits: int = 8,
    _compact_stats: dict | None = None,
) -> DataFrame:
    """Sub-quadratic near-dup: multi-table sign-LSH candidate
    generation + exact JVM-side cosine rerank (``aggregate``/``zip_with``
    folds, no Python) for candidates only.

    Standard LSH parameterization: ``n_planes`` controls bucket size
    (2^p buckets — more planes = fewer candidates per bucket = less
    rerank work), ``n_tables`` independent plane sets control recall
    (a pair is a candidate if it collides in ANY table:
    1-(1-p_agree^planes)^tables), and Hamming-1 multiprobe on side a
    of each table recovers near-miss signatures cheaply. Deterministic
    (seeded hyperplane literals) but approximate by design — the
    recall trade is the algorithm, and both knobs are per-call.

    SIZE ``n_planes`` WITH THE CORPUS: expected candidates per vector
    ≈ n_tables·(1+n_planes) · n/2^n_planes (probe cells × mean bucket
    occupancy), so p must grow ~log2(n) to keep rerank work linear —
    p=8 puts a 2k-vector corpus at ~140 candidates/vector (fine for
    the sf0.1 oracle, measured r7) but would be quadratic-ish at 1B
    vectors; p≈26, tables 4-8 holds candidates/vector at O(100)
    there. The rerank cost IS the candidate count: everything upstream
    of it is one scan plus a 24-byte-row collision join.

    ``broadcast_vectors`` (r13, from the x300 probe): with candidates
    sized O(100)·n, the default sort-merge rerank joins shuffle
    2·dim·8 bytes PER CANDIDATE — 67 GB at 600k vectors / 131M
    candidates, a spill regime that measured α(x100→x300) = 1.95
    while the candidate COUNT grew ×3.27 (linear; the (1+p) factor).
    The vector table itself is tiny (dim·8·n ≈ 312 MB there), so when
    the corpus fits a broadcast (callers gate on row count — the
    registry uses ≤2M), broadcasting the vector side turns BOTH
    rerank joins and the collision join map-side: the only remaining
    wide exchange is the 16-byte-row pair dedup (plus the narrow
    up-front repartition below). Re-measured fresh-JVM x100/x300:
    90.9/774.0 s co-shuffle → 25.2/93.8 s broadcast, α 1.95 → 1.20 —
    the residual is the corpus's own qualifying-pair growth (the
    probe generator's same-cluster cosine tail crosses t=0.4
    quadratically often; output 0.77M pairs at 200k vectors, 3.45M
    at 600k) plus the (1+p) probe factor, i.e. output mass, not
    operator overhead. Beyond broadcast size (true 100 TB corpora)
    the co-shuffle path stands — there the cluster absorbs the
    candidate shuffle; locally it spills.

    ``compact_rerank`` (r14, VERDICT r13 #2 — the scale tier ABOVE
    broadcast size): the co-shuffle rerank's α-1.95 regime was pure
    shuffle mass — 2·dim·8 B of float64 vector per candidate. This
    tier reranks candidates against an int8 quantization of the
    unit-normalized vectors first (``array<tinyint>`` ≈ dim bytes
    through the exchange, ~7× less), keeping every pair whose
    quantized integer dot clears a per-pair margin, then rechecks ONLY
    the survivors against the exact float64 vectors. The margin is
    PER-VECTOR (r15, VERDICT r14 #1b): each vector ships its ACTUAL
    quantization-error norm qe = |q/s − u|₂ (one double, computed free
    at quantize time), and a true pair (cos ≥ t) provably satisfies
    ``q_a·q_b ≥ s²·(t − qe_a − qe_b − qe_a·qe_b)`` (Cauchy–Schwarz on
    the exact expansion) — strictly tighter than the old global
    worst-case δ = √dim/(2s) bound on a quantized cosine (typical
    |e|₂ ≈ √(dim/12)/s is 1/√3 of worst case, and filtering the
    integer dot removes the |q|-norm denominator slop). Survivors are
    a SUPERSET of the true pairs, so the exact recheck makes the
    output IDENTICAL to the default path (parity-tested), not
    approximate. Full-vector shuffle mass drops from O(candidates) to
    O(survivors) — output-proportional plus the (now ~halved) margin
    band. Ignored under ``broadcast_vectors`` (map-side joins already
    move no vectors through an exchange); it is the default co-shuffle
    regime's fix. RETENTION: each call persists one narrow quantized
    frame; long-lived sessions can release those blocks eagerly with
    ``release_quantized_cache()`` after consuming the result. NOTE
    (ADVICE r15): building a SECOND compact-rerank plan evicts the
    prior call's persisted frame at plan-BUILD time, so consume
    (collect/write) each compact-rerank result before building the
    next one — an unconsumed earlier result stays CORRECT (persist
    keeps lineage; lost blocks recompute) but silently re-executes
    its quantize stage, the exact 2× cost the persist avoids.
    """
    from energydatalake_spark.similarity.search import _bucket, _hyperplanes, dot, with_norm

    base = with_norm(
        df.select(F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")),
        "vec",
        "nm",
    ).withColumn(
        # Zero vectors: norm 0 → NaN cosine, and Spark orders NaN above
        # every number, so it would PASS the threshold. Same guard as
        # _normalized_matrix: norm 1 → cosine 0 → excluded at any t > 0.
        "nm",
        F.when(F.col("nm") == 0, F.lit(1.0)).otherwise(F.col("nm")),
    )
    if broadcast_vectors or compact_rerank:
        # With the collision and rerank joins map-side, the whole
        # explode→join→dedup-map chain runs at PARQUET SCAN
        # parallelism — a single large row group means one task does
        # all the candidate work (measured r13: 31 idle + 1 straggler
        # task per stage, x100 167 s vs 91 s co-shuffle). One narrow
        # corpus-sized exchange up front buys full-width execution of
        # the fat broadcast-join stages. The compact tier needs the
        # same guard (measured r14: AQE broadcasts its small quantized
        # side, collapsing the chain into a scan-parallel map stage —
        # one straggler task ran 8+ min at x100 before the fix).
        spark = df.sparkSession
        try:
            width = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except ValueError:  # e.g. "auto" under some AQE platforms
            width = spark.sparkContext.defaultParallelism
        base = base.repartition(width)
    bucket_cols = [
        _bucket("vec", _hyperplanes(dim, n_planes, seed=seed + t)).alias(f"b{t}")
        for t in range(n_tables)
    ]
    base = base.select("id", "vec", "nm", *bucket_cols)
    # b side: one home (table, bucket) per table. a side: home plus the
    # n_planes Hamming-1 probes per table — probing one side only
    # covers exact-equal AND 1-bit-off signature pairs without
    # double-probing.
    home = [
        F.struct(F.lit(t).alias("t"), F.col(f"b{t}").alias("bucket"))
        for t in range(n_tables)
    ]
    probe = home + [
        F.struct(
            F.lit(t).alias("t"),
            F.col(f"b{t}").bitwiseXOR(F.lit(1 << i)).alias("bucket"),
        )
        for t in range(n_tables)
        for i in range(n_planes)
    ]
    # Candidate generation moves ONLY (id, table, bucket) — 24-byte
    # rows; vectors stay out of the collision join and its dedup
    # shuffle entirely (a pair colliding in several tables/probes would
    # otherwise drag 2·dim floats through the exchange per collision).
    a = base.select(F.col("id").alias("id_a"), F.explode(F.array(*probe)).alias("tb")).select(
        "id_a", F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket")
    )
    b = base.select(F.col("id").alias("id_b"), F.explode(F.array(*home)).alias("tb")).select(
        "id_b", F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket")
    )
    if broadcast_vectors:
        b = F.broadcast(b)
    cand = (
        a.join(b, ["t", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    if compact_rerank and not broadcast_vectors:
        # Quantized pre-rerank: compact-vector joins carry dim (int8) or
        # 2·dim (int16) bytes per candidate side instead of dim·8 B of
        # float64 — the exchange mass that made the co-shuffle rerank
        # spill. Margin = the analytic worst case of unit-vector
        # rounding at the chosen width, so the exact recheck below sees
        # every true pair. The width trades candidate-side bytes
        # against the near-threshold MARGIN BAND the survivor join must
        # carry: int8's margin is ~0.084 at dim 64 (wide band on
        # corpora with cosine mass near the threshold), int16's is
        # ~0.0007 (survivors ≈ true output).
        if compact_bits == 8:
            qscale, qtype = 127.0, "tinyint"
        elif compact_bits == 16:
            qscale, qtype = 32767.0, "smallint"
        else:
            raise ValueError(
                f"compact_bits must be 8 or 16, got {compact_bits}"
            )

        # Arrow-batched quantization, NOT a Catalyst transform/aggregate
        # chain: interpreted HOF lambdas cost ~400 evals/row here, and
        # the join's inferred isnotnull(qn) predicate PUSHES the whole
        # expression below the up-front repartition into the
        # single-row-group scan task (measured r14: one straggler task
        # evaluated 200k quantizations alone for 4+ min at the x100
        # probe). mapInPandas is vectorized NumPy AND a pushdown
        # barrier, so the compute stays at exchange width.
        def quantize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                if len(pdf) == 0:
                    continue
                lens = pdf["vec"].map(len)
                if lens.nunique() > 1 or int(lens.iloc[0]) != dim:
                    # the margin math needs the true vector length; an
                    # undersized `dim` param (or ragged input, which
                    # np.asarray would turn into a 1-D object array and
                    # an opaque IndexError) would understate the margin
                    # and SILENTLY drop true pairs only in this tier
                    # (the other reranks tolerate the mismatch) — fail
                    # loudly instead (ADVICE r14: cover ragged batches)
                    got = sorted(lens.unique().tolist())
                    raise ValueError(
                        f"compact_rerank: vectors have "
                        f"{got[0] if len(got) == 1 else got} "
                        f"elements but dim={dim}; the quantization "
                        f"margin needs the true length"
                    )
                m = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["vec"]]
                )
                nm = pdf["nm"].to_numpy(dtype=np.float64)
                u = m / nm[:, None]
                q = np.round(qscale * u)
                # Per-vector ACTUAL quantization-error norm (VERDICT
                # r14 #1b): qe = |q/s − u|₂, one extra double computed
                # free at quantize time. The global analytic worst case
                # √dim/(2s) is ~√3× the typical error (uniform rounding
                # errors give E|e|₂ ≈ √(dim/12)/s), so the per-pair
                # margin qe_a+qe_b+qe_a·qe_b roughly HALVES the
                # survivor band the exact recheck must carry (measured
                # r14: 4.63× survivors/true-pairs at the global bound).
                qe = np.sqrt(((q / qscale - u) ** 2).sum(axis=1))
                # Non-finite vectors (NaN/inf elements): the exact
                # rerank's cosine is NaN, which Spark compares ABOVE
                # every number, so the default path EMITS those pairs.
                # int8-casting NaN is platform-undefined garbage that
                # could fail the margin filter and silently drop them —
                # zero the quantized vector and poison qe to NaN
                # (pandas→Arrow ships it as NULL); the survivor filter
                # passes NULL margins through so the exact recheck
                # stays the decider (parity preserved).
                bad = ~np.isfinite(q).all(axis=1)
                if bad.any():
                    q[bad] = 0.0
                    qe[bad] = np.nan
                yield pd.DataFrame(
                    {
                        "id": pdf["id"].values,
                        "qv": list(
                            q.astype(np.int8 if compact_bits == 8 else np.int16)
                        ),
                        "qe": qe,
                    }
                )

        # persist: BOTH join sides read qbase, and without a
        # materialization boundary each side re-executes the Python
        # quantize stage (2× the NumPy work and Arrow round-trips per
        # run); the frame is 3 narrow columns. persist over
        # localCheckpoint deliberately: checkpoint blocks die with
        # their executor (non-recomputable — the job fails), while a
        # persisted frame keeps lineage and recomputes lost partitions
        # — the fault-tolerance this tier needs on a real cluster.
        # RETENTION (ADVICE r14, corrected r15): the CacheManager
        # pins the blocks until unpersist — Python GC never frees
        # them — so evict every PRIOR invocation's frame here (an
        # older unconsumed result recomputes from lineage) and keep
        # only this one registered for eager release via
        # ``release_quantized_cache()``.
        from pyspark import StorageLevel

        release_quantized_cache()
        qbase = (
            base.select("id", "vec", "nm")
            .mapInPandas(quantize, f"id long, qv array<{qtype}>, qe double")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        _QUANTIZED_CACHE.append(qbase)
        qa = qbase.select(
            F.col("id").alias("id_a"),
            F.col("qv").alias("qv_a"),
            F.col("qe").alias("qe_a"),
        )
        qb = qbase.select(
            F.col("id").alias("id_b"),
            F.col("qv").alias("qv_b"),
            F.col("qe").alias("qe_b"),
        )
        # per-element products fit int (≤ 32767²); the dim-length sum
        # can exceed int32 at 16-bit scale, so accumulate in bigint
        qdot = F.aggregate(
            F.zip_with(
                F.col("qv_a"),
                F.col("qv_b"),
                lambda x, y: x.cast("int") * y.cast("int"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        # Superset filter with PER-PAIR margins: writing q = s·(u+e)
        # with s = qscale and |e|₂ = qe exactly (not a bound),
        #   q_a·q_b = s²·(u_a·u_b + u_a·e_b + e_a·u_b + e_a·e_b)
        #           ≥ s²·(cos − qe_b − qe_a − qe_a·qe_b)
        # by Cauchy–Schwarz with |u|₂ = 1, so every true pair
        # (cos ≥ threshold) satisfies
        #   qdot ≥ s²·(threshold − qe_a − qe_b − qe_a·qe_b).
        # Filtering on the integer dot directly (not a quantized
        # cosine) also removes the old bound's |q|-norm denominator
        # slop — both tightenings shrink the survivor band the exact
        # recheck must carry.
        qmargin = F.lit(qscale * qscale) * (
            F.lit(threshold)
            - F.col("qe_a")
            - F.col("qe_b")
            - F.col("qe_a") * F.col("qe_b")
        )
        if _compact_stats is not None:
            # measurement hook (tools/adjudicate_compact.py): expose
            # the pre-filter candidate frame so the survivor band
            # (survivors / true pairs) is countable without
            # duplicating the margin math outside the operator
            _compact_stats["candidates"] = cand
        cand = (
            cand.join(qa, "id_a")
            .join(qb, "id_b")
            # NULL/NaN margin = a non-finite input vector (poisoned qe
            # above — pandas→Arrow ships np.nan in a float column as
            # NULL); those pairs pass through so the exact recheck
            # decides, exactly as the default rerank would
            .filter(
                (qdot.cast("double") >= qmargin)
                | qmargin.isNull()
                | F.isnan(qmargin)
            )
            .select("id_a", "id_b")
        )
        if _compact_stats is not None:
            _compact_stats["survivors"] = cand
    # Exact rerank: fetch vectors for the deduped candidates only
    # (under compact_rerank, only for the quantized-cosine survivors).
    # Both join sides derive from ONE (id, vec, nm) frame — under
    # broadcast_vectors the broadcast hint is placed on that shared
    # frame so the two rerank builds are structurally identical
    # (ADVICE r13: hinting each renamed side separately doubled the
    # driver collect and per-executor broadcast memory near the size
    # gate; a shared canonical subtree is what exchange reuse can
    # deduplicate).
    g = base.select("id", "vec", "nm")
    if broadcast_vectors:
        g = F.broadcast(g)
    ga = g.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), F.col("nm").alias("nm_a")
    )
    gb = g.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), F.col("nm").alias("nm_b")
    )
    cos = dot(F.col("vec_a"), F.col("vec_b")) / (F.col("nm_a") * F.col("nm_b"))
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _coarse_router(
    cbn: np.ndarray, n_coarse: int, n_iter: int = 3
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Group the (normalized) codebook rows into ``n_coarse`` coarse
    cells with a few spherical-Lloyd iterations — the first level of a
    two-level (IVF-style) centroid assignment. Deterministic: init is
    the first ``n_coarse`` codebook rows, all updates are NumPy
    reductions over fixed-order arrays. Cost O(n_iter·n_cells·
    n_coarse·dim) driver-side flops on a model-sized matrix — e.g.
    2,344 cells × 49 coarse × 64 dim ≈ 7M flops per iteration.

    Returns ``(coarse_n, members)``: the normalized coarse-centroid
    matrix (n_coarse × dim) and, per coarse cell, the ASCENDING array
    of codebook row positions routed to it (ascending order is what
    lets the second-level argmax keep NumPy's first-max tie-break).
    """
    n_cells = cbn.shape[0]
    g = min(n_coarse, n_cells)
    coarse = cbn[:g].copy()
    assign = np.zeros(n_cells, dtype=np.int64)
    for _ in range(max(1, n_iter)):
        nrm = np.linalg.norm(coarse, axis=1)
        nrm[nrm == 0.0] = 1.0
        coarse_n = coarse / nrm[:, None]
        assign = np.argmax(cbn @ coarse_n.T, axis=1)
        sums = np.zeros_like(coarse)
        np.add.at(sums, assign, cbn)
        counts = np.bincount(assign, minlength=g).astype(np.float64)
        nonempty = counts > 0
        coarse[nonempty] = sums[nonempty] / counts[nonempty, None]
        # empty coarse cells keep their previous centroid (stable,
        # deterministic; their member list just stays empty)
    nrm = np.linalg.norm(coarse, axis=1)
    nrm[nrm == 0.0] = 1.0
    coarse_n = coarse / nrm[:, None]
    assign = np.argmax(cbn @ coarse_n.T, axis=1)
    members = [np.nonzero(assign == k)[0] for k in range(g)]
    return coarse_n, members


def embedding_semantic_dedup(
    df: DataFrame,
    threshold: float = 0.4,
    n_cells: int = 16,
    centroids: DataFrame | list[tuple[int, list[float]]] | None = None,
    labels: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cell_rows: int = 100_000,
    fold_max_cells: int = 64,
    two_level_min_cells: int = 512,
    coarse_probes: int = 8,
) -> DataFrame:
    """SemDeDup-style cell-local keep-one dedup (Abbas et al., 2023):
    every vector is coarse-quantized to its nearest codebook cell
    (pass ``kmeans_centroids`` output for the paper's k-means cells;
    default = the first ``n_cells`` vectors by id, the same stand-in
    ``ivf_topk`` uses), then near-duplicate components are closed and
    collapsed WITHIN each cell — the paper's key structure: no global
    closure, cross-cell duplicates are missed by design (that is the
    approximation that makes the op linear-ish). HOW MANY are missed
    is measured, not asserted (r19, the oracle-checked
    ``semantic_recall`` eval vs the exact all-pairs tier): in the
    TWIN regime — the operator's actual dedup target — planted-twin
    collapse recall is 0.963 (r14 probe, 50k vectors / 196 cells);
    in the TAIL-PAIR regime (loose cosine-0.4..0.5 pairs, whose cell
    assignment is inherently arbitrary — the test corpus's max pair
    cosine is only ≈0.6) the cell-local closure catches 19–23 % of
    true ≥0.4 pairs at 16 cells (miss rate 77–81 % at that threshold;
    70–100 % across the tighter 0.45/0.5 tail tiers, vs ~6 %
    co-location for random directions). Callers deduping for loose
    semantic
    SIMILARITY rather than duplication should use the pair tiers
    (``embedding_near_dup_lsh``) instead.

    Returns one row per input vector: ``(vec_id, cluster_id, keep)``
    where ``cluster_id`` is the minimum member id of the vector's
    within-cell near-dup component and ``keep`` marks that minimum.
    Zero-norm vectors have no direction, so they are their own
    singleton clusters (``keep = true``) — mirrored in the SQL twin.

    Scale shape — exactly ONE exchange: the codebook is model-sized
    (vectors are never joined back), the only shuffle is the
    groupBy(cell), and each cell resolves its own components with an
    Arrow-batched union-find (no CC iterations, no lineage growth).
    Within-cell scoring is O(|cell|²) BLAS — the paper's semantics —
    so ``n_cells`` MUST scale with the corpus to bound cell size
    (SemDeDup uses tens of thousands of clusters at web scale; the
    similarity matrix is computed in row blocks so memory stays
    ~block×|cell|, and any cell over ``max_cell_rows`` raises loudly
    with instructions to raise ``n_cells`` rather than silently going
    quadratic).

    Assignment picks its implementation by codebook size: at
    ≤``fold_max_cells`` cells it is the map-side Catalyst argmax fold
    over the plan-literal codebook — pure JVM, value-hash-exact
    against the recursive SQL mirror. Catalyst evaluates
    higher-order-function lambdas per array element (no codegen), so
    a corpus-sized codebook would cost O(rows·n_cells·dim)
    interpreter steps; beyond the bound assignment runs as an
    Arrow-batched BLAS argmax in ``mapInPandas`` (codebook in the
    task closure — n_cells×dim float64, model-sized). Same first-max
    tie-break, but BLAS summation order differs from the sequential
    fold, so the big-codebook tier is deliberately OUTSIDE the static
    oracle bound (rows-only checked, like dedup_embedding_lsh's
    corpus-sized planes).

    Above ``two_level_min_cells`` cells the BLAS tier routes through a
    TWO-LEVEL assignment (r14, from the x300 probe's α₃ = 1.41
    finding): with the corpus-sized codebook (n_cells = ⌈n/256⌉) the
    brute argmax is O(n·n_cells·dim) = O(n²·dim/256) — the engine's
    last structural super-linearity. ``_coarse_router`` clusters the
    codebook itself into ⌈√n_cells⌉ coarse cells (driver-side
    spherical Lloyd on the model-sized matrix); each vector scores the
    coarse matrix, probes its ``coarse_probes`` best coarse cells, and
    argmaxes only over the codebook rows inside them —
    O(n·(1+coarse_probes)·√n_cells·dim), the paper-standard IVF
    assignment shape. Approximate by design: a vector near a coarse
    boundary can land in a neighbouring fine cell vs brute argmax —
    but near-duplicate vectors have near-identical coarse scores, so
    they ROUTE TOGETHER either way, and it is co-location (not which
    cell) that decides the dedup verdict. Measured on the probe
    generator at 50k vectors / 196 cells (A/B vs brute, r14):
    planted-twin collapse recall IDENTICAL (0.963 brute / 0.963 w=8 /
    0.968 w=4 — inside noise), keeps +2.9 % at w=8 — the drift is
    confined to the loose cosine-tail pairs whose brute cell
    assignment is itself arbitrary (SemDeDup already drops cross-cell
    tail pairs by design). ``coarse_probes ≥`` the coarse-cell count
    degenerates to exact brute argmax (pinned by a parity test); the
    tier sits above the static oracle bound like the brute BLAS tier
    it replaces. NOTE the two-level default is a documented behavior
    change vs ≤r13: boundary vectors can land in a neighbouring fine
    cell vs brute argmax (keep/cluster verdicts for loose tail pairs
    may differ); pass ``coarse_probes`` ≥ ⌈√n_cells⌉ or
    ``two_level_min_cells`` above your codebook size to restore exact
    brute assignment.

    ``labels`` (r15, VERDICT r14 #6 — the second external escape
    hatch): a caller with PRECOMPUTED assignments (an earlier run, an
    external IVF trainer) passes an (``id_col``, ``cell_id``) frame
    and skips codebook collection and the router entirely — at 100 TB
    that replaces the assignment compute with one co-partitioned
    join. Mutually exclusive with ``centroids``. Every non-zero-norm
    vector must be labelled: a missing id fails loudly in the cell
    stage (never a silent drop), and an id labelled with two
    DIFFERENT cells raises in-plan (exact duplicate rows collapse
    silently — re-concatenated assignment runs are idempotent).
    Zero-norm vectors stay singleton clusters whether labelled or not
    (their label is ignored — they have no direction to score).
    """
    from energydatalake_spark.similarity.search import (
        _argmax_cell,
        _codebook_literal,
        _collect_codebook_rows,
        with_norm,
    )

    base = with_norm(
        df.select(
            F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
        ),
        "vec",
        "nm",
    )
    nz = base.filter(F.col("nm") > 0)
    if labels is not None and centroids is not None:
        raise ValueError(
            "embedding_semantic_dedup: pass centroids (train-side "
            "escape hatch) or labels (assignment-side), not both"
        )
    cents = (
        None
        if labels is not None
        else _collect_codebook_rows(df, centroids, n_cells, vec_col,
                                    id_col, "embedding_semantic_dedup")
    )
    if labels is not None:
        lab = labels.select(
            F.col(id_col).cast("long").alias("id"),
            F.col("cell_id").cast("long").alias("cell_id"),
        )
        # Duplicate ids in the caller's frame would fan the join out,
        # duplicating vectors into cells and emitting conflicting
        # (id, cluster, keep) rows with no error (r15 self-review).
        # Collapse exact duplicates (idempotent re-concat is fine);
        # CONFLICTING cells raise loudly in-plan via raise_error. The
        # groupBy's exchange is reused by the id-join below, so the
        # guard costs only the map-side partial aggregate.
        lab = lab.groupBy("id").agg(
            F.min("cell_id").alias("cell_id"),
            F.count_distinct("cell_id").alias("_ncell"),
        )
        lab = lab.select(
            "id",
            F.when(
                F.col("_ncell") > 1,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "embedding_semantic_dedup: labels assigns "
                            "conflicting cells to id "
                        ),
                        F.col("id").cast("string"),
                    )
                ).cast("long"),
            )
            .otherwise(F.col("cell_id"))
            .alias("cell_id"),
        )
        # left join: an unlabelled vector surfaces as a NULL cell in
        # dedup_cell (loud ValueError there) instead of silently
        # vanishing from the output as an inner join would make it
        cells = nz.select("id", "vec").join(lab, "id", "left")
    elif len(cents) <= fold_max_cells:
        cells = nz.select(
            "id",
            "vec",
            _argmax_cell(
                _codebook_literal(cents), F.col("vec"), F.col("nm")
            ).alias("cell_id"),
        )
    else:
        cb_ids = np.array([cid for cid, _ in cents], dtype=np.int64)
        cb = np.array([cv for _, cv in cents], dtype=np.float64)
        cb_norms = np.linalg.norm(cb, axis=1)
        cb_norms[cb_norms == 0.0] = 1.0
        cbn = cb / cb_norms[:, None]
        cbn_t = cbn.T
        if len(cents) > two_level_min_cells:
            n_coarse = int(np.ceil(np.sqrt(len(cents))))
            coarse_n, cmembers = _coarse_router(cbn, n_coarse)
            coarse_t = coarse_n.T
            n_probe = min(coarse_probes, coarse_n.shape[0])
        else:
            coarse_t = None

        def _assign(mbn: np.ndarray) -> np.ndarray:
            """argmax cell per row of the normalized batch matrix."""
            if coarse_t is None:
                return cb_ids[np.argmax(mbn @ cbn_t, axis=1)]
            b = mbn.shape[0]
            cs = mbn @ coarse_t  # (b, G)
            if n_probe >= cs.shape[1]:
                topw = np.tile(np.arange(cs.shape[1]), (b, 1))
            else:
                topw = np.argpartition(-cs, n_probe - 1, axis=1)[:, :n_probe]
            # group the (row, coarse-cell) probe pairs by coarse cell so
            # each cell's second-level scoring is ONE BLAS product
            flat_rows = np.repeat(np.arange(b), topw.shape[1])
            flat_g = topw.ravel()
            order = np.argsort(flat_g, kind="stable")
            flat_rows, flat_g = flat_rows[order], flat_g[order]
            bounds = np.searchsorted(flat_g, np.arange(coarse_t.shape[1] + 1))
            best = np.full(b, -np.inf)
            best_pos = np.full(b, np.iinfo(np.int64).max, dtype=np.int64)
            for g in range(coarse_t.shape[1]):
                lo, hi = bounds[g], bounds[g + 1]
                mem = cmembers[g]
                if lo == hi or mem.size == 0:
                    continue
                rows = flat_rows[lo:hi]
                sub = mbn[rows] @ cbn_t[:, mem]  # (r, |mem|)
                j = np.argmax(sub, axis=1)
                s = sub[np.arange(rows.size), j]
                pos = mem[j]  # ascending within mem → first-max tie-break
                upd = (s > best[rows]) | ((s == best[rows]) & (pos < best_pos[rows]))
                ridx = rows[upd]
                best[ridx] = s[upd]
                best_pos[ridx] = pos[upd]
            # rows whose every probed coarse cell was empty (an empty
            # coarse cell keeps its stale centroid, so it can still win
            # the coarse argmax): brute-assign just those rows
            miss = np.nonzero(best_pos == np.iinfo(np.int64).max)[0]
            if miss.size:
                best_pos[miss] = np.argmax(mbn[miss] @ cbn_t, axis=1)
            return cb_ids[best_pos]

        def assign_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                if len(pdf) == 0:
                    continue
                m = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["vec"]]
                )
                norms = np.linalg.norm(m, axis=1)
                norms[norms == 0.0] = 1.0  # nz already excludes, belt+braces
                cell = _assign(m / norms[:, None])
                yield pd.DataFrame(
                    {
                        "id": pdf["id"].values,
                        "vec": pdf["vec"].values,
                        # cell ids are corpus ids (default codebook =
                        # first n_cells corpus vectors) and the id
                        # space is 64-bit — an int32 cast would wrap
                        # ids above 2^31 and could merge two distinct
                        # cells (the Catalyst fold tier keeps longs).
                        "cell_id": cell,
                    }
                )

        cells = nz.select("id", "vec").mapInPandas(
            assign_batches, "id long, vec array<double>, cell_id long"
        )

    out_schema = "vec_id long, cluster_id long, keep boolean"

    def dedup_cell(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if pd.isna(key[0]):
            # a null grouping key arrives as None OR NaN depending on
            # the Arrow conversion (a nullable long key lands as NaN);
            # only reachable via the `labels` escape hatch's left join
            missing = pdf["id"].head(5).tolist()
            raise ValueError(
                f"embedding_semantic_dedup: {len(pdf)} vectors have no "
                f"row in the caller-supplied labels frame (e.g. ids "
                f"{missing}); every non-zero-norm vector must be "
                f"labelled — a silent drop would understate the corpus"
            )
        n = len(pdf)
        if n > max_cell_rows:
            raise ValueError(
                f"embedding_semantic_dedup: cell {key[0]} holds {n} vectors "
                f"> max_cell_rows={max_cell_rows}; within-cell scoring is "
                f"O(|cell|^2) by SemDeDup semantics — increase n_cells so "
                f"cells stay bounded (or raise max_cell_rows deliberately)."
            )
        ids, mn = _normalized_matrix(pdf["id"].values, pdf["vec"])
        order = np.argsort(ids)
        ids, mn = ids[order], mn[order]
        parent = np.arange(n)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        # Row-blocked similarity: memory ~ block×n, compute the full
        # O(n^2) the semantics require. The upper-triangle mask is
        # applied vectorized BEFORE the interpreted union loop — the
        # raw nonzero yields each pair twice plus the diagonal, and
        # dup-dense cells are exactly where the loop cost concentrates.
        block = 2048
        for s in range(0, n, block):
            sims = mn[s : s + block] @ mn.T
            li, ri = np.nonzero(sims >= threshold)
            li = li + s
            upper = li < ri
            for a, b in zip(li[upper], ri[upper]):
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        roots = np.fromiter((find(i) for i in range(n)), dtype=np.int64, count=n)
        cl = ids[roots]
        return pd.DataFrame(
            {"vec_id": ids, "cluster_id": cl, "keep": ids == cl}
        )

    deduped = cells.groupBy("cell_id").applyInPandas(dedup_cell, out_schema)
    singletons = base.filter(F.col("nm") == 0).select(
        F.col("id").alias("vec_id"),
        F.col("id").alias("cluster_id"),
        F.lit(True).alias("keep"),
    )
    return deduped.unionByName(singletons)
