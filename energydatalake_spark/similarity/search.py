"""Embedding similarity search over ``array<float>`` columns.

Two paths, per the standard ANN playbook:

- ``cosine_topk`` — exact brute force: broadcast the (small) query set,
  score every corpus vector with JVM-side ``zip_with``/``aggregate``
  (no Python, no UDF), rank per query with a window. At 100 TB this is
  the per-partition scoring primitive; wall-clock scales with corpus ×
  queries, so it's the baseline and the rerank stage.
- ``lsh_topk`` — random-hyperplane LSH: H deterministic hyperplanes
  (seeded, driver-generated literals) → sign bits → bucket key; probe
  joins only same-bucket vectors, then exact-cosine rerank. Sub-linear
  candidate sets at the cost of recall; multi-probe (Hamming-1 buckets)
  recovers most of it.

Norms are precomputed once per side (``with_norm``) rather than inside
the pair loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from energydatalake_spark.portable import cached_expr


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _py_norm(vec: list[float]) -> float:
    """Driver-side vector norm with the same op sequence as
    ``sqrt(dot(v, v))`` in-engine: sequential fold of products, then
    IEEE sqrt — bit-identical to the engine's value."""
    import math

    acc = 0.0
    for x in vec:
        acc += x * x
    return math.sqrt(acc)


def _sql_double(x: float) -> str:
    """Shortest round-trip SQL double literal. Python ``repr`` emits
    the shortest decimal that round-trips to the same IEEE double, and
    the JVM parser is correctly rounded, so the parsed value is
    bit-identical to what ``F.lit`` would ship."""
    v = float(x)
    if v != v or v in (float("inf"), float("-inf")):
        raise ValueError(f"non-finite literal not supported: {x!r}")
    return repr(v) + "D"


def lit_double_array(xs: list[float]) -> Column:
    """``array<double>`` literal in ONE py4j round trip (``F.expr``
    over a rendered SQL array) instead of one JVM call per element:
    ``F.lit`` on a Python list builds element-wise ``lit`` columns, so
    a dim-64 codebook costs ~1k driver round trips (~0.5-0.8 s per
    call, measured this round) while the rendered form parses in
    single-digit ms. The parsed CreateArray of foldable literals
    constant-folds to the identical array Literal the element-wise
    form produces — same values, same plan after optimization."""
    if not xs:
        return cached_expr("CAST(array() AS array<double>)")
    return cached_expr("array(" + ",".join(_sql_double(x) for x in xs) + ")")


def lit_double_matrix(rows: list[list[float]]) -> Column:
    """``array<array<double>>`` literal, one py4j call (see
    :func:`lit_double_array`)."""
    if not rows:
        return cached_expr("CAST(array() AS array<array<double>>)")
    return cached_expr(
        "array("
        + ",".join(
            "array(" + ",".join(_sql_double(x) for x in r) + ")" for r in rows
        )
        + ")"
    )


def lit_int_array(xs: list[int]) -> Column:
    """``array<int>`` literal, one py4j call (values above int range
    coerce the array to bigint — the same inference ``F.lit`` applies
    element-wise)."""
    if not xs:
        return cached_expr("CAST(array() AS array<int>)")
    return cached_expr("array(" + ",".join(str(int(x)) for x in xs) + ")")


def _codebook_literal(cents: list[tuple[int, list[float]]]) -> Column:
    """The model-sized codebook as an array of (cell_id, cv, cnm)
    structs, ascending cell_id — it rides into the plan like any
    broadcast model. Built from THREE nested-list Literal nodes zipped
    together, not n_cells struct expressions: a per-cell expression
    tree costs the analyzer ~1 s per k-means iteration at n_cells=16,
    dim=64; three Literals are effectively free. The literals
    themselves render through the one-call ``lit_*`` helpers — the
    element-wise ``F.lit`` form spent ~0.8 s of py4j time per call
    (r19 optimization round, guide §7.3 driver-side work)."""
    ids = lit_int_array([cid for cid, _ in cents])
    vecs = lit_double_matrix([cv for _, cv in cents])
    norms = lit_double_array([_py_norm(cv) for _, cv in cents])
    return F.zip_with(
        ids,
        F.zip_with(
            vecs,
            norms,
            lambda v, n: F.struct(v.alias("cv"), n.alias("cnm")),
        ),
        lambda i, s: F.struct(
            i.alias("cell_id"), s["cv"].alias("cv"), s["cnm"].alias("cnm")
        ),
    )


def _cell_cosine_array(codebook: Column, vec: Column, norm: Column) -> Column:
    """array<struct<cos,cell_id>> of per-cell cosines, ascending
    cell_id. The cosine expression appears ONCE, inside the transform
    lambda — not inlined per cell — keeping the analyzed tree small."""
    return F.transform(
        codebook,
        lambda s: F.struct(
            (dot(vec, s["cv"]) / (norm * s["cnm"])).alias("cos"),
            s["cell_id"].alias("cell_id"),
        ),
    )


def _argmax_cell(codebook: Column, vec: Column, norm: Column) -> Column:
    """Map-side nearest-cell argmax: strict > keeps the FIRST max in
    ascending cell_id order — the desc-cos/asc-cell tie-break of a
    row_number window, with no shuffle."""
    return F.aggregate(
        _cell_cosine_array(codebook, vec, norm),
        F.struct(
            F.lit(float("-inf")).alias("cos"),
            F.lit(-1).cast("bigint").alias("cell_id"),
        ),
        lambda acc, x: F.when(x["cos"] > acc["cos"], x).otherwise(acc),
    )["cell_id"]


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_norm(
    df: DataFrame, vec_col: str = "embedding", norm_col: str = "norm"
) -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.withColumn(vec_col, v).withColumn(norm_col, F.sqrt(dot(v, v)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, cosine, rank), rank 1..k
    per query, ties broken by corpus id. ``queries`` carries
    ``query_id_col`` + ``vec_col``; self-matches (same id) are excluded."""
    c = with_norm(corpus, vec_col, "c_norm").select(
        F.col(id_col), F.col(vec_col).alias("c_vec"), F.col("c_norm")
    )
    q = with_norm(queries, vec_col, "q_norm").select(
        F.col(query_id_col), F.col(vec_col).alias("q_vec"), F.col("q_norm")
    )
    pairs = c.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col))
    cos = (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))).alias(
        "cosine"
    )
    scored = pairs.select(F.col(query_id_col), F.col(id_col), cos)
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.col("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    centroids: DataFrame | list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize the corpus into cells,
    probe each query's n_probe nearest cells, exact-rerank inside them.

    ``centroids`` defaults to the first ``n_cells`` corpus vectors by id
    — a deterministic stand-in for a k-means codebook (swap in trained
    centroids without touching the flow).

    Scale shape: the codebook is MODEL-sized by construction (n_cells ×
    dim doubles, a few KB), so it is collected once and rides into the
    plan as literals. Cell assignment and query probing are then pure
    map-side expressions — an ``aggregate`` argmax fold over the
    per-cell cosine array — so the corpus is never shuffled, duplicated
    or nested-loop-joined (the previous shape cross-joined corpus ×
    centroids and re-sorted all n_cells copies by id through an
    Exchange). The only remaining shuffle is the per-query rerank
    window over the candidate set (~n_probe/n_cells of the corpus) —
    the classic IVF sub-linear probe. Everything stays JVM-side
    (``aggregate``/``zip_with`` folds + one window), no Python in the
    path.
    """
    from pyspark.sql import Window

    c = with_norm(corpus, vec_col, "c_norm").select(
        F.col(id_col), F.col(vec_col).alias("c_vec"), F.col("c_norm")
    )
    codebook = _collect_codebook(
        corpus, centroids, n_cells, vec_col, id_col, "ivf_topk"
    )

    assigned = c.withColumn(
        "cell_id", _argmax_cell(codebook, F.col("c_vec"), F.col("c_norm"))
    )
    q = with_norm(queries, vec_col, "q_norm").select(
        F.col(query_id_col), F.col(vec_col).alias("q_vec"), F.col("q_norm")
    )
    # Map-side probe selection: sort the per-cell cosine array (desc
    # cos, asc cell_id — the former window's order), slice n_probe,
    # explode.
    probe_sorted = F.array_sort(
        _cell_cosine_array(codebook, F.col("q_vec"), F.col("q_norm")),
        lambda a, b: F.when(a["cos"] > b["cos"], F.lit(-1))
        .when(a["cos"] < b["cos"], F.lit(1))
        .when(a["cell_id"] < b["cell_id"], F.lit(-1))
        .when(a["cell_id"] > b["cell_id"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    probes = q.withColumn(
        "cell_id", F.explode(F.slice(probe_sorted, 1, n_probe)["cell_id"])
    ).select(F.col(query_id_col), F.col("q_vec"), F.col("q_norm"), F.col("cell_id"))
    pairs = assigned.join(F.broadcast(probes), "cell_id").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    cos = (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))).alias(
        "cosine"
    )
    scored = pairs.select(F.col(query_id_col), F.col(id_col), cos)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.col("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _collect_codebook_rows(
    corpus: DataFrame,
    centroids: DataFrame | list[tuple[int, list[float]]] | None,
    n_cells: int,
    vec_col: str,
    id_col: str,
    caller: str,
) -> list[tuple[int, list[float]]]:
    """Shared codebook construction for IVF search and cell
    assignment: default centroids = first ``n_cells`` corpus vectors
    by id (deterministic for ANY id space), model-sized collect,
    sorted ascending cell_id. One home so the centroid convention can
    never desynchronize between consumers.

    ``centroids`` may be the already-collected ``kmeans_centroids``
    output (a list of (cell_id, vec) tuples): the trainer returns
    driver-side rows, and shipping them through a createDataFrame +
    collect round trip just to get the same rows back cost ~0.5 s of
    jobs per consuming query (r19 optimization round)."""
    if isinstance(centroids, list):
        if not centroids:
            raise ValueError(f"{caller}: empty centroid set")
        return sorted(
            (int(cid), [float(x) for x in cv]) for cid, cv in centroids
        )
    if centroids is None:
        centroids = corpus.orderBy(F.col(id_col)).limit(n_cells)
    cent_rows = centroids.select(
        # bigint: default centroids are corpus vectors, and the
        # corpus id space is 64-bit ("ANY id space") — an int cast
        # raises CAST_OVERFLOW under ANSI for ids above 2^31.
        F.col(id_col).cast("bigint").alias("cell_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).collect()
    if not cent_rows:
        raise ValueError(f"{caller}: empty centroid set")
    return sorted((r.cell_id, list(r.cv)) for r in cent_rows)


def _collect_codebook(
    corpus: DataFrame,
    centroids: DataFrame | list[tuple[int, list[float]]] | None,
    n_cells: int,
    vec_col: str,
    id_col: str,
    caller: str,
) -> Column:
    """:func:`_collect_codebook_rows` as the plan-literal codebook
    column (the form the Catalyst argmax fold consumes)."""
    return _codebook_literal(
        _collect_codebook_rows(corpus, centroids, n_cells, vec_col, id_col, caller)
    )


def assign_cells(
    corpus: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Coarse-quantize every corpus vector to its nearest codebook
    cell — the shared front half of IVF search and of embedding-space
    corpus clustering (per-cluster stats, cluster-balanced sampling).
    Returns (id_col, cell_id, norm).

    ``centroids`` defaults to the first ``n_cells`` corpus vectors by
    id (the same deterministic stand-in ``ivf_topk`` uses; pass
    ``kmeans_centroids`` output for a trained codebook). The codebook
    is model-sized and rides into the plan as literals, so assignment
    is a pure map-side argmax fold — ZERO shuffles, the corpus is
    never duplicated, and the op scales linearly to any corpus size.
    """
    c = with_norm(corpus, vec_col, "c_norm").select(
        F.col(id_col), F.col(vec_col).alias("c_vec"), F.col("c_norm")
    )
    codebook = _collect_codebook(
        corpus, centroids, n_cells, vec_col, id_col, "assign_cells"
    )
    # Zero-norm vectors have no direction, so cosine assignment is
    # undefined (the argmax fold would emit its -1 sentinel while a
    # NULL-ordering SQL replay lands elsewhere) — excluded, documented.
    return c.filter(F.col("c_norm") > 0).select(
        F.col(id_col),
        _argmax_cell(codebook, F.col("c_vec"), F.col("c_norm")).alias("cell_id"),
        F.col("c_norm").alias("norm"),
    )


# Knuth multiplicative-hash constant. The training sample predicate is
# deliberately plain 64-bit integer arithmetic (no engine hash builtin)
# so the EXACT same row set is selected by Spark and by any ANSI-SQL
# oracle replaying the trajectory.
_KNUTH = 2654435761


def train_sample_predicate(id_col: Column, sample_mod: int) -> Column:
    """Deterministic, engine-portable 1/sample_mod row sample:
    multiplicative-hash the id and keep the hashes below
    2^32/sample_mod. The range test reads the hash's HIGH bits (where
    a multiplicative hash mixes well) — a residue test would collapse
    to ``id % mod`` for power-of-two mods. Bounded so the intermediate
    product never overflows signed 64-bit."""
    h = ((id_col.cast("bigint") % F.lit(2147483648)) * F.lit(_KNUTH)) % F.lit(
        4294967296
    )
    return h < F.lit(4294967296 // sample_mod)


def train_sample_sql(id_expr: str, sample_mod: int) -> str:
    """ANSI-SQL twin of :func:`train_sample_predicate`."""
    return (
        f"(({id_expr} % 2147483648) * {_KNUTH}) % 4294967296 "
        f"< {4294967296 // sample_mod}"
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 9,
    train_sample_mod: int | None = None,
) -> list[tuple[int, list[float]]]:
    """Distributed spherical k-means (Lloyd iterations) for the IVF
    codebook — the iterative-algorithm pattern done Spark-style: the
    DATA never leaves executors (assignment is a broadcast-literal
    cross + argmax, the update is a posexplode → per-(cell, dim)
    aggregate); only the MODEL (n_cells × dim doubles, a few KB)
    returns to the driver each iteration, exactly like MLlib's
    broadcast-model loop. Plans stay flat: each iteration's centroids
    are literals, so iteration N does not drag N-1 plans behind it.

    ``train_sample_mod`` bounds training cost: when set (> 1), Lloyd
    runs on the deterministic 1/mod hash-sample from
    :func:`train_sample_predicate` instead of the full corpus — a
    codebook is a summary statistic, a bounded sample trains it equally
    well, and at 100 TB this makes training cost independent of corpus
    size (pick mod so the sample lands ~1M vectors). The sampled frame
    is persisted across iterations, so training reads the corpus ONCE
    instead of once per iteration.

    Determinism (the property that makes a cross-engine oracle
    possible): the sample predicate is pure integer arithmetic (same
    rows in any engine); initial centroids are the ``n_cells``
    lowest-id sampled vectors; assignment ties break on cell_id; the
    per-dimension mean is an EXACT decimal(38,28) sum divided by the
    count, then snapped to a 1e-{round_digits} grid with the portable
    floor-round — so both engines walk the identical centroid
    trajectory and empty cells die identically (standard Lloyd).

    Returns the trained codebook as plain Python rows (cell_id, vec) —
    callers hand it to :func:`ivf_topk` via ``spark.createDataFrame``.
    """
    spark = corpus.sparkSession
    p = float(10**round_digits)
    v = corpus.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("nm", F.sqrt(dot(F.col("v"), F.col("v"))))
    if train_sample_mod is not None and train_sample_mod > 1:
        v = v.filter(train_sample_predicate(F.col(id_col), train_sample_mod))
    v = v.persist()
    init = (
        v.orderBy(F.col(id_col)).limit(n_cells).select(
            F.col(id_col).cast("int").alias("cell_id"), F.col("v")
        )
    ).collect()
    if len(init) < n_cells:
        v.unpersist()
        raise ValueError(
            f"k-means training input has only {len(init)} vectors for "
            f"n_cells={n_cells}; lower train_sample_mod "
            f"({train_sample_mod}) or n_cells"
        )
    cents: list[tuple[int, list[float]]] = [
        (r.cell_id, list(r.v)) for r in init
    ]
    # The only shuffle per iteration is the (cell, dim)-keyed mean —
    # model-bounded cardinality (n_cells × dim groups), so scope the
    # shuffle width down for the training loop instead of paying
    # n_iter × full-width task scheduling on a few hundred groups. The
    # result is partitioning-invariant (pytest-pinned), this only
    # trims per-iteration overhead.
    conf_key = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "8")
    try:
        cents = _lloyd_iterations(v, cents, n_iter, p)
    finally:
        spark.conf.set(conf_key, prev_parts)
    v.unpersist()
    return cents


def _lloyd_iterations(
    v: DataFrame,
    cents: list[tuple[int, list[float]]],
    n_iter: int,
    p: float,
) -> list[tuple[int, list[float]]]:
    for _ in range(n_iter):
        # Map-side assignment over the literal codebook (shared with
        # ivf_topk): per-row argmax, NO cross-join and NO per-iteration
        # shuffle of the training vectors — the only shuffle left in an
        # iteration is the (cell, dim)-keyed mean aggregate, whose
        # cardinality is the model size, not the data size.
        assigned = v.select(
            _argmax_cell(
                _codebook_literal(cents), F.col("v"), F.col("nm")
            ).alias("cell_id"),
            F.col("v"),
        )
        means = (
            assigned.select(F.col("cell_id"), F.posexplode(F.col("v")))
            .groupBy("cell_id", "pos")
            .agg(
                (
                    F.sum(F.col("col").cast("decimal(38,28)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .withColumn("m", F.floor(F.col("m") * F.lit(p) + F.lit(0.5)) / F.lit(p))
        )
        # The (cell, dim) means are final after the grid snap; the old
        # second groupBy existed only to reassemble them into per-cell
        # arrays — one more exchange + AQE stage per iteration for a
        # model-sized reshape (r19 optimization round: ~0.2 s of the
        # ~0.55 s iteration cost). Collect the n_cells × dim rows
        # (model-sized by construction) and assemble on the driver:
        # same values, same (pos-ascending, cell-ascending) order.
        by_cell: dict[int, list[tuple[int, float]]] = {}
        for r in means.collect():
            by_cell.setdefault(r.cell_id, []).append((r.pos, r.m))
        cents = sorted(
            (cid, [m for _, m in sorted(pm)]) for cid, pm in by_cell.items()
        )
    return cents


def kmeans_centroids_np(
    corpus: DataFrame,
    n_cells: int,
    n_iter: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 9,
    train_sample_mod: int | None = None,
    train_max_rows: int = 131_072,
) -> list[tuple[int, list[float]]]:
    """Bounded-sample NumPy Lloyd — the large-codebook twin of
    :func:`kmeans_centroids`. The distributed trainer's assignment is
    a Catalyst higher-order-function fold, evaluated per array element
    (not codegen'd): at n_cells in the hundreds that is
    O(rows × n_cells × dim) interpreter steps — slower than the
    quadratic it exists to fix. A codebook is a summary statistic, so
    above the oracle tier we train it on the deterministic
    ``train_sample_predicate`` hash-sample collected to the driver and
    run Lloyd in BLAS. This is a GATED bounded collect (the
    ≤``train_max_rows`` refusal below, same discipline as the
    union-find small-graph tier in operators/graph.py): callers size
    ``train_sample_mod`` so the expected sample is a few × n_cells,
    and at 100 TB the sample stays model-scale while the corpus never
    moves. Beyond ~10⁷-cell codebooks (SemDeDup at web scale trains
    50k-100k cells over ~1M samples — still fine here) the next tier
    is an externally trained codebook passed straight into the
    ``centroids`` parameter of the consuming operator.

    Deterministic: integer-arithmetic sample, init = ``n_cells``
    lowest-id sampled vectors (cell_id = vector id, as the distributed
    trainer), first-max argmax ties (ascending cell_id), sequential
    ``np.add.at`` accumulation, means snapped to the same
    1e-``round_digits`` grid, empty cells die. NOT bit-identical to
    the decimal-sum distributed trajectory — use only beyond the
    static-mirror oracle bound.
    """
    import numpy as np

    p = float(10**round_digits)
    v = corpus.select(F.col(id_col).cast("long").alias("id"),
                      _as_double(F.col(vec_col)).alias("v"))
    if train_sample_mod is not None and train_sample_mod > 1:
        v = v.filter(train_sample_predicate(F.col("id"), train_sample_mod))
    rows = v.collect()
    if len(rows) > train_max_rows:
        raise ValueError(
            f"kmeans_centroids_np: sample of {len(rows)} rows exceeds "
            f"train_max_rows={train_max_rows}; raise train_sample_mod so "
            f"the driver-side training collect stays model-sized."
        )
    if len(rows) < n_cells:
        raise ValueError(
            f"k-means training sample has only {len(rows)} vectors for "
            f"n_cells={n_cells}; lower train_sample_mod "
            f"({train_sample_mod}) or n_cells"
        )
    rows.sort(key=lambda r: r.id)
    ids = np.array([r.id for r in rows], dtype=np.int64)
    mat = np.array([list(r.v) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    mn = mat / norms[:, None]
    cent_ids = ids[:n_cells].astype(np.int64)
    cents = mat[:n_cells].copy()
    for _ in range(n_iter):
        cn = np.linalg.norm(cents, axis=1)
        cn[cn == 0.0] = 1.0
        assign = np.argmax(mn @ (cents / cn[:, None]).T, axis=1)
        k = len(cents)
        sums = np.zeros((k, mat.shape[1]))
        np.add.at(sums, assign, mat)
        counts = np.bincount(assign, minlength=k)
        live = counts > 0
        means = sums[live] / counts[live, None]
        cents = np.floor(means * p + 0.5) / p
        cent_ids = cent_ids[live]
        order = np.argsort(cent_ids)
        cent_ids, cents = cent_ids[order], cents[order]
    return [(int(c), [float(x) for x in vec]) for c, vec in zip(cent_ids, cents)]


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side literals —
    tiny: n_planes × dim doubles, broadcast with the plan)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _bucket(vec: str, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket key over the named vector column, rendered as
    ONE SQL expression: the Column form spent ~0.3 s of py4j time per
    call (each higher-order zip_with/aggregate wrapper is several JVM
    round trips, × n_planes) — same fold, same all-BIGINT bit packing,
    same values (r19 optimization round)."""
    col = "`" + vec.replace("`", "``") + "`"

    def dot_sql(p: list[float]) -> str:
        arr = "array(" + ",".join(_sql_double(x) for x in p) + ")"
        return (
            f"aggregate(zip_with({col}, {arr}, (x, y) -> x * y), "
            "0.0D, (acc, x) -> acc + x)"
        )

    terms = " + ".join(
        f"(CASE WHEN {dot_sql(p)} >= 0 THEN {1 << i}L ELSE 0L END)"
        for i, p in enumerate(planes)
    )
    return cached_expr(f"CAST(0 AS BIGINT) + {terms}")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: sign-LSH bucketing + exact rerank inside the
    probed buckets. ``multiprobe`` additionally probes all Hamming-1
    neighbor buckets of each query (n_planes extra probes) — standard
    recall recovery."""
    planes = _hyperplanes(dim, n_planes)
    c = with_norm(corpus, vec_col, "c_norm").select(
        F.col(id_col),
        F.col(vec_col).alias("c_vec"),
        F.col("c_norm"),
        _bucket(vec_col, planes).alias("bucket"),
    )
    q = with_norm(queries, vec_col, "q_norm").select(
        F.col(query_id_col),
        F.col(vec_col).alias("q_vec"),
        F.col("q_norm"),
        _bucket(vec_col, planes).alias("q_bucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("q_bucket"),
            *[
                F.col("q_bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(n_planes)
            ],
        )
        q = q.withColumn("bucket", F.explode(probes))
    else:
        q = q.withColumn("bucket", F.col("q_bucket"))
    pairs = c.join(F.broadcast(q.drop("q_bucket")), "bucket").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    cos = (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))).alias(
        "cosine"
    )
    scored = pairs.select(F.col(query_id_col), F.col(id_col), cos).dropDuplicates(
        [query_id_col, id_col]
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.col("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization, returned DEQUANTIZED:
    each component maps to its nearest point on the 255-level grid
    ``{-127..127}·(amax/127)`` — the memory layout that shrinks a
    100 TB float32 corpus index 4× (store int8 + one float scale per
    vector; this operator materializes the value the int8 index would
    reproduce, so downstream cosine math needs no new code path).
    Zero vectors pass through unchanged (no 0·inf NaN).

    Pure per-row expressions: amax is a max-fold (order-independent),
    the grid round uses the portable floor(x+0.5) idiom, so the grid
    is bit-identical across engines."""
    v = _as_double(F.col(vec_col))
    amax = F.aggregate(
        v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))
    )
    deq = F.when(amax == 0.0, v).otherwise(
        F.transform(
            v,
            lambda x: F.least(
                F.greatest(
                    F.floor(x * (F.lit(127.0) / amax) + F.lit(0.5)).cast(
                        "double"
                    ),
                    F.lit(-127.0),
                ),
                F.lit(127.0),
            )
            / (F.lit(127.0) / amax),
        )
    )
    return df.select(F.col(id_col), deq.alias(vec_col))
