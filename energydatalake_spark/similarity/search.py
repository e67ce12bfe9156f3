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


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


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
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize the corpus into cells,
    probe each query's n_probe nearest cells, exact-rerank inside them.

    ``centroids`` defaults to the first ``n_cells`` corpus vectors by id
    — a deterministic stand-in for a k-means codebook (swap in trained
    centroids without touching the flow). Scale shape: the centroid set
    is broadcast (tiny), cell assignment is a map-side argmax (no
    shuffle of the corpus beyond the final cell-id equi-join), and the
    candidate join fans each query out to n_probe/n_cells of the corpus
    — the classic IVF sub-linear probe. Everything is JVM-side
    (``aggregate``/``zip_with`` folds + windows), no Python in the path.
    """
    from pyspark.sql import Window

    c = with_norm(corpus, vec_col, "c_norm").select(
        F.col(id_col), F.col(vec_col).alias("c_vec"), F.col("c_norm")
    )
    if centroids is None:
        # First n_cells vectors by id — deterministic for ANY id space
        # (dense, sparse, hashed), not just 0-based.
        centroids = corpus.orderBy(F.col(id_col)).limit(n_cells)
    cent = with_norm(centroids, vec_col, "k_norm").select(
        F.col(id_col).alias("cell_id"),
        F.col(vec_col).alias("k_vec"),
        F.col("k_norm"),
    )
    cent_cos = dot(F.col("c_vec"), F.col("k_vec")) / (F.col("c_norm") * F.col("k_norm"))
    w_assign = Window.partitionBy(id_col).orderBy(
        F.desc("cent_cos"), F.asc("cell_id")
    )
    assigned = (
        c.join(F.broadcast(cent), how="cross")
        .withColumn("cent_cos", cent_cos)
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), F.col("c_vec"), F.col("c_norm"), F.col("cell_id"))
    )
    q = with_norm(queries, vec_col, "q_norm").select(
        F.col(query_id_col), F.col(vec_col).alias("q_vec"), F.col("q_norm")
    )
    probe_cos = dot(F.col("q_vec"), F.col("k_vec")) / (F.col("q_norm") * F.col("k_norm"))
    w_probe = Window.partitionBy(query_id_col).orderBy(
        F.desc("probe_cos"), F.asc("cell_id")
    )
    probes = (
        q.join(F.broadcast(cent), how="cross")
        .withColumn("probe_cos", probe_cos)
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= n_probe)
        .select(F.col(query_id_col), F.col("q_vec"), F.col("q_norm"), F.col("cell_id"))
    )
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


def kmeans_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 9,
) -> list[tuple[int, list[float]]]:
    """Distributed spherical k-means (Lloyd iterations) for the IVF
    codebook — the iterative-algorithm pattern done Spark-style: the
    DATA never leaves executors (assignment is a broadcast-literal
    cross + argmax, the update is a posexplode → per-(cell, dim)
    aggregate); only the MODEL (n_cells × dim doubles, a few KB)
    returns to the driver each iteration, exactly like MLlib's
    broadcast-model loop. Plans stay flat: each iteration's centroids
    are literals, so iteration N does not drag N-1 plans behind it.

    Determinism (the property that makes a cross-engine oracle
    possible): initial centroids are the ``n_cells`` lowest-id vectors;
    assignment ties break on cell_id; the per-dimension mean is an
    EXACT decimal(38,28) sum divided by the count, then snapped to a
    1e-{round_digits} grid with the portable floor-round — so both
    engines walk the identical centroid trajectory and empty cells die
    identically (standard Lloyd).

    Returns the trained codebook as plain Python rows (cell_id, vec) —
    callers hand it to :func:`ivf_topk` via ``spark.createDataFrame``.
    """
    spark = corpus.sparkSession
    from pyspark.sql import Window

    p = float(10**round_digits)
    v = corpus.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("nm", F.sqrt(dot(F.col("v"), F.col("v"))))
    init = (
        v.orderBy(F.col(id_col)).limit(n_cells).select(
            F.col(id_col).cast("int").alias("cell_id"), F.col("v")
        )
    ).collect()
    cents: list[tuple[int, list[float]]] = [
        (r.cell_id, list(r.v)) for r in init
    ]
    for _ in range(n_iter):
        # Model → DataFrame → broadcast: one Arrow batch instead of
        # n_cells × dim py4j literal calls (measured: literals cost
        # ~10 s/iteration in plan construction alone).
        cent_df = spark.createDataFrame(
            [(cid, vec) for cid, vec in cents], "cell_id int, cv array<double>"
        ).withColumn("cnm", F.sqrt(dot(F.col("cv"), F.col("cv"))))
        ex = v.crossJoin(F.broadcast(cent_df))
        cos = dot(F.col("v"), F.col("cv")) / (F.col("nm") * F.col("cnm"))
        w = Window.partitionBy(id_col).orderBy(F.desc("cos"), F.asc("cell_id"))
        assigned = (
            ex.withColumn("cos", cos)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("cell_id"), F.col("v"))
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
            .groupBy("cell_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
        )
        cents = sorted(
            ((r.cell_id, list(r.cv)) for r in means.collect()),
            key=lambda t: t[0],
        )
    return cents


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side literals —
    tiny: n_planes × dim doubles, broadcast with the plan)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _bucket(vec: Column, planes: list[list[float]]) -> Column:
    bits = [
        F.when(dot(vec, F.array(*[F.lit(x) for x in p])) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        for p in planes
    ]
    key: Column = F.lit(0).cast("bigint")
    for i, b in enumerate(bits):
        key = key + (b.cast("bigint") * F.lit(1 << i))
    return key


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
        _bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = with_norm(queries, vec_col, "q_norm").select(
        F.col(query_id_col),
        F.col(vec_col).alias("q_vec"),
        F.col("q_norm"),
        _bucket(F.col(vec_col), planes).alias("q_bucket"),
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
