"""Deterministic corpus-selection operators for training-data
pipelines: hash-based train/val/test split, stratified sampling, and
fixed-token-window chunking.

These are the operators a 100 TB corpus-prep job runs after dedup and
quality filtering (BASELINE north star; siblings of text/dedup.py).
All three are pure per-row expressions — no shuffle at all for split
and sample (the assignment is a function of the row), one explode for
chunking — so they scale linearly and parallelize perfectly.

Determinism is the design center, not an accident: split/sample
membership depends ONLY on (salt, id), never on partitioning, row
order, or cluster size, so re-runs (and engines — the DuckDB oracle
mirrors the same md5 bucket) agree exactly, and a doc keeps its split
across pipeline versions. That's what `rand()`-based sampling cannot
give (Spark's `rand` is partition-seeded: any repartition reshuffles
membership).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from energydatalake_spark.text.stats import _hex15_to_long

#: Bucket granularity for split/sample fractions: 1e-4 resolution.
N_BUCKETS = 10_000


def _hash_bucket(id_col: Column, salt: str) -> Column:
    """Uniform bucket in [0, N_BUCKETS) from (salt, id) — the portable
    md5 primitive, so DuckDB derives the identical bucket."""
    return F.pmod(
        _hex15_to_long(F.md5(F.concat_ws("|", F.lit(salt), id_col.cast("string")))),
        F.lit(N_BUCKETS),
    )


def _sql_hash_key(id_expr: str, salt: str) -> str:
    """DuckDB twin of the raw 60-bit (salt, id) hash key."""
    return (
        f"(('0x' || substr(md5('{salt}' || '|' || CAST({id_expr} AS VARCHAR)), 1, 15))"
        f"::BIGINT)"
    )


def _sql_hash_bucket(id_expr: str, salt: str) -> str:
    """DuckDB twin of _hash_bucket (module-level so oracle generators
    stay in lockstep with the Spark expression)."""
    return f"({_sql_hash_key(id_expr, salt)} % {N_BUCKETS})"


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Assign every row to a named split by hash bucket. ``weights``
    maps split name → fraction (must sum to ≤ 1; any remainder falls in
    the last split). Cumulative bucket ranges follow the dict's
    insertion order, so {'train': .9, 'val': .05, 'test': .05} gives
    buckets [0,9000) / [9000,9500) / [9500,10000)."""
    total = sum(weights.values())
    if not 0 < total <= 1 + 1e-9:
        raise ValueError(f"split weights must sum to (0, 1], got {total}")
    bucket = _hash_bucket(F.col(id_col), salt)
    names = list(weights)
    edges, acc = [], 0.0
    for w in weights.values():
        acc += w
        edges.append(int(round(acc * N_BUCKETS)))
    expr: Column = F.lit(names[-1])
    # Build the when-chain from the last boundary backwards.
    for name, hi in zip(reversed(names), reversed(edges)):
        expr = F.when(bucket < hi, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Keep each row with its stratum's fraction — deterministic
    per-row hash membership, no shuffle, no sampling variance across
    re-runs. Strata missing from ``fractions`` use ``default`` (0.0 =
    drop; 1.0 = keep all)."""
    bucket = _hash_bucket(F.col(id_col), salt)
    cut: Column = F.lit(int(round(default * N_BUCKETS)))
    for stratum, frac in fractions.items():
        cut = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(frac * N_BUCKETS)))
        ).otherwise(cut)
    return df.filter(bucket < cut)


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into consecutive windows of ≤ ``max_tokens``
    whitespace tokens — the context-window chunking step before
    tokenization/packing. Output: (id, chunk_id, n_chunk_tokens,
    chunk_text). (An empty string still tokenizes to one empty token —
    identically in Spark and DuckDB — so it yields one empty chunk;
    null text yields none.)

    One generator explode per document (sequence of chunk indices →
    slice of the token array) — the token array is built once per row
    and never shuffles; downstream stages key on (id, chunk_id)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = F.ceil(n / F.lit(max_tokens)).cast("int")
    out = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    chunk = F.slice(out["_toks"], out.chunk_id * max_tokens + 1, max_tokens)
    return out.select(
        F.col(id_col),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def pack_chunks(
    df: DataFrame,
    budget: int,
    n_shards: int = 32,
    id_col: str = "doc_id",
    chunk_id_col: str = "chunk_id",
    size_col: str = "n_chunk_tokens",
) -> DataFrame:
    """Sequence packing: assign chunks to fixed-token-budget bins by
    running token count in (id, chunk_id) order — the step that turns a
    chunked corpus into dense training sequences.

    Sharded for scale: a single global running sum would serialize into
    one window partition, so packing runs independently inside
    ``pmod(id, n_shards)`` shards (one parallel window each; bins never
    cross shards). Deterministic: shard and order are pure functions of
    the row, so bin assignment survives re-runs and repartitioning.
    Bins are the half-open token intervals [k·budget, (k+1)·budget): a
    chunk straddling a boundary starts the next bin's interval rather
    than splitting — the simple deterministic packing, ≥50% fill at
    chunk sizes ≤ budget.
    """
    from pyspark.sql import Window

    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col), F.col(chunk_id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("shard", shard).withColumn(
        "_cum", F.sum(size_col).over(w)
    )
    bin_id = F.floor((F.col("_cum") - F.col(size_col)) / F.lit(budget))
    return out.select(
        F.col(id_col),
        F.col(chunk_id_col),
        F.col(size_col),
        "shard",
        bin_id.cast("bigint").alias("bin_id"),
    )


def weighted_upsample(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "lang",
    default: float = 1.0,
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Domain mixing with weights ≥ 0, including UP-sampling (the
    "high-quality source × 3" training-mix knob stratified_sample's
    filter cannot express): every row is emitted ``floor(w)`` times
    plus one more with probability ``frac(w)`` by deterministic hash —
    so the realized mix is exact in expectation and reproducible
    row-for-row. Emission is a map-side ``explode(sequence(...))``
    (generator, no shuffle); ``copy_idx`` distinguishes the copies so a
    downstream global shuffle can interleave them."""
    if any(w < 0 for w in weights.values()) or default < 0:
        raise ValueError("upsample weights must be >= 0")
    bucket = _hash_bucket(F.col(id_col), salt)

    def n_copies(w: float) -> Column:
        base = int(w)
        extra_cut = int(round((w - base) * N_BUCKETS))
        return F.lit(base) + (bucket < F.lit(extra_cut)).cast("int")

    copies: Column = n_copies(default)
    for domain, w in weights.items():
        copies = F.when(F.col(domain_col) == domain, n_copies(w)).otherwise(
            copies
        )
    return (
        df.withColumn("__n", copies)
        .filter(F.col("__n") > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__n")
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int = 64,
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Deterministic global shuffle for training order: a portable
    md5 sort key decorrelates row order from ingest order, ``shard``
    (key mod n_shards) names the output file, and ``shard_pos`` is the
    row's position within its shard — so a trainer reads shards in
    order and sees a reproducible, ingest-independent permutation.
    One range-free shuffle (the per-shard window); re-salting yields a
    fresh epoch permutation without touching the data."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from pyspark.sql import Window

    key = _hex15_to_long(
        F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    )
    w = Window.partitionBy("shard").orderBy("sort_key", id_col)
    return (
        df.withColumn("sort_key", key)
        .withColumn("shard", F.pmod(F.col("sort_key"), F.lit(n_shards)).cast("int"))
        .withColumn("shard_pos", F.row_number().over(w).cast("bigint"))
    )


def cap_per_domain(
    df: DataFrame,
    cap: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Deterministic per-domain document cap — the crawl-pipeline
    downsampler that stops one over-represented domain from dominating
    the mix: within each domain, rank documents by the portable
    (salt, id) hash (a frozen uniform-random order — changing ``salt``
    redraws it) and keep rank ≤ ``cap``. Emits every row with its
    ``cap_rank`` and ``kept`` flag so callers can audit what a cap
    value would drop before applying it.

    Scale shape: one shuffle on the domain key; the rank ≤ cap filter
    is a top-k per group, which Spark executes as WindowGroupLimit
    (per-partition heap of ``cap`` rows, map-side, then final per-group
    limit) when the caller filters ``kept`` — no full per-domain sort
    materializes. Deterministic and partition-invariant: the hash
    order is a pure function of (salt, id).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(domain_col).orderBy(
        _hex15_to_long(
            F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
        ),
        F.col(id_col),
    )
    return df.withColumn("cap_rank", F.row_number().over(w)).withColumn(
        "kept", F.col("cap_rank") <= cap
    )


def sql_cap_per_domain(
    cap: int,
    domain_expr: str = "source",
    id_expr: str = "doc_id",
    salt: str = "v1",
) -> str:
    """DuckDB twin of ``cap_per_domain`` over the documents view."""
    return f"""
SELECT doc_id, {domain_expr} AS domain,
       ROW_NUMBER() OVER (
         PARTITION BY {domain_expr}
         ORDER BY {_sql_hash_key(id_expr, salt)}, {id_expr}
       ) AS cap_rank,
       ROW_NUMBER() OVER (
         PARTITION BY {domain_expr}
         ORDER BY {_sql_hash_key(id_expr, salt)}, {id_expr}
       ) <= {cap} AS kept
FROM documents
"""
