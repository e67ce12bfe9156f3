"""Embedding-cosine near-duplicate detection (the vector-space member
of the dedup family: exact / minhash / simhash / ngram — see
``energydatalake_spark.text.dedup`` — plus this one).

Semantics: all pairs (id_a < id_b) whose cosine similarity ≥ threshold.

Scale design: the corpus matrix is L2-normalized once and broadcast;
scoring is a blocked matrix product inside ``mapInPandas`` (Arrow in,
NumPy BLAS per block, Arrow out) — each task scores its partition's
rows against the broadcast matrix without shuffling vectors. This is
the same shape as a broadcast hash join: it holds while one side fits
in executor memory (~10M × 64-dim float32 ≈ 2.5 GB). Beyond that,
compose with an LSH/IVF pre-filter (``lsh_topk`` buckets or
``ivf_assign``) so each block only scores same-bucket candidates —
the O(n²) term is the algorithm, not this implementation.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

PAIR_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ]
)


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
) -> DataFrame:
    """Exact cosine near-dup pairs: (id_a, id_b, cosine), id_a < id_b,
    cosine ≥ threshold. Deterministic output (float64 throughout)."""
    collected = df.select(id_col, vec_col).collect()
    ids_all, mat = _normalized_matrix(
        [r[0] for r in collected], [r[1] for r in collected]
    )
    bc = df.sparkSession.sparkContext.broadcast((ids_all, mat))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat = bc.value
        for pdf in batches:
            if len(pdf) == 0 or len(all_ids) == 0:
                continue
            ids, block = _normalized_matrix(pdf[id_col].values, pdf[vec_col])
            sims = block @ all_mat.T  # (batch, corpus)
            # Upper triangle only: candidate must have a larger id.
            keep = (sims >= threshold) & (all_ids[None, :] > ids[:, None])
            li, ri = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "id_a": ids[li],
                    "id_b": all_ids[ri],
                    "cosine": sims[li, ri],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(score, PAIR_SCHEMA)
