"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media travel as opaque ``binary`` columns plus a typed metadata struct
— the lakehouse-standard layout (content-addressed bytes + queryable
metadata). All heavy per-item work runs through ``mapInPandas``:
Arrow-batched, executor-side, schema-stable — the Spark mechanics are
real and tested; only the codec itself is stubbed because this image
lacks PIL/ffmpeg (imports are try-gated; with the libs installed the
same operators run real decodes).

The deterministic fake decode derives pseudo-features from the bytes'
md5, so tests can assert exact values and partition-count invariance.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real codec path — not present in this image
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("sha_prefix", T.StringType()),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, mime: str = "image/png") -> DataFrame:
    """Deterministic synthetic media: content bytes derived from the id
    (md5-seeded), metadata struct populated. Stand-in for a real binary
    ingest (e.g. parquet with a bytes column or a manifest of files)."""
    seed = F.md5(F.col(id_col).cast("string"))
    content = F.encode(F.concat(F.lit("MEDIA:"), seed, F.lit(":"), seed), "utf-8")
    w = (F.abs(F.hash(F.col(id_col))) % 1920 + 1).cast("int")
    h = (F.abs(F.hash(F.col(id_col), F.lit(1))) % 1080 + 1).cast("int")
    meta = F.struct(
        F.lit(mime).alias("mime"),
        w.alias("width"),
        h.alias("height"),
        F.lit(1).cast("int").alias("n_frames"),
    )
    return df.withColumn("content", content).withColumn("meta", meta)


def _fake_decode(content: bytes) -> tuple[int, int, float, str]:
    """Codec stub: md5-derived pseudo width/height/mean-luma. Replace
    with PIL decode when HAVE_PIL (kept deliberately isomorphic: same
    outputs schema, same determinism contract)."""
    d = hashlib.md5(content).digest()
    width = int.from_bytes(d[0:2], "big") % 1920 + 1
    height = int.from_bytes(d[2:4], "big") % 1080 + 1
    mean_luma = int.from_bytes(d[4:6], "big") / 65535.0
    return width, height, mean_luma, d.hex()[:8]


def decode_media(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    meta_col: str = "meta",
) -> DataFrame:
    """Decode pass: binary → (dimensions, mean luma, content hash).

    ``mapInPandas`` so each Arrow batch is decoded in one Python call;
    output schema is fixed (DECODE_SCHEMA) regardless of codec path.
    Raises NotImplementedError from the executors if a real decode is
    requested without the codec library.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if HAVE_PIL:  # pragma: no cover - real path needs PIL
                raise NotImplementedError(
                    "real PIL decode not wired in this environment"
                )
            rows = [_fake_decode(c) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "mime": [m["mime"] for m in pdf[meta_col]],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "mean_luma": [r[2] for r in rows],
                    "sha_prefix": [r[3] for r in rows],
                }
            )

    return df.mapInPandas(run, DECODE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n: int = 2,
    max_frames: int = 4,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Frame sampling (video → rows of frames): 1→N row expansion inside
    mapInPandas. The stub derives per-frame bytes deterministically; a
    real implementation swaps the inner loop for an ffmpeg seek."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_bytes = [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                for k in range(0, max_frames * every_n, every_n):
                    out_ids.append(mid)
                    out_idx.append(k)
                    out_bytes.append(
                        # ASCII frame-index suffix: deterministic AND
                        # reproducible by the SQL oracle (md5 over text
                        # in both engines; a binary suffix would need a
                        # blob-md5 DuckDB lacks).
                        hashlib.md5(bytes(content) + b":" + str(k).encode()).digest()
                    )
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_bytes": out_bytes}
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


EMBED_DIM = 16


def media_embedding(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Feature extraction stub: bytes → fixed-dim float vector (md5
    expansion). Schema/partitioning identical to a real encoder UDF."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for content in pdf[content_col]:
                d = hashlib.md5(bytes(content)).digest()
                vecs.append([b / 255.0 for b in d[:EMBED_DIM]])
            yield pd.DataFrame({"media_id": pdf[id_col].values, "embedding": vecs})

    return df.mapInPandas(run, schema)
