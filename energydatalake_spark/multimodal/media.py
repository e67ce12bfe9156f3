"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media travel as opaque ``binary`` columns plus a typed metadata struct
— the lakehouse-standard layout (content-addressed bytes + queryable
metadata). All heavy per-item work runs through ``mapInPandas``:
Arrow-batched, executor-side, schema-stable.

The image path is REAL end-to-end with no external codec dependency:
``attach_png_media`` emits genuine PNG files (signature, IHDR, IDAT,
IEND, CRC-correct, zlib-deflated scanlines) built with stdlib
``zlib``+``struct``, and ``decode_media`` contains an actual PNG
decoder (chunk walk with CRC verification, inflate, all five scanline
defilters) for 8-bit grayscale — the profile the synthetic corpus
uses. Audio/video remain stubbed (``sample_frames`` /
``media_embedding`` derive deterministic pseudo-outputs from the
bytes' md5) because this image lacks ffmpeg/audio libs; their Spark
plumbing — schema, 1→N expansion, Arrow batching — is real and tested.

Determinism contract: PNG pixel data is a pure function of the media
id (dims and a seed from ``md5(str(id))``, pixel ``k`` =
``(seed + 7*k) % 256``), so an independent SQL oracle can predict the
decoded width/height/pixel-sum without ever touching the bytes — a
wrong decode cannot hash-match.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PNG_SIG = b"\x89PNG\r\n\x1a\n"

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
        T.StructField("pixel_fp", T.StringType()),
    ]
)


# --------------------------------------------------------------- PNG codec


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_dims_for_id(ident: int) -> tuple[int, int, int]:
    """(width, height, pixel seed) for a media id — the id→image
    contract shared with the SQL oracle (md5-hex arithmetic there)."""
    d = hashlib.md5(str(ident).encode()).digest()
    return d[0] % 12 + 4, d[1] % 8 + 4, d[2]


def encode_png_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Encode an arbitrary 8-bit grayscale raster as a genuine minimal
    PNG: filter-None scanlines, one zlib-deflated IDAT, CRC-correct
    chunks."""
    raw = bytearray()
    for r in range(height):
        raw.append(0)  # filter type 0 (None)
        raw.extend(pixels[r * width : (r + 1) * width])
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png(ident: int) -> bytes:
    """The id→image contract: pixel ``k`` (raster order) is
    ``(seed + 7*k) % 256`` with dims/seed from ``png_dims_for_id``."""
    w, h, seed = png_dims_for_id(ident)
    pixels = bytes((seed + 7 * k) % 256 for k in range(w * h))
    return encode_png_gray(w, h, pixels)


def resize_png_nearest(data: bytes, factor: int = 2) -> bytes:
    """Real nearest-neighbour downscale: decode (CRC walk + inflate +
    defilter), subsample every ``factor``-th pixel in both axes
    (ceil-divided output dims, so index ``factor*r`` stays in range),
    re-encode through :func:`encode_png_gray`. Output is a valid PNG
    that round-trips through :func:`decode_png`."""
    w, h, px = decode_png(data)
    w2 = (w + factor - 1) // factor
    h2 = (h + factor - 1) // factor
    out = bytes(
        px[(r * factor) * w + (c * factor)]
        for r in range(h2)
        for c in range(w2)
    )
    return encode_png_gray(w2, h2, out)


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Parse a grayscale-8 PNG: walk chunks (verifying CRCs), inflate
    the IDAT stream, undo any of the five scanline filters. Returns
    (width, height, raster pixel bytes). Raises on non-grayscale-8 or
    interlaced input — the only profiles this engine emits."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, width, height, idat = 8, None, None, bytearray()
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if (depth, ctype, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError("only 8-bit grayscale non-interlaced supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width
    out = bytearray()
    prev = bytes(stride)
    pos = 0
    for _r in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub (bpp=1: left neighbour)
            for i in range(1, stride):
                line[i] = (line[i] + line[i - 1]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - 1] if i else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - 1] if i else 0
                b, c = prev[i], (prev[i - 1] if i else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter type {ftype}")
        out += line
        prev = bytes(line)
    return width, height, bytes(out)


# ------------------------------------------------------------- attach ops


def attach_png_media(df: DataFrame, id_col: str) -> DataFrame:
    """Real binary ingest stand-in: per id, a genuine deterministic PNG
    in ``content`` plus the metadata struct. Arrow-batched generation
    (mapInPandas keeps whole input rows + appends columns)."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("content", T.BinaryType()), T.StructField("meta", MEDIA_META)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas, blobs = [], []
            for ident in pdf[id_col]:
                blob = encode_png(int(ident))
                w, h, _ = png_dims_for_id(int(ident))
                blobs.append(blob)
                metas.append(
                    {"mime": "image/png", "width": w, "height": h, "n_frames": 1}
                )
            pdf = pdf.copy()
            pdf["content"] = blobs
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(run, out_schema)


def attach_fake_media(df: DataFrame, id_col: str, mime: str = "video/mp4") -> DataFrame:
    """Deterministic synthetic media for the codec-stubbed paths
    (frame sampling, embedding): ASCII content bytes derived from the
    id (md5-seeded) so SQL oracles can rebuild them, metadata struct
    populated."""
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


# -------------------------------------------------------------- decode op

_ROUND6 = 1_000_000.0


def _decode_one(content: bytes) -> tuple[int, int, float, str]:
    """Real decode for PNG bytes; md5-derived pseudo-features for other
    (stub) mimes — same output shape either way. ``pixel_fp`` commits
    to the full decoded raster (dims + pixel sum), so a wrong defilter
    or inflate changes it."""
    content = bytes(content)
    if content[:8] == PNG_SIG:
        w, h, pixels = decode_png(content)
        px_sum = sum(pixels)
        import math

        mean_luma = math.floor((px_sum / (w * h)) / 255.0 * _ROUND6 + 0.5) / _ROUND6
        fp = hashlib.md5(f"{w}x{h}:{px_sum}".encode()).hexdigest()[:8]
        return w, h, mean_luma, fp
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
    """Decode pass: binary → (dimensions, mean luma, pixel
    fingerprint). ``mapInPandas`` so each Arrow batch is decoded in one
    Python call; output schema is fixed (DECODE_SCHEMA) regardless of
    codec path. PNG content is genuinely parsed (see ``decode_png``);
    other mimes fall back to the documented md5 stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_decode_one(c) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "mime": [m["mime"] for m in pdf[meta_col]],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "mean_luma": [r[2] for r in rows],
                    "pixel_fp": [r[3] for r in rows],
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
                        # ASCII frame-index suffix (content ‖ ':' ‖
                        # str(k)): deterministic AND reproducible by
                        # the SQL oracle (md5 over text in both
                        # engines; a binary suffix would need a
                        # blob-md5 DuckDB lacks).
                        hashlib.md5(bytes(content) + b":" + str(k).encode()).digest()
                    )
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_bytes": out_bytes}
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


def resize_media(
    df: DataFrame,
    factor: int = 2,
    id_col: str = "media_id",
    content_col: str = "content",
    meta_col: str = "meta",
) -> DataFrame:
    """Resize pass (binary → binary): PNG content is REALLY resized —
    decoded, nearest-neighbour subsampled, re-encoded — inside one
    Arrow-batched ``mapInPandas`` call per batch; the metadata struct
    is updated to the output dims. Non-PNG mimes pass through unchanged
    (the documented stub tier: no image libs in this environment), so
    the operator composes into mixed-mime pipelines without branching.

    Output schema equals the input schema (id, content, meta, and any
    carried columns), which is what lets decode/resize/embed chain
    arbitrarily — the lakehouse layout stays stable through every pass.
    """
    out_schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, metas = [], []
            for content, meta in zip(pdf[content_col], pdf[meta_col]):
                content = bytes(content)
                if content[:8] == PNG_SIG:
                    resized = resize_png_nearest(content, factor)
                    w2, h2, _ = decode_png(resized)
                    meta = dict(meta)
                    meta["width"], meta["height"] = w2, h2
                    contents.append(resized)
                else:
                    contents.append(content)  # stub mime: pass through
                metas.append(meta)
            out = pdf.copy()
            out[content_col] = contents
            out[meta_col] = metas
            yield out

    return df.mapInPandas(run, out_schema)


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
