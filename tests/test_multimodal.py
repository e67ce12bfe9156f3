"""Multimodal plumbing tests. The image path is a REAL PNG codec
(stdlib zlib+struct encode + full parse/defilter decode); frame
sampling and embedding remain deterministic stubs whose Spark
mechanics (schema, batching, 1→N expansion) are exercised here."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from energydatalake_spark.multimodal.media import (
    EMBED_DIM,
    PNG_SIG,
    attach_fake_media,
    attach_png_media,
    decode_media,
    decode_png,
    encode_png,
    media_embedding,
    png_dims_for_id,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    base = spark.range(20).withColumnRenamed("id", "media_id")
    return attach_fake_media(base, "media_id")


@pytest.fixture(scope="module")
def png_media(spark):
    base = spark.range(20).withColumnRenamed("id", "media_id")
    return attach_png_media(base, "media_id")


def test_media_schema(png_media):
    dt = dict(png_media.dtypes)
    assert dt["content"] == "binary"
    assert dt["meta"].startswith("struct<mime:string,width:int,height:int")


def test_png_roundtrip_local():
    """encode_png emits a genuine PNG; decode_png recovers the exact
    raster (no Spark involved — pure codec test)."""
    for ident in (0, 7, 123456789):
        blob = encode_png(ident)
        assert blob[:8] == PNG_SIG
        w, h, seed = png_dims_for_id(ident)
        gw, gh, pixels = decode_png(blob)
        assert (gw, gh) == (w, h) and len(pixels) == w * h
        assert list(pixels) == [(seed + 7 * k) % 256 for k in range(w * h)]


def test_png_decoder_handles_all_filters():
    """The decoder undoes Sub/Up/Average/Paeth, not just None: build a
    PNG whose scanlines cycle through all five filter types and check
    the defiltered raster matches the original."""
    w, h = 6, 5
    orig = [(i * 37 + 11) % 256 for i in range(w * h)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = [0] * w
    for r in range(h):
        line = orig[r * w : (r + 1) * w]
        ftype = r % 5
        raw.append(ftype)
        for i in range(w):
            left = line[i - 1] if i else 0
            if ftype == 0:
                enc = line[i]
            elif ftype == 1:
                enc = line[i] - left
            elif ftype == 2:
                enc = line[i] - prev[i]
            elif ftype == 3:
                enc = line[i] - ((left + prev[i]) >> 1)
            else:
                enc = line[i] - paeth(left, prev[i], prev[i - 1] if i else 0)
            raw.append(enc & 0xFF)
        prev = line

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    blob = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    gw, gh, pixels = decode_png(blob)
    assert (gw, gh) == (w, h) and list(pixels) == orig


def test_png_decoder_rejects_corruption():
    blob = bytearray(encode_png(42))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a" + bytes(blob))
    blob[20] ^= 0xFF  # flip a byte inside IHDR payload → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))


def test_decode_real_png_deterministic(spark, png_media):
    a = {r.media_id: r for r in decode_media(png_media).collect()}
    b = {r.media_id: r for r in decode_media(png_media.repartition(7)).collect()}
    assert len(a) == 20
    for k in a:
        assert (a[k].width, a[k].height, a[k].mean_luma, a[k].pixel_fp) == (
            b[k].width,
            b[k].height,
            b[k].mean_luma,
            b[k].pixel_fp,
        )
        # decode output matches the id→image contract independently
        w, h, seed = png_dims_for_id(k)
        px_sum = sum((seed + 7 * j) % 256 for j in range(w * h))
        assert (a[k].width, a[k].height) == (w, h)
        expect_fp = hashlib.md5(f"{w}x{h}:{px_sum}".encode()).hexdigest()[:8]
        assert a[k].pixel_fp == expect_fp
    r = a[0]
    assert 4 <= r.width <= 15 and 4 <= r.height <= 11
    assert 0.0 <= r.mean_luma <= 1.0


def test_decode_stub_path_still_works(spark, media):
    """Non-PNG content (the video/audio stubs) still decodes through
    the documented md5 pseudo-feature path."""
    rows = decode_media(media).collect()
    assert len(rows) == 20
    assert all(1 <= r.width <= 1920 and 0.0 <= r.mean_luma <= 1.0 for r in rows)


def test_frame_sampling_expansion(media):
    frames = sample_frames(media, every_n=2, max_frames=4)
    rows = frames.collect()
    assert len(rows) == 20 * 4
    per = [r for r in rows if r.media_id == 3]
    assert sorted(r.frame_idx for r in per) == [0, 2, 4, 6]
    # frame bytes differ per frame but are deterministic per (id, idx)
    assert len({bytes(r.frame_bytes) for r in per}) == 4


def test_media_embedding_shape(media):
    out = media_embedding(media).collect()
    assert len(out) == 20
    assert all(len(r.embedding) == EMBED_DIM for r in out)
    assert all(0.0 <= x <= 1.0 for r in out for x in r.embedding)


def test_resize_png_nearest_local():
    """Pure-codec check: resized raster is exactly the stride-2
    subsample of the decoded original, re-encoded as a valid PNG."""
    from energydatalake_spark.multimodal.media import resize_png_nearest

    data = encode_png(7)
    w, h, px = decode_png(data)
    out = resize_png_nearest(data, 2)
    w2, h2, px2 = decode_png(out)
    assert (w2, h2) == ((w + 1) // 2, (h + 1) // 2)
    expect = bytes(
        px[(2 * r) * w + (2 * c)] for r in range(h2) for c in range(w2)
    )
    assert px2 == expect
    assert out[:8] == PNG_SIG


def test_resize_media_updates_meta_and_roundtrips(spark, png_media):
    from energydatalake_spark.multimodal.media import resize_media

    rows = {r.media_id: r for r in resize_media(png_media, factor=2).collect()}
    assert len(rows) == 20
    for mid, r in rows.items():
        w, h, _ = png_dims_for_id(mid)
        assert (r.meta.width, r.meta.height) == ((w + 1) // 2, (h + 1) // 2)
        w2, h2, _px = decode_png(bytes(r.content))  # still a valid PNG
        assert (w2, h2) == (r.meta.width, r.meta.height)


def test_resize_media_stub_mime_passthrough(spark, media):
    """Non-PNG content passes through byte-identical (documented stub)."""
    from energydatalake_spark.multimodal.media import resize_media

    before = {r.media_id: bytes(r.content) for r in media.collect()}
    after = {
        r.media_id: bytes(r.content) for r in resize_media(media).collect()
    }
    assert after == before
