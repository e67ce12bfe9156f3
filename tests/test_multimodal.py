"""Multimodal plumbing tests — the Spark mechanics (schema, batching,
1→N expansion, determinism) are real even though the codec is a stub."""

from __future__ import annotations

import pytest

from energydatalake_spark.multimodal.media import (
    EMBED_DIM,
    attach_fake_media,
    decode_media,
    media_embedding,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    base = spark.range(20).withColumnRenamed("id", "media_id")
    return attach_fake_media(base, "media_id")


def test_media_schema(media):
    dt = dict(media.dtypes)
    assert dt["content"] == "binary"
    assert dt["meta"].startswith("struct<mime:string,width:int,height:int")


def test_decode_deterministic(spark, media):
    a = {r.media_id: r for r in decode_media(media).collect()}
    b = {r.media_id: r for r in decode_media(media.repartition(7)).collect()}
    assert len(a) == 20
    for k in a:
        assert (a[k].width, a[k].height, a[k].mean_luma, a[k].sha_prefix) == (
            b[k].width,
            b[k].height,
            b[k].mean_luma,
            b[k].sha_prefix,
        )
    r = a[0]
    assert 1 <= r.width <= 1920 and 1 <= r.height <= 1080
    assert 0.0 <= r.mean_luma <= 1.0


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
