"""Multimodal plumbing: typed binary columns through mapInPandas."""

import pytest

from crawlspark.operators.multimodal import (
    build_media_table,
    decode_media,
    frame_sample,
    media_stats,
    real_decode_image,
)


def test_decode_extracts_typed_metadata(spark):
    media = build_media_table(spark, 48)
    decoded = decode_media(media)
    rows = {r["media_id"]: r for r in decoded.collect()}
    assert len(rows) == 48
    r = rows[5]
    assert r["width"] == 16 + (5 * 7) % 48
    assert r["height"] == 16 + (5 * 13) % 32
    assert r["n_bytes"] > 12
    assert 0.0 <= r["mean_byte"] <= 255.0


def test_decode_is_deterministic(spark):
    media = build_media_table(spark, 32)
    a = sorted(map(tuple, decode_media(media).collect()))
    b = sorted(map(tuple, decode_media(media).collect()))
    assert a == b


def test_frame_sample_shapes(spark):
    media = build_media_table(spark, 16)
    out = frame_sample(media, every_n_bytes=4)
    rows = out.collect()
    assert len(rows) == 16
    for r in rows:
        assert isinstance(bytes(r["sampled"]), bytes)
        assert len(bytes(r["sampled"])) <= len(bytes(r["payload"]))


def test_media_stats_rollup(spark):
    decoded = decode_media(build_media_table(spark, 30))
    stats = {r["kind"]: r["n"] for r in media_stats(decoded).collect()}
    assert stats == {"image": 10, "audio": 10, "video": 10}


def test_real_decode_is_clearly_stubbed():
    with pytest.raises(NotImplementedError):
        real_decode_image(b"\x89PNG...")
