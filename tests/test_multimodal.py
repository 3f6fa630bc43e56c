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


def test_resize_caps_long_side_and_is_decodable(spark):
    from pyspark.sql import functions as F

    from crawlspark.operators.multimodal import resize_media

    media = build_media_table(spark, 24)
    out = resize_media(media, max_dim=16)
    # the resized payload re-enters the same decode path
    redecoded = decode_media(
        out.select("media_id", "kind", F.col("resized").alias("payload"))
    )
    orig = {r["media_id"]: r for r in decode_media(media).collect()}
    for r in redecoded.collect():
        assert max(r["width"], r["height"]) <= 16
        o = orig[r["media_id"]]
        if max(o["width"], o["height"]) > 16:  # actually shrunk: aspect kept
            scale = max(o["width"], o["height"]) / 16
            assert r["width"] == max(int(o["width"] / scale), 1)
            assert r["height"] == max(int(o["height"] / scale), 1)
            assert r["n_bytes"] <= o["n_bytes"]
    # deterministic
    a = sorted((r["media_id"], bytes(r["resized"])) for r in out.collect())
    b = sorted((r["media_id"], bytes(r["resized"])) for r in resize_media(media, 16).collect())
    assert a == b
