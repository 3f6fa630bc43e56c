"""Multimodal plumbing: typed binary columns through mapInPandas, with
real pure-numpy decode for binary PPM (P6) and uncompressed 24-bit BMP."""

import struct

import numpy as np
import pytest

from crawlspark.operators.multimodal import (
    build_media_table,
    decode_bmp,
    decode_media,
    decode_png,
    decode_ppm,
    encode_png,
    encode_ppm,
    frame_sample,
    media_stats,
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


def _bmp_bytes(pixels: np.ndarray, top_down: bool = False) -> bytes:
    """Golden 24bpp BI_RGB BMP encoder (tests only): BITMAPFILEHEADER +
    BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        row = pixels[y][:, ::-1].astype(np.uint8).tobytes()  # RGB → BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    px = b"".join(rows)
    dib = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0, len(px), 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(px), 0, 0, 14 + 40)
    return file_hdr + dib + px


def _px(w, h, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip_golden():
    px = _px(5, 4)
    w, h, got = decode_ppm(encode_ppm(5, 4, px))
    assert (w, h) == (5, 4)
    assert np.array_equal(got, px)
    # header variants the spec allows: comments + extra whitespace
    with_comment = b"P6\n# a comment\n5 4\n# more\n255\n" + px.tobytes()
    w2, h2, got2 = decode_ppm(with_comment)
    assert (w2, h2) == (5, 4) and np.array_equal(got2, px)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")  # grayscale PGM is not P6


def test_bmp_roundtrip_golden():
    px = _px(6, 3, seed=9)  # w=6 → row stride 20 (padding exercised... 18→20)
    for top_down in (False, True):
        w, h, got = decode_bmp(_bmp_bytes(px, top_down=top_down))
        assert (w, h) == (6, 3)
        assert np.array_equal(got, px)
    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 40)  # not 24bpp


def test_png_roundtrip_every_filter_type():
    """Each PNG row filter (None/Sub/Up/Average/Paeth) must invert
    exactly; the encoder computes filtered bytes forward from the spec,
    the decoder reverses them — both directions exercised per filter."""
    px = _px(7, 5, seed=11)
    for f in range(5):
        w, h, got = decode_png(encode_png(px, row_filters=[f] * 5))
        assert (w, h) == (7, 5), f"filter {f}"
        assert np.array_equal(got, px), f"filter {f}"
    # mixed filters per row (the common real-encoder output)
    w, h, got = decode_png(encode_png(px, row_filters=[0, 1, 2, 3, 4]))
    assert np.array_equal(got, px)


def test_png_rgba_and_rejections():
    rng = np.random.RandomState(5)
    rgba = rng.randint(0, 256, size=(3, 4, 4), dtype=np.uint8)
    w, h, got = decode_png(encode_png(rgba, row_filters=[4, 1, 3]))
    assert (w, h, got.shape[2]) == (4, 3, 4)
    assert np.array_equal(got, rgba)
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n")  # no IHDR
    # interlaced flag rejected (header says Adam7)
    good = encode_png(rgba)
    bad = bytearray(good)
    bad[8 + 8 + 12] = 1  # IHDR interlace byte
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_malformed_payloads_fall_back_per_row(spark):
    """Poison blobs behind a known magic must not fail the job: each
    lands as a metadata-only row (width=height=0) while the healthy
    rows in the SAME batch decode fully (ADVICE r3 isolation)."""
    from crawlspark.operators.multimodal import MEDIA_SCHEMA

    good = _px(4, 4, seed=7)
    rows = [
        (0, "image", encode_ppm(4, 4, good)),
        (1, "image", b"P6\n4 4\n255\n\x01\x02"),          # truncated PPM body
        (2, "image", b"P6\n4 4\n70000\n" + b"\x00" * 96),  # 16-bit samples
        (3, "image", b"BM" + b"\x00" * 60),                 # not 24bpp BI_RGB
        (4, "image", b"\x89PNG\r\n\x1a\n" + b"\x00" * 30),  # bogus chunks
        (5, "image", encode_png(good)[:40]),                # truncated PNG
    ]
    out = {r["media_id"]: r for r in decode_media(
        spark.createDataFrame(rows, MEDIA_SCHEMA)
    ).collect()}
    assert (out[0]["width"], out[0]["height"]) == (4, 4)
    assert out[0]["mean_byte"] == pytest.approx(float(good.mean()))
    for mid in (1, 2, 3, 4, 5):
        assert (out[mid]["width"], out[mid]["height"]) == (0, 0), mid
        assert out[mid]["n_bytes"] == len(rows[mid][2])


def test_decode_media_handles_real_formats_and_fake_mix(spark):
    """One frame mixing P6, BMP, FAKE, and an unknown blob — the decode
    dispatches per row and the means match numpy exactly."""
    ppm_px, bmp_px = _px(4, 4, seed=1), _px(3, 5, seed=2)
    rows = [
        (0, "image", encode_ppm(4, 4, ppm_px)),
        (1, "image", _bmp_bytes(bmp_px)),
        (2, "image", bytes(b"FAKE" + struct.pack(">II", 7, 2) + bytes(range(10)))),
        (3, "video", b"\x89PNG\r\n\x1a\n garbage"),
    ]
    from crawlspark.operators.multimodal import MEDIA_SCHEMA

    out = {r["media_id"]: r for r in decode_media(
        spark.createDataFrame(rows, MEDIA_SCHEMA)
    ).collect()}
    assert (out[0]["width"], out[0]["height"]) == (4, 4)
    assert out[0]["mean_byte"] == pytest.approx(float(ppm_px.mean()))
    assert (out[1]["width"], out[1]["height"]) == (3, 5)
    assert out[1]["mean_byte"] == pytest.approx(float(bmp_px.mean()))
    assert (out[2]["width"], out[2]["height"]) == (7, 2)
    assert out[2]["mean_byte"] == pytest.approx(float(np.mean(range(10))))
    assert (out[3]["width"], out[3]["height"]) == (0, 0)  # unknown codec


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


def test_wav_roundtrip_golden():
    from crawlspark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.RandomState(13)
    mono = rng.randint(-32768, 32768, size=40, dtype=np.int16)
    n, ch, rate, got = decode_wav(encode_wav(mono, rate=16000))
    assert (n, ch, rate) == (40, 1, 16000)
    assert np.array_equal(got[:, 0], mono)
    stereo = rng.randint(-32768, 32768, size=(21, 2), dtype=np.int16)
    n, ch, rate, got = decode_wav(encode_wav(stereo))
    assert (n, ch, rate) == (21, 2, 8000)
    assert np.array_equal(got, stereo)
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00AIFF")  # not WAVE
    with pytest.raises(ValueError):
        decode_wav(encode_wav(mono)[:30])  # truncated data chunk


def test_y4m_roundtrip_golden():
    from crawlspark.operators.multimodal import decode_y4m, encode_y4m

    rng = np.random.RandomState(17)
    frames = rng.randint(0, 256, size=(3, 6 * 4 * 3 // 2), dtype=np.uint8)
    w, h, nf, got = decode_y4m(encode_y4m(6, 4, frames))
    assert (w, h, nf) == (6, 4, 3)
    assert np.array_equal(got, frames)
    with pytest.raises(ValueError):
        encode_y4m(5, 4, frames)  # odd width can't be C420
    with pytest.raises(ValueError):
        decode_y4m(encode_y4m(6, 4, frames)[:-5])  # truncated last frame
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W6 H4 C444\n")  # unsupported colorspace


def test_decode_media_real_audio_video_rows(spark):
    """WAV and Y4M payloads decode through the same mapInPandas path:
    audio reports (samples, channels) in (width, height) with a SIGNED
    sample mean; video reports header dims with the plane-byte mean;
    poison variants of both fall back to metadata-only rows."""
    from crawlspark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        encode_wav,
        encode_y4m,
    )

    rng = np.random.RandomState(19)
    samples = rng.randint(-2000, 2000, size=50, dtype=np.int16)
    frames = rng.randint(0, 256, size=(2, 8 * 6 * 3 // 2), dtype=np.uint8)
    rows = [
        (0, "audio", encode_wav(samples, rate=8000)),
        (1, "video", encode_y4m(8, 6, frames)),
        (2, "audio", encode_wav(samples)[:20]),      # truncated WAV
        (3, "video", encode_y4m(8, 6, frames)[:40]),  # truncated Y4M
    ]
    out = {r["media_id"]: r for r in decode_media(
        spark.createDataFrame(rows, MEDIA_SCHEMA)
    ).collect()}
    assert (out[0]["width"], out[0]["height"]) == (50, 1)
    assert out[0]["mean_byte"] == pytest.approx(float(samples.mean()))
    assert (out[1]["width"], out[1]["height"]) == (8, 6)
    assert out[1]["mean_byte"] == pytest.approx(float(frames.mean()))
    for mid in (2, 3):
        assert (out[mid]["width"], out[mid]["height"]) == (0, 0), mid


def test_real_media_table_decodes_every_row(spark):
    """build_media_table(real=True) rows all decode to their closed-form
    metadata — the corpus behind the multimodal_decode oracle."""
    from crawlspark.operators.multimodal import build_media_table, decode_media

    out = {r["media_id"]: r for r in decode_media(
        build_media_table(spark, 36, real=True)
    ).collect()}
    assert len(out) == 36
    for i, r in out.items():
        if i % 3 == 0:  # image: PPM/BMP/FAKE all carry the same dims
            assert r["width"] == 16 + (i * 7) % 48, i
            assert r["height"] == 16 + (i * 13) % 32, i
        elif i % 3 == 1:  # audio: mono, 64 + (i*11) % 64 samples
            assert r["width"] == 64 + (i * 11) % 64, i
            assert r["height"] == 1, i
            assert -128.0 <= r["mean_byte"] <= 127.0, i
        else:  # video: even header dims
            assert r["width"] == 16 + 2 * ((i * 7) % 8), i
            assert r["height"] == 16 + 2 * ((i * 13) % 8), i


def test_png_decompression_bomb_is_bounded():
    """A ~500KB IDAT inflating to 512MB must fail the length check
    after at most expected+1 inflated bytes — never materialize the
    bomb (hostile payloads at corpus scale would OOM executors)."""
    import struct
    import time
    import zlib

    import pytest

    from crawlspark.operators.multimodal import PNG_SIG, decode_png

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", 100, 100, 8, 2, 0, 0, 0)  # claims 100x100
    bomb = zlib.compress(b"\x00" * (512 * 1024 * 1024), 9)
    png = PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", bomb) + chunk(b"IEND", b"")
    t0 = time.time()
    with pytest.raises(ValueError):
        decode_png(png)
    assert time.time() - t0 < 0.5  # bounded inflate, not 512MB then check


# ---------------------------------------------------------------------------
# Perceptual image hashing (dHash) + near-duplicate pairs
# ---------------------------------------------------------------------------


def test_dhash_brightness_invariant_and_deterministic():
    from crawlspark.operators.multimodal import dhash64_pixels

    rng = np.random.default_rng(11)
    px = rng.integers(20, 200, size=(24, 32, 3), dtype=np.uint8)
    h0 = dhash64_pixels(px)
    assert h0 == dhash64_pixels(px)  # deterministic
    assert -(1 << 63) <= h0 < (1 << 63)  # fits LongType
    # global brightness shift cancels in the horizontal gradients
    assert dhash64_pixels(np.clip(px.astype(int) + 30, 0, 255).astype(np.uint8)) == h0
    # alpha channel is ignored
    rgba = np.dstack([px, np.full(px.shape[:2], 7, np.uint8)])
    assert dhash64_pixels(rgba) == h0
    # a structurally different image hashes differently
    assert dhash64_pixels(px[::-1].copy()) != h0


def test_perceptual_hash_mixed_formats_and_poison(spark):
    from crawlspark.operators.jpeg import encode_jpeg
    from crawlspark.operators.multimodal import (
        dhash64_pixels, decode_jpeg, encode_bmp, encode_wav, perceptual_hash,
    )

    px = _px(24, 16, seed=9)
    rows = [
        (0, "image", encode_ppm(24, 16, px)),
        (1, "image", encode_bmp(px)),
        (2, "image", encode_png(px)),
        (3, "image", encode_jpeg(px, quality=90)),
        (4, "audio", encode_wav(np.zeros(64, np.int16))),   # not an image
        (5, "image", b"\xff\xd8truncated-garbage"),         # poison
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {r.media_id: r for r in perceptual_hash(media).collect()}
    assert len(got) == 6
    exact = dhash64_pixels(px)
    # lossless codecs reproduce the exact pixel hash
    assert got[0].phash == exact and got[1].phash == exact and got[2].phash == exact
    assert (got[0].width, got[0].height) == (24, 16)
    # JPEG is lossy but perceptually close: small hamming to the original
    _, _, jpx = decode_jpeg(encode_jpeg(px, quality=90))
    assert got[3].phash == dhash64_pixels(jpx)
    assert bin((got[3].phash ^ exact) & ((1 << 64) - 1)).count("1") <= 6
    # non-image and poison rows survive with NULL hash
    assert got[4].phash is None and got[5].phash is None


def test_image_phash_pairs_finds_brightness_near_dups(spark):
    from crawlspark.operators.multimodal import image_phash_pairs

    rng = np.random.default_rng(4)
    base = rng.integers(30, 190, size=(20, 28, 3), dtype=np.uint8)
    brighter = np.clip(base.astype(int) + 25, 0, 255).astype(np.uint8)
    other = rng.integers(0, 255, size=(20, 28, 3), dtype=np.uint8)
    rows = [
        (1, "image", encode_ppm(28, 20, base)),
        (2, "image", encode_png(brighter)),     # same scene, re-exposed + re-encoded
        (3, "image", encode_ppm(28, 20, other)),
        (4, "audio", b"RIFFgarbage"),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in image_phash_pairs(media, max_hamming=4).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 0
    assert all({a, b} != {1, 3} and {a, b} != {2, 3} for a, b in pairs)
