"""Baseline JPEG codec: roundtrip quality bounds across all encoder
variants, byte-level determinism, non-baseline rejection, and the
mapInPandas dispatch with per-row poison isolation."""

import hashlib

import numpy as np
import pytest

from crawlspark.operators.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 7) % 256, (yy * 5) % 256, ((xx + yy) * 3) % 256], axis=-1
    ).astype(np.uint8)


def test_flat_color_roundtrips_exactly():
    img = np.full((16, 24, 3), 130, dtype=np.uint8)
    w, h, out = decode_jpeg(encode_jpeg(img, 75))
    assert (w, h) == (24, 16)
    assert np.array_equal(out, img)  # constant block = DC only, no loss


@pytest.mark.parametrize("kwargs", [
    {}, {"subsample": True}, {"restart_interval": 3},
    {"subsample": True, "restart_interval": 2},
])
def test_gradient_roundtrip_all_variants(kwargs):
    img = _gradient(37, 50)  # odd-vs-MCU dims exercise edge padding
    w, h, out = decode_jpeg(encode_jpeg(img, quality=90, **kwargs))
    assert (w, h) == (50, 37)
    err = np.abs(out.astype(int) - img.astype(int))
    # 4:4:4 is near-lossless at q90 on smooth content; 4:2:0 box-averages
    # chroma so edges of the %256 wraparound cost more
    assert err.mean() < (5 if kwargs.get("subsample") else 2)


def test_grayscale_roundtrip():
    g = ((np.add.outer(np.arange(20), np.arange(31)) * 4) % 256).astype(np.uint8)
    w, h, out = decode_jpeg(encode_jpeg(g, 90))
    assert (w, h) == (31, 20) and out.shape == (20, 31)
    assert np.abs(out.astype(int) - g.astype(int)).mean() < 3


def test_encoder_is_deterministic():
    img = _gradient(24, 33)
    a = encode_jpeg(img, 75, subsample=True, restart_interval=4)
    b = encode_jpeg(img, 75, subsample=True, restart_interval=4)
    assert a == b and a[:2] == b"\xff\xd8" and a[-2:] == b"\xff\xd9"
    # decoding our own deterministic bytes is itself deterministic
    assert hashlib.md5(decode_jpeg(a)[2].tobytes()).hexdigest() == hashlib.md5(
        decode_jpeg(b)[2].tobytes()
    ).hexdigest()


def test_quality_monotone_in_size_and_error():
    img = _gradient(40, 40)
    lo, hi = encode_jpeg(img, 20), encode_jpeg(img, 95)
    assert len(lo) < len(hi)
    err_lo = np.abs(decode_jpeg(lo)[2].astype(int) - img.astype(int)).mean()
    err_hi = np.abs(decode_jpeg(hi)[2].astype(int) - img.astype(int)).mean()
    assert err_hi < err_lo


def test_non_baseline_and_garbage_rejected():
    img = np.full((8, 8, 3), 99, dtype=np.uint8)
    good = encode_jpeg(img, 80)
    with pytest.raises(ValueError):
        decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1))  # progressive
    with pytest.raises((ValueError, Exception)):
        decode_jpeg(good[:30])  # truncated mid-headers
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")


def test_decode_media_dispatch_and_poison_isolation(spark):
    from crawlspark.operators.multimodal import decode_media

    img = _gradient(9, 11)
    good = encode_jpeg(img, 80)
    poison = good[:40]
    df = spark.createDataFrame(
        [(1, "image", bytearray(good)), (2, "image", bytearray(poison))],
        "media_id long, kind string, payload binary",
    )
    rows = {r.media_id: r for r in decode_media(df).collect()}
    assert (rows[1].width, rows[1].height) == (11, 9)
    assert (rows[2].width, rows[2].height) == (0, 0)  # metadata-only fallback
    assert rows[2].n_bytes == 40


def test_resize_media_makes_real_jpeg_thumbnails(spark):
    from crawlspark.operators.multimodal import resize_media

    img = _gradient(48, 64)
    big = encode_jpeg(img, 85)
    small_already = encode_jpeg(img[:8, :8], 85)
    df = spark.createDataFrame(
        [(1, "image", bytearray(big)), (2, "image", bytearray(small_already))],
        "media_id long, kind string, payload binary",
    )
    rows = {r.media_id: bytes(r.resized) for r in resize_media(df, max_dim=16).collect()}
    w, h, thumb = decode_jpeg(rows[1])
    assert (w, h) == (16, 12)  # aspect preserved, longer side capped
    # thumbnail content tracks the source (nearest-neighbor of a smooth
    # gradient stays close to the subsampled original)
    ys = np.linspace(0, 47, num=12).astype(int)
    xs = np.linspace(0, 63, num=16).astype(int)
    ref = img[np.ix_(ys, xs)]
    assert np.abs(thumb.astype(int) - ref.astype(int)).mean() < 12
    assert rows[2] == bytes(small_already)  # already small: untouched


def test_corrupt_table_references_raise_valueerror():
    """A stream whose SOS references undefined tables must raise
    ValueError (not KeyError) so the per-row isolation catch holds."""
    img = np.full((8, 8, 3), 50, dtype=np.uint8)
    good = encode_jpeg(img, 80)
    # strip every DHT segment: table lookups in the scan become dangling
    out = bytearray()
    pos = 0
    while pos < len(good):
        if good[pos] == 0xFF and good[pos + 1] == 0xC4:
            (seglen,) = np.frombuffer(good[pos + 2:pos + 4], dtype=">u2")
            pos += 2 + int(seglen)
            continue
        out.append(good[pos])
        pos += 1
    with pytest.raises(ValueError):
        decode_jpeg(bytes(out))


def test_truncated_at_restart_boundary_raises_valueerror():
    img = _gradient(24, 24)
    b = encode_jpeg(img, 90, restart_interval=1)
    # cut inside the entropy stream, right after the first RST marker
    rst = b.find(b"\xff\xd0")
    assert rst > 0
    with pytest.raises(ValueError):
        decode_jpeg(b[:rst + 3])


def test_fuzzed_payloads_never_escape_the_isolation_catch():
    """The per-row isolation contract: whatever bytes arrive, decode
    either succeeds or raises one of the classes _decode_batch catches
    — never KeyError/TypeError/unbounded loops. Deterministic fuzz:
    truncations at every 7th byte and single-byte corruptions at every
    11th position of a real stream, plus random-bytes payloads."""
    import struct as _struct
    import zlib as _zlib

    caught = (ValueError, _struct.error, _zlib.error, IndexError)
    img = _gradient(16, 24)
    base = encode_jpeg(img, 80, subsample=True, restart_interval=2)

    payloads = [base[:i] for i in range(2, len(base), 7)]
    for pos in range(2, len(base), 11):
        for flip in (0x00, 0xFF, 0x42):
            payloads.append(base[:pos] + bytes([flip]) + base[pos + 1:])
    rng = np.random.default_rng(3)
    payloads += [b"\xff\xd8" + rng.integers(0, 256, n, dtype=np.uint8).tobytes()
                 for n in (0, 1, 17, 200)]

    for p in payloads:
        try:
            decode_jpeg(p)
        except caught:
            pass  # the contract: only classes the batch loop absorbs
