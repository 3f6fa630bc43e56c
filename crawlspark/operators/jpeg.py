"""Pure numpy+stdlib baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

Completes the no-codec-library multimodal story (PPM/BMP/PNG/WAV/Y4M in
multimodal.py): the container has no PIL/libjpeg, so both directions
are implemented from the public spec. Scope is the interchange-format
common case:

* decode: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
  any sampling factors up to 2x2 (4:4:4, 4:2:2, 4:2:0), standard or
  custom quant/huffman tables, restart intervals (DRI/RSTn), stuffed-
  byte entropy stream. Progressive (SOF2), arithmetic coding, 12-bit,
  and hierarchical modes raise ValueError → the mapInPandas dispatch
  falls back to metadata-only for that row (the module contract).
* encode: 4:4:4 YCbCr (or grayscale), Annex-K example quant tables
  scaled by the IJG quality formula, Annex-K standard huffman tables,
  no subsampling — a spec-legal producer used for fixtures and as the
  roundtrip oracle for the decoder.

Entropy coding is inherently serial per block — fine inside the Arrow
batch loop (one Python-side pass per payload, like the PNG Paeth rows).
All DCT math is float64 matrix products; quantization is np.round —
deterministic on a given platform, pinned by golden tests.
"""

from __future__ import annotations

import struct

import numpy as np

# ── Annex K example tables (public spec constants) ──────────────────────────

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# (bits[1..16], values) per Annex K
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)
UNZIGZAG = np.argsort(ZIGZAG)

# orthonormal 8-point DCT-II matrix: coef = D @ block @ D.T
_D = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _D[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 → scaled Annex-K table, clipped 1..255."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _build_huff_encode(bits: list[int], vals: list[int]) -> dict:
    """Canonical huffman table → {symbol: (code, length)}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value → (size, raw bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, v if v >= 0 else v + (1 << size) - 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def byte_align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per spec

    def raw_marker(self, marker: int) -> None:
        """Emit a marker into the entropy stream (RSTn) — markers are
        written raw, never byte-stuffed."""
        self.byte_align()
        self.out += struct.pack(">H", marker)

    def flush(self) -> bytes:
        self.byte_align()
        return bytes(self.out)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0].astype(np.float64), px[..., 1].astype(np.float64), px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _encode_block(block, quant, dct, act, pred, bw) -> int:
    """FDCT + quantize + huffman-encode one 8x8 block; returns the new
    DC predictor."""
    coef = _D @ block @ _D.T
    qz = np.round(coef / quant).astype(np.int32).ravel()[ZIGZAG]
    diff = int(qz[0]) - pred
    size, bits = _magnitude(diff)
    code, length = dct[size]
    bw.put(code, length)
    if size:
        bw.put(bits, size)
    run = 0
    nz = np.nonzero(qz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(qz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = act[0xF0]  # ZRL
            bw.put(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = act[(run << 4) | size]
        bw.put(code, length)
        bw.put(bits, size)
        run = 0
    if last < 63:
        code, length = act[0x00]  # EOB
        bw.put(code, length)
    return int(qz[0])


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 75,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG from an (h, w, 3) RGB or (h, w) grayscale uint8
    array. Annex-K tables scaled by the IJG quality formula.
    ``subsample=True`` emits 4:2:0 (2x2-box-averaged chroma, the real-web
    default); ``restart_interval=N`` emits DRI + RSTn markers every N
    MCUs — both exist chiefly so the decoder's generic MCU walk,
    chroma upsample, and restart handling are testable without libjpeg."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy = _scaled_quant(QUANT_LUMA, quality).reshape(8, 8)
    qc = _scaled_quant(QUANT_CHROMA, quality).reshape(8, 8)

    dc_y = _build_huff_encode(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _build_huff_encode(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_huff_encode(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_huff_encode(AC_CHROMA_BITS, AC_CHROMA_VALS)

    # (plane, h_samp, v_samp, quant, dc_tbl, ac_tbl) per component
    if gray:
        comps = [(px.astype(np.float64) - 128.0, 1, 1, qy, dc_y, ac_y)]
    else:
        ycc = _rgb_to_ycbcr(px)
        y, cb, cr = (ycc[..., i] for i in range(3))
        if subsample:
            # pad to even dims, then 2x2 box-average the chroma
            eh, ew = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cbp = np.pad(cb, ((0, eh - h), (0, ew - w)), mode="edge")
            crp = np.pad(cr, ((0, eh - h), (0, ew - w)), mode="edge")
            cb = (cbp[0::2, 0::2] + cbp[1::2, 0::2] + cbp[0::2, 1::2] + cbp[1::2, 1::2]) / 4.0
            cr = (crp[0::2, 0::2] + crp[1::2, 0::2] + crp[0::2, 1::2] + crp[1::2, 1::2]) / 4.0
            comps = [
                (y - 128.0, 2, 2, qy, dc_y, ac_y),
                (cb - 128.0, 1, 1, qc, dc_c, ac_c),
                (cr - 128.0, 1, 1, qc, dc_c, ac_c),
            ]
        else:
            comps = [
                (y - 128.0, 1, 1, qy, dc_y, ac_y),
                (cb - 128.0, 1, 1, qc, dc_c, ac_c),
                (cr - 128.0, 1, 1, qc, dc_c, ac_c),
            ]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # pad each plane to its MCU grid by edge replication
    padded = []
    for plane, ch, cv, quant, dct, act in comps:
        tph, tpw = mcuy * cv * 8, mcux * ch * 8
        p = np.pad(
            plane,
            ((0, tph - plane.shape[0]), (0, tpw - plane.shape[1])),
            mode="edge",
        )
        padded.append((p, ch, cv, quant, dct, act))

    bw = _BitWriter()
    preds = [0] * len(padded)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.raw_marker(0xFFD0 + ((mcu_count // restart_interval - 1) % 8))
                preds = [0] * len(padded)
            for ci, (p, ch, cv, quant, dct, act) in enumerate(padded):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        preds[ci] = _encode_block(
                            p[y0:y0 + 8, x0:x0 + 8], quant, dct, act, preds[ci], bw
                        )
            mcu_count += 1
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    ncomp = 1 if gray else 3
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qy.ravel()[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, b"\x01" + bytes(qc.ravel()[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (_p, ch, cv, _q, _d, _a) in enumerate(padded):
        sof += struct.pack(">BBB", ci + 1, (ch << 4) | cv, 0 if ci == 0 else 1)
    out += seg(0xFFC0, sof)
    for cls, tid, bits, vals in [
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS), (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS), (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ][: 2 if gray else 4]:
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = struct.pack(">B", ncomp)
    for ci in range(ncomp):
        sos += struct.pack(">BB", ci + 1, 0x00 if ci == 0 else 0x11)
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first entropy-segment reader with 0xFF00 unstuffing; stops at
    markers (returns them via ``marker``)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.buf
        if self.pos >= len(b):
            raise ValueError("truncated entropy stream")
        v = b[self.pos]
        if v == 0xFF:
            nxt = b[self.pos + 1] if self.pos + 1 < len(b) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker hit mid-read: pad with zeros (spec allows the
                # final bits of the last byte to be padding)
                self.acc = (self.acc << 8)
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | v
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_to_marker(self) -> int:
        """Discard partial bits, consume an RSTn marker, return it."""
        self.acc = 0
        self.nbits = 0
        b = self.buf
        while self.pos + 1 < len(b) and not (b[self.pos] == 0xFF and b[self.pos + 1] != 0x00):
            self.pos += 1
        if self.pos + 2 > len(b):
            raise ValueError("truncated entropy stream at restart boundary")
        m = struct.unpack(">H", b[self.pos:self.pos + 2])[0]
        self.pos += 2
        return m


def _build_huff_decode(bits: list[int], vals: list[int]):
    """Canonical decode tables (F.2.2.3): per length — mincode, maxcode,
    index of first value."""
    mincode, maxcode, valptr = [0] * 17, [-1] * 17, [0] * 17
    code, k = 0, 0
    for length in range(1, 17):
        if bits[length - 1]:
            valptr[length] = k
            mincode[length] = code
            code += bits[length - 1]
            k += bits[length - 1]
            maxcode[length] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, vals


def _huff_decode(br: _BitReader, tbl) -> int:
    mincode, maxcode, valptr, vals = tbl
    code = br.bits(1)
    for length in range(1, 17):
        if maxcode[length] >= 0 and code <= maxcode[length]:
            return vals[valptr[length] + code - mincode[length]]
        code = (code << 1) | br.bits(1)
    raise ValueError("bad huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(b: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline JPEG → (width, height, uint8 array (h, w, 3) or (h, w)).
    Raises ValueError on anything outside baseline-sequential scope."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple] = {}
    huff_ac: dict[int, tuple] = {}
    comps = None  # list of (cid, h, v, tq)
    h = w = 0
    restart_interval = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = struct.unpack(">H", b[pos:pos + 2])[0]
        pos += 2
        if marker in (0xFFD8, 0xFFD9):
            continue
        (seglen,) = struct.unpack(">H", b[pos:pos + 2])
        payload = b[pos + 2: pos + seglen]
        if len(payload) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xFFDB:  # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(payload[p + 1:p + 65], dtype=np.uint8).astype(np.int32)
                quant[tq] = tbl[UNZIGZAG].reshape(8, 8)
                p += 65
        elif marker == 0xFFC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                vals = list(payload[p + 17:p + 17 + n])
                (huff_dc if cls == 0 else huff_ac)[tid] = _build_huff_decode(bits, vals)
                p += 17 + n
        elif marker == 0xFFC0 or marker == 0xFFC1:  # SOF0/1 (baseline/ext seq)
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i:9 + 3 * i]
                ch, cv = hv >> 4, hv & 0xF
                if ch not in (1, 2) or cv not in (1, 2):
                    raise ValueError("sampling factors beyond 2x2 unsupported")
                comps.append([cid, ch, cv, tq])
        elif marker in (0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic)")
        elif marker == 0xFFDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xFFDA:  # SOS — entropy data follows
            if comps is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan = {}
            for i in range(ns):
                cs, tbls = payload[1 + 2 * i], payload[2 + 2 * i]
                scan[cs] = (tbls >> 4, tbls & 0xF)
            pos += seglen
            return _decode_scan(
                b, pos, w, h, comps, scan, quant, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seglen
    raise ValueError("no SOS marker")


def _decode_scan(b, pos, w, h, comps, scan, quant, huff_dc, huff_ac,
                 restart_interval):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8), dtype=np.float64)
        for c in comps
    ]
    # resolve every table reference ONCE, up front — a corrupt stream
    # whose SOS/SOF references an undefined table/component must raise
    # ValueError (the decode contract; a bare KeyError would escape the
    # per-row isolation catch in multimodal._decode_batch)
    tables = []
    for cid, ch, cv, tq in comps:
        try:
            dct, act = scan[cid]
            tables.append((huff_dc[dct], huff_ac[act], quant[tq]))
        except KeyError as e:
            raise ValueError(f"undefined table/component reference: {e}") from e
    br = _BitReader(b, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = br.align_to_marker()
                if not (0xFFD0 <= m <= 0xFFD7):
                    raise ValueError("expected RST marker")
                preds = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                dc_tbl, ac_tbl, q = tables[ci]
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.int32)
                        size = _huff_decode(br, dc_tbl)
                        diff = _extend(br.bits(size), size) if size else 0
                        preds[ci] += diff
                        # 8-bit baseline DC is bounded by ±2047 after
                        # quant; a predictor far outside that is corrupt
                        # entropy data — fail as ValueError before the
                        # int32 store can raise OverflowError (which
                        # would escape the per-row isolation catch)
                        if not -(1 << 20) <= preds[ci] <= (1 << 20):
                            raise ValueError("DC predictor out of range")
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, ac_tbl)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        coef = (zz[UNZIGZAG].reshape(8, 8) * q).astype(np.float64)
                        block = _D.T @ coef @ _D
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            mcu_count += 1
    # upsample to full resolution and crop
    full = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        p = planes[ci]
        if ch < hmax:
            p = np.repeat(p, hmax // ch, axis=1)
        if cv < vmax:
            p = np.repeat(p, vmax // cv, axis=0)
        full.append(p[:h, :w] + 128.0)
    if len(full) == 1:
        return w, h, np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise ValueError(f"{len(full)}-component JPEG unsupported")
    return w, h, _ycbcr_to_rgb(full[0], full[1], full[2])
