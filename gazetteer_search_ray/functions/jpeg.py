"""Baseline JPEG codec in pure numpy + stdlib (no external libraries).

Implements the sequential-DCT baseline process of ITU-T T.81 (the
public JPEG spec): 8x8 forward/inverse DCT, Annex-K quantization and
Huffman tables with IJG-style quality scaling, canonical Huffman
entropy coding with byte stuffing, JFIF headers, 4:4:4 and 4:2:0
chroma subsampling, optional restart intervals (DRI/RSTn), and
grayscale or YCbCr color.  Progressive (SOF2), arithmetic coding and
12-bit precision are out of scope and raise ``NotImplementedError``.

This exists because the container has no image codec libraries
(reference analog: the multimodal decode stages of a training-data
pipeline, which normally lean on libjpeg).  The hot math (DCT,
quantization, color transform, upsampling) is vectorized over all
blocks at once; only the entropy coding loop is per-MCU Python, which
is fine at the payload sizes an actor-pool decode stage sees per batch.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.float64).reshape(8, 8)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# orthonormal 8-point DCT-II matrix: forward F = C @ B @ C.T
_k = np.arange(8).reshape(8, 1)
_n = np.arange(8).reshape(1, 8)
DCT_M = np.sqrt(2.0 / 8.0) * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
DCT_M[0, :] = 1.0 / np.sqrt(8.0)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
    return np.clip(np.floor((base * scale + 50.0) / 100.0), 1, 255)


def _build_codes(bits, vals):
    """Canonical Huffman: symbol -> (code, length)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """mincode/maxcode/valptr canonical decode (T.81 F.2.2.3)."""

    def __init__(self, bits, vals):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for l in range(1, 17):
            if bits[l - 1]:
                self.valptr[l] = k
                self.mincode[l] = code
                code += bits[l - 1]
                k += bits[l - 1]
                self.maxcode[l] = code - 1
            self.maxcode[l] = self.maxcode[l] if bits[l - 1] else -1
            code <<= 1

    def decode(self, reader) -> int:
        code = 0
        for l in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if self.maxcode[l] >= code >= self.mincode[l]:
                return self.vals[self.valptr[l] + code - self.mincode[l]]
        raise ValueError("bad Huffman code in JPEG stream")


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:          # byte stuffing (T.81 B.1.1.5)
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush_align(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


class _BitReader:
    """Reads entropy-coded bits, dropping stuffed zero bytes; RSTn
    markers are consumed only via :meth:`sync_restart`."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                return 0  # past-end pad (T.81 allows driving with 1s; 0 is benign for EOB-terminated blocks)
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0x00
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    # hit a marker without sync_restart: rewind and pad
                    self.pos -= 1
                    return 0
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive_extend(self, size: int) -> int:
        if size == 0:
            return 0
        r = 0
        for _ in range(size):
            r = (r << 1) | self.read_bit()
        if r < (1 << (size - 1)):
            return r - (1 << size) + 1
        return r

    def sync_restart(self):
        """Byte-align and consume an RSTn marker."""
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected RSTn marker")


# ---------------------------------------------------------------------------
# block helpers (vectorized over all blocks)
# ---------------------------------------------------------------------------


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W multiples of 8 -> (H//8, W//8, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _from_blocks(blocks: np.ndarray) -> np.ndarray:
    bh, bw = blocks.shape[:2]
    return blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)


def _fdct_quant(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """Level-shift, DCT and quantize every 8x8 block; returns int32
    coefficient blocks of shape (bh, bw, 8, 8)."""
    blocks = _to_blocks(plane.astype(np.float64) - 128.0)
    coef = np.einsum("ij,abjk,lk->abil", DCT_M, blocks, DCT_M, optimize=True)
    return np.round(coef / qtbl).astype(np.int32)


def _dequant_idct(coef: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    spat = np.einsum("ji,abjk,kl->abil", DCT_M, coef * qtbl, DCT_M, optimize=True)
    return spat + 128.0


def _pad_edge(img: np.ndarray, mult_h: int, mult_w: int) -> np.ndarray:
    h, w = img.shape[:2]
    ph = (-h) % mult_h
    pw = (-w) % mult_w
    if ph or pw:
        pad = [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2)
        img = np.pad(img, pad, mode="edge")
    return img


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    img = img.astype(np.float64)
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
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
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _encode_block(wr: _BitWriter, z: np.ndarray, dc_prev: int,
                  dc_codes, ac_codes) -> int:
    """Huffman-encode one zigzagged quantized block; returns its DC."""
    dc = int(z[0])
    diff = dc - dc_prev
    size = abs(diff).bit_length()
    code, length = dc_codes[size]
    wr.write(code, length)
    if size:
        wr.write(diff if diff > 0 else diff + (1 << size) - 1, size)

    nz = np.nonzero(z[1:])[0]
    prev = 0
    for idx in nz:
        k = int(idx) + 1
        run = k - prev - 1
        prev = k
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            wr.write(code, length)
            run -= 16
        v = int(z[k])
        size = abs(v).bit_length()
        code, length = ac_codes[(run << 4) | size]
        wr.write(code, length)
        wr.write(v if v > 0 else v + (1 << size) - 1, size)
    if prev != 63:
        code, length = ac_codes[0x00]  # EOB
        wr.write(code, length)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def encode_jpeg(img: np.ndarray, quality: int = 85, subsample: str = "444",
                restart_interval: int = 0) -> bytes:
    """Encode an (H, W, 3) uint8 RGB or (H, W) grayscale array as a
    baseline JFIF JPEG.  ``subsample``: '444' or '420' (color only)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    if gray:
        comps = [dict(cid=1, h=1, v=1, tq=0)]
        planes = [img.astype(np.float64)]
    else:
        if subsample not in ("444", "420"):
            raise ValueError("subsample must be '444' or '420'")
        ycc = _rgb_to_ycbcr(img)
        if subsample == "444":
            comps = [dict(cid=1, h=1, v=1, tq=0),
                     dict(cid=2, h=1, v=1, tq=1),
                     dict(cid=3, h=1, v=1, tq=1)]
            planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        else:
            comps = [dict(cid=1, h=2, v=2, tq=0),
                     dict(cid=2, h=1, v=1, tq=1),
                     dict(cid=3, h=1, v=1, tq=1)]
            full = _pad_edge(ycc, 16, 16)
            sub = full.reshape(full.shape[0] // 2, 2, full.shape[1] // 2, 2, 3).mean(axis=(1, 3))
            planes = [full[..., 0], sub[..., 1], sub[..., 2]]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    # per-component quantized coefficient blocks, zigzagged
    zz = []
    for c, plane in zip(comps, planes):
        # pad each plane to cover whole MCUs for this component
        n_mcu_x = -(-w // (8 * hmax))
        n_mcu_y = -(-h // (8 * vmax))
        ph = n_mcu_y * 8 * c["v"]
        pw = n_mcu_x * 8 * c["h"]
        pl = np.pad(plane,
                    [(0, max(0, ph - plane.shape[0])), (0, max(0, pw - plane.shape[1]))],
                    mode="edge")[:ph, :pw]
        coef = _fdct_quant(pl, qy if c["tq"] == 0 else qc)
        zz.append(coef.reshape(coef.shape[0], coef.shape[1], 64)[:, :, ZIGZAG])

    dc_codes_y = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes_y = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_codes_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_codes_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    n_mcu_x = -(-w // (8 * hmax))
    n_mcu_y = -(-h // (8 * vmax))
    wr = _BitWriter()
    dc_prev = [0] * len(comps)
    mcu_count = 0
    rst_n = 0
    for my in range(n_mcu_y):
        for mx in range(n_mcu_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wr.flush_align()
                wr.buf += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) & 7
                dc_prev = [0] * len(comps)
            for ci, c in enumerate(comps):
                is_y = c["tq"] == 0
                dct, act = (dc_codes_y, ac_codes_y) if is_y else (dc_codes_c, ac_codes_c)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = zz[ci][my * c["v"] + by, mx * c["h"] + bx]
                        dc_prev[ci] = _encode_block(wr, blk, dc_prev[ci], dct, act)
            mcu_count += 1
    wr.flush_align()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(qy.reshape(64)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(qc.reshape(64)[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        sof += bytes([c["cid"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    if not gray:
        out += _seg(0xC4, bytes([0x01]) + bytes(DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS))
        out += _seg(0xC4, bytes([0x11]) + bytes(AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for c in comps:
        td_ta = 0x00 if c["tq"] == 0 else 0x11
        sos += bytes([c["cid"], td_ta])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += wr.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) JPEG to (H, W, 3) uint8 RGB.

    Supports 8-bit precision, 1 or 3 components, sampling factors in
    {1, 2}, restart intervals, and standard or custom Huffman/quant
    tables.  Progressive/arithmetic raise ``NotImplementedError``.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables = {}
    huff_dc = {}
    huff_ac = {}
    comps = []
    h = w = 0
    restart_interval = 0
    scan = None
    scan_comps = []

    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables not supported")
                tbl = np.zeros(64, dtype=np.float64)
                tbl[ZIGZAG] = np.frombuffer(body[i:i + 64], dtype=np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                i += 64
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                dec = _HuffDecoder(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                ch, cv = hv >> 4, hv & 0x0F
                if ch not in (1, 2) or cv not in (1, 2):
                    raise NotImplementedError(f"sampling factor {ch}x{cv} not supported")
                comps.append(dict(cid=cid, h=ch, v=cv, tq=tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF{marker - 0xC0}: only baseline sequential DCT (SOF0) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for si in range(ns):
                cid, tdta = body[1 + 2 * si:3 + 2 * si]
                scan_comps.append((cid, tdta >> 4, tdta & 0x0F))
            # entropy data runs until the next non-RST marker
            end = pos
            while end + 1 < len(payload):
                if payload[end] == 0xFF and payload[end + 1] not in (0x00,) \
                        and not (0xD0 <= payload[end + 1] <= 0xD7):
                    break
                end += 1
            scan = payload[pos:end]
            pos = end
    if not comps or scan is None:
        raise ValueError("truncated JPEG: missing SOF/SOS")

    by_cid = {c["cid"]: c for c in comps}
    order = []
    for cid, td, ta in scan_comps:
        c = by_cid[cid]
        c["td"], c["ta"] = td, ta
        order.append(c)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    n_mcu_x = -(-w // (8 * hmax))
    n_mcu_y = -(-h // (8 * vmax))

    # per-component zigzag coefficient store
    store = [np.zeros((n_mcu_y * c["v"], n_mcu_x * c["h"], 64), dtype=np.float64)
             for c in order]

    reader = _BitReader(scan)
    dc_prev = [0] * len(order)
    mcu_count = 0
    for my in range(n_mcu_y):
        for mx in range(n_mcu_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                dc_prev = [0] * len(order)
            for ci, c in enumerate(order):
                dc_dec = huff_dc[c["td"]]
                ac_dec = huff_ac[c["ta"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.float64)
                        size = dc_dec.decode(reader)
                        dc_prev[ci] += reader.receive_extend(size)
                        blk[0] = dc_prev[ci]
                        k = 1
                        while k < 64:
                            rs = ac_dec.decode(reader)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            blk[k] = reader.receive_extend(size)
                            k += 1
                        store[ci][my * c["v"] + by, mx * c["h"] + bx] = blk
            mcu_count += 1

    # dequant + IDCT per component (vectorized over all blocks)
    planes = []
    for ci, c in enumerate(order):
        coef = np.zeros_like(store[ci])
        coef[:, :, ZIGZAG] = store[ci]
        coef = coef.reshape(coef.shape[0], coef.shape[1], 8, 8)
        spat = _dequant_idct(coef, qtables[c["tq"]])
        plane = _from_blocks(spat)
        # upsample to full MCU-grid resolution, then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)
