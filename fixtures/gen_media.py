"""Deterministic synthetic media table (multimodal fixtures).

Schema = rayxt.multimodal.MEDIA_SCHEMA.  Payload formats per kind:

* image -> real PNG (8-bit grey/RGB/RGBA, rows cycling through all
  five scanline filters so the decoder's filter paths are exercised),
  with every 4th image row a real baseline JPEG (JFIF, 4:2:0, Annex K
  tables, quality 85) from the spec-true encoder below;
* audio -> real RIFF/WAVE PCM16 (1-2 channels);
* video -> the RAYX raw-frame container (no stdlib-expressible real
  video codec; frame sampling operates on raw frames).

Everything derives from the row index — no randomness, regenerates
byte-identically anywhere.  ``media_ground_truth(i)`` returns the
expected decode stats: for the LOSSLESS formats they come from the
SOURCE arrays before encoding (golden generation runs no decoder —
the engine must invert the encoding); for the lossy JPEG rows they
come from the INDEPENDENT naive decoder in
``tests/oracle/jpeg_oracle.py``, which the engine must match
bit-for-bit.
"""

from __future__ import annotations

import hashlib
import os
import struct
import sys
import zlib

import numpy as np
import pyarrow as pa

try:
    from ray import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

_MAGIC = b"RAYX"


def _h(i: int, salt: str) -> int:
    return int.from_bytes(hashlib.sha256(f"{salt}:{i}".encode()).digest()[:8], "big")


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_COLOURS = (0, 2, 6)  # grey, RGB, RGBA
_PNG_CH = {0: 1, 2: 3, 6: 4}


def _body(i: int, n: int) -> np.ndarray:
    seed = _h(i, "px")
    return ((np.arange(n, dtype=np.uint64) * np.uint64(2654435761)
             + np.uint64(seed)) >> np.uint64(24)).astype(np.uint8)


def _png_encode(arr: np.ndarray, colour: int) -> bytes:
    """Minimal spec-true PNG writer; row y uses filter y % 5."""
    h, stride = arr.shape
    ch = _PNG_CH[colour]
    flat = arr.astype(np.int64)
    zeros = np.zeros(ch, dtype=np.int64)
    lines = []
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int64)
        a = np.concatenate([zeros, cur[:-ch]]) if stride > ch else \
            np.zeros(stride, dtype=np.int64)
        c = np.concatenate([zeros, prev[:-ch]]) if stride > ch else \
            np.zeros(stride, dtype=np.int64)
        f = y % 5
        if f == 0:
            out = cur
        elif f == 1:
            out = cur - a
        elif f == 2:
            out = cur - prev
        elif f == 3:
            out = cur - (a + prev) // 2
        else:  # Paeth
            p = a + prev - c
            pa_, pb, pc_ = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), a,
                            np.where(pb <= pc_, prev, c))
            out = cur - pred
        lines.append(bytes([f]) + (out & 0xFF).astype(np.uint8).tobytes())
    comp = zlib.compress(b"".join(lines))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    w = stride // ch
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colour, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp)
            + chunk(b"IEND", b""))


def _png_filter_line(cur, prev, ch: int, f: int) -> bytes:
    """Filter one scanline (int64 arrays) with PNG filter ``f``."""
    stride = len(cur)
    zeros = np.zeros(ch, dtype=np.int64)
    a = np.concatenate([zeros, cur[:-ch]]) if stride > ch else \
        np.zeros(stride, dtype=np.int64)
    c = np.concatenate([zeros, prev[:-ch]]) if stride > ch else \
        np.zeros(stride, dtype=np.int64)
    if f == 0:
        out = cur
    elif f == 1:
        out = cur - a
    elif f == 2:
        out = cur - prev
    elif f == 3:
        out = cur - (a + prev) // 2
    else:  # Paeth
        p = a + prev - c
        pa_, pb, pc_ = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
        pred = np.where((pa_ <= pb) & (pa_ <= pc_), a,
                        np.where(pb <= pc_, prev, c))
        out = cur - pred
    return bytes([f]) + (out & 0xFF).astype(np.uint8).tobytes()


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_encode_adam7(arr: np.ndarray, colour: int) -> bytes:
    """Spec-true Adam7-interlaced PNG writer (same pixels as
    ``_png_encode`` would carry).  Each pass is filtered as its own
    sub-image (prev scanline = previous scanline OF THE PASS); the
    filter type cycles over a global scanline counter so every pass
    mixes filter kinds.  Empty passes emit no bytes at all."""
    h, stride = arr.shape
    ch = _PNG_CH[colour]
    w = stride // ch
    flat = arr.astype(np.int64)
    lines = []
    counter = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        cols = (x0 + dx * np.arange(pw)) * ch
        col_idx = (cols[:, None] + np.arange(ch)[None, :]).ravel()
        sub = flat[y0::dy][:ph][:, col_idx]
        prev = np.zeros(pw * ch, dtype=np.int64)
        for r in range(ph):
            lines.append(_png_filter_line(sub[r], prev, ch, counter % 5))
            prev = sub[r]
            counter += 1
    comp = zlib.compress(b"".join(lines))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colour, 0, 0, 1)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp)
            + chunk(b"IEND", b""))


def _gif_lzw_encode(indices: bytes, min_code_size: int,
                    reset_every: int | None = None) -> bytes:
    """From-scratch GIF-variant LZW: variable code width growing at
    table size ``2^width`` (the decoder, one entry behind, grows at
    ``2^width - 1``), LSB-first bit packing, CLEAR emitted up front,
    on (optional) ``reset_every`` emissions, and before the 12-bit
    table could overflow; EOI terminates."""
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = 0
    nacc = 0
    out = bytearray()

    def emit(code: int, width: int):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}, clear + 2, \
            min_code_size + 1

    table, next_code, width = fresh()
    emit(clear, width)
    cur = indices[0:1]
    emitted = 0
    for j in range(1, len(indices)):
        k = indices[j:j + 1]
        if cur + k in table:
            cur = cur + k
            continue
        emit(table[cur], width)
        emitted += 1
        if next_code < 4095:
            table[cur + k] = next_code
            next_code += 1
            if width < 12 and next_code == (1 << width):
                width += 1
        else:  # table nearly full: reset rather than defer
            emit(clear, width)
            table, next_code, width = fresh()
        if reset_every and emitted % reset_every == 0:
            emit(clear, width)
            table, next_code, width = fresh()
        cur = k
    emit(table[cur], width)
    emit(eoi, width)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_encode(frames: list, palette: np.ndarray, *,
                interlace: bool = False, local_tables: bool = False,
                reset_every: int | None = None) -> bytes:
    """Spec-true GIF89a writer: logical screen + global colour table
    (or per-image local tables), a graphic-control extension per frame
    (sub-block skipping must be exercised), LZW-compressed image data
    in <=255-byte sub-blocks, optional 4-pass row interlace."""
    h, w = frames[0].shape
    n_col = len(palette)
    bits = max(2, (n_col - 1).bit_length())
    packed = (0x80 | 0x70 | (bits - 1)) if not local_tables else 0x70
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", w, h, packed, 0, 0)
    pal_bytes = palette.astype(np.uint8).tobytes()
    pal_bytes += b"\x00" * (3 * (1 << bits) - len(pal_bytes))
    if not local_tables:
        out += pal_bytes
    for fi, fr in enumerate(frames):
        # GCE: delay 4/100 s, no transparency
        out += b"\x21\xF9\x04" + struct.pack("<BHB", 0, 4, 0) + b"\x00"
        ipk = (0x40 if interlace else 0)
        if local_tables:
            ipk |= 0x80 | (bits - 1)
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, ipk)
        if local_tables:
            out += pal_bytes
        idx = fr
        if interlace:
            rows = np.concatenate(
                [np.arange(s, h, st) for s, st in _GIF_INTERLACE])
            idx = fr[rows]
        min_code = max(2, bits)
        lzw = _gif_lzw_encode(idx.astype(np.uint8).tobytes(), min_code,
                              reset_every=reset_every)
        out.append(min_code)
        for off in range(0, len(lzw), 255):
            blk = lzw[off:off + 255]
            out.append(len(blk))
            out += blk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def _wav_encode(samples: np.ndarray, channels: int, sr: int = 8000) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, sr, sr * channels * 2,
                      channels * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# -- baseline JPEG encoder (spec-true, stdlib+numpy) ------------------------
# Annex K example tables (ITU-T T.81); 4:2:0 subsampling; quality 85 via
# the libjpeg scaling formula.  The engine and oracle decoders read all
# tables from the bitstream, so these constants live only here.

_JQT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)
_JQT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64).reshape(8, 8)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

_DC_LUM_BITS = (0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_DC_LUM_VALS = tuple(range(12))
_DC_CHR_BITS = (0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
_DC_CHR_VALS = tuple(range(12))
_AC_LUM_BITS = (0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_AC_LUM_VALS = (
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
    0xF9, 0xFA)
_AC_CHR_BITS = (0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
_AC_CHR_VALS = (
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
    0xF9, 0xFA)


def _jpeg_quality_tables(quality: int):
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def q(base):
        t = (base * scale + 50) // 100
        return np.clip(t, 1, 255).astype(np.int64)
    return q(_JQT_LUM), q(_JQT_CHR)


def _huff_codes(bits, vals):
    """(bits, vals) -> {symbol: (code, length)} per T.81 C.2."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DCT_M = None


def _dct_matrix() -> np.ndarray:
    global _DCT_M
    if _DCT_M is None:
        u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
        m[0, :] = m[0, :] / np.sqrt(2.0)
        _DCT_M = m
    return _DCT_M


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int):
    """JPEG magnitude category + appended bits."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(bw, block_q, prev_dc, dc_codes, ac_codes):
    zz = block_q.flatten()[_ZIGZAG]
    dc = int(zz[0])
    size, bits = _magnitude(dc - prev_dc)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _jpeg_encode(rgb: np.ndarray, quality: int = 85,
                 restart_interval: int = 0) -> bytes:
    """Baseline JFIF: YCbCr, 4:2:0, Annex K huffman tables.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (byte-aligned, DC predictors reset) — the T.81
    restart machinery real-world encoders use for error resilience."""
    h, w, _ = rgb.shape
    qt_l, qt_c = _jpeg_quality_tables(quality)
    m = _dct_matrix()

    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0

    # pad to a multiple of 16 by edge replication (MCU = 16x16 at 4:2:0)
    ph = (h + 15) // 16 * 16
    pw = (w + 15) // 16 * 16

    def pad(p):
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    y, cb, cr = pad(y), pad(cb), pad(cr)
    # 4:2:0: average each 2x2
    cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    def quant_block(plane, by, bx, qt):
        blk = plane[by:by + 8, bx:bx + 8] - 128.0
        coef = m @ blk @ m.T
        return np.round(coef / qt).astype(np.int64)

    dc_l = _huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_l = _huff_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_c = _huff_codes(_DC_CHR_BITS, _DC_CHR_VALS)
    ac_c = _huff_codes(_AC_CHR_BITS, _AC_CHR_VALS)

    bw = _BitWriter()
    prev = [0, 0, 0]  # Y, Cb, Cr DC predictors
    mcu_count = 0
    rst = 0
    for my in range(0, ph, 16):
        for mx in range(0, pw, 16):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()  # pad to byte boundary with 1-bits
                bw.out += bytes([0xFF, 0xD0 + rst])  # RSTn, raw (unstuffed)
                rst = (rst + 1) % 8
                prev = [0, 0, 0]
            mcu_count += 1
            for sy in (0, 8):
                for sx in (0, 8):
                    prev[0] = _encode_block(
                        bw, quant_block(y, my + sy, mx + sx, qt_l),
                        prev[0], dc_l, ac_l)
            prev[1] = _encode_block(
                bw, quant_block(cb, my // 2, mx // 2, qt_c),
                prev[1], dc_c, ac_c)
            prev[2] = _encode_block(
                bw, quant_block(cr, my // 2, mx // 2, qt_c),
                prev[2], dc_c, ac_c)
    bw.flush()

    def seg(marker: int, data: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data

    def dqt(tid: int, qt) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(
            int(qt.flatten()[_ZIGZAG][k]) for k in range(64)))

    def dht(cls: int, tid: int, bits, vals) -> bytes:
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits[1:17])
                   + bytes(vals))

    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]))
    sos = seg(0xDA, bytes([3]) + bytes([1, 0x00]) + bytes([2, 0x11])
              + bytes([3, 0x11]) + bytes([0, 63, 0]))
    app0 = seg(0xE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
               + bytes([0, 0]))
    dri = seg(0xDD, struct.pack(">H", restart_interval)) \
        if restart_interval else b""
    return (b"\xFF\xD8" + app0 + dqt(0, qt_l) + dqt(1, qt_c) + sof
            + dht(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
            + dht(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
            + dht(0, 1, _DC_CHR_BITS, _DC_CHR_VALS)
            + dht(1, 1, _AC_CHR_BITS, _AC_CHR_VALS)
            + dri + sos + bytes(bw.out) + b"\xFF\xD9")


# -- progressive JPEG (SOF2) encoder ---------------------------------------
#
# Emits a libjpeg-style scan script: DC-first (Al=1, interleaved or
# per-component), spectral-selection AC-first scans with EOB-run
# coding, then DC and AC successive-approximation refinement scans
# (the jcphuff correction-bit buffering algorithm).  The AC scans use
# a custom uniform 8-bit Huffman table because the Annex K tables lack
# the EOBn (n>0) symbols progressive streams need.

#: all AC-scan symbols at code length 8 (176 codes < 255: valid Kraft,
#: all-ones code unused)
_PROG_AC_VALS = tuple(
    [n << 4 for n in range(15)] + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_PROG_AC_BITS = (0,) + (0,) * 7 + (len(_PROG_AC_VALS),) + (0,) * 8


def _jpeg_quant_grids(rgb: np.ndarray, quality: int):
    """-> (qt_l, qt_c, grids): per-component zigzag int64 coefficient
    block grids at MCU-padded size (same color/pad/subsample/quantize
    math as the baseline encoder, so a progressive stream carries the
    IDENTICAL coefficients as the baseline stream of the same image)."""
    h, w, _ = rgb.shape
    qt_l, qt_c = _jpeg_quality_tables(quality)
    m = _dct_matrix()
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    ph = (h + 15) // 16 * 16
    pw = (w + 15) // 16 * 16

    def pad(p):
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    y, cb, cr = pad(y), pad(cb), pad(cr)
    cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    def grid(plane, qt):
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        out = np.zeros((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coefs = m @ blk @ m.T
                out[by, bx] = np.round(coefs / qt).astype(
                    np.int64).flatten()[_ZIGZAG]
        return out

    return qt_l, qt_c, {1: grid(y, qt_l), 2: grid(cb, qt_c),
                        3: grid(cr, qt_c)}


class _ProgAcState:
    """Cross-block AC-scan state: pending EOB run + the correction
    bits buffered for the blocks inside it (refinement scans)."""

    __slots__ = ("eobrun", "be")

    def __init__(self):
        self.eobrun = 0
        self.be = []

    def flush(self, bw, ac_codes):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, length = ac_codes[nbits << 4]
            bw.write(code, length)
            if nbits:
                bw.write(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
            for bit in self.be:
                bw.write(bit, 1)
            self.be = []


def _enc_ac_first(bw, blk, ac_codes, ss, se, al, st: _ProgAcState):
    r = 0
    for k in range(ss, se + 1):
        c = int(blk[k])
        t = abs(c) >> al
        if t == 0:
            r += 1
            continue
        st.flush(bw, ac_codes)
        while r > 15:
            code, length = ac_codes[0xF0]
            bw.write(code, length)
            r -= 16
        size, bits = _magnitude(t if c > 0 else -t)
        code, length = ac_codes[(r << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush(bw, ac_codes)


def _enc_ac_refine(bw, blk, ac_codes, ss, se, al, st: _ProgAcState):
    absvals = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1  # index of the last newly-nonzero coefficient
    for k in range(ss, se + 1):
        if absvals[k - ss] == 1:
            eob = k
    r = 0
    br: list = []  # this block's buffered correction bits
    for k in range(ss, se + 1):
        t = absvals[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            st.flush(bw, ac_codes)
            code, length = ac_codes[0xF0]
            bw.write(code, length)
            r -= 16
            for bit in br:
                bw.write(bit, 1)
            br = []
        if t > 1:  # nonzero history: buffer the correction bit
            br.append(t & 1)
            continue
        st.flush(bw, ac_codes)
        code, length = ac_codes[(r << 4) | 1]
        bw.write(code, length)
        bw.write(1 if int(blk[k]) > 0 else 0, 1)
        for bit in br:
            bw.write(bit, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.be.extend(br)
        if st.eobrun == 0x7FFF:
            st.flush(bw, ac_codes)


def _jpeg_encode_progressive(rgb: np.ndarray, quality: int = 85,
                             dc_split: bool = False) -> bytes:
    """Progressive JFIF (SOF2): YCbCr 4:2:0, same coefficients as
    `_jpeg_encode` of the same image, 10-scan libjpeg-style script.
    ``dc_split=True`` emits three single-component DC scans instead of
    one interleaved scan (exercises non-interleaved DC decoding)."""
    h, w, _ = rgb.shape
    qt_l, qt_c, grids = _jpeg_quant_grids(rgb, quality)
    comps = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]  # (cid, hs, vs)
    # non-interleaved block counts (ceil of the component's true dims;
    # hmax = vmax = 2 in this fixed 4:2:0 layout)
    ni = {}
    for cid, hs, vs in comps:
        cw = -(-(w * hs) // 2)
        ch = -(-(h * vs) // 2)
        ni[cid] = (-(-cw // 8), -(-ch // 8))
    mcus_x, mcus_y = -(-w // 16), -(-h // 16)

    dc_codes = {1: _huff_codes(_DC_LUM_BITS, _DC_LUM_VALS),
                2: _huff_codes(_DC_CHR_BITS, _DC_CHR_VALS),
                3: _huff_codes(_DC_CHR_BITS, _DC_CHR_VALS)}
    ac_codes = _huff_codes(_PROG_AC_BITS, _PROG_AC_VALS)

    def seg(marker: int, data: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data

    def sos(scan_comps, ss, se, ah, al) -> bytes:
        body = bytes([len(scan_comps)])
        for cid in scan_comps:
            td = 0 if cid == 1 else 1
            body += bytes([cid, (td << 4) | 0])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def dc_first_bits(scan_cids, al) -> bytes:
        bw = _BitWriter()
        pred = {cid: 0 for cid in scan_cids}
        if len(scan_cids) > 1:  # interleaved MCU order
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for cid, hs, vs in comps:
                        for by in range(vs):
                            for bx in range(hs):
                                v = int(grids[cid][my * vs + by,
                                                   mx * hs + bx, 0]) >> al
                                size, bits = _magnitude(v - pred[cid])
                                code, length = dc_codes[cid][size]
                                bw.write(code, length)
                                if size:
                                    bw.write(bits, size)
                                pred[cid] = v
        else:
            cid = scan_cids[0]
            bw_n, bh_n = ni[cid]
            for iy in range(bh_n):
                for ix in range(bw_n):
                    v = int(grids[cid][iy, ix, 0]) >> al
                    size, bits = _magnitude(v - pred[cid])
                    code, length = dc_codes[cid][size]
                    bw.write(code, length)
                    if size:
                        bw.write(bits, size)
                    pred[cid] = v
        bw.flush()
        return bytes(bw.out)

    def dc_refine_bits(scan_cids, al) -> bytes:
        bw = _BitWriter()
        if len(scan_cids) > 1:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for cid, hs, vs in comps:
                        for by in range(vs):
                            for bx in range(hs):
                                bw.write((int(grids[cid][my * vs + by,
                                                         mx * hs + bx, 0])
                                          >> al) & 1, 1)
        else:
            cid = scan_cids[0]
            bw_n, bh_n = ni[cid]
            for iy in range(bh_n):
                for ix in range(bw_n):
                    bw.write((int(grids[cid][iy, ix, 0]) >> al) & 1, 1)
        bw.flush()
        return bytes(bw.out)

    def ac_bits(cid, ss, se, ah, al) -> bytes:
        bw = _BitWriter()
        st = _ProgAcState()
        bw_n, bh_n = ni[cid]
        enc = _enc_ac_refine if ah else _enc_ac_first
        for iy in range(bh_n):
            for ix in range(bw_n):
                enc(bw, grids[cid][iy, ix], ac_codes, ss, se, al, st)
        st.flush(bw, ac_codes)
        bw.flush()
        return bytes(bw.out)

    def dqt(tid: int, qt) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(
            int(qt.flatten()[_ZIGZAG][k]) for k in range(64)))

    def dht(cls: int, tid: int, bits, vals) -> bytes:
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits[1:17])
                   + bytes(vals))

    app0 = seg(0xE0, b"JFIF\x00" + bytes([1, 1, 0])
               + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    sof2 = seg(0xC2, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, 0x22, 0]) + bytes([2, 0x11, 1])
               + bytes([3, 0x11, 1]))
    head = (b"\xFF\xD8" + app0 + dqt(0, qt_l) + dqt(1, qt_c) + sof2
            + dht(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
            + dht(0, 1, _DC_CHR_BITS, _DC_CHR_VALS)
            + dht(1, 0, _PROG_AC_BITS, _PROG_AC_VALS)
            + dht(1, 1, _PROG_AC_BITS, _PROG_AC_VALS))
    body = b""
    if dc_split:
        for cid, _, _ in comps:
            body += sos([cid], 0, 0, 0, 1) + dc_first_bits([cid], 1)
    else:
        body += sos([1, 2, 3], 0, 0, 0, 1) + dc_first_bits([1, 2, 3], 1)
    body += sos([1], 1, 5, 0, 2) + ac_bits(1, 1, 5, 0, 2)
    body += sos([2], 1, 63, 0, 1) + ac_bits(2, 1, 63, 0, 1)
    body += sos([3], 1, 63, 0, 1) + ac_bits(3, 1, 63, 0, 1)
    body += sos([1], 6, 63, 0, 2) + ac_bits(1, 6, 63, 0, 2)
    body += sos([1], 1, 63, 2, 1) + ac_bits(1, 1, 63, 2, 1)
    body += sos([1, 2, 3], 0, 0, 1, 0) + dc_refine_bits([1, 2, 3], 0)
    body += sos([2], 1, 63, 1, 0) + ac_bits(2, 1, 63, 1, 0)
    body += sos([3], 1, 63, 1, 0) + ac_bits(3, 1, 63, 1, 0)
    body += sos([1], 1, 63, 1, 0) + ac_bits(1, 1, 63, 1, 0)
    return head + body + b"\xFF\xD9"


def _image_spec(i: int):
    w = 8 + _h(i, "w") % 40
    h = 8 + _h(i, "h") % 40
    colour = _PNG_COLOURS[(i // 3) % 3]
    return w, h, colour


def _audio_spec(i: int):
    n = 1000 + _h(i, "n") % 4000  # samples per channel
    channels = 1 + (i // 3) % 2
    return n, channels


def _audio_samples(i: int, n: int, channels: int) -> np.ndarray:
    return (_body(i, n * channels).astype(np.int64) * 257 - 32768) \
        .clip(-32768, 32767).astype(np.int16)


def _avi_encode(jpeg_frames: list, w: int, h: int, fps: int = 10) -> bytes:
    """Mux baseline-JPEG frames into a spec-true MJPEG AVI (RIFF 'AVI '
    with LIST hdrl [avih, LIST strl [strh 'vids'/'MJPG', strf
    BITMAPINFOHEADER]], LIST movi of '00dc' chunks, and an idx1 index).
    The engine demuxer reads dims from strf and frames from movi; the
    independent oracle ignores the headers entirely (flat scan from the
    movi marker, dims from the first frame's own JPEG SOF)."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(form: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", form + body)

    n = len(jpeg_frames)
    max_bytes = max((len(f) for f in jpeg_frames), default=0)
    avih = chunk(b"avih", struct.pack(
        "<14I", 1_000_000 // fps, max_bytes * fps, 0, 0x10,  # HASINDEX
        n, 0, 1, max_bytes, w, h, 0, 0, 0, 0))
    strh = chunk(b"strh", b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, max_bytes, 10000, 0)
        + struct.pack("<4h", 0, 0, w, h))
    strf = chunk(b"strf", struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0))
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi_chunks, idx, off = [], [], 4  # offsets from the movi form tag
    for f in jpeg_frames:
        c = chunk(b"00dc", f)
        movi_chunks.append(c)
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += len(c)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _mp4_encode(jpeg_frames: list, w: int, h: int, fps: int = 10) -> bytes:
    """Minimal spec-true MJPEG-in-MP4 writer (ISO-BMFF) for fixtures.

    Deliberately a DIFFERENT layout from the engine's re-mux writer
    (`rayxt.multimodal._encode_mp4`): brand mp42, one chunk PER SAMPLE
    (stsc run (1,1,1)) and 64-bit co64 chunk offsets — so the demuxer's
    multi-chunk and co64 paths are exercised by the corpus."""

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + typ + body

    def full(typ: bytes, ver: int, flags: int, body: bytes) -> bytes:
        return box(typ, struct.pack(">I", (ver << 24) | flags) + body)

    n = len(jpeg_frames)
    timescale = 600
    dur = n * (timescale // fps)
    matrix = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0,
                         0, 0, 0x40000000)
    ftyp = box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42isom")
    mdat = box(b"mdat", b"".join(jpeg_frames))
    offs = []
    off = len(ftyp) + 8
    for f in jpeg_frames:
        offs.append(off)
        off += len(f)
    mvhd = full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, dur) + struct.pack(
        ">IHH", 0x00010000, 0x0100, 0) + b"\x00" * 8 + matrix
        + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = full(b"tkhd", 0, 3, struct.pack(">IIIII", 0, 0, 1, 0, dur)
                + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + matrix
                + struct.pack(">II", w << 16, h << 16))
    mdhd = full(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, timescale, dur)
                + struct.pack(">HH", 0x55C4, 0))
    hdlr = full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                + b"\x00" * 12 + b"fixture\x00")
    vmhd = full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dinf = box(b"dinf", full(b"dref", 0, 0, struct.pack(">I", 1)
                             + full(b"url ", 0, 1, b"")))
    entry = (struct.pack(">I4s", 86, b"jpeg") + b"\x00" * 6
             + struct.pack(">H", 1) + struct.pack(">HH", 0, 0)
             + b"\x00" * 12 + struct.pack(">HH", w, h)
             + struct.pack(">II", 0x00480000, 0x00480000)
             + struct.pack(">I", 0) + struct.pack(">H", 1)
             + b"\x00" * 32 + struct.pack(">Hh", 24, -1))
    stsd = full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = full(b"stts", 0, 0, struct.pack(">III", 1, n, timescale // fps))
    stsc = full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                + b"".join(struct.pack(">I", len(f)) for f in jpeg_frames))
    co64 = full(b"co64", 0, 0, struct.pack(">I", n)
                + b"".join(struct.pack(">Q", o) for o in offs))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + co64)
    minf = box(b"minf", vmhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _is_jpeg_row(i: int) -> bool:
    """Every 4th image row carries a baseline JPEG instead of a PNG."""
    return i % 3 == 0 and (i // 3) % 4 == 3


def _is_gif_row(i: int) -> bool:
    """A quarter of the image rows carry a GIF (possibly animated)."""
    return i % 3 == 0 and (i // 3) % 4 == 1


def _is_adam7_row(i: int) -> bool:
    """A quarter of the image rows carry an Adam7-interlaced PNG."""
    return i % 3 == 0 and (i // 3) % 4 == 2


def _gif_spec(i: int):
    """(w, h, frames, palette array, interlace, local_tables,
    reset_every) — cycles palette width 4/16/256 colours, interlaced
    rows, local-vs-global tables, and forced mid-stream LZW resets."""
    w, h, _colour = _image_spec(i)
    frames = 1 + _h(i, "gf") % 3
    bits = (2, 4, 8)[(i // 12) % 3]
    n_col = 1 << bits
    palette = _body(i * 7 + 1, 3 * n_col).reshape(n_col, 3)
    interlace = (i // 24) % 2 == 1
    local_tables = (i // 36) % 3 == 2
    reset_every = 300 if (i // 12) % 2 == 1 else None
    return w, h, frames, palette, interlace, local_tables, reset_every


def _gif_frame_indices(i: int, f: int, w: int, h: int,
                       n_col: int) -> np.ndarray:
    return (_body(i * 131 + f, h * w) % n_col).reshape(h, w)


def _is_avi_row(i: int) -> bool:
    """Every 3rd video row is a real MJPEG AVI instead of RAYX raw."""
    return i % 3 == 2 and (i // 3) % 3 == 2


def _is_mp4_row(i: int) -> bool:
    """Another third of the video rows is MJPEG-in-MP4 (ISO-BMFF)."""
    return i % 3 == 2 and (i // 3) % 3 == 1


def _avi_spec(i: int):
    """Small dims / few frames: JPEG frames are decoded by the pure
    numpy decoder during golden generation."""
    w = 16 + _h(i, "aw") % 16
    h = 16 + _h(i, "ah") % 16
    frames = 3 + _h(i, "af") % 4
    return w, h, frames


def _avi_frame_src(i: int, f: int, w: int, h: int) -> np.ndarray:
    return _body(i * 1009 + f, h * w * 3).reshape(h, w, 3)


def _jpeg_ri(i: int) -> int:
    """Restart interval for JPEG row i: cycles 0 (no DRI), 1, 2 MCUs so
    two thirds of the JPEG rows exercise the RSTn machinery."""
    return (i // 12) % 3


def _jpeg_mode(i: int) -> int:
    """JPEG flavor for row i: 0 = baseline, 1 = progressive,
    2 = progressive with split (non-interleaved) DC scans.  Cycles so
    every third JPEG row is baseline and the rest exercise the SOF2
    decoder's two DC scan shapes."""
    return (i // 24) % 3


def _jpeg_payload(i: int, src: np.ndarray) -> bytes:
    mode = _jpeg_mode(i)
    if mode == 0:
        return _jpeg_encode(src, 85, restart_interval=_jpeg_ri(i))
    return _jpeg_encode_progressive(src, 85, dc_split=mode == 2)


# -- WebP lossless (VP8L) writer ---------------------------------------------
#
# Spec-true encoder used only to build fixtures: LSB-first bit writer,
# canonical length-limited Huffman with the full code-length coding
# (16/17/18 repeats), simple 1/2-symbol codes, colour cache, LZ77
# backward references over the 2-D distance planes, meta prefix-code
# groups, and all four transforms (predictor with the 14 modes cycling
# per block, colour transform, subtract-green, colour-indexing with
# sub-byte bundling).  The engine decoder (rayxt/webp.py) and the
# independent oracle (tests/oracle/webp_oracle.py) must both invert it
# exactly — VP8L is lossless.


class _LsbWriter:
    """LSB-first bit writer (VP8L convention, unlike JPEG's MSB-first
    ``_BitWriter`` above)."""

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def bits(self, value: int, n: int) -> None:
        for k in range(n):
            self.cur |= ((value >> k) & 1) << self.nbits
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def code(self, code: int, length: int) -> None:
        """Prefix CODES are emitted MSB-first (decoder builds the code
        one bit at a time)."""
        for k in range(length - 1, -1, -1):
            self.bits((code >> k) & 1, 1)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur)
            self.cur = 0
            self.nbits = 0
        return bytes(self.out)


def _vp8l_plane_codes() -> dict:
    """(dx, dy) -> 1-based plane code (inverse of the decoder's
    table): dy 0..7, dx -7..8, ordered by squared distance, ties by
    larger dy then positive dx first."""
    pairs = [(dx, dy)
             for dy in range(8) for dx in range(-7, 9)
             if not (dy == 0 and dx < 1)]
    pairs.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0))
    return {p: i + 1 for i, p in enumerate(pairs)}


_VP8L_PLANES = _vp8l_plane_codes()


def _vp8l_dist_code(dist: int, w: int) -> int:
    for dy in range(8):
        dx = dist - dy * w
        if (dx, dy) in _VP8L_PLANES and max(1, dy * w + dx) == dist:
            return _VP8L_PLANES[(dx, dy)]
    return dist + 120


def _vp8l_lz77_sym(value: int):
    """LZ77 length/distance value -> (prefix symbol, extra, n_extra)."""
    if value <= 4:
        return value - 1, 0, 0
    rem = value - 1
    extra_bits = rem.bit_length() - 2
    bit = (rem >> extra_bits) - 2
    sym = 2 * extra_bits + 2 + bit
    offset = (2 + bit) << extra_bits
    return sym, rem - offset, extra_bits


def _vp8l_huff_lengths(freqs, limit: int):
    """Heap Huffman; on depth overflow halve frequencies and retry
    (fixture images are tiny, one retry is already rare)."""
    import heapq

    f = list(freqs)
    while True:
        heap = [(fr, sym, ("leaf", sym)) for sym, fr in enumerate(f) if fr > 0]
        heapq.heapify(heap)
        if len(heap) <= 1:
            return [1 if fr > 0 else 0 for fr in f]
        uid = len(f)
        while len(heap) > 1:
            fa, _, na = heapq.heappop(heap)
            fb, _, nb = heapq.heappop(heap)
            heapq.heappush(heap, (fa + fb, uid, ("node", na, nb)))
            uid += 1
        lengths = [0] * len(f)
        stack = [(heap[0][2], 0)]
        max_d = 0
        while stack:
            node, d = stack.pop()
            if node[0] == "leaf":
                lengths[node[1]] = max(1, d)
                max_d = max(max_d, d)
            else:
                stack.append((node[1], d + 1))
                stack.append((node[2], d + 1))
        if max_d <= limit:
            return lengths
        f = [(fr + 1) >> 1 if fr > 0 else 0 for fr in f]


def _vp8l_canon(lengths) -> dict:
    """lengths -> {sym: (code, length)} (canonical, DEFLATE order)."""
    used = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln > 0)
    codes = {}
    code = 0
    prev_len = 0
    for ln, sym in used:
        code <<= ln - prev_len
        prev_len = ln
        codes[sym] = (code, ln)
        code += 1
    return codes


def _vp8l_write_code(bw: _LsbWriter, lengths) -> dict:
    """Emit one prefix-code header; return the symbol->code map the
    token writer must use.  Uses the simple spelling when possible."""
    used = [s for s, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(used) <= 2 and max(used) <= 255:
        bw.bits(1, 1)  # simple
        bw.bits(len(used) - 1, 1)
        first = used[0]
        if first > 1:
            bw.bits(1, 1)
            bw.bits(first, 8)
        else:
            bw.bits(0, 1)
            bw.bits(first, 1)
        if len(used) == 1:
            return {first: (0, 0)}
        bw.bits(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}
    bw.bits(0, 1)  # normal: code lengths themselves prefix-coded
    # RLE-tokenize the length array (exercises 16/17/18 on decode)
    toks = []
    i = 0
    n = len(lengths)
    while i < n:
        ln = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == ln:
            run += 1
        if ln == 0:
            left = run
            while left >= 11:
                take = min(left, 138)
                toks.append((18, take - 11, 7))
                left -= take
            while left >= 3:
                take = min(left, 10)
                toks.append((17, take - 3, 3))
                left -= take
            toks.extend((0, 0, 0) for _ in range(left))
        else:
            toks.append((ln, 0, 0))
            left = run - 1
            while left >= 3:
                take = min(left, 6)
                toks.append((16, take - 3, 2))
                left -= take
            toks.extend((ln, 0, 0) for _ in range(left))
        i += run
    clc_order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
                 11, 12, 13, 14, 15)
    cl_freq = [0] * 19
    for sym, _, _ in toks:
        cl_freq[sym] += 1
    cl_lengths = _vp8l_huff_lengths(cl_freq, 7)
    if sum(1 for ln in cl_lengths if ln) == 1:
        # a lone CL symbol decodes as a 0-bit code; keep its length 1
        pass
    cl_codes = _vp8l_canon(cl_lengths)
    single_cl = sum(1 for ln in cl_lengths if ln) == 1
    bw.bits(19 - 4, 4)
    for s in clc_order:
        bw.bits(cl_lengths[s], 3)
    bw.bits(0, 1)  # no max-symbol cap
    for sym, extra, n_extra in toks:
        if not single_cl:
            c, ln = cl_codes[sym]
            bw.code(c, ln)
        if n_extra:
            bw.bits(extra, n_extra)
    return _vp8l_canon(lengths)


def _vp8l_hash(px: int, bits: int) -> int:
    return ((px * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - bits)


def _vp8l_tokenize(flat, w, h, *, cache_bits=0, use_lz77=False,
                   meta_bits=0, n_groups=1):
    """Pixel stream -> per-position tokens + group ids.  Tokens:
    ('lit', a, r, g, b) | ('cache', idx) | ('copy', length, dist)."""
    total = len(flat)
    cache = [None] * (1 << cache_bits) if cache_bits else None
    mw = ((w + (1 << meta_bits) - 1) >> meta_bits) if meta_bits else 0
    tokens = []
    pos = 0
    while pos < total:
        x, y = pos % w, pos // w
        gid = 0
        if meta_bits:
            gid = ((y >> meta_bits) * mw + (x >> meta_bits)) % n_groups
        best_len = 0
        best_dist = 0
        if use_lz77:
            for dist in (1, w):
                if dist == 0 or dist > pos:
                    continue
                ln = 0
                while pos + ln < total and ln < 4096 \
                        and flat[pos + ln - dist] == flat[pos + ln]:
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, dist
        if best_len >= 3:
            tokens.append((gid, ("copy", best_len, best_dist)))
            if cache is not None:
                for k in range(best_len):
                    px = int(flat[pos + k])
                    cache[_vp8l_hash(px, cache_bits)] = px
            pos += best_len
            continue
        px = int(flat[pos])
        if cache is not None:
            idx = _vp8l_hash(px, cache_bits)
            if cache[idx] == px:
                tokens.append((gid, ("cache", idx)))
                pos += 1
                continue
            cache[idx] = px
        tokens.append((gid, ("lit", (px >> 24) & 0xFF, (px >> 16) & 0xFF,
                             (px >> 8) & 0xFF, px & 0xFF)))
        pos += 1
    return tokens


def _vp8l_write_image(bw, flat, w, h, *, top_level, cache_bits=0,
                      use_lz77=False, meta_bits=0, n_groups=1):
    """Write one entropy-coded image (recursively for the meta image)."""
    if top_level:
        if meta_bits:
            bw.bits(1, 1)
            bw.bits(meta_bits - 2, 3)
            mw = (w + (1 << meta_bits) - 1) >> meta_bits
            mh = (h + (1 << meta_bits) - 1) >> meta_bits
            gids = np.arange(mw * mh, dtype=np.uint32) % n_groups
            meta_flat = (np.uint32(0xFF) << 24) | (gids << 8)
            _vp8l_write_image(bw, meta_flat, mw, mh, top_level=False)
        else:
            bw.bits(0, 1)
    if cache_bits:
        bw.bits(1, 1)
        bw.bits(cache_bits, 4)
    else:
        bw.bits(0, 1)
    tokens = _vp8l_tokenize(flat, w, h, cache_bits=cache_bits,
                            use_lz77=use_lz77, meta_bits=meta_bits,
                            n_groups=n_groups)
    groups = n_groups if meta_bits else 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    freqs = [[([0] * (256 + 24 + cache_size)), [0] * 256, [0] * 256,
              [0] * 256, [0] * 40] for _ in range(groups)]
    for gid, tok in tokens:
        fg = freqs[gid]
        if tok[0] == "lit":
            _, a, r, g, b = tok
            fg[0][g] += 1
            fg[1][r] += 1
            fg[2][b] += 1
            fg[3][a] += 1
        elif tok[0] == "cache":
            fg[0][280 + tok[1]] += 1
        else:
            lsym, _, _ = _vp8l_lz77_sym(tok[1])
            fg[0][256 + lsym] += 1
            dsym, _, _ = _vp8l_lz77_sym(_vp8l_dist_code(tok[2], w))
            fg[4][dsym] += 1
    codes = []
    for fg in freqs:
        group_codes = []
        for f in fg:
            if not any(f):
                f = list(f)
                f[0] = 1  # decoder requires a present (if unused) code
            lengths = _vp8l_huff_lengths(f, 15)
            group_codes.append(_vp8l_write_code(bw, lengths))
        codes.append(group_codes)
    for gid, tok in tokens:
        green_c, red_c, blue_c, alpha_c, dist_c = codes[gid]
        if tok[0] == "lit":
            _, a, r, g, b = tok
            bw.code(*green_c[g])
            bw.code(*red_c[r])
            bw.code(*blue_c[b])
            bw.code(*alpha_c[a])
        elif tok[0] == "cache":
            bw.code(*green_c[280 + tok[1]])
        else:
            _, length, dist = tok
            lsym, extra, n_extra = _vp8l_lz77_sym(length)
            bw.code(*green_c[256 + lsym])
            if n_extra:
                bw.bits(extra, n_extra)
            dsym, dextra, dn = _vp8l_lz77_sym(_vp8l_dist_code(dist, w))
            bw.code(*dist_c[dsym])
            if dn:
                bw.bits(dextra, dn)


def _vp8l_s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _vp8l_fwd_predictor(flat, w, h, size_bits):
    """Residual image + mode sub-image; block modes cycle 0..13 so all
    14 predictors appear.  Prediction uses the ORIGINAL pixels as the
    already-decoded neighbours (lossless <=> identical)."""
    from rayxt.webp import _predict  # shared mode arithmetic (frozen spec)

    mw = (w + (1 << size_bits) - 1) >> size_bits
    mh = (h + (1 << size_bits) - 1) >> size_bits
    modes = (np.arange(mw * mh, dtype=np.uint32) % 14)
    ch = np.stack([(flat >> 24) & 0xFF, (flat >> 16) & 0xFF,
                   (flat >> 8) & 0xFF, flat & 0xFF], axis=-1).astype(int)
    res = np.zeros_like(ch)
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = (255, 0, 0, 0)
        elif y == 0:
            pred = tuple(ch[pos - 1])
        elif x == 0:
            pred = tuple(ch[pos - w])
        else:
            mode = int(modes[(y >> size_bits) * mw + (x >> size_bits)])
            pred = _predict(mode, tuple(ch[pos - 1]), tuple(ch[pos - w]),
                            tuple(ch[pos - w - 1]), tuple(ch[pos - w + 1]))
        res[pos] = [(int(c) - int(p)) & 0xFF for c, p in zip(ch[pos], pred)]
    res = res.astype(np.uint32)
    res_flat = (res[:, 0] << 24) | (res[:, 1] << 16) | (res[:, 2] << 8) \
        | res[:, 3]
    mode_img = (np.uint32(0xFF) << 24) | (modes << 8)
    return res_flat, mode_img, mw, mh


def _vp8l_fwd_color(flat, w, h, size_bits):
    """Forward colour transform with multipliers cycling per block."""
    mw = (w + (1 << size_bits) - 1) >> size_bits
    mh = (h + (1 << size_bits) - 1) >> size_bits
    g2r = (np.arange(mw * mh) * 37 + 11) % 256
    g2b = (np.arange(mw * mh) * 73 + 5) % 256
    r2b = (np.arange(mw * mh) * 101 + 29) % 256
    out = flat.copy()
    for pos in range(w * h):
        x, y = pos % w, pos // w
        b_i = (y >> size_bits) * mw + (x >> size_bits)
        px = int(flat[pos])
        g = _vp8l_s8((px >> 8) & 0xFF)
        red = (px >> 16) & 0xFF
        blue = px & 0xFF
        red_e = (red - ((_vp8l_s8(int(g2r[b_i])) * g) >> 5)) & 0xFF
        blue_e = (blue - ((_vp8l_s8(int(g2b[b_i])) * g) >> 5)
                  - ((_vp8l_s8(int(r2b[b_i])) * _vp8l_s8(red)) >> 5)) & 0xFF
        out[pos] = (px & 0xFF00FF00) | (red_e << 16) | blue_e
    elems = ((np.uint32(0xFF) << 24) | (r2b.astype(np.uint32) << 16)
             | (g2b.astype(np.uint32) << 8) | g2r.astype(np.uint32))
    return out, elems, mw, mh


def _vp8l_encode(argb: np.ndarray, *, alpha_hint: int = 0,
                 transforms=(), cache_bits: int = 0,
                 use_lz77: bool = False, meta_bits: int = 0,
                 n_groups: int = 1, palette_size: int = 0) -> bytes:
    """(h, w, 4) uint8 [A,R,G,B] -> VP8L chunk payload."""
    h, w, _ = argb.shape
    a = argb[..., 0].astype(np.uint32)
    r = argb[..., 1].astype(np.uint32)
    g = argb[..., 2].astype(np.uint32)
    b = argb[..., 3].astype(np.uint32)
    flat = ((a << 24) | (r << 16) | (g << 8) | b).reshape(-1)
    bw = _LsbWriter()
    bw.bits(0x2F, 8)
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(alpha_hint, 1)
    bw.bits(0, 3)  # version
    cur_w = w
    if palette_size:
        # colour-indexing transform: palette from the distinct pixels
        uniq = np.unique(flat)
        assert len(uniq) <= palette_size <= 256
        pal = np.zeros(palette_size, dtype=np.uint32)
        pal[:len(uniq)] = uniq
        lookup = {int(p): i for i, p in enumerate(pal)}
        idx = np.array([lookup[int(p)] for p in flat], dtype=np.uint32)
        if palette_size <= 2:
            wb = 3
        elif palette_size <= 4:
            wb = 2
        elif palette_size <= 16:
            wb = 1
        else:
            wb = 0
        bw.bits(1, 1)
        bw.bits(3, 2)  # transform type 3
        bw.bits(palette_size - 1, 8)
        # delta-code the palette entries componentwise
        pal_ch = np.stack([(pal >> 24) & 0xFF, (pal >> 16) & 0xFF,
                           (pal >> 8) & 0xFF, pal & 0xFF], axis=-1)
        deltas = np.diff(np.vstack([[0, 0, 0, 0], pal_ch]), axis=0) % 256
        dflat = ((deltas[:, 0].astype(np.uint32) << 24)
                 | (deltas[:, 1].astype(np.uint32) << 16)
                 | (deltas[:, 2].astype(np.uint32) << 8)
                 | deltas[:, 3].astype(np.uint32))
        _vp8l_write_image(bw, dflat, palette_size, 1, top_level=False)
        if wb:
            per = 1 << wb
            bits = 8 >> wb
            packed_w = (w + per - 1) // per
            grid = np.zeros((h, packed_w * per), dtype=np.uint32)
            grid[:, :w] = idx.reshape(h, w)
            packed = np.zeros((h, packed_w), dtype=np.uint32)
            for k in range(per):
                packed |= grid[:, k::per] << (k * bits)
            flat = ((np.uint32(0xFF) << 24) | (packed << 8)).reshape(-1)
            cur_w = packed_w
        else:
            flat = ((np.uint32(0xFF) << 24) | (idx << 8)).reshape(-1)
    for t in transforms:
        if t == "subgreen":
            bw.bits(1, 1)
            bw.bits(2, 2)
            gch = (flat >> 8) & 0xFF
            rch = (((flat >> 16) & 0xFF) - gch) & 0xFF
            bch = ((flat & 0xFF) - gch) & 0xFF
            flat = (flat & 0xFF00FF00) | (rch << 16) | bch
        elif t == "predictor":
            size_bits = 2
            res, mode_img, mw, mh = _vp8l_fwd_predictor(
                flat, cur_w, h, size_bits)
            bw.bits(1, 1)
            bw.bits(0, 2)
            bw.bits(size_bits - 2, 3)
            _vp8l_write_image(bw, mode_img, mw, mh, top_level=False)
            flat = res
        elif t == "color":
            size_bits = 3
            res, elems, mw, mh = _vp8l_fwd_color(flat, cur_w, h, size_bits)
            bw.bits(1, 1)
            bw.bits(1, 2)
            bw.bits(size_bits - 2, 3)
            _vp8l_write_image(bw, elems, mw, mh, top_level=False)
            flat = res
        else:  # pragma: no cover - guard
            raise ValueError(t)
    bw.bits(0, 1)  # end of transforms
    _vp8l_write_image(bw, flat, cur_w, h, top_level=True,
                      cache_bits=cache_bits, use_lz77=use_lz77,
                      meta_bits=meta_bits, n_groups=n_groups)
    return bw.flush()


def _webp_wrap(vp8l: bytes, extended: bool = False,
               canvas=(0, 0)) -> bytes:
    """RIFF/WEBP container; ``extended`` adds a VP8X header chunk."""
    chunks = b""
    if extended:
        w, h = canvas
        # VP8X: 1 flags byte (ALPHA bit set), 3 reserved, 3-byte
        # canvas width-1 and height-1 (10 bytes, always even)
        body = struct.pack("<B", 0x10) + b"\x00\x00\x00" \
            + struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3]
        chunks += b"VP8X" + struct.pack("<I", len(body)) + body
    chunks += b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def _is_webp_row(i: int) -> bool:
    """Half of the former plain-PNG image rows carry a lossless WebP."""
    return i % 3 == 0 and (i // 3) % 4 == 0 and (i // 12) % 2 == 1


def _webp_spec(i: int):
    """(w, h, argb array, alpha_hint, encoder options) — variants cycle
    the whole VP8L surface: pure literals; colour cache + LZ77;
    subtract-green; predictor (all 14 modes); colour transform; palette
    at every bundling width; meta prefix groups; the kitchen sink; and
    a VP8X-extended container with true alpha."""
    w = 8 + _h(i, "ww") % 24
    h = 8 + _h(i, "wh") % 24
    variant = (i // 24) % 9
    rgb = _body(i * 13 + 5, h * w * 3).reshape(h, w, 3)
    alpha = np.full((h, w, 1), 255, dtype=np.uint8)
    opts = dict(transforms=(), cache_bits=0, use_lz77=False,
                meta_bits=0, n_groups=1, palette_size=0)
    extended = False
    alpha_hint = 0
    if variant == 1:
        opts.update(cache_bits=5, use_lz77=True)
        # horizontal runs (dist=1) plus duplicated rows (dist=w)
        rgb = np.repeat(rgb[:, : (w + 3) // 4 + 1], 4, axis=1)[:, :w]
        rgb[h // 2] = rgb[h // 2 - 1]
    elif variant == 2:
        opts.update(transforms=("subgreen",), cache_bits=4)
    elif variant == 3:
        opts.update(transforms=("predictor",))
    elif variant == 4:
        opts.update(transforms=("color",))
    elif variant == 5:
        # hit every bundling width (3/2/1/0) across the corpus
        size = (2, 4, 16, 200)[_h(i, "palw") % 4]
        quant = (_body(i * 17 + 3, h * w) % size).astype(np.uint8)
        pal = _body(i * 19 + 7, size * 3).reshape(size, 3)
        rgb = pal[quant].reshape(h, w, 3)
        opts.update(palette_size=size)
    elif variant == 6:
        opts.update(meta_bits=3, n_groups=2)
    elif variant == 7:
        opts.update(transforms=("predictor", "subgreen"),
                    cache_bits=6, use_lz77=True)
    elif variant == 8:
        alpha = (_body(i * 23 + 1, h * w) | 1).reshape(h, w, 1)
        alpha_hint = 1
        extended = True
    argb = np.concatenate([alpha, rgb], axis=-1)
    return w, h, argb, alpha_hint, opts, extended


def _webp_payload(i: int) -> bytes:
    w, h, argb, alpha_hint, opts, extended = _webp_spec(i)
    vp8l = _vp8l_encode(argb, alpha_hint=alpha_hint, **opts)
    return _webp_wrap(vp8l, extended=extended, canvas=(w, h))


def media_row(i: int) -> dict:
    kind = ("image", "audio", "video")[i % 3]
    if kind == "image":
        w, h, colour = _image_spec(i)
        frames = 1
        if _is_jpeg_row(i):
            src = _body(i, h * w * 3).reshape(h, w, 3)
            payload = _jpeg_payload(i, src)
        elif _is_webp_row(i):
            w, h, _argb, _hint, _opts, _ext = _webp_spec(i)
            payload = _webp_payload(i)
        elif _is_gif_row(i):
            w, h, frames, palette, inter, local, reset = _gif_spec(i)
            frs = [_gif_frame_indices(i, f, w, h, len(palette))
                   for f in range(frames)]
            payload = _gif_encode(frs, palette, interlace=inter,
                                  local_tables=local, reset_every=reset)
        else:
            arr = _body(i, h * w * _PNG_CH[colour]).reshape(
                h, w * _PNG_CH[colour])
            enc = _png_encode_adam7 if _is_adam7_row(i) else _png_encode
            payload = enc(arr, colour)
    elif kind == "audio":
        n, channels = _audio_spec(i)
        payload = _wav_encode(_audio_samples(i, n, channels), channels)
        w, h, frames = n, channels, 1
    elif _is_avi_row(i):
        w, h, frames = _avi_spec(i)
        jpegs = [_jpeg_encode(_avi_frame_src(i, f, w, h), 85)
                 for f in range(frames)]
        payload = _avi_encode(jpegs, w, h)
    elif _is_mp4_row(i):
        w, h, frames = _avi_spec(i)
        jpegs = [_jpeg_encode(_avi_frame_src(i, f, w, h), 85)
                 for f in range(frames)]
        payload = _mp4_encode(jpegs, w, h)
    else:
        w, h, frames = 16 + _h(i, "w") % 16, 16 + _h(i, "h") % 16, 4 + _h(i, "f") % 12
        body = _body(i, w * h * frames)
        payload = _MAGIC + struct.pack("<iii", w, h, frames) + body.tobytes()
    return {
        "media_id": i,
        "kind": kind,
        "payload": payload,
        "declared_w": w,
        "declared_h": h,
        "declared_frames": frames,
    }


def media_ground_truth(i: int) -> dict:
    """Expected decode output, computed from the SOURCE arrays (never
    by decoding) — the independent side of the round-trip oracle."""
    kind = ("image", "audio", "video")[i % 3]
    if kind == "image":
        w, h, colour = _image_spec(i)
        if _is_jpeg_row(i):
            # JPEG is LOSSY, so source-array stats cannot serve as the
            # round-trip truth; the golden instead comes from the
            # INDEPENDENT naive decoder (tests/oracle/jpeg_oracle.py —
            # its own parser; IDCT/upsample/color are shared spec), and
            # the engine decoder must match it bit-for-bit.
            from tests.oracle.jpeg_oracle import oracle_decode_jpeg

            src = _body(i, h * w * 3).reshape(h, w, 3)
            dec = oracle_decode_jpeg(_jpeg_payload(i, src))
            return {"width": w, "height": h, "n_frames": 1,
                    "mean_value": round(float(dec.mean()), 6),
                    "decode_status": "ok"}
        if _is_webp_row(i):
            # VP8L is LOSSLESS: the truth is the SOURCE array mean —
            # RGB channels when opaque, RGBA when the alpha variant
            w, h, argb, alpha_hint, _opts, _ext = _webp_spec(i)
            if alpha_hint:
                vals = argb.astype(np.float64)  # all four channels
            else:
                vals = argb[..., 1:4].astype(np.float64)
            return {"width": w, "height": h, "n_frames": 1,
                    "mean_value": round(float(vals.mean()), 6),
                    "decode_status": "ok"}
        if _is_gif_row(i):
            # GIF is LOSSLESS palette-indexed: the truth is the mean of
            # the palette-mapped SOURCE indices, never a decode
            w, h, frames, palette, _int, _loc, _rst = _gif_spec(i)
            px = np.concatenate([
                palette[_gif_frame_indices(i, f, w, h, len(palette))]
                .ravel().astype(np.float64) for f in range(frames)])
            return {"width": w, "height": h, "n_frames": frames,
                    "mean_value": round(float(px.mean()), 6),
                    "decode_status": "ok"}
        # plain AND Adam7 PNG: lossless, truth = source-array mean
        arr = _body(i, h * w * _PNG_CH[colour])
        return {"width": w, "height": h, "n_frames": 1,
                "mean_value": round(float(arr.mean()), 6),
                "decode_status": "ok"}
    if kind == "audio":
        n, channels = _audio_spec(i)
        samples = _audio_samples(i, n, channels)
        return {"width": n, "height": channels, "n_frames": 1,
                "mean_value": round(float(samples.mean()), 6),
                "decode_status": "ok"}
    if _is_avi_row(i) or _is_mp4_row(i):
        # MJPEG (in AVI or MP4) is lossy like the JPEG image rows: the
        # truth comes from the INDEPENDENT naive JPEG decoder over each
        # frame, encoded here from source — no container demux runs
        from tests.oracle.jpeg_oracle import oracle_decode_jpeg

        w, h, frames = _avi_spec(i)
        means = np.concatenate([
            oracle_decode_jpeg(
                _jpeg_encode(_avi_frame_src(i, f, w, h), 85)
            ).ravel().astype(np.float64)
            for f in range(frames)
        ])
        return {"width": w, "height": h, "n_frames": frames,
                "mean_value": round(float(means.mean()), 6),
                "decode_status": "ok"}
    w, h, frames = 16 + _h(i, "w") % 16, 16 + _h(i, "h") % 16, 4 + _h(i, "f") % 12
    body = _body(i, w * h * frames)
    return {"width": w, "height": h, "n_frames": frames,
            "mean_value": round(float(body.mean()), 6),
            "decode_status": "ok"}


def generate_media_table(n_rows: int) -> pa.Table:
    from rayxt.multimodal import MEDIA_SCHEMA

    rows = [media_row(i) for i in range(n_rows)]
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def ensure_media_parquet(path: str, n_rows: int) -> str:
    if os.path.exists(path):
        return path
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(generate_media_table(n_rows), tmp)
    os.rename(tmp, path)
    return path


# -- pHash near-dup image fixture family ------------------------------------
# Rows come in pairs: even j = base image, odd j = either a near-dup
# (base + 3 clipped — identical pHash up to clipping/quantization
# noise) or, for every 5th pair, an UNRELATED image (hamming ~32, must
# not pair).  Every 4th pair is JPEG-encoded (lossy: ground truth runs
# the independent naive decoder), the rest PNG (lossless: ground truth
# hashes the source array directly — no decoder runs).


def _phash_spec(pair: int):
    w = 24 + _h(pair, "pw") % 24
    h = 24 + _h(pair, "ph") % 24
    return w, h


def _phash_src(j: int) -> np.ndarray:
    pair = j // 2
    w, h = _phash_spec(pair)
    base = _body(pair * 7919 + 13, h * w * 3).reshape(h, w, 3)
    if j % 2 == 0:
        return base
    if pair % 5 == 4:  # unrelated odd row
        return _body(pair * 7919 + 14, h * w * 3).reshape(h, w, 3)
    return np.clip(base.astype(np.int64) + 3, 0, 255).astype(np.uint8)


def _phash_is_jpeg(pair: int) -> bool:
    return pair % 4 == 3


def phash_media_row(j: int) -> dict:
    pair = j // 2
    w, h = _phash_spec(pair)
    src = _phash_src(j)
    if _phash_is_jpeg(pair):
        payload = _jpeg_encode(src, 85)
    else:
        payload = _png_encode(src.reshape(h, w * 3), 2)
    return {
        "media_id": j,
        "kind": "image",
        "payload": payload,
        "declared_w": w,
        "declared_h": h,
        "declared_frames": 1,
    }


def phash_ground_truth_hash(j: int) -> int:
    """Expected pHash via the INDEPENDENT oracle restatement
    (tests/oracle/phash_oracle.py): source array for lossless PNG rows,
    independent naive JPEG decode for lossy rows."""
    from tests.oracle.phash_oracle import oracle_phash

    pair = j // 2
    src = _phash_src(j)
    if _phash_is_jpeg(pair):
        from tests.oracle.jpeg_oracle import oracle_decode_jpeg

        src = oracle_decode_jpeg(_jpeg_encode(src, 85))
    return oracle_phash(np.asarray(src).tolist())


def generate_phash_media_table(n_rows: int) -> pa.Table:
    from rayxt.multimodal import MEDIA_SCHEMA

    rows = [phash_media_row(j) for j in range(n_rows)]
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def ensure_phash_media_parquet(path: str, n_rows: int) -> str:
    if os.path.exists(path):
        return path
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(generate_phash_media_table(n_rows), tmp)
    os.rename(tmp, path)
    return path
