"""WebP lossless (VP8L) decoder — from the public bitstream spec,
stdlib + numpy only.

Covers the full still-image VP8L surface (SURVEY §2.5 multimodal row;
closes the round-4 VERDICT "GIF and WebP" media gap for the patent-free
half of WebP):

* RIFF/WEBP container walk, plain ``VP8L`` files and ``VP8X``-extended
  files whose image chunk is ``VP8L``;
* LSB-first bit reading; canonical prefix codes in both spellings
  (simple 1/2-symbol codes and code-length-coded normal codes with
  16/17/18 repeats and the optional max-symbol cap);
* colour cache (hash 0x1e35a7bd, 1..11 bits), meta prefix-code groups
  (entropy image), LZ77 backward references with the 120-entry
  2-D distance-plane mapping;
* all four transforms, inverted in reverse bitstream order:
  PREDICTOR (the 14 spatial modes with the spec's edge rules),
  COLOR (signed-multiplier cross-channel deltas), SUBTRACT_GREEN,
  COLOR_INDEXING (delta-coded palette with sub-byte pixel bundling).

Lossy WebP (``VP8 `` chunks) is a VP8 intra decoder — boolean
arithmetic coder, 10 prediction modes, loop filter — i.e. a further
codec-sized project; those payloads (and animated ``ANIM``/``ANMF``
files) keep surfacing as ``decode_status unsupported_codec`` like
H.264/HEVC.

Verified bit-for-bit against the independently-architected naive
decoder in ``tests/oracle/webp_oracle.py`` on every fixture row, and
both must invert the spec-true fixture encoder exactly (VP8L is
lossless): see ``fixtures/gen_media.py::_vp8l_encode`` and
``tests/test_sketch_oracle.py``.

The per-pixel loops are plain Python: the decoder is a per-row kernel
inside an actor-pool ``map_batches`` stage (``DecodeMedia``), so
documents parallelize across the pool, and fixture/CC thumbnail images
are small.  numpy handles the whole-image transform inverses.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_webp", "vp8l_pixels"]


# -- bit reader ---------------------------------------------------------------


class _Bits:
    """LSB-first bit reader (VP8L convention)."""

    __slots__ = ("data", "byte", "bit")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        data, byte, bit = self.data, self.byte, self.bit
        for k in range(n):
            if byte >= len(data):
                raise ValueError("VP8L: bitstream truncated")
            v |= ((data[byte] >> bit) & 1) << k
            bit += 1
            if bit == 8:
                bit = 0
                byte += 1
        self.byte, self.bit = byte, bit
        return v


# -- prefix codes -------------------------------------------------------------


class _PrefixCode:
    """Canonical prefix code: either a single 0-bit symbol or a
    (length, code) -> symbol map walked bit by bit."""

    __slots__ = ("single", "table", "max_len")

    def __init__(self, single=None, table=None, max_len=0):
        self.single = single
        self.table = table
        self.max_len = max_len

    def read_symbol(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        table = self.table
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
            if length > self.max_len:
                raise ValueError("VP8L: invalid prefix code in stream")


def _code_from_lengths(lengths) -> _PrefixCode:
    """DEFLATE-style canonical assignment: codes ordered by (length,
    symbol).  A lone used symbol becomes a 0-bit code (libwebp
    semantics); over/under-subscribed codes are rejected."""
    used = [(sym, ln) for sym, ln in enumerate(lengths) if ln > 0]
    if not used:
        raise ValueError("VP8L: empty prefix code")
    if len(used) == 1:
        return _PrefixCode(single=used[0][0])
    max_len = max(ln for _, ln in used)
    bl_count = [0] * (max_len + 1)
    for _, ln in used:
        bl_count[ln] += 1
    # completeness (Kraft equality)
    kraft = sum(bl_count[ln] << (max_len - ln) for ln in range(1, max_len + 1))
    if kraft != (1 << max_len):
        raise ValueError("VP8L: over/under-subscribed prefix code")
    next_code = [0] * (max_len + 1)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    table = {}
    for sym, ln in used:
        table[(ln, next_code[ln])] = sym
        next_code[ln] += 1
    return _PrefixCode(table=table, max_len=max_len)


#: code-length symbols arrive in this fixed order (spec)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code: 1 or 2 symbols
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol in 8 bits
            first = br.read(8)
        else:
            first = br.read(1)
        if num_symbols == 1:
            return _PrefixCode(single=first)
        second = br.read(8)
        return _PrefixCode(table={(1, 0): first, (1, 1): second}, max_len=1)
    # normal code: code lengths themselves prefix-coded
    num_code_lengths = 4 + br.read(4)
    if num_code_lengths > len(_CLC_ORDER):
        raise ValueError("VP8L: bad code-length count")
    clc_lengths = [0] * len(_CLC_ORDER)
    for i in range(num_code_lengths):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _code_from_lengths(clc_lengths)
    if br.read(1):  # optional cap on the number of coded symbols
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_length = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = clc.read_symbol(br)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s != 0:
                prev_length = s
        elif s == 16:
            repeat = 3 + br.read(2)
            for _ in range(repeat):
                if symbol >= alphabet_size:
                    raise ValueError("VP8L: code-length repeat overflow")
                lengths[symbol] = prev_length
                symbol += 1
        elif s == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
        if symbol > alphabet_size:
            raise ValueError("VP8L: code-length repeat overflow")
    return _code_from_lengths(lengths)


# -- LZ77 value coding ----------------------------------------------------------


def _lz77_value(br: _Bits, prefix_sym: int) -> int:
    """Length/distance prefix symbol -> value (spec 'LZ77 backward
    reference' coding: 4 literal symbols then exponential buckets)."""
    if prefix_sym < 4:
        return prefix_sym + 1
    extra_bits = (prefix_sym - 2) >> 1
    offset = (2 + (prefix_sym & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _plane_code_table():
    """The 120 short-distance (dx, dy) pairs: dy 0..7, dx -7..8
    (forward-only on row 0), ordered by squared distance, ties by
    larger dy first then positive dx first."""
    pairs = [(dx, dy)
             for dy in range(8) for dx in range(-7, 9)
             if not (dy == 0 and dx < 1)]
    pairs.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0))
    return pairs


_PLANE_CODES = _plane_code_table()


def _plane_to_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _PLANE_CODES[code - 1]
    return max(1, dy * xsize + dx)


# -- entropy-coded image --------------------------------------------------------


_HASH_MUL = 0x1E35A7BD


def _read_entropy_image(br: _Bits, w: int, h: int, *, top_level: bool):
    """Decode one spatially-coded image -> flat uint32 ARGB ndarray.

    ``top_level`` enables the meta prefix-code machinery; sub-images
    (transform data, palettes, entropy images) use a single group but
    may still carry their own colour cache (spec 5.2)."""
    meta = None
    meta_bits = 0
    n_groups = 1
    if top_level and br.read(1):
        meta_bits = 2 + br.read(3)
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _read_entropy_image(br, mw, mh, top_level=False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
        meta_w = mw
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad colour-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        green = _read_prefix_code(br, 256 + 24 + cache_size)
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        groups.append((green, red, blue, alpha, dist))
    out = np.zeros(w * h, dtype=np.uint32)
    cache = [0] * cache_size
    cache_shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    total = w * h
    g_codes = groups[0]
    while pos < total:
        if meta is not None:
            x = pos % w
            y = pos // w
            g_codes = groups[int(
                meta[(y >> meta_bits) * meta_w + (x >> meta_bits)])]
        green_c, red_c, blue_c, alpha_c, dist_c = g_codes
        s = green_c.read_symbol(br)
        if s < 256:
            r = red_c.read_symbol(br)
            b = blue_c.read_symbol(br)
            a = alpha_c.read_symbol(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            pos += 1
            if cache_bits:
                cache[(px * _HASH_MUL & 0xFFFFFFFF) >> cache_shift] = px
        elif s < 280:
            length = _lz77_value(br, s - 256)
            dist_code = _lz77_value(br, dist_c.read_symbol(br))
            dist = _plane_to_distance(dist_code, w)
            if dist > pos or pos + length > total:
                raise ValueError("VP8L: backward reference out of range")
            if cache_bits:
                for _ in range(length):
                    px = int(out[pos - dist])
                    out[pos] = px
                    pos += 1
                    cache[(px * _HASH_MUL & 0xFFFFFFFF) >> cache_shift] = px
            else:
                for _ in range(length):
                    out[pos] = out[pos - dist]
                    pos += 1
        else:
            out[pos] = cache[s - 280]
            pos += 1
    return out


# -- transforms (inverse) -------------------------------------------------------


def _split_argb(flat: np.ndarray, w: int, h: int) -> np.ndarray:
    """flat uint32 ARGB -> (h, w, 4) uint8 [A, R, G, B]."""
    arr = flat.reshape(h, w)
    return np.stack([(arr >> 24) & 0xFF, (arr >> 16) & 0xFF,
                     (arr >> 8) & 0xFF, arr & 0xFF],
                    axis=-1).astype(np.uint8)


def _join_argb(px: np.ndarray) -> np.ndarray:
    a, r, g, b = (px[..., k].astype(np.uint32) for k in range(4))
    return ((a << 24) | (r << 16) | (g << 8) | b).reshape(-1)


def _inv_subtract_green(flat: np.ndarray, w: int, h: int) -> np.ndarray:
    g = (flat >> 8) & 0xFF
    r = (((flat >> 16) & 0xFF) + g) & 0xFF
    b = ((flat & 0xFF) + g) & 0xFF
    return (flat & 0xFF00FF00) | (r << 16) | b


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _inv_color_transform(flat, w, h, size_bits, elements, ew):
    """Per-block signed cross-channel deltas (spec 4.3), row-major so
    red feeds the blue delta with its POST-inverse value."""
    px = _split_argb(flat, w, h)
    out = px.copy()
    for y in range(h):
        ey = (y >> size_bits) * ew
        for x in range(w):
            elem = int(elements[ey + (x >> size_bits)])
            g2r = _s8(elem & 0xFF)
            g2b = _s8((elem >> 8) & 0xFF)
            r2b = _s8((elem >> 16) & 0xFF)
            g = _s8(int(px[y, x, 2]))
            red = (int(px[y, x, 1]) + ((g2r * g) >> 5)) & 0xFF
            blue = (int(px[y, x, 3]) + ((g2b * g) >> 5)) & 0xFF
            blue = (blue + ((r2b * _s8(red)) >> 5)) & 0xFF
            out[y, x, 1] = red
            out[y, x, 3] = blue
    return _join_argb(out)


def _avg2(a, b):
    return (a + b) >> 1


def _clip255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _predict(mode: int, L, T, TL, TR):
    """The 14 spatial predictors over 4-int channel tuples (spec 4.2)."""
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return tuple(_avg2(_avg2(l, tr), t) for l, t, tr in zip(L, T, TR))
    if mode == 6:
        return tuple(_avg2(l, tl) for l, tl in zip(L, TL))
    if mode == 7:
        return tuple(_avg2(l, t) for l, t in zip(L, T))
    if mode == 8:
        return tuple(_avg2(tl, t) for tl, t in zip(TL, T))
    if mode == 9:
        return tuple(_avg2(t, tr) for t, tr in zip(T, TR))
    if mode == 10:
        return tuple(_avg2(_avg2(l, tl), _avg2(t, tr))
                     for l, t, tl, tr in zip(L, T, TL, TR))
    if mode == 11:  # Select: Manhattan-closer of L and T to L+T-TL
        p_l = sum(abs(t - tl) for t, tl in zip(T, TL))
        p_t = sum(abs(l - tl) for l, tl in zip(L, TL))
        return L if p_l < p_t else T
    if mode == 12:
        return tuple(_clip255(l + t - tl) for l, t, tl in zip(L, T, TL))
    if mode == 13:
        return tuple(
            _clip255(a + int((a - tl) / 2))  # C division: trunc toward 0
            for a, tl in ((_avg2(l, t), tl) for l, t, tl in zip(L, T, TL)))
    raise ValueError(f"VP8L: bad predictor mode {mode}")


def _inv_predictor(flat, w, h, size_bits, modes, mw):
    """Residuals += prediction, row-major.  Edge rules: (0,0) predicts
    opaque black, the rest of row 0 uses L, column 0 uses T; TR of the
    last column is the FIRST pixel of the current row (flat-array
    addressing, libwebp semantics)."""
    px = _split_argb(flat, w, h).astype(np.int64).reshape(-1, 4)
    for pos in range(w * h):
        x = pos % w
        y = pos // w
        if pos == 0:
            pred = (255, 0, 0, 0)
        elif y == 0:
            pred = tuple(px[pos - 1])
        elif x == 0:
            pred = tuple(px[pos - w])
        else:
            mode = int(modes[(y >> size_bits) * mw + (x >> size_bits)])
            pred = _predict(
                mode,
                tuple(px[pos - 1]), tuple(px[pos - w]),
                tuple(px[pos - w - 1]), tuple(px[pos - w + 1]))
        px[pos] = [(int(c) + int(p)) & 0xFF for c, p in zip(px[pos], pred)]
    return _join_argb(px.astype(np.uint8).reshape(h, w, 4))


def _palette_width_bits(size: int) -> int:
    if size <= 2:
        return 3
    if size <= 4:
        return 2
    if size <= 16:
        return 1
    return 0


def _inv_color_index(flat, packed_w, h, w, palette, width_bits):
    """Unbundle sub-byte indices from the green channel, then map
    through the (delta-decoded) palette; out-of-range indices are
    transparent black (spec 4.4)."""
    green = ((flat >> 8) & 0xFF).reshape(h, packed_w).astype(np.uint32)
    if width_bits:
        per = 1 << width_bits
        bits = 8 >> width_bits
        cols = []
        for k in range(per):
            cols.append((green >> (k * bits)) & ((1 << bits) - 1))
        idx = np.stack(cols, axis=-1).reshape(h, packed_w * per)[:, :w]
    else:
        idx = green
    table = np.zeros(256, dtype=np.uint32)
    table[:len(palette)] = palette
    # out-of-range indices (only possible when the palette has < 256
    # entries) land on a zero slot -> transparent black, per spec
    safe = np.where(idx < len(palette), idx, len(palette) % 256)
    return table[safe].reshape(-1)


# -- VP8L top level -------------------------------------------------------------


def vp8l_pixels(payload: bytes):
    """Decode a VP8L chunk payload -> (w, h, alpha_hint,
    (h, w, 4) uint8 ARGB array)."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _Bits(payload, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_hint = br.read(1)
    if br.read(3) != 0:
        raise ValueError("VP8L: unknown version")

    transforms = []  # applied inverse in reverse read order
    seen = set()
    cur_w = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            size_bits = 2 + br.read(3)
            bw = (cur_w + (1 << size_bits) - 1) >> size_bits
            bh = (h + (1 << size_bits) - 1) >> size_bits
            data = _read_entropy_image(br, bw, bh, top_level=False)
            transforms.append(("pred", size_bits,
                               (data >> 8) & 0xFF, bw))
        elif ttype == 1:  # colour transform
            size_bits = 2 + br.read(3)
            bw = (cur_w + (1 << size_bits) - 1) >> size_bits
            bh = (h + (1 << size_bits) - 1) >> size_bits
            data = _read_entropy_image(br, bw, bh, top_level=False)
            transforms.append(("color", size_bits, data, bw))
        elif ttype == 2:
            transforms.append(("subgreen",))
        else:  # colour indexing
            size = 1 + br.read(8)
            pal_deltas = _read_entropy_image(br, size, 1, top_level=False)
            palette = np.cumsum(
                _split_argb(pal_deltas, size, 1).astype(np.uint32)
                .reshape(size, 4), axis=0, dtype=np.uint32) & 0xFF
            palette = _join_argb(palette.astype(np.uint8)
                                 .reshape(1, size, 4))
            width_bits = _palette_width_bits(size)
            packed_w = (cur_w + (1 << width_bits) - 1) >> width_bits
            transforms.append(("index", packed_w, cur_w, palette,
                               width_bits))
            cur_w = packed_w

    flat = _read_entropy_image(br, cur_w, h, top_level=True)
    for t in reversed(transforms):
        if t[0] == "index":
            _, packed_w, full_w, palette, width_bits = t
            flat = _inv_color_index(flat, packed_w, h, full_w, palette,
                                    width_bits)
            cur_w = full_w
        elif t[0] == "subgreen":
            flat = _inv_subtract_green(flat, cur_w, h)
        elif t[0] == "color":
            flat = _inv_color_transform(flat, cur_w, h, t[1], t[2], t[3])
        else:
            flat = _inv_predictor(flat, cur_w, h, t[1], t[2], t[3])
    return w, h, alpha_hint, _split_argb(flat, w, h)


def decode_webp(payload: bytes):
    """RIFF walk -> (w, h, n_frames=1, mean).

    The mean is over RGB when the VP8L alpha-hint bit is clear and over
    RGBA otherwise (mirrors the PNG greyscale/RGB/RGBA convention).
    ``VP8 `` (lossy) and animated files raise ``NotImplementedError``
    -> ``decode_status unsupported_codec``.
    """
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    vp8l = None
    while pos + 8 <= len(payload):
        fourcc = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if fourcc == b"VP8L":
            vp8l = body
            break
        if fourcc in (b"VP8 ", b"ANIM", b"ANMF"):
            raise NotImplementedError(
                "lossy/animated WebP needs a VP8 intra decoder "
                "(patent-encumbered codec surface); only VP8L "
                "(lossless) is supported")
        pos += 8 + size + (size & 1)  # chunks are even-padded
    if vp8l is None:
        raise ValueError("WebP: no VP8L chunk")
    w, h, alpha_hint, px = vp8l_pixels(vp8l)
    if alpha_hint:
        vals = px.reshape(-1, 4)[:, [1, 2, 3, 0]]  # RGBA order, all 4
        mean = float(vals.astype(np.float64).mean())
    else:
        mean = float(px[..., 1:4].astype(np.float64).mean())
    return w, h, 1, mean
