"""Independent WebP-lossless (VP8L) decoder (conformance oracle).

A from-scratch restatement of the VP8L bitstream spec with its OWN
architecture — independent of ``rayxt.webp``:

* the whole payload is exploded ONCE into a flat bit array
  (``np.unpackbits`` with ``bitorder='little'``) and fields are read by
  slice + dot-product against powers of two, instead of the engine's
  incremental byte/bit cursor;
* canonical prefix codes decode by first-code/count arithmetic per
  code length (Moffat's method: ``code < first[len] + count[len]``),
  instead of the engine's (length, code) -> symbol hash map;
* pixels live as an (n, 4) channel matrix end to end; the inverse
  transforms are written as explicit per-pixel loops over that matrix,
  instead of the engine's packed-uint32 + vectorized numpy forms;
* the decoder is a stateful class whose image reader recurses through
  ``self``, instead of the engine's free functions.

Only the published spec is shared: the LSB-first convention, the
code-length code order, the LZ77 prefix-value buckets, the 120-entry
distance planes, the colour-cache hash, the 14 predictors with their
edge rules, and the transform inverses.
"""

from __future__ import annotations

import numpy as np


class _BitCur:
    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8),
                                  bitorder="little")
        self.p = 0

    def get(self, n: int) -> int:
        if n == 0:
            return 0
        if self.p + n > len(self.bits):
            raise ValueError("VP8L bits exhausted")
        v = int(self.bits[self.p:self.p + n]
                @ (1 << np.arange(n, dtype=np.int64)))
        self.p += n
        return v

    def get1(self) -> int:
        if self.p >= len(self.bits):
            raise ValueError("VP8L bits exhausted")
        v = int(self.bits[self.p])
        self.p += 1
        return v


class _Canon:
    """Canonical prefix decoder via per-length first-code arithmetic."""

    def __init__(self, lengths):
        syms = [(ln, s) for s, ln in enumerate(lengths) if ln]
        if not syms:
            raise ValueError("empty code")
        if len(syms) == 1:
            self.lone = syms[0][1]
            return
        self.lone = None
        syms.sort()
        max_len = syms[-1][0]
        count = [0] * (max_len + 1)
        for ln, _ in syms:
            count[ln] += 1
        if sum(c << (max_len - ln) for ln, c in enumerate(count) if ln) \
                != 1 << max_len:
            raise ValueError("incomplete prefix code")
        first = [0] * (max_len + 2)
        base = [0] * (max_len + 2)
        code = 0
        idx = 0
        for ln in range(1, max_len + 1):
            first[ln] = code
            base[ln] = idx
            code = (code + count[ln]) << 1
            idx += count[ln]
        self.first = first
        self.base = base
        self.count = count
        self.order = [s for _, s in syms]
        self.max_len = max_len

    def decode(self, cur: _BitCur) -> int:
        if self.lone is not None:
            return self.lone
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | cur.get1()
            if code - self.first[ln] < self.count[ln]:
                return self.order[self.base[ln] + code - self.first[ln]]
        raise ValueError("bad prefix code word")


_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15)


def _planes():
    pairs = [(dx, dy) for dy in range(8) for dx in range(-7, 9)
             if not (dy == 0 and dx < 1)]
    pairs.sort(key=lambda p: (p[0] ** 2 + p[1] ** 2, -p[1], p[0] < 0))
    return pairs


_PLANE = _planes()


def _value(cur: _BitCur, sym: int) -> int:
    if sym < 4:
        return sym + 1
    nbits = (sym - 2) >> 1
    return ((2 + (sym & 1)) << nbits) + cur.get(nbits) + 1


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _sx(v: int) -> int:
    return v if v < 128 else v - 256


class _Vp8lOracle:
    def __init__(self, chunk: bytes):
        self.cur = _BitCur(chunk)
        if self.cur.get(8) != 0x2F:
            raise ValueError("bad VP8L signature")
        self.w = self.cur.get(14) + 1
        self.h = self.cur.get(14) + 1
        self.alpha_hint = self.cur.get1()
        if self.cur.get(3) != 0:
            raise ValueError("bad version")

    # -- prefix-code reading -------------------------------------------------
    def read_code(self, n_sym: int) -> _Canon:
        cur = self.cur
        if cur.get1():  # simple
            two = cur.get1() + 1
            first = cur.get(8) if cur.get1() else cur.get1()
            lengths = [0] * n_sym
            if two == 1:
                lengths[first] = 1
                return _Canon(lengths)
            second = cur.get(8)
            lengths[first] = 1
            lengths[second] = 1
            canon = _Canon(lengths)
            # simple codes assign 0 to the FIRST-WRITTEN symbol even if
            # it is numerically larger; patch the order accordingly
            canon.order = [first, second]
            return canon
        n_cl = 4 + cur.get(4)
        cl_lengths = [0] * 19
        for k in range(n_cl):
            cl_lengths[_CL_ORDER[k]] = cur.get(3)
        cl = _Canon(cl_lengths)
        if cur.get1():
            nb = 2 + 2 * cur.get(3)
            budget = 2 + cur.get(nb)
        else:
            budget = n_sym
        lengths = [0] * n_sym
        prev = 8
        s = 0
        while s < n_sym and budget > 0:
            budget -= 1
            t = cl.decode(cur)
            if t < 16:
                lengths[s] = t
                s += 1
                if t:
                    prev = t
            elif t == 16:
                rep = 3 + cur.get(2)
                if s + rep > n_sym:
                    raise ValueError("repeat overflow")
                for _ in range(rep):
                    lengths[s] = prev
                    s += 1
            elif t == 17:
                s += 3 + cur.get(3)
            else:
                s += 11 + cur.get(7)
            if s > n_sym:
                raise ValueError("repeat overflow")
        return _Canon(lengths)

    # -- spatially-coded image ----------------------------------------------
    def read_image(self, w: int, h: int, main: bool) -> np.ndarray:
        """-> (w*h, 4) int [A, R, G, B] channel matrix."""
        cur = self.cur
        meta = None
        if main and cur.get1():
            mbits = 2 + cur.get(3)
            mw = (w + (1 << mbits) - 1) >> mbits
            mh = (h + (1 << mbits) - 1) >> mbits
            mimg = self.read_image(mw, mh, False)
            meta = (mimg[:, 1].astype(int) << 8) | mimg[:, 2]
            n_groups = int(meta.max()) + 1
        else:
            n_groups = 1
        cache_bits = cur.get(4) if cur.get1() else 0
        cache = [0] * (1 << cache_bits) if cache_bits else None
        tables = []
        for _ in range(n_groups):
            tables.append((
                self.read_code(256 + 24 + (1 << cache_bits
                                           if cache_bits else 0)),
                self.read_code(256), self.read_code(256),
                self.read_code(256), self.read_code(40)))
        px = np.zeros((w * h, 4), dtype=np.int64)
        i = 0
        while i < w * h:
            if meta is not None:
                gid = int(meta[((i // w) >> mbits) * mw + ((i % w) >> mbits)])
            else:
                gid = 0
            greens, reds, blues, alphas, dists = tables[gid]
            g = greens.decode(cur)
            if g < 256:
                r = reds.decode(cur)
                b = blues.decode(cur)
                a = alphas.decode(cur)
                px[i] = (a, r, g, b)
                i += 1
                if cache is not None:
                    word = (a << 24) | (r << 16) | (g << 8) | b
                    cache[((word * 0x1E35A7BD) & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = word
            elif g < 280:
                ln = _value(cur, g - 256)
                dcode = _value(cur, dists.decode(cur))
                if dcode > 120:
                    d = dcode - 120
                else:
                    dx, dy = _PLANE[dcode - 1]
                    d = dy * w + dx
                    if d < 1:
                        d = 1
                if d > i or i + ln > w * h:
                    raise ValueError("bad backref")
                for _ in range(ln):
                    px[i] = px[i - d]
                    if cache is not None:
                        a, r, gg, b = (int(v) for v in px[i])
                        word = (a << 24) | (r << 16) | (gg << 8) | b
                        cache[((word * 0x1E35A7BD) & 0xFFFFFFFF)
                              >> (32 - cache_bits)] = word
                    i += 1
            else:
                word = cache[g - 280]
                px[i] = ((word >> 24) & 255, (word >> 16) & 255,
                         (word >> 8) & 255, word & 255)
                i += 1
        return px

    # -- transforms -----------------------------------------------------------
    def decode(self):
        cur = self.cur
        w, h = self.w, self.h
        inv = []
        used = set()
        cw = w
        while cur.get1():
            t = cur.get(2)
            if t in used:
                raise ValueError("transform repeated")
            used.add(t)
            if t in (0, 1):
                sb = 2 + cur.get(3)
                bw = (cw + (1 << sb) - 1) >> sb
                bh = (h + (1 << sb) - 1) >> sb
                data = self.read_image(bw, bh, False)
                inv.append((t, sb, bw, data))
            elif t == 2:
                inv.append((2,))
            else:
                n = 1 + cur.get(8)
                deltas = self.read_image(n, 1, False)
                pal = np.cumsum(deltas, axis=0) % 256
                wb = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
                pw = (cw + (1 << wb) - 1) >> wb
                inv.append((3, pw, cw, pal, wb))
                cw = pw
        px = self.read_image(cw, h, True)
        for t in reversed(inv):
            if t[0] == 3:
                _, pw, full_w, pal, wb = t
                out = np.zeros((full_w * h, 4), dtype=np.int64)
                sub = 8 >> wb if wb else 8
                per = 1 << wb
                for y in range(h):
                    for x in range(full_w):
                        packed = int(px[y * pw + (x >> wb), 2]) if wb \
                            else int(px[y * pw + x, 2])
                        if wb:
                            idx = (packed >> ((x % per) * sub)) \
                                & ((1 << sub) - 1)
                        else:
                            idx = packed
                        if idx < len(pal):
                            out[y * full_w + x] = pal[idx]
                px = out
                cw = full_w
            elif t[0] == 2:
                for i in range(len(px)):
                    g = int(px[i, 2])
                    px[i, 1] = (int(px[i, 1]) + g) % 256
                    px[i, 3] = (int(px[i, 3]) + g) % 256
            elif t[0] == 1:
                _, sb, bw, data = t
                for i in range(len(px)):
                    x, y = i % cw, i // cw
                    e = data[(y >> sb) * bw + (x >> sb)]
                    g2r = _sx(int(e[3]))
                    g2b = _sx(int(e[2]))
                    r2b = _sx(int(e[1]))
                    g = _sx(int(px[i, 2]))
                    red = (int(px[i, 1]) + ((g2r * g) >> 5)) % 256
                    blue = (int(px[i, 3]) + ((g2b * g) >> 5)) % 256
                    blue = (blue + ((r2b * _sx(red)) >> 5)) % 256
                    px[i, 1] = red
                    px[i, 3] = blue
            else:
                _, sb, bw, data = t
                self._unpredict(px, cw, h, sb, bw, data)
        return px.reshape(h, w, 4).astype(np.uint8)

    @staticmethod
    def _unpredict(px, w, h, sb, bw, data):
        def avg(a, b):
            return [(int(x) + int(y)) >> 1 for x, y in zip(a, b)]

        for i in range(w * h):
            x, y = i % w, i // w
            if i == 0:
                p = (255, 0, 0, 0)
            elif y == 0:
                p = px[i - 1]
            elif x == 0:
                p = px[i - w]
            else:
                L, T = px[i - 1], px[i - w]
                TL, TR = px[i - w - 1], px[i - w + 1]
                m = int(data[(y >> sb) * bw + (x >> sb), 2])
                if m == 0:
                    p = (255, 0, 0, 0)
                elif m == 1:
                    p = L
                elif m == 2:
                    p = T
                elif m == 3:
                    p = TR
                elif m == 4:
                    p = TL
                elif m == 5:
                    p = avg(avg(L, TR), T)
                elif m == 6:
                    p = avg(L, TL)
                elif m == 7:
                    p = avg(L, T)
                elif m == 8:
                    p = avg(TL, T)
                elif m == 9:
                    p = avg(T, TR)
                elif m == 10:
                    p = avg(avg(L, TL), avg(T, TR))
                elif m == 11:
                    p_l = sum(abs(int(a) - int(b)) for a, b in zip(T, TL))
                    p_t = sum(abs(int(a) - int(b)) for a, b in zip(L, TL))
                    p = L if p_l < p_t else T
                elif m == 12:
                    p = [_clamp(int(a) + int(b) - int(c))
                         for a, b, c in zip(L, T, TL)]
                elif m == 13:
                    p = []
                    for a, b, c in zip(L, T, TL):
                        av = (int(a) + int(b)) >> 1
                        diff = av - int(c)
                        # C division truncates toward zero
                        p.append(_clamp(av + (diff // 2 if diff >= 0
                                               else -((-diff) // 2))))
                else:
                    raise ValueError(f"bad mode {m}")
            px[i] = [(int(c) + int(q)) % 256 for c, q in zip(px[i], p)]


def oracle_decode_webp(payload: bytes):
    """RIFF walk -> (w, h, alpha_hint, (h, w, 4) uint8 ARGB)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not WebP")
    p = 12
    while p + 8 <= len(payload):
        tag = payload[p:p + 4]
        n = int.from_bytes(payload[p + 4:p + 8], "little")
        if tag == b"VP8L":
            dec = _Vp8lOracle(payload[p + 8:p + 8 + n])
            return dec.w, dec.h, dec.alpha_hint, dec.decode()
        p += 8 + n + (n & 1)
    raise ValueError("no VP8L chunk")
