"""Independent pHash oracle: naive per-coefficient restatement.

The engine (``rayxt.multimodal.phash64_of_array``) computes the hash
with int64 matmuls; this oracle recomputes every DCT coefficient with
explicit Python-int double loops (different mechanism, exact integer
arithmetic) and assembles the bits one by one.  Because the frozen spec
is all-integer, the two must agree bit-for-bit on ANY input — no
float-association escape hatch.

``oracle_hamming_pairs`` is the brute-force all-pairs counterpart of
the engine's banded :func:`rayxt.dedup.hamming_pairs`.
"""

from __future__ import annotations

import math
import sys

try:
    from ray import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

_C = None


def _coeffs():
    global _C
    if _C is None:
        c = []
        for u in range(32):
            scale = 16384.0 * (1.0 / math.sqrt(2.0) if u == 0 else 1.0)
            # Python round() is half-to-even like np.round; the integer
            # coefficient table is part of the shared frozen spec
            c.append([round(scale * math.cos((2 * x + 1) * u * math.pi / 64.0))
                      for x in range(32)])
        _C = c
    return _C


def oracle_phash(img) -> int:
    """img: nested lists / ndarray, (h, w) grey or (h, w, ch) uint8."""
    # grayscale
    first = img[0][0]
    has_ch = hasattr(first, "__len__")
    h = len(img)
    w = len(img[0])
    grey = []
    for y in range(h):
        row = []
        for x in range(w):
            px = img[y][x]
            if not has_ch:
                row.append(int(px))
            elif len(px) == 1:
                row.append(int(px[0]))
            else:
                row.append((77 * int(px[0]) + 150 * int(px[1])
                            + 29 * int(px[2])) >> 8)
        grey.append(row)
    # nearest-neighbor 32x32
    small = [[grey[y * h // 32][x * w // 32] for x in range(32)]
             for y in range(32)]
    c = _coeffs()
    block = []
    for u in range(8):
        for v in range(8):
            acc = 0
            for x in range(32):
                cux = c[u][x]
                rowx = small[x]
                for y in range(32):
                    acc += cux * c[v][y] * rowx[y]
            block.append(acc)
    med = sorted(block[1:])[31]  # median of 63 values = element 31
    value = 0
    for t in block:
        value = (value << 1) | (1 if t > med else 0)
    return value - (1 << 64) if value >= (1 << 63) else value


def oracle_hamming_pairs(ids, hashes, max_hamming: int):
    """Brute-force all-pairs hamming (signed int64 hashes)."""
    out = []
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            d = bin((hashes[i] & 0xFFFFFFFFFFFFFFFF)
                    ^ (hashes[j] & 0xFFFFFFFFFFFFFFFF)).count("1")
            if d <= max_hamming:
                a, b = sorted((ids[i], ids[j]))
                out.append((a, b, d))
    return sorted(out)
