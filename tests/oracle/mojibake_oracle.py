"""Independent naive oracle for mojibake repair.

Deliberately different mechanism from ``rayxt/mojibake.py``: the
char->byte table is built from an explicit literal of cp1252's 0x80
row (typed from the WHATWG windows-1252 index, not derived via
``bytes.decode``), and UTF-8 validation + decoding is a from-scratch
bit-arithmetic state walk (RFC 3629 table: continuation masks,
overlong / surrogate / max-codepoint checks) — ``bytes.decode`` is
never called.  Restates the frozen policy from the engine module
docstring, never the engine code.  Goldens come from THIS module only.
"""

from __future__ import annotations

# WHATWG windows-1252 index, bytes 0x80-0x9F (0x81/8D/8F/90/9D are the
# unmapped holes -> lenient decoders pass the C1 control through)
_C1 = [
    0x20AC, 0x81, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x8D, 0x017D, 0x8F,
    0x90, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x9D, 0x017E, 0x0178,
]

_CP_TO_BYTE = {cp: 0x80 + i for i, cp in enumerate(_C1)}
for _b in list(range(0x80)) + list(range(0xA0, 0x100)):
    _CP_TO_BYTE[_b] = _b


def _utf8_decode_strict(bs):
    """From-scratch RFC 3629 decoder: list of codepoints, or None on
    any ill-formed sequence.  Also reports whether a multi-byte
    sequence occurred."""
    cps = []
    i, n = 0, len(bs)
    multi = False
    while i < n:
        b0 = bs[i]
        if b0 < 0x80:
            cps.append(b0)
            i += 1
            continue
        # (need, first-continuation range) per the RFC 3629 table —
        # the range encodes the overlong / surrogate / max exclusions
        if 0xC2 <= b0 <= 0xDF:
            need, lo1, hi1 = 1, 0x80, 0xBF
        elif b0 == 0xE0:
            need, lo1, hi1 = 2, 0xA0, 0xBF
        elif 0xE1 <= b0 <= 0xEC or b0 in (0xEE, 0xEF):
            need, lo1, hi1 = 2, 0x80, 0xBF
        elif b0 == 0xED:  # exclude surrogates D800-DFFF
            need, lo1, hi1 = 2, 0x80, 0x9F
        elif b0 == 0xF0:
            need, lo1, hi1 = 3, 0x90, 0xBF
        elif 0xF1 <= b0 <= 0xF3:
            need, lo1, hi1 = 3, 0x80, 0xBF
        elif b0 == 0xF4:  # exclude > U+10FFFF
            need, lo1, hi1 = 3, 0x80, 0x8F
        else:
            return None, False  # C0/C1 overlong lead, F5-FF, stray cont
        if i + need >= n:
            return None, False
        cp = b0 & (0x7F >> (need + 1))
        for k in range(1, need + 1):
            bk = bs[i + k]
            lo_k, hi_k = (lo1, hi1) if k == 1 else (0x80, 0xBF)
            if not (lo_k <= bk <= hi_k):
                return None, False
            cp = (cp << 6) | (bk & 0x3F)
        cps.append(cp)
        multi = True
        i += need + 1
    return cps, multi


def _oracle_round(s: str):
    bs = []
    for ch in s:
        b = _CP_TO_BYTE.get(ord(ch))
        if b is None:
            return None
        bs.append(b)
    cps, multi = _utf8_decode_strict(bs)
    if cps is None or not multi:
        return None
    return "".join(chr(c) for c in cps)


def oracle_fix(text, max_rounds: int = 3):
    """``(repaired_text, rounds)`` — restatement of the frozen policy."""
    if text is None:
        return None, 0
    rounds = 0
    while rounds < max_rounds:
        fixed = _oracle_round(text)
        if fixed is None:
            break
        text = fixed
        rounds += 1
    return text, rounds
