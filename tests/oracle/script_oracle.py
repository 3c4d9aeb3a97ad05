"""Independent naive oracle for Unicode script profiling.

Deliberately different mechanism from ``rayxt/script_id.py``: a
PER-CHARACTER pure-Python classifier (an if-chain over ``ord`` values
typed out from the frozen range table in the engine's spec text),
counts in a dict, the winner picked by an explicit ``min`` over
``(-count, name)`` — no numpy anywhere.  Goldens come from THIS module
only.
"""

from __future__ import annotations


def _classify(cp: int):
    if 0x41 <= cp <= 0x5A or 0x61 <= cp <= 0x7A or 0xC0 <= cp <= 0x24F:
        return "latin"
    if 0x370 <= cp <= 0x3FF or 0x1F00 <= cp <= 0x1FFF:
        return "greek"
    if 0x400 <= cp <= 0x4FF or 0x500 <= cp <= 0x52F:
        return "cyrillic"
    if 0x590 <= cp <= 0x5FF:
        return "hebrew"
    if 0x600 <= cp <= 0x6FF or 0x750 <= cp <= 0x77F:
        return "arabic"
    if 0x900 <= cp <= 0x97F:
        return "devanagari"
    if 0xE00 <= cp <= 0xE7F:
        return "thai"
    if 0x3040 <= cp <= 0x309F or 0x30A0 <= cp <= 0x30FF:
        return "kana"
    if 0xAC00 <= cp <= 0xD7AF or 0x1100 <= cp <= 0x11FF:
        return "hangul"
    if 0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF:
        return "han"
    return None


def oracle_script_profile(text):
    if not text:
        return None, 0.0, 0
    counts: dict = {}
    for ch in text:
        name = _classify(ord(ch))
        if name is not None:
            counts[name] = counts.get(name, 0) + 1
    if not counts:
        return None, 0.0, 0
    best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    return best[0], round(best[1] / total, 6), total
