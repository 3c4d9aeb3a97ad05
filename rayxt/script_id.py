"""Unicode script profiling: per-document dominant writing system and
its share — the script-level filter multilingual corpus pipelines
apply next to language ID (langid models mislabel short or mixed-
script text; the script histogram is the cheap, deterministic guard).

Frozen policy (the independent oracle in
``tests/oracle/script_oracle.py`` restates it from this spec text with
a per-character pure-Python classifier — never from the code):

* codepoints classify into SCRIPT classes by the explicit ranges of
  ``SCRIPT_RANGES`` (first matching class; ranges are disjoint).
  Everything else — ASCII digits, punctuation, whitespace, symbols,
  unlisted scripts — is unclassified and never counts.
* ``script_counts`` = number of classified codepoints per class;
  ``n_script_chars`` = their sum.
* ``dominant_script`` = the class with the highest count, ties broken
  by LEXICOGRAPHICALLY SMALLEST class name; null when no codepoint
  classified.  ``script_ratio`` = round(max count / n_script_chars, 6);
  0.0 when nothing classified.  null text -> (null, 0.0, 0).

Scale shape: one stateless ``map_batches`` stage; per row the text
decodes to a numpy uint32 codepoint array once and every class is a
vectorized range test — no per-character Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["SCRIPT_RANGES", "script_profile", "add_script_profile"]

#: class name -> tuple of inclusive (lo, hi) codepoint ranges
SCRIPT_RANGES: dict = {
    "latin": ((0x41, 0x5A), (0x61, 0x7A), (0xC0, 0x24F)),
    "greek": ((0x370, 0x3FF), (0x1F00, 0x1FFF)),
    "cyrillic": ((0x400, 0x4FF), (0x500, 0x52F)),
    "hebrew": ((0x590, 0x5FF),),
    "arabic": ((0x600, 0x6FF), (0x750, 0x77F)),
    "devanagari": ((0x900, 0x97F),),
    "thai": ((0xE00, 0xE7F),),
    "kana": ((0x3040, 0x309F), (0x30A0, 0x30FF)),
    "hangul": ((0xAC00, 0xD7AF), (0x1100, 0x11FF)),
    "han": ((0x4E00, 0x9FFF), (0x3400, 0x4DBF)),
}

_CLASSES = sorted(SCRIPT_RANGES)  # lexicographic = the tie-break order


def script_profile(text):
    """``(dominant_script, script_ratio, n_script_chars)`` for one
    document under the frozen policy."""
    if not text:
        return None, 0.0, 0
    cps = np.frombuffer(text.encode("utf-32-le"), dtype="<u4")
    best_name, best_count, total = None, 0, 0
    for name in _CLASSES:
        count = 0
        for lo, hi in SCRIPT_RANGES[name]:
            count += int(((cps >= lo) & (cps <= hi)).sum())
        total += count
        if count > best_count:  # strict: earlier (smaller) name wins ties
            best_name, best_count = name, count
    if total == 0:
        return None, 0.0, 0
    return best_name, round(best_count / total, 6), total


def add_script_profile(ds, col: str = "text"):
    """Append ``dominant_script`` / ``script_ratio`` /
    ``n_script_chars`` — stateless, zero exchanges."""

    def profile(batch: pa.Table) -> pa.Table:
        rows = [script_profile(t) for t in batch[col].to_pylist()]
        return (batch
                .append_column("dominant_script",
                               pa.array([r[0] for r in rows], pa.string()))
                .append_column("script_ratio",
                               pa.array([r[1] for r in rows], pa.float64()))
                .append_column("n_script_chars",
                               pa.array([r[2] for r in rows], pa.int64())))

    return ds.map_batches(profile, batch_format="pyarrow")
