"""Mojibake repair: undo UTF-8 text that was mis-decoded as
windows-1252 and re-encoded (the single most common encoding damage in
web corpora — ``Ã©`` for ``é``, ``â€™`` for ``’``), including the
double-mangled case.  The ftfy-shaped cleanup a training-data pipeline
runs right after extraction.

Frozen policy (the independent oracle in
``tests/oracle/mojibake_oracle.py`` restates it from this spec text —
never from the code; its UTF-8 validation/decoding is its own
bit-arithmetic implementation, never ``bytes.decode``):

* One repair round maps every char of the string back to the byte it
  came from under **sloppy windows-1252**: the cp1252 byte for the 251
  chars cp1252 defines, and the raw byte value for U+0081/8D/8F/90/9D
  (the five holes, which lenient decoders pass through as C1
  controls).  A char outside this 256-entry table (any char >
  U+FFFF or not in the map) makes the round inapplicable.
* The round APPLIES only if the recovered bytes are STRICTLY valid
  UTF-8 (RFC 3629: no surrogates, no overlongs, max U+10FFFF) AND
  contain at least one multi-byte sequence (pure-ASCII round-trips
  are identity and never count as repairs).
* Rounds repeat on the repaired string, at most ``MAX_ROUNDS`` (= 3)
  times; the result records how many rounds applied.
* null text passes through with 0 rounds.
* Documented false-positive envelope: genuine text that happens to
  form valid multi-byte UTF-8 under the map (e.g. the literal
  bigram ``Ã©``) is "repaired" — the deterministic trade ftfy makes
  too; at web scale the mangled reading is overwhelmingly the
  correct one.

Scale shape: one stateless ``map_batches`` stage.  An Arrow RE2
prefilter keeps the Python repair loop off clean rows: a string can
only be repairable if it contains a char in [U+00C2, U+00F4] (the
mis-decoded UTF-8 LEAD bytes C2..F4 — every multi-byte sequence
starts with one), so typically >99% of rows pass through zero-copy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["MAX_ROUNDS", "fix_mojibake", "fix_text_encoding"]

MAX_ROUNDS = 3

#: char -> original byte under sloppy windows-1252
_CHAR_TO_BYTE: dict[str, int] = {}
for _b in range(256):
    try:
        _c = bytes([_b]).decode("cp1252")
    except UnicodeDecodeError:  # the five holes: latin-1 passthrough
        _c = chr(_b)
    _CHAR_TO_BYTE[_c] = _b

#: mis-decoded UTF-8 lead bytes: only strings containing one of these
#: chars can possibly repair (C2..F4 under cp1252/latin-1 decodes into
#: this char range — cp1252 maps none of C2..F4 to other codepoints)
_LEAD_RE = "[Â-ô]"


def _one_round(s: str):
    out = bytearray(len(s))
    multi = False
    for i, ch in enumerate(s):
        b = _CHAR_TO_BYTE.get(ch)
        if b is None:
            return None
        out[i] = b
        if b >= 0x80:
            multi = True
    if not multi:
        return None
    try:
        return out.decode("utf-8", "strict")
    except UnicodeDecodeError:
        return None


def fix_mojibake(text):
    """``(repaired_text, rounds_applied)`` under the frozen policy."""
    if text is None:
        return None, 0
    rounds = 0
    while rounds < MAX_ROUNDS:
        fixed = _one_round(text)
        if fixed is None:
            break
        text = fixed
        rounds += 1
    return text, rounds


def fix_text_encoding(ds, col: str = "text", *,
                      out: str | None = None,
                      rounds_col: str = "mojibake_rounds"):
    """Append the repaired column (``out``, default: replace ``col``
    in place) and the per-row repair-round count.  Stateless, zero
    exchanges; rows without a mis-decoded lead char never enter the
    Python path."""
    dst = out or col

    def fix(batch: pa.Table) -> pa.Table:
        s = batch[col]
        hot = pc.match_substring_regex(s, _LEAD_RE)
        hot_idx = np.flatnonzero(
            hot.combine_chunks().to_numpy(zero_copy_only=False))
        rounds = np.zeros(batch.num_rows, np.int32)
        if len(hot_idx):
            vals = s.to_pylist()
            for i in hot_idx:
                vals[i], rounds[i] = fix_mojibake(vals[i])
            fixed_arr = pa.array(vals, pa.string())
        else:
            fixed_arr = pc.cast(s, pa.string())
        names = batch.column_names
        if dst in names:
            batch = batch.set_column(names.index(dst), dst, fixed_arr)
        else:
            batch = batch.append_column(dst, fixed_arr)
        return batch.append_column(rounds_col,
                                   pa.array(rounds, pa.int32()))

    return ds.map_batches(fix, batch_format="pyarrow")
