"""Independent restatement of the token-shard policy
(``rayxt/tokshard.py`` module docstring) for golden generation.

Different mechanisms end to end: CRC-32 via its own generated
bit-reflection table (the engine calls ``zlib.crc32``), regex split
restated with ``re``, packing as a plain per-partition python loop
over doc-sorted rows (the engine concatenates numpy arrays), and the
expected ``.bin`` bytes assembled with ``struct`` — so a byte-level
comparison of engine shards against oracle bytes checks layout,
endianness, padding and ordering at once.
"""

from __future__ import annotations

import re
import struct

_WS_RE = re.compile("[ \t\n\r\f\v]+")

_CRC_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0xEDB88320 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = _CRC_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def tokens_of(text) -> list:
    if text is None:
        return []
    return [t for t in _WS_RE.split(text) if t]


def token_id(token: str, vocab_size: int) -> int:
    return 2 + crc32(token.encode("utf-8")) % (vocab_size - 2)


def oracle_shards(rows, *, seq_len, vocab_size, num_partitions,
                  id_col="url", text_col="text"):
    """rows (dicts) -> {part_id: (bin bytes, idx dict)} under the
    frozen policy; empty partitions are absent."""
    parts: dict = {}
    for r in rows:
        pid = crc32(str(r[id_col]).encode("utf-8")) % num_partitions
        parts.setdefault(pid, []).append(r)
    out = {}
    for pid, docs in parts.items():
        docs.sort(key=lambda r: str(r[id_col]))
        stream: list = []
        for r in docs:
            stream.extend(token_id(t, vocab_size)
                          for t in tokens_of(r[text_col]))
            stream.append(1)  # EOD
        n_tokens = len(stream)
        n_seqs = (n_tokens + seq_len - 1) // seq_len if n_tokens else 0
        stream.extend([0] * (n_seqs * seq_len - n_tokens))  # PAD
        blob = struct.pack(f"<{len(stream)}i", *stream)
        out[pid] = (blob, {"part_id": pid, "n_seqs": n_seqs,
                           "seq_len": seq_len, "n_tokens": n_tokens,
                           "n_docs": len(docs),
                           "vocab_size": vocab_size})
    return out


def oracle_sequences(rows, **kw):
    """Flat (part_id, seq_idx, space-joined id string) triples — the
    gate-golden shape."""
    seq_len = kw["seq_len"]
    out = []
    for pid, (blob, _idx) in sorted(oracle_shards(rows, **kw).items()):
        ids = struct.unpack(f"<{len(blob) // 4}i", blob)
        for s in range(len(ids) // seq_len):
            chunk = ids[s * seq_len:(s + 1) * seq_len]
            out.append({"part_id": pid, "seq_idx": s,
                        "tokens_str": " ".join(map(str, chunk))})
    return out


def oracle_shuffle_order(seed: int, part_id: int, n: int) -> list:
    """Restates the frozen shuffled-read permutation: seq indices in
    ascending ``crc32(b"<seed>:<part_id>:<i>")`` order, ties by i —
    via the oracle's own CRC table, never zlib."""
    keyed = sorted(range(n), key=lambda i: (
        crc32(b"%d:%d:%d" % (seed, part_id, i)), i))
    return keyed
