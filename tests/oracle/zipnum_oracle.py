"""Independent naive oracle for the ZipNum cluster index layout.

Restates the documented on-disk contract of
``rayxt/cdx.py::export_zipnum`` from its spec text, never the code,
with deliberately different mechanisms: gzip members are decompressed
and boundary-checked with ``zlib.decompressobj`` (eof + empty
``unused_data`` proves each ``cluster.idx`` entry spans EXACTLY one
member — the engine writes via ``gzip.GzipFile``), sort order is
verified on the (urlkey, ts14, url) tuple re-extracted by the
from-scratch CDXJ line oracle (``cdx_oracle.oracle_cdxj_line`` — the
``json`` module is never imported), and the lookup restatement is a
plain linear scan over the concatenated lines.
"""

from __future__ import annotations

import os
import zlib

from .cdx_oracle import oracle_cdxj_line


def parse_cluster_idx(out_dir: str):
    """Own cluster.idx parser: (sortkey, part, offset, length, seq)."""
    entries = []
    with open(os.path.join(out_dir, "cluster.idx"),
              encoding="utf-8") as fh:
        for raw in fh:
            fields = raw.rstrip("\n").split("\t")
            assert len(fields) == 5, f"bad cluster.idx line {raw!r}"
            key, part, off, length, seq = fields
            entries.append((key, part, int(off), int(length), int(seq)))
    return entries


def _gunzip_one_member(blob: bytes) -> bytes:
    """Decompress EXACTLY one gzip member spanning the whole blob."""
    d = zlib.decompressobj(wbits=31)
    out = d.decompress(blob)
    assert d.eof, "cluster.idx entry does not end on a member boundary"
    assert d.unused_data == b"", "cluster.idx entry spans >1 member"
    return out


def verify_zipnum_layout(out_dir: str, lines_per_block: int):
    """Structural verification of a ZipNum directory against the
    documented contract; returns every CDXJ line in cluster.idx
    order.  Checks per entry: the (offset, length) slice is one whole
    gzip member, the entry key is the first line's ``urlkey ts14``,
    non-final blocks of a part hold exactly ``lines_per_block``
    lines; per part: entries are contiguous from 0 and cover the
    whole file; globally: seq numbers are 1..N in file order and the
    concatenated lines sort by the documented (urlkey, ts14, url)
    tuple."""
    entries = parse_cluster_idx(out_dir)
    by_part: dict[str, list] = {}
    for e in entries:
        by_part.setdefault(e[1], []).append(e)
    assert [e[4] for e in entries] == list(range(1, len(entries) + 1))
    assert list(by_part) == sorted(by_part), "parts out of key order"

    all_lines = []
    for part, plist in by_part.items():
        path = os.path.join(out_dir, part)
        size = os.path.getsize(path)
        pos = 0
        with open(path, "rb") as fh:
            data = fh.read()
        for i, (key, _part, off, length, _seq) in enumerate(plist):
            assert off == pos, f"{part}: gap/overlap at entry {i}"
            pos = off + length
            lines = _gunzip_one_member(
                data[off:off + length]).decode("utf-8").splitlines()
            assert lines, f"{part}: empty block {i}"
            if i < len(plist) - 1:
                assert len(lines) == lines_per_block
            else:
                assert 0 < len(lines) <= lines_per_block
            first = lines[0].split(" ", 2)
            assert key == f"{first[0]} {first[1]}", (
                f"{part}: entry key != first line key at block {i}")
            all_lines.extend(lines)
        assert pos == size, f"{part}: trailing bytes beyond last entry"

    def sort_key(line: str):
        row = oracle_cdxj_line(line)
        assert row is not None, f"unparsable line {line!r}"
        return (row["urlkey"], row["ts"], row["url"] or "")

    keys = [sort_key(ln) for ln in all_lines]
    assert keys == sorted(keys), "lines not globally tuple-sorted"
    return all_lines


def oracle_zipnum_lookup(all_lines, prefix: str, *, exact: bool = False):
    """Linear-scan restatement of the lookup contract: every line
    starting with ``prefix`` (exact appends the field separator), as
    parsed rows in index order."""
    if exact:
        prefix = prefix + " "
    return [oracle_cdxj_line(ln) for ln in all_lines
            if ln.startswith(prefix)]
