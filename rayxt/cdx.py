"""Common-Crawl index tooling: SURT url keys and a CDXJ source.

The CC index (``cdx-*.gz`` / ``*.cdxj``) is the lookup layer next to
the WARC containers: one line per capture, ``<urlkey> <timestamp14>
<json>``, sorted by SURT urlkey.  A recrawl / selective-fetch pipeline
plans from the index and only then touches containers, so the engine
needs (a) the urlkey transform that joins index rows against its own
url universe, and (b) an index source.

Frozen SURT policy (the independent oracle in
``tests/oracle/url_oracle.py::oracle_surt`` restates it from this spec
text via ``urllib.parse`` — never from the code):

* in scope: absolute URLs whose scheme (case-insensitive) is ``http``
  or ``https`` with a plain reg-name / IPv4 authority.  Out of scope
  -> null urlkey: any other scheme, authorities containing userinfo
  (``@``) or IPv6 brackets, empty hosts, and non-empty ports with
  non-digit characters.
* the fragment never participates.
* host: lowercased; ONE leading label matching ``www\\d*`` is dropped
  (``www.``, ``www2.`` …) unless it is the only label; labels are
  reversed and joined with commas.
* port: digits parsed as an integer; empty (``host:``) means no port;
  the scheme default (80/443) is dropped, anything else is re-emitted
  in plain decimal as ``:N`` after the reversed host.
* path: lowercased, empty -> ``/``.
* query: lowercased, split on ``&``, empty segments dropped, the rest
  sorted bytewise and re-joined; no surviving segments -> no ``?``.
* urlkey = ``rev,host[:port])/path[?query]``.

Frozen CDXJ line policy: ``urlkey SP timestamp14 SP json``; the JSON
object is flat with string values (the CC layout).  ``timestamp14``
parses as UTC ``YYYYMMDDhhmmss`` -> ``ts``; known fields lift into
typed columns (``url``, ``mime``, ``status`` int32, ``digest``,
``length``/``offset`` int64, ``filename``); unparsable lines (bad
field count, bad timestamp, malformed JSON) are SKIPPED.  Gzip
members are handled by the read layer (CC ships the index gzipped).

Scale shape: ``surt_key`` is one stateless map (one RE2 decomposition
per batch; per-row Python only for label reversal / query sort on
in-scope rows).  ``read_cdxj`` is a ``FileBasedDatasource`` — file-
level parallelism over the ~300 index shards of a CC crawl, streaming
line walk bounded at ``batch_rows``.
"""

from __future__ import annotations

import io
import json
import re
from datetime import datetime

import pyarrow as pa
import pyarrow.compute as pc

# NOTE: module-level import, captured in the by-value pickle —
# worker-side runtime relative imports fail when the driver runs from
# outside the repo (see ExtractDocs note in rayxt/kernel.py)
from . import __version__
from .warc import _NativeWrapper, parse_warc_records

__all__ = ["surt", "surt_key", "parse_cdxj_line", "read_cdxj",
           "latest_capture", "cdx_diff", "build_cdx", "write_cdxj",
           "export_cdxj", "write_zipnum_part", "export_zipnum",
           "load_cluster_idx", "zipnum_lookup", "zipnum_fetch"]

_URL_RE = re.compile(
    r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?")
_HOST_PORT_RE = re.compile(r"^([^:]+)(?::([0-9]*))?$")
_WWW_RE = re.compile(r"^www\d*$")
_DEFAULT_PORT = {"http": 80, "https": 443}


def surt(url) -> str | None:
    """The SURT urlkey of one URL under the frozen policy, or None."""
    if not url:
        return None
    m = _URL_RE.match(url)
    if m is None:
        return None
    scheme = m.group(1).lower()
    default = _DEFAULT_PORT.get(scheme)
    if default is None:
        return None
    authority = m.group(2)
    if "@" in authority or "[" in authority or "]" in authority:
        return None
    hp = _HOST_PORT_RE.match(authority)
    if hp is None or not hp.group(1):
        return None
    host = hp.group(1).lower()
    port_text = hp.group(2)
    port = None
    if port_text:
        port = int(port_text)
        if port == default:
            port = None
    labels = host.split(".")
    if len(labels) > 1 and _WWW_RE.match(labels[0]):
        labels = labels[1:]
    key = ",".join(reversed(labels))
    if port is not None:
        key += f":{port}"
    path = (m.group(3) or "/").lower()
    query = m.group(4)
    if query is not None:
        segs = sorted(s for s in query.lower().split("&") if s)
        if segs:
            return f"{key}){path}?" + "&".join(segs)
    return f"{key}){path}"


def surt_key(ds, col: str = "url", out: str = "urlkey"):
    """Append the SURT urlkey column — stateless, zero exchanges; an
    RE2 prefilter skips rows that cannot be in scope."""

    def add(batch: pa.Table) -> pa.Table:
        s = batch[col]
        maybe = pc.match_substring_regex(
            s, "(?i)^https?://").combine_chunks().to_numpy(
                zero_copy_only=False)
        vals = s.to_pylist()
        keys = [surt(v) if ok else None for v, ok in zip(vals, maybe)]
        return batch.append_column(out, pa.array(keys, pa.string()))

    return ds.map_batches(add, batch_format="pyarrow")


_CDX_SCHEMA = pa.schema([
    ("urlkey", pa.string()),
    ("ts", pa.timestamp("us")),
    ("url", pa.string()),
    ("mime", pa.string()),
    ("status", pa.int32()),
    ("digest", pa.string()),
    ("length", pa.int64()),
    ("offset", pa.int64()),
    ("filename", pa.string()),
])


def parse_cdxj_line(line: str):
    """One CDXJ line -> dict of the typed columns, or None (skipped)."""
    parts = line.rstrip("\r\n").split(" ", 2)
    if len(parts) != 3:
        return None
    urlkey, ts14, blob = parts
    if len(ts14) != 14 or not ts14.isdigit():
        return None
    try:
        ts = datetime(int(ts14[0:4]), int(ts14[4:6]), int(ts14[6:8]),
                      int(ts14[8:10]), int(ts14[10:12]), int(ts14[12:14]))
    except ValueError:
        return None
    try:
        fields = json.loads(blob)
    except ValueError:
        return None
    if not isinstance(fields, dict) or not all(
            isinstance(v, str) for v in fields.values()):
        return None  # the frozen layout is flat string-valued JSON

    def _int(name):
        v = fields.get(name)
        try:
            return int(v) if v is not None else None
        except ValueError:
            return None

    return {
        "urlkey": urlkey,
        "ts": ts,
        "url": fields.get("url"),
        "mime": fields.get("mime"),
        "status": _int("status"),
        "digest": fields.get("digest"),
        "length": _int("length"),
        "offset": _int("offset"),
        "filename": fields.get("filename"),
    }


def _cdx_table(rows) -> pa.Table:
    cols = {name: [r[name] for r in rows] for name in _CDX_SCHEMA.names}
    return pa.table(
        {name: pa.array(cols[name], _CDX_SCHEMA.field(name).type)
         for name in _CDX_SCHEMA.names}, schema=_CDX_SCHEMA)


def read_cdxj(paths, *, batch_rows: int = 4096, **kwargs):
    """CDXJ index files (plain or gzipped) -> Dataset with the typed
    CDX schema; unparsable lines are skipped."""
    import ray.data as rd
    from ray.data.datasource import FileBasedDatasource

    class CdxjDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["cdxj", "cdx", "gz"]

        def _read_stream(self, f, path: str):
            import gzip

            stream = io.BufferedReader(_NativeWrapper(f))
            if stream.peek(2)[:2] == b"\x1f\x8b":
                stream = io.BufferedReader(gzip.GzipFile(fileobj=stream))
            text = io.TextIOWrapper(stream, encoding="utf-8",
                                    errors="replace")
            rows = []
            for line in text:
                row = parse_cdxj_line(line)
                if row is None:
                    continue
                rows.append(row)
                if len(rows) >= batch_rows:
                    yield _cdx_table(rows)
                    rows = []
            if rows:
                yield _cdx_table(rows)

    return rd.read_datasource(CdxjDatasource(paths, **kwargs))


def latest_capture(ds, *, key_col: str = "urlkey", ts_col: str = "ts"):
    """One row per ``key_col`` — the max-``ts_col`` capture, ties
    broken by the greatest ``url`` (nulls compare lowest).  The same
    argmax-``AggregateFn`` shape as
    :func:`rayxt.pipeline.dedup_latest_by_url`, but null-safe: CDX
    rows legitimately carry null fields, so the comparison key is only
    ``(ts, url-or-empty)`` and never touches the payload columns."""
    from ray.data.aggregate import AggregateFn

    def row_key(row: dict):
        return (row[ts_col], row.get("url") or "")

    def accumulate_block(acc, block):
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block, preserve_index=False)
        if block.num_rows == 0:
            return acc
        mx = pc.max(block[ts_col])
        sub = block.filter(pc.equal(block[ts_col], mx))
        if sub.num_rows > 1:
            sub = sub.sort_by([("url", "descending")])
        row = sub.slice(0, 1).to_pylist()[0]
        if acc is None or row_key(row) > row_key(acc):
            return row
        return acc

    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return a if row_key(a) >= row_key(b) else b

    latest = ds.groupby(key_col).aggregate(
        AggregateFn(init=lambda k: None, merge=merge, name="latest_row",
                    accumulate_block=accumulate_block))

    def unpack(t: pa.Table) -> pa.Table:
        col = t["latest_row"].combine_chunks()
        fields = {f.name: pc.struct_field(col, f.name) for f in col.type}
        return pa.table(fields)

    return latest.map_batches(unpack, batch_format="pyarrow")


def cdx_diff(old, new, *, num_partitions: int = 8):
    """Per-urlkey change classification between two index snapshots —
    the recrawl planner's delta.  Each side reduces to its latest
    capture, the skinny ``(urlkey, ts, digest)`` projections meet in
    ONE full-outer hash join, and each key classifies as ``added``
    (new side only), ``removed`` (old side only), ``changed``
    (digests differ, null-safe: both-null compares equal) or
    ``unchanged``.  The wide index columns never enter the exchange."""

    def skinny(ds, prefix: str):
        def ren(t: pa.Table) -> pa.Table:
            return pa.table({
                "urlkey": t["urlkey"],
                f"{prefix}_ts": t["ts"],
                f"{prefix}_digest": t["digest"],
            })

        return latest_capture(ds).map_batches(ren, batch_format="pyarrow")

    joined = skinny(old, "old").join(
        skinny(new, "new"), "full_outer", num_partitions=num_partitions,
        on=("urlkey",))

    def classify(t: pa.Table) -> pa.Table:
        old_there = pc.is_valid(t["old_ts"])
        new_there = pc.is_valid(t["new_ts"])
        od = pc.fill_null(t["old_digest"], "\x00none")
        nd = pc.fill_null(t["new_digest"], "\x00none")
        change = pc.if_else(
            pc.invert(old_there), pa.scalar("added"),
            pc.if_else(
                pc.invert(new_there), pa.scalar("removed"),
                pc.if_else(pc.not_equal(od, nd),
                           pa.scalar("changed"), pa.scalar("unchanged"))))
        return pa.table({
            "urlkey": t["urlkey"],
            "change": change,
            "old_ts": t["old_ts"],
            "new_ts": t["new_ts"],
            "old_digest": t["old_digest"],
            "new_digest": t["new_digest"],
        })

    return joined.map_batches(classify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# CDX generation (the cdx-indexer side): WARC containers -> index rows
# ---------------------------------------------------------------------------
#
# Common Crawl derives its index FROM the containers: for every
# ``response`` record, the capture's urlkey/timestamp plus the seek
# coordinates (filename, byte offset, compressed length) that let a
# fetcher pull exactly that record without reading the rest of the
# file.  Those coordinates are properties of the CONTAINER layout, so
# the indexer walks raw bytes itself (never a decompressing reader):
#
# * ``.warc.gz`` — one gzip member per record (the CC layout): members
#   found by handing each member to ``zlib.decompressobj(wbits=31)``
#   and resuming at ``unused_data``; offset/length are the member's
#   compressed span.  A member holding several records attributes all
#   of them to the member's span (seekable unit = member).
# * ``.warc.zst`` — one zstd frame per record: frames walked per RFC
#   8878 (descriptor-sized header fields, then 3-byte block headers
#   until ``last``), skippable frames skipped; each frame slice is
#   decompressed via pyarrow's bundled codec.
# * plain ``.warc`` — seekable unit = the record itself: offset is the
#   first byte of the version line, length runs through the record's
#   trailing CRLF CRLF.
#
# FROZEN row policy (restated independently by
# ``tests/oracle/cdxgen_oracle.py`` — RFC 1952 field-level member walk
# with CRC/ISIZE verification, its own frame walk, regex header parse,
# arithmetic base32 — never this module's mechanisms):
#
# 1. one row per ``WARC-Type: response`` record, in container order;
#    every other record type (warcinfo/request/metadata/conversion/..)
#    is skipped.
# 2. ``urlkey`` = the frozen SURT transform of WARC-Target-URI (null
#    for out-of-scope URLs — such rows are still emitted by
#    ``build_cdx`` but SKIPPED by ``write_cdxj``: they cannot be
#    looked up).
# 3. ``ts`` = WARC-Date (null when unparsable).
# 4. ``mime`` = the HTTP Content-Type value before the first ``;``,
#    ASCII-stripped and lowercased, null when absent or when the
#    payload has no HTTP head; ``status`` = the status-line code under
#    the ``read_warc(with_http=True)`` policy.
# 5. ``digest`` = RFC 4648 base32 of SHA-1 over the RAW stored HTTP
#    body (bytes after the first CRLF CRLF; never de-chunked) — CC's
#    WARC-Payload-Digest convention without the ``sha1:`` prefix.
#    An empty body digests normally (sha1 of b"").
# 6. ``filename`` = the basename of the container path.

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


class _BufStream:
    """Buffered reader over a raw byte stream tracking the ABSOLUTE
    offset of the next unconsumed byte (``pos``)."""

    def __init__(self, f, chunk: int = 1 << 16):
        self._f = f
        self._chunk = chunk
        self._buf = b""
        self._eof = False
        self.pos = 0

    def _fill(self) -> bool:
        b = self._f.read(self._chunk)
        if not b:
            self._eof = True
            return False
        self._buf += b
        return True

    def peek(self, n: int) -> bytes:
        while len(self._buf) < n and not self._eof:
            self._fill()
        return self._buf[:n]

    def read(self, n: int) -> bytes:
        while len(self._buf) < n and not self._eof:
            self._fill()
        out, self._buf = self._buf[:n], self._buf[n:]
        self.pos += len(out)
        return out

    def read_some(self) -> bytes:
        """Whatever is buffered (filling once if empty); b'' at EOF."""
        if not self._buf and not self._eof:
            self._fill()
        out, self._buf = self._buf, b""
        self.pos += len(out)
        return out

    def readline(self) -> bytes:
        while True:
            i = self._buf.find(b"\n")
            if i >= 0:
                out, self._buf = self._buf[:i + 1], self._buf[i + 1:]
                self.pos += len(out)
                return out
            if not self._fill():
                out, self._buf = self._buf, b""
                self.pos += len(out)
                return out


def _iter_gzip_members(bs: _BufStream):
    """(offset, compressed_length, decompressed bytes) per gzip member:
    each member inflates under ``wbits=31`` and the walk resumes at the
    decompressor's ``unused_data`` boundary."""
    import zlib

    leftover = b""
    start = 0
    while True:
        if not leftover:
            start = bs.pos
            leftover = bs.read_some()
            if not leftover:
                return
        else:
            start = bs.pos - len(leftover)
        d = zlib.decompressobj(31)
        parts = []
        fed = 0
        chunk = leftover
        leftover = b""
        while True:
            parts.append(d.decompress(chunk))
            fed += len(chunk)
            if d.eof:
                leftover = d.unused_data
                fed -= len(leftover)
                yield start, fed, b"".join(parts)
                break
            chunk = bs.read_some()
            if not chunk:
                raise ValueError("truncated gzip member")


def _iter_zstd_frames(bs: _BufStream):
    """(offset, compressed_length, decompressed bytes) per zstd frame
    (RFC 8878 walk); skippable frames (magic 0x184D2A5?) are skipped."""
    while True:
        start = bs.pos
        magic = bs.peek(4)
        if not magic:
            return
        if len(magic) < 4:
            raise ValueError("truncated zstd stream")
        if magic[0] in range(0x50, 0x60) and magic[1] == 0x2A \
                and magic[2] == 0x4D and magic[3] == 0x18:
            head = bs.read(8)  # skippable frame: magic + LE32 size
            size = int.from_bytes(head[4:8], "little")
            if len(bs.read(size)) != size:
                raise ValueError("truncated skippable frame")
            continue
        if magic != _ZSTD_MAGIC:
            raise ValueError(f"not a zstd frame at {start}: {magic!r}")
        frame = bytearray(bs.read(4))
        desc_b = bs.read(1)
        if not desc_b:
            raise ValueError("truncated zstd frame header")
        frame += desc_b
        desc = desc_b[0]
        fcs_flag = desc >> 6
        single_segment = (desc >> 5) & 1
        checksum = (desc >> 2) & 1
        did_size = (0, 1, 2, 4)[desc & 3]
        if desc & 0x08:  # bit 3 reserved; bit 4 'Unused' is legal
            raise ValueError("reserved zstd descriptor bit set")
        fcs_size = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
        n_head = (0 if single_segment else 1) + did_size + fcs_size
        head = bs.read(n_head)
        if len(head) != n_head:
            raise ValueError("truncated zstd frame header")
        frame += head
        while True:  # block walk: 3-byte LE header
            bh = bs.read(3)
            if len(bh) != 3:
                raise ValueError("truncated zstd block header")
            frame += bh
            v = int.from_bytes(bh, "little")
            last, btype, bsize = v & 1, (v >> 1) & 3, v >> 3
            if btype == 3:
                raise ValueError("reserved zstd block type")
            span = 1 if btype == 1 else bsize  # RLE stores one byte
            body = bs.read(span)
            if len(body) != span:
                raise ValueError("truncated zstd block")
            frame += body
            if last:
                break
        if checksum:
            frame += bs.read(4)
        blob = bytes(frame)
        out = pa.CompressedInputStream(
            pa.BufferReader(blob), "zstd").read()
        yield start, len(blob), bytes(out)


def _iter_plain_records(bs: _BufStream):
    """(offset, length, record bytes) per record of a PLAIN WARC
    stream: version line + headers + blank line + Content-Length
    payload + CRLF CRLF."""
    while True:
        # skip inter-record blank lines; the record starts at the
        # version line
        while True:
            start = bs.pos
            line = bs.readline()
            if not line:
                return
            if line.rstrip(b"\r\n"):
                break
        head = [line]
        length = 0
        while True:
            line = bs.readline()
            if not line:
                raise ValueError("truncated WARC header block")
            head.append(line)
            s = line.rstrip(b"\r\n")
            if not s:
                break
            name, _, val = s.partition(b":")
            if name.strip().lower() == b"content-length":
                length = int(val.strip())
        payload = bs.read(length)
        if len(payload) != length:
            raise ValueError("truncated WARC payload")
        tail = bs.read(4)  # the record's CRLF CRLF
        rec = b"".join(head) + payload + tail
        yield start, bs.pos - start, rec


def _iter_container_units(bs: _BufStream):
    """Dispatch on the container magic: (offset, length, decompressed
    bytes) seekable units for gz / zst / plain WARC streams."""
    magic = bs.peek(4)
    if magic[:2] == b"\x1f\x8b":
        return _iter_gzip_members(bs)
    if magic == _ZSTD_MAGIC or _is_skippable(magic):
        return _iter_zstd_frames(bs)
    return _iter_plain_records(bs)


def _is_skippable(magic: bytes) -> bool:
    """zstd skippable-frame magic 0x184D2A50..5F (little-endian)."""
    return (len(magic) == 4 and 0x50 <= magic[0] <= 0x5F
            and magic[1:] == b"\x2a\x4d\x18")


def _open_raw(path: str):
    """Raw (NEVER auto-decompressed) byte stream for one path, via
    pyarrow.fs so URI-addressed stores work like local files."""
    from pyarrow import fs as pafs

    try:
        fsys, rel = pafs.FileSystem.from_uri(path)
    except Exception:
        fsys, rel = pafs.LocalFileSystem(), path
    return fsys.open_input_stream(rel, compression=None)


def _index_units(path: str):
    """CDX row dicts for one container, in container order."""
    # NOTE: stdlib-only runtime imports here; parse_warc_records is a
    # MODULE-LEVEL relative import captured in the by-value pickle — a
    # runtime `from .warc import ...` inside this worker-side UDF dies
    # when the driver runs from outside the repo (the ExtractDocs rule)
    import base64
    import hashlib
    import io as _io
    import posixpath

    filename = posixpath.basename(path.rstrip("/"))
    bs = _BufStream(_open_raw(path))
    for offset, length, blob in _iter_container_units(bs):
        for url, ts, body, status, ctype in parse_warc_records(
                _io.BytesIO(blob), record_types=(b"response",),
                with_http=True):
            mime = None
            if ctype:
                mime = ctype.split(";", 1)[0].strip() or None
            yield {
                "urlkey": surt(url),
                "ts": ts,
                "url": url or None,
                "mime": mime,
                "status": status,
                "digest": base64.b32encode(
                    hashlib.sha1(body).digest()).decode("ascii"),
                "length": length,
                "offset": offset,
                "filename": filename,
            }


def build_cdx(paths, *, batch_rows: int = 4096):
    """WARC containers -> Dataset of CDX index rows (the cdx-indexer
    side of the index layer; ``read_cdxj`` is the consumer side).

    Scale shape: one task per container file (CC segments are ~1 GiB,
    thousands per crawl), each walking its container's raw bytes as a
    bounded stream — at most one seekable unit (one record, in the CC
    layouts) is held decompressed at a time, and rows flush every
    ``batch_rows``.  Output is the narrow typed index schema; payload
    bytes die inside the task."""
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]
    paths = list(paths)

    def index_files(batch: pa.Table):
        rows = []
        for path in batch["path"].to_pylist():
            for row in _index_units(path):
                rows.append(row)
                if len(rows) >= batch_rows:
                    yield _cdx_table(rows)
                    rows = []
        if rows:
            yield _cdx_table(rows)

    return rd.from_items(
        [{"path": p} for p in paths], override_num_blocks=len(paths),
    ).map_batches(index_files, batch_format="pyarrow", batch_size=None)


def _format_cdxj_lines(rows) -> list[str]:
    """CDX row dicts -> sorted CDXJ lines (the frozen shard policy
    shared by :func:`write_cdxj` and the ZipNum writer): rows with a
    null urlkey or null ts are SKIPPED (unindexable); ``ts`` truncates
    to the 14-digit second grain; null fields are omitted from the
    flat string-valued JSON; lines sort bytewise by the DOCUMENTED
    (urlkey, timestamp14, url) tuple — never the formatted line, where
    json escaping would leak into the url tie-break."""
    keyed = []
    for r in rows:
        if not r.get("urlkey") or r.get("ts") is None:
            continue
        ts14 = r["ts"].strftime("%Y%m%d%H%M%S")
        fields = {}
        for name in ("url", "mime", "status", "digest", "length",
                     "offset", "filename"):
            v = r.get(name)
            if v is not None:
                fields[name] = str(v)
        keyed.append(((r["urlkey"], ts14, r.get("url") or ""),
                      f"{r['urlkey']} {ts14} {json.dumps(fields)}\n"))
    keyed.sort(key=lambda kv: kv[0])
    return [line for _, line in keyed]


def write_cdxj(rows, path: str, *, gzip_compress: bool | None = None
               ) -> str:
    """CDX row dicts -> ONE CDXJ index shard: ``urlkey SP timestamp14
    SP json`` lines sorted bytewise by (urlkey, timestamp14, url) —
    the CC shard layout ``read_cdxj`` consumes.  Frozen: rows with a
    null urlkey or null ts are SKIPPED (unindexable); ``ts`` truncates
    to the 14-digit second grain; null fields are omitted from the
    flat string-valued JSON.  ``.gz`` paths gzip the whole shard
    (the CC index layout — unlike WARCs, index shards are scanned
    sequentially, so per-line members buy nothing)."""
    import gzip as _gzip

    if gzip_compress is None:
        gzip_compress = path.endswith(".gz")
    lines = _format_cdxj_lines(rows)
    blob = "".join(lines).encode("utf-8")
    if gzip_compress:
        buf = io.BytesIO()
        with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(blob)
        blob = buf.getvalue()
    with open(path, "wb") as out:
        out.write(blob)
    return path


def export_cdxj(ds, out_dir: str, num_partitions: int = 16):
    """Distributed CDXJ export: urlkey-hash-partitioned index shards,
    one ``part-NNNN.cdxj.gz`` per partition written atomically
    (tmp+rename; an existing shard is SKIPPED, so a re-run resumes),
    each with a P12 lineage sidecar.  Rows with a null urlkey or ts
    are dropped BEFORE the exchange (``write_cdxj``'s frozen policy —
    they cannot be looked up), so only indexable narrow rows shuffle.
    Returns the per-partition summary ``(part_id, rows)``.

    (CC itself range-partitions shards by sorted urlkey; hash
    partitioning keeps the exchange one-pass and resumable — a range
    layout would add a full sort for lookup locality this engine's
    consumers don't need.)"""
    # __version__ is imported at module level — the worker-import rule
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.and_(pc.is_valid(batch["urlkey"]),
                                    pc.is_valid(batch["ts"])))

    def write_group(group: pd.DataFrame) -> pd.DataFrame:
        pid = int(group["part_id"].iloc[0])
        path = os.path.join(out_dir, f"part-{pid:04d}.cdxj.gz")
        if not os.path.exists(path):
            tmp = path + f".tmp{os.getpid()}"
            write_cdxj(
                ({k: (v.to_pydatetime() if k == "ts" else
                      None if pd.isna(v) else
                      int(v) if k in ("status", "length", "offset")
                      else v)
                  for k, v in row.items() if k != "part_id"}
                 for row in group.to_dict("records")), tmp,
                gzip_compress=True)
            os.rename(tmp, path)
            ldir = os.path.join(out_dir, "lineage")
            os.makedirs(ldir, exist_ok=True)
            ltmp = os.path.join(ldir, f"part-{pid:04d}.json.tmp")
            with open(ltmp, "w") as lf:
                json.dump({
                    "part_id": pid,
                    "rows": int(len(group)),
                    "bytes_out": int(os.path.getsize(path)),
                    "engine_version": __version__,
                }, lf)
            os.rename(ltmp, os.path.join(ldir, f"part-{pid:04d}.json"))
        return pd.DataFrame({"part_id": [pid], "rows": [len(group)]})

    from .pipeline import add_part_id

    tagged = add_part_id(
        ds.map_batches(keep, batch_format="pyarrow"),
        num_partitions, key_col="urlkey")
    return tagged.groupby("part_id").map_groups(write_group).to_pandas()


# ---------------------------------------------------------------------------
# ZipNum cluster index (CC's seekable index layout: cluster.idx + cdx-*.gz)
# ---------------------------------------------------------------------------

def _prefix_upper(prefix: str):
    """Smallest string greater than every string with ``prefix``
    (``None`` = unbounded).  ASCII-envelope increment of the last
    character; SURT urlkeys are ASCII by construction (non-ASCII hosts
    pass through :func:`surt` unchanged, and the increment still works
    for any character below the max codepoint)."""
    while prefix and ord(prefix[-1]) >= 0x10FFFF:
        prefix = prefix[:-1]
    if not prefix:
        return None
    return prefix[:-1] + chr(ord(prefix[-1]) + 1)


def write_zipnum_part(rows, path: str, *, lines_per_block: int = 3000):
    """CDX row dicts -> ONE ZipNum part: sorted CDXJ lines chunked
    into ``lines_per_block``-line groups, each group an independent
    gzip member (``mtime=0`` — byte-deterministic), members
    concatenated into ``path``.  Returns the part's summary entries
    ``[(sortkey, offset, length), ...]`` — one per block, where
    ``sortkey`` is the ``"urlkey ts14"`` key of the block's FIRST
    line, exactly what a ``cluster.idx`` line carries.  The frozen
    line/sort/skip policy is :func:`_format_cdxj_lines`'s."""
    import gzip as _gzip

    lines = _format_cdxj_lines(rows)
    entries = []
    offset = 0
    with open(path, "wb") as out:
        for start in range(0, len(lines), lines_per_block):
            chunk = lines[start:start + lines_per_block]
            buf = io.BytesIO()
            with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write("".join(chunk).encode("utf-8"))
            blob = buf.getvalue()
            out.write(blob)
            key = " ".join(chunk[0].split(" ", 2)[:2])
            entries.append((key, offset, len(blob)))
            offset += len(blob)
    return entries


def export_zipnum(ds, out_dir: str, *, num_parts: int = 16,
                  lines_per_block: int = 3000, sample_mod: int = 1024,
                  max_samples: int = 2_000_000):
    """Distributed ZipNum export — Common Crawl's seekable index
    layout: range-partitioned ``cdx-NNNNN.gz`` parts (each a run of
    independent gzip members of ``lines_per_block`` sorted CDXJ
    lines) plus ONE ``cluster.idx`` summary with a line per block
    (``sortkey TAB part TAB offset TAB length TAB seq``), so a lookup
    binary-searches the summary and decompresses only the touched
    blocks (:func:`zipnum_lookup`).

    Unlike the hash-partitioned :func:`export_cdxj`, ZipNum REQUIRES
    global key order across parts.  Range boundaries come from a
    deterministic row-level hash sample (``crc32(urlkey) %
    sample_mod == 0`` — batching/partition independent, so re-runs
    route identically and resume is safe): samples are collected
    driver-side (guarded by ``max_samples``; at 10^12 captures pass
    ``sample_mod=2**20`` for a ~1M-key sample, the documented
    envelope) and decimated to ``num_parts-1`` cut keys.  One hash
    exchange routes the narrow index rows; each part group sorts
    locally (a part is ~1/num_parts of the index — size num_parts so
    a part fits a worker, CC itself uses ~300) and writes atomically
    (summary sidecar first, part rename is the commit point; existing
    parts are SKIPPED -> resume) with a P12 lineage sidecar.
    ``cluster.idx`` is rebuilt from the sidecars at the end — bounded
    at one line per ``lines_per_block`` captures.  Returns the
    per-part summary ``(part_id, rows)``.

    Resume assumes the SAME input and parameters: a re-run into an
    out_dir written with different ``num_parts`` / ``sample_mod`` /
    data would mix layouts — start fresh instead (the convention all
    the exporters share).

    The sample and the route are TWO passes over ``ds`` (inherent to
    range partitioning: boundaries must exist before routing) —
    callers whose upstream is expensive (a fresh :func:`build_cdx`
    container walk) should checkpoint the narrow index rows to
    parquet first and export from the re-read, the same staging the
    MinHash signature table uses."""
    import bisect
    import os
    import zlib

    import numpy as np
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, "idx"), exist_ok=True)

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.and_(pc.is_valid(batch["urlkey"]),
                                    pc.is_valid(batch["ts"])))

    narrow = ds.map_batches(keep, batch_format="pyarrow")

    def sample(batch: pa.Table) -> pa.Table:
        ks = [k for k in batch["urlkey"].to_pylist()
              if zlib.crc32(k.encode("utf-8")) % sample_mod == 0]
        return pa.table({"urlkey": pa.array(ks, pa.string())})

    samples = narrow.map_batches(sample, batch_format="pyarrow")
    try:
        sdf = samples.to_pandas(limit=max_samples)
        keys = (sorted(sdf["urlkey"].tolist())
                if "urlkey" in sdf.columns else [])
    except ValueError as exc:
        raise ValueError(
            f"export_zipnum key sample exceeds max_samples="
            f"{max_samples}; raise sample_mod (deterministic row-hash"
            f" rate) so ~100*num_parts keys survive") from exc
    bounds = []
    for i in range(1, num_parts):
        if not keys:
            break
        cut = keys[min(len(keys) - 1, round(i * len(keys) / num_parts))]
        if not bounds or cut > bounds[-1]:
            bounds.append(cut)

    def route(batch: pa.Table) -> pa.Table:
        pid = np.fromiter(
            (bisect.bisect_right(bounds, k)
             for k in batch["urlkey"].to_pylist()),
            dtype=np.int64, count=batch.num_rows)
        return batch.append_column("part_id", pa.array(pid, pa.int64()))

    def write_group(group: pd.DataFrame) -> pd.DataFrame:
        pid = int(group["part_id"].iloc[0])
        path = os.path.join(out_dir, f"cdx-{pid:05d}.gz")
        if not os.path.exists(path):
            tmp = path + f".tmp{os.getpid()}"
            entries = write_zipnum_part(
                ({k: (v.to_pydatetime() if k == "ts" else
                      None if pd.isna(v) else
                      int(v) if k in ("status", "length", "offset")
                      else v)
                  for k, v in row.items() if k != "part_id"}
                 for row in group.to_dict("records")), tmp,
                lines_per_block=lines_per_block)
            # summary sidecar FIRST; the part rename is the commit
            # point (a crash between the two leaves no committed part)
            ipath = os.path.join(out_dir, "idx", f"cdx-{pid:05d}.idx")
            itmp = ipath + f".tmp{os.getpid()}"
            with open(itmp, "w", encoding="utf-8") as fh:
                for key, off, length in entries:
                    fh.write(f"{key}\t{off}\t{length}\n")
            os.rename(itmp, ipath)
            ldir = os.path.join(out_dir, "lineage")
            os.makedirs(ldir, exist_ok=True)
            ltmp = os.path.join(ldir, f"cdx-{pid:05d}.json.tmp")
            with open(ltmp, "w") as lf:
                json.dump({"part_id": pid, "rows": int(len(group)),
                           "blocks": len(entries),
                           "bytes_out": int(os.path.getsize(tmp)),
                           "engine_version": __version__}, lf)
            os.rename(ltmp, os.path.join(ldir, f"cdx-{pid:05d}.json"))
            os.rename(tmp, path)
        return pd.DataFrame({"part_id": [pid], "rows": [len(group)]})

    summary = (narrow.map_batches(route, batch_format="pyarrow")
               .groupby("part_id").map_groups(write_group).to_pandas())

    # assemble cluster.idx from the per-part sidecars in part (= key
    # range) order; streamed, never held whole
    tmp = os.path.join(out_dir, f"cluster.idx.tmp{os.getpid()}")
    seq = 0
    with open(tmp, "w", encoding="utf-8") as out:
        for name in sorted(os.listdir(out_dir)):
            if not (name.startswith("cdx-") and name.endswith(".gz")):
                continue
            ipath = os.path.join(out_dir, "idx",
                                 name[:-3] + ".idx")
            with open(ipath, encoding="utf-8") as fh:
                for line in fh:
                    key, off, length = line.rstrip("\n").split("\t")
                    seq += 1
                    out.write(f"{key}\t{name}\t{off}\t{length}\t{seq}\n")
    os.rename(tmp, os.path.join(out_dir, "cluster.idx"))
    return summary


def load_cluster_idx(out_dir: str):
    """``cluster.idx`` -> list of ``(sortkey, part, offset, length)``
    in file (= global key) order."""
    import os

    entries = []
    with open(os.path.join(out_dir, "cluster.idx"),
              encoding="utf-8") as fh:
        for line in fh:
            key, part, off, length, _seq = line.rstrip("\n").split("\t")
            entries.append((key, part, int(off), int(length)))
    return entries


def zipnum_lookup(out_dir: str, prefixes, *, exact: bool = False):
    """Seek-based ZipNum lookup: binary-search ``cluster.idx`` for
    each prefix, decompress ONLY the touched blocks, return the
    matching captures as the typed CDX table (the same schema as
    :func:`read_cdxj`).

    A prefix matches every line that starts with it — pass a full
    urlkey with ``exact=True`` (appends the field separator) for
    exact-key lookups, or a SURT host/path prefix for domain queries.
    Results concatenate in prefix order; overlapping prefixes return
    their shared lines once per prefix (callers wanting set semantics
    pass disjoint prefixes).  Lines within a block and summary keys
    are bytewise-ordered (the documented sort tuple — contiguity of a
    prefix's matches needs no character below 0x20 in a urlkey, which
    :func:`surt` never emits for in-policy URLs)."""
    entries = load_cluster_idx(out_dir)
    keys = [e[0] for e in entries]
    block_cache: dict[tuple[str, int], list[str]] = {}
    rows = []
    for p in (prefixes if isinstance(prefixes, (list, tuple))
              else [prefixes]):
        rows.extend(_scan_prefix(entries, keys, out_dir, block_cache,
                                 p, exact))
    return _cdx_table(rows)


def _read_block(out_dir: str, part: str, off: int, length: int):
    import gzip as _gzip
    import os

    with open(os.path.join(out_dir, part), "rb") as fh:
        fh.seek(off)
        blob = fh.read(length)
    return _gzip.decompress(blob).decode("utf-8").splitlines()


def _scan_prefix(entries, keys, out_dir, block_cache, p, exact):
    """Shared lookup core: binary-search the summary keys, decompress
    touched blocks through ``block_cache``, yield parsed rows."""
    import bisect

    if exact:
        p = p + " "
    upper = _prefix_upper(p)
    lo = max(0, bisect.bisect_right(keys, p) - 1)
    hi = (bisect.bisect_left(keys, upper) if upper is not None
          else len(keys))
    rows = []
    for key, part, off, length in entries[lo:max(lo + 1, hi)]:
        ck = (part, off)
        lines = block_cache.get(ck)
        if lines is None:
            lines = _read_block(out_dir, part, off, length)
            block_cache[ck] = lines
        a = bisect.bisect_left(lines, p)
        b = (bisect.bisect_left(lines, upper)
             if upper is not None else len(lines))
        for line in lines[a:b]:
            if not line.startswith(p):  # belt over the bisect
                continue
            row = parse_cdxj_line(line)
            if row is not None:
                rows.append(row)
    return rows


class _BlockLRU:
    """Bounded block cache with the dict surface ``_scan_prefix``
    uses (``get`` / ``__setitem__``)."""

    def __init__(self, cap: int):
        from collections import OrderedDict

        self._d: dict = OrderedDict()
        self._cap = cap

    def get(self, ck, default=None):
        lines = self._d.get(ck, default)
        if lines is not None:
            self._d.move_to_end(ck)
        return lines

    def __setitem__(self, ck, lines):
        self._d[ck] = lines
        if len(self._d) > self._cap:
            self._d.popitem(last=False)


class _ZipFetch:
    """Actor-pool ZipNum fetch stage: the cluster.idx summary is
    fetched ONCE per actor from the object store (plasma-local after
    the first ``ray.get``), blocks decompress behind a bounded
    per-actor LRU — a probe batch touching the same hot blocks pays
    one decompress, not one per probe."""

    def __init__(self, idx_ref, out_dir: str, key_col: str,
                 exact: bool, cache_blocks: int):
        import ray

        self._entries = ray.get(idx_ref)
        self._keys = [e[0] for e in self._entries]
        self._dir = out_dir
        self._key_col = key_col
        self._exact = exact
        self._cache = _BlockLRU(cache_blocks)

    def __call__(self, batch: pa.Table) -> pa.Table:
        probes = batch[self._key_col].to_pylist()
        out_probe = []
        out_rows = []
        for p in probes:
            if p is None:
                continue
            rows = _scan_prefix(self._entries, self._keys, self._dir,
                                self._cache, p, self._exact)
            out_probe.extend([p] * len(rows))
            out_rows.extend(rows)
        t = _cdx_table(out_rows)
        return t.add_column(0, pa.field("probe", pa.string()),
                            pa.array(out_probe, pa.string()))


def zipnum_fetch(probes, out_dir: str, *, key_col: str = "urlkey",
                 exact: bool = True, locality: bool = False,
                 concurrency=(1, 8), cache_blocks: int = 256):
    """Distributed bulk ZipNum lookup — the scale path next to the
    driver utility :func:`zipnum_lookup`: a Dataset of probe keys
    streams through an actor pool; each actor holds the cluster.idx
    summary (``ray.put`` once — at full CC scale the summary is
    ~100s of MB, exactly what the object store broadcast is for) and
    a ``cache_blocks``-bounded LRU of decompressed blocks.  Output is
    one row per (probe, matching capture) with the probe in column
    ``probe`` — a probe with no captures emits nothing (callers
    wanting anti semantics left-anti-join the probe table back).

    ``locality=True`` range-sorts the probes first (ONE narrow
    exchange) so neighbouring probes land in the same actor batches
    and block-cache hits dominate — worth it when probes >> blocks.
    The ZipNum directory must be reachable from every worker (shared
    filesystem / object store mount — the CC layout's own
    assumption)."""
    import ray

    ref = ray.put(load_cluster_idx(out_dir))
    if locality:
        probes = probes.sort(key_col)
    return probes.map_batches(
        _ZipFetch, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_args=(ref, out_dir, key_col, exact,
                             cache_blocks),
        num_cpus=1)
