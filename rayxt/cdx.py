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
from .warc import _NativeWrapper

__all__ = ["surt", "surt_key", "parse_cdxj_line", "read_cdxj",
           "latest_capture", "cdx_diff"]

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
