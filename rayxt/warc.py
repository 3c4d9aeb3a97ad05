"""WARC (ISO 28500) source — the container Common-Crawl actually ships.

``read_warc(paths)`` returns a ``ray.data.Dataset`` with the engine's
canonical pages schema ``(url, warc_ts, html, lang)``: one row per
``WARC-Type: response`` record, ``html`` = the HTTP response body
bytes, ``warc_ts`` = the record's ``WARC-Date``, ``lang`` null (a
WARC carries no language tag; run the language-ID stage downstream).

From-scratch per the public spec, stdlib only:

* record = CRLF-delimited header block (``WARC/1.0`` version line +
  ``Name: value`` fields, empty line terminator), exactly
  ``Content-Length`` payload bytes, then CRLF CRLF;
* response payloads are HTTP messages — the body starts after the
  first CRLF CRLF.  By default headers are not interpreted (CC WARCs
  store raw capture bytes); ``dechunk=True`` re-assembles bodies whose
  HTTP headers declare ``Transfer-Encoding: chunked`` (newer
  CC-derived corpora ship those un-decoded);
* ``.warc.gz`` files are concatenated per-record gzip members —
  Python's gzip reader walks multi-member streams natively, so one
  wrapper serves both the plain and gzip layouts;
* ``.warc.zst`` files are concatenated zstd frames (RFC 8878) —
  decoded via pyarrow's bundled zstd codec (no extra dependency; the
  same codec every Arrow build ships for parquet).  Frames using a
  custom dictionary (some CC releases embed one in a skippable
  frame) are NOT supported and fail loudly.

Scale shape: a ``FileBasedDatasource`` subclass — Ray schedules one
read task per file (CC segments are ~1 GiB, thousands per crawl, so
file-level parallelism is the natural partitioning), and the record
walk STREAMS: it never holds more than ``batch_rows`` records, so a
task's memory is bounded regardless of file size.  Everything
downstream (extraction, dedup, the partitioned sink) takes this
Dataset exactly like the parquet source's.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

import pyarrow as pa

# module-level so the by-value pickle captures the value: a runtime
# relative import inside a worker-side UDF (export_wet's write_group)
# dies when the driver runs from outside the repo (see the ExtractDocs
# NOTE)
from . import __version__

__all__ = ["read_warc", "parse_warc_records", "write_warc",
           "WARC_SCHEMA", "write_wet", "read_wet", "export_wet",
           "WET_SCHEMA", "REVISIT_SCHEMA", "parse_warc_records_ext",
           "read_warc_revisits", "resolve_revisits", "export_warc",
           "read_records_at"]

WARC_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("lang", pa.string()),
])

_CRLF = b"\r\n"


def _read_exact(f, n: int) -> bytes:
    chunks = []
    while n > 0:
        b = f.read(n)
        if not b:
            break
        chunks.append(b)
        n -= len(b)
    return b"".join(chunks)


def _read_header_block(f):
    """-> (version line, {lower name: value}) or None at EOF.  Headers
    are CRLF lines up to an empty line; leading blank lines (the
    record separator) are skipped."""
    version = None
    headers: dict = {}
    while True:
        line = f.readline()
        if not line:
            return None
        s = line.rstrip(b"\r\n")
        if version is None:
            if not s:
                continue  # inter-record CRLFs
            version = s
            if not s.startswith(b"WARC/"):
                raise ValueError(f"not a WARC record header: {s[:30]!r}")
            continue
        if not s:
            return version, headers
        if b":" in s:
            name, _, val = s.partition(b":")
            headers[name.strip().lower()] = val.strip()


def _parse_warc_date(raw: bytes):
    """WARC-Date (ISO 8601, UTC 'Z') -> naive-UTC datetime (us)."""
    try:
        txt = raw.decode("ascii").replace("Z", "+00:00")
        dt = datetime.fromisoformat(txt)
        if dt.tzinfo is not None:
            dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
        return dt
    except ValueError:
        return None


def _dechunk(body: bytes) -> bytes:
    """Re-assemble an RFC 9112 chunked body: ``size-hex[;ext] CRLF
    data CRLF`` repeated, ``0`` chunk terminates (trailers dropped).
    Malformed framing returns the body unchanged — a capture may
    declare chunked but store already-decoded bytes."""
    out, pos = [], 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            return body
        size_tok = body[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return body
        if size == 0:
            return b"".join(out)
        start = nl + 2
        end = start + size
        if end > len(body):
            return body
        out.append(body[start:end])
        pos = end + 2  # skip the chunk-data CRLF


def parse_warc_records(f, *, dechunk: bool = False,
                       decode_content: bool = False,
                       record_types: tuple = (b"response",),
                       with_http: bool = False):
    """Stream (url, warc_ts, body bytes) tuples for every record of
    one (decompressed) WARC stream whose WARC-Type is in
    ``record_types``.  ``response`` payloads are HTTP messages (body
    after the first CRLF CRLF); any other type's payload IS the body
    (``conversion`` — the WET layout).

    ``decode_content=True`` undoes ``Content-Encoding`` on response
    bodies (captures store the wire bytes; a gzip-encoded body parses
    as garbage downstream): frozen policy — the header's value,
    stripped and lowercased, selects ``gzip``/``x-gzip`` (RFC 1952)
    or ``deflate`` (zlib-wrapped, raw fallback — the historical
    server ambiguity); any other value (``br``, ``zstd``, stacked
    codings) and any decode failure keep the body UNCHANGED, the
    same tolerance as ``dechunk`` (captures sometimes declare a
    coding but store decoded bytes).  Transfer-Encoding undoes first
    (wire order), then Content-Encoding.

    ``with_http=True`` yields 5-tuples ``(url, ts, body, status,
    content_type)`` instead: frozen policy — ``status`` is the second
    whitespace token of the HTTP status line, only if the first token
    starts with ``HTTP/`` and the second is all digits, else null;
    ``content_type`` is the first ``Content-Type`` header value,
    ASCII-stripped and lowercased, null if absent.  Records without an
    HTTP head (no CRLF CRLF, or non-response types) carry nulls."""
    while True:
        head = _read_header_block(f)
        if head is None:
            return
        _version, headers = head
        length = int(headers.get(b"content-length", b"0"))
        payload = _read_exact(f, length)
        rtype = headers.get(b"warc-type", b"").lower()
        if rtype not in record_types:
            continue
        url = headers.get(b"warc-target-uri", b"").decode(
            "utf-8", "replace")
        ts = _parse_warc_date(headers.get(b"warc-date", b""))
        status = ctype = None
        if rtype == b"response":
            # HTTP message: body starts after the first CRLF CRLF
            sep = payload.find(b"\r\n\r\n")
            body = payload[sep + 4:] if sep >= 0 else payload
            if with_http and sep >= 0:
                status, ctype = _parse_http_head(payload[:sep])
            if (dechunk and sep >= 0
                    and b"chunked" in payload[:sep].lower()
                    and _http_declares_chunked(payload[:sep])):
                body = _dechunk(body)
            if decode_content and sep >= 0:
                body = _decode_content(payload[:sep], body)
        else:
            body = payload
        if with_http:
            yield url, ts, body, status, ctype
        else:
            yield url, ts, body


def _http_content_encoding(head: bytes):
    for line in head.split(b"\r\n")[1:]:
        name, _, val = line.partition(b":")
        if name.strip().lower() == b"content-encoding":
            return val.strip().lower()
    return None


def _decode_content(head: bytes, body: bytes) -> bytes:
    """Undo the declared Content-Encoding, tolerantly (see
    :func:`parse_warc_records`)."""
    import zlib as _zlib

    coding = _http_content_encoding(head)
    if coding in (b"gzip", b"x-gzip"):
        try:
            return gzip.decompress(body)
        except (OSError, EOFError, _zlib.error):
            return body
    if coding == b"deflate":
        try:
            return _zlib.decompress(body)
        except _zlib.error:
            try:
                return _zlib.decompress(body, -15)  # raw deflate
            except _zlib.error:
                return body
    return body


def _parse_http_head(head: bytes):
    """(status int | None, content-type str | None) of one HTTP head."""
    lines = head.split(b"\r\n")
    status = None
    toks = lines[0].split()
    if len(toks) >= 2 and toks[0].startswith(b"HTTP/") \
            and toks[1].isdigit():
        status = int(toks[1])
    ctype = None
    for line in lines[1:]:
        name, _, val = line.partition(b":")
        if name.strip().lower() == b"content-type":
            ctype = val.strip().lower().decode("utf-8", "replace")
            break
    return status, ctype


def _http_declares_chunked(head: bytes) -> bool:
    for line in head.split(b"\r\n")[1:]:  # skip the status line
        name, _, val = line.partition(b":")
        if (name.strip().lower() == b"transfer-encoding"
                and b"chunked" in val.lower()):
            return True
    return False


REVISIT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("lang", pa.string()),
    ("record_type", pa.string()),
    ("payload_digest", pa.string()),
    ("revisit_of_url", pa.string()),
    ("revisit_of_ts", pa.timestamp("us")),
])


def parse_warc_records_ext(f, *, dechunk: bool = False):
    """Dict rows for ``response`` AND ``revisit`` records of one
    decompressed WARC stream — the capture-dedup-aware walk.  Revisit
    rows carry ``html=None`` plus the referred-to capture coordinates;
    both kinds carry ``payload_digest`` verbatim when the record
    declares one."""
    while True:
        head = _read_header_block(f)
        if head is None:
            return
        _version, headers = head
        length = int(headers.get(b"content-length", b"0"))
        payload = _read_exact(f, length)
        rtype = headers.get(b"warc-type", b"").lower()
        if rtype not in (b"response", b"revisit"):
            continue
        url = headers.get(b"warc-target-uri", b"").decode(
            "utf-8", "replace")
        ts = _parse_warc_date(headers.get(b"warc-date", b""))
        digest = headers.get(b"warc-payload-digest")
        digest = (digest.decode("ascii", "replace") if digest
                  else None)
        if rtype == b"response":
            sep = payload.find(b"\r\n\r\n")
            body = payload[sep + 4:] if sep >= 0 else payload
            if (dechunk and sep >= 0
                    and b"chunked" in payload[:sep].lower()
                    and _http_declares_chunked(payload[:sep])):
                body = _dechunk(body)
            yield {"url": url, "warc_ts": ts, "html": body,
                   "lang": None, "record_type": "response",
                   "payload_digest": digest,
                   "revisit_of_url": None, "revisit_of_ts": None}
        else:
            rof = headers.get(b"warc-refers-to-target-uri")
            yield {"url": url, "warc_ts": ts, "html": None,
                   "lang": None, "record_type": "revisit",
                   "payload_digest": digest,
                   "revisit_of_url": (rof.decode("utf-8", "replace")
                                      if rof else None),
                   "revisit_of_ts": _parse_warc_date(
                       headers.get(b"warc-refers-to-date", b""))}


def read_warc(paths, *, batch_rows: int = 256, dechunk: bool = False,
              decode_content: bool = False,
              with_http: bool = False, **kwargs):
    """WARC/WARC-gz/WARC-zst files -> Dataset(url, warc_ts, html,
    lang).  ``dechunk=True`` re-assembles chunked HTTP bodies;
    ``decode_content=True`` undoes gzip/deflate Content-Encoding
    (tolerant frozen policy in :func:`parse_warc_records`);
    ``with_http=True`` appends ``http_status`` int32 and
    ``content_type`` string columns parsed from the capture's HTTP
    head (the pre-filter columns a CC pipeline uses when it has no
    index)."""
    import ray.data as rd
    from ray.data.datasource import FileBasedDatasource

    class WarcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["warc", "gz", "zst"]

        def _read_stream(self, f, path: str):
            # NOTE: Ray's FileBasedDatasource auto-decompresses ``.gz``
            # (Arrow CompressedInputStream) — ``f`` is already the
            # plain WARC byte stream for that layout.  ``.zst`` is not
            # auto-detected on every Ray version, so sniff the stream:
            # a zstd frame opens 28 B5 2F FD, a plain record "WARC/".
            stream = io.BufferedReader(_NativeWrapper(f))
            magic = stream.peek(4)[:4]
            if magic == b"\x28\xb5\x2f\xfd":
                stream = io.BufferedReader(_NativeWrapper(
                    pa.CompressedInputStream(stream, "zstd")))
            elif magic[:2] == b"\x1f\x8b":
                stream = io.BufferedReader(
                    gzip.GzipFile(fileobj=stream))
            rows = []
            for rec in parse_warc_records(
                    stream, dechunk=dechunk,
                    decode_content=decode_content,
                    with_http=with_http):
                rows.append(rec)
                if len(rows) >= batch_rows:
                    yield _warc_table(rows, with_http)
                    rows = []
            if rows:
                yield _warc_table(rows, with_http)

    return rd.read_datasource(WarcDatasource(paths, **kwargs))


def read_records_at(coords, base_dir: str | None = None, *,
                    filename_col: str = "filename",
                    offset_col: str = "offset",
                    length_col: str = "length",
                    locality: bool = True, dechunk: bool = False,
                    decode_content: bool = False):
    """Seek-based SELECTIVE record fetch — the consumer the CDX /
    ZipNum coordinates exist for: a Dataset of index rows
    ``(filename, offset, length)`` fetches ONLY the referenced
    records from their containers (KB of seeks instead of GB of
    container scan) and yields the standard ``(url, warc_ts, html,
    lang)`` capture rows, ready for the extract pool.

    Each coordinate span decompresses by its own magic (per-record
    gzip member / zstd frame / plain record span — exactly what
    :func:`rayxt.cdx.build_cdx` emits); every ``response`` record in
    the span is emitted in span order (one, in the standard CC
    layouts; all of them in the degenerate whole-file-member case).
    Rows with a null coordinate are skipped.  ``locality=True``
    sorts by (filename, offset) first — ONE narrow exchange so a
    task's fetches run down each container forward with one open
    handle, instead of seeking randomly across all of them.
    Containers must be reachable from every worker (the shared-store
    assumption all the container exporters document)."""
    import os as _os

    import pyarrow.compute as _pc

    def drop_null(t: pa.Table) -> pa.Table:
        mask = _pc.and_(_pc.and_(_pc.is_valid(t[filename_col]),
                                 _pc.is_valid(t[offset_col])),
                        _pc.is_valid(t[length_col]))
        return t.filter(mask)

    # null coordinates are unfetchable — drop BEFORE the sort (Ray's
    # sort cannot order null filenames, and the fetch skips them)
    coords = coords.map_batches(drop_null, batch_format="pyarrow")
    if locality:
        coords = coords.sort([filename_col, offset_col])

    def fetch(t: pa.Table) -> pa.Table:
        rows = []
        handles: dict = {}
        try:
            names = t[filename_col].to_pylist()
            offs = t[offset_col].to_pylist()
            lens = t[length_col].to_pylist()
            for name, off, length in zip(names, offs, lens):
                path = (_os.path.join(base_dir, name)
                        if base_dir else name)
                fh = handles.get(path)
                if fh is None:
                    fh = handles[path] = open(path, "rb")
                fh.seek(off)
                blob = fh.read(length)
                if blob[:2] == b"\x1f\x8b":
                    blob = gzip.decompress(blob)
                elif blob[:4] == b"\x28\xb5\x2f\xfd":
                    blob = bytes(pa.CompressedInputStream(
                        pa.BufferReader(blob), "zstd").read())
                for rec in parse_warc_records(
                        io.BufferedReader(io.BytesIO(blob)),
                        dechunk=dechunk,
                        decode_content=decode_content):
                    rows.append(rec)
        finally:
            for fh in handles.values():
                fh.close()
        return _warc_table(rows)

    return coords.map_batches(fetch, batch_format="pyarrow")


class _NativeWrapper(io.RawIOBase):
    """pyarrow NativeFile -> raw io stream (readinto via read)."""

    def __init__(self, f):
        self._f = f

    def readable(self):
        return True

    def readinto(self, b):
        data = self._f.read(len(b))
        n = len(data)
        b[:n] = data
        return n


def _warc_table(rows, with_http: bool = False) -> pa.Table:
    cols = {
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "html": pa.array([r[2] for r in rows], pa.binary()),
        "lang": pa.array([None] * len(rows), pa.string()),
    }
    if with_http:
        cols["http_status"] = pa.array([r[3] for r in rows], pa.int32())
        cols["content_type"] = pa.array([r[4] for r in rows], pa.string())
    return pa.table(cols)


def _warc_date(ts) -> tuple[str, bytes]:
    """(WARC-Date string, version line) for one timestamp.  Tz-aware
    datetimes are normalized to UTC first (naive values are taken as
    already-UTC, matching ``_parse_warc_date``).  Sub-second
    timestamps emit microsecond precision, which WARC/1.1 allows but
    WARC/1.0 forbids — the version line follows the precision, so
    second-aligned rows keep the exact bytes earlier rounds wrote."""
    if not hasattr(ts, "isoformat"):
        return str(ts), b"WARC/1.0"
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
    if ts.microsecond:
        return ts.isoformat(timespec="microseconds") + "Z", b"WARC/1.1"
    return ts.isoformat(timespec="seconds") + "Z", b"WARC/1.0"


def write_warc(rows, path: str, *, gzip_members: bool | None = None,
               zstd_frames: bool | None = None,
               dedup_payloads: bool = False,
               warcinfo: bytes = b"software: rayxt\r\n") -> str:
    """Spec-true WARC writer (fixtures / re-export): one warcinfo
    record + one response record per (url, warc_ts, html) row.
    ``.gz`` paths write one gzip member PER RECORD and ``.zst`` paths
    one zstd frame per record (both the CC layouts — member/frame
    boundaries make records independently seekable); override with
    ``gzip_members`` / ``zstd_frames``.

    ``dedup_payloads=True`` is the CC capture-dedup layout: every
    response carries ``WARC-Payload-Digest`` (sha1 base32 of the body),
    and a row whose body digest was already written in THIS file
    becomes a ``revisit`` record (profile identical-payload-digest,
    ``WARC-Refers-To-Target-URI``/``-Date`` naming the first capture)
    whose payload is the HTTP head ONLY — the body is not repeated.
    The digest table is per-file (one writer task per container), so
    its memory is bounded by the file's distinct payloads."""
    import base64
    import hashlib

    if gzip_members is None:
        gzip_members = path.endswith(".gz")
    if zstd_frames is None:
        zstd_frames = path.endswith(".zst")
    zstd_codec = pa.Codec("zstd") if zstd_frames else None

    def record(rtype: bytes, headers: list, payload: bytes,
               version: bytes = b"WARC/1.0") -> bytes:
        head = [version,
                b"WARC-Type: " + rtype,
                *headers,
                b"Content-Length: " + str(len(payload)).encode()]
        return (_CRLF.join(head) + _CRLF + _CRLF + payload
                + _CRLF + _CRLF)

    def emit(out, blob: bytes):
        if zstd_codec is not None:
            out.write(zstd_codec.compress(blob, asbytes=True))
        elif gzip_members:
            # mtime=0 for deterministic bytes
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(blob)
            out.write(buf.getvalue())
        else:
            out.write(blob)

    seen: dict = {}  # digest -> (url, date) of the first capture
    with open(path, "wb") as out:
        emit(out, record(b"warcinfo",
                         [b"Content-Type: application/warc-fields"],
                         warcinfo))
        for r in rows:
            date, version = _warc_date(r["warc_ts"])
            status = int(r.get("status", 200))
            ctype = str(r.get("content_type") or "text/html")
            body = r["html"]
            enc_header = b""
            coding = r.get("content_encoding")
            if coding and isinstance(coding, str):
                # stage a capture of a compressed response: gzip /
                # deflate bodies are ENCODED on the wire (html is the
                # logical content); other codings keep the raw bytes
                # under the declared header (the undecodable case)
                coding = str(coding).lower()
                if coding in ("gzip", "x-gzip"):
                    buf = io.BytesIO()
                    with gzip.GzipFile(fileobj=buf, mode="wb",
                                       mtime=0) as gz:
                        gz.write(body)
                    body = buf.getvalue()
                elif coding == "deflate":
                    import zlib as _zlib

                    body = _zlib.compress(body)
                enc_header = (b"Content-Encoding: " + coding.encode()
                              + b"\r\n")
            http_head = (
                b"HTTP/1.1 " + str(status).encode() + b" OK\r\n"
                b"Content-Type: " + ctype.encode() + b"\r\n"
                + enc_header +
                b"Content-Length: " + str(len(body)).encode()
                + b"\r\n\r\n")
            if not dedup_payloads:
                emit(out, record(
                    b"response",
                    [b"WARC-Target-URI: " + r["url"].encode(),
                     b"WARC-Date: " + date.encode(),
                     b"Content-Type: application/http;msgtype=response"],
                    http_head + body, version))
                continue
            digest = b"sha1:" + base64.b32encode(
                hashlib.sha1(body).digest())
            first = seen.get(digest)
            if first is None:
                seen[digest] = (r["url"], date)
                emit(out, record(
                    b"response",
                    [b"WARC-Target-URI: " + r["url"].encode(),
                     b"WARC-Date: " + date.encode(),
                     b"WARC-Payload-Digest: " + digest,
                     b"Content-Type: application/http;msgtype=response"],
                    http_head + body, version))
            else:
                emit(out, record(
                    b"revisit",
                    [b"WARC-Target-URI: " + r["url"].encode(),
                     b"WARC-Date: " + date.encode(),
                     b"WARC-Payload-Digest: " + digest,
                     b"WARC-Refers-To-Target-URI: " + first[0].encode(),
                     b"WARC-Refers-To-Date: " + first[1].encode(),
                     b"WARC-Profile: http://netpreserve.org/warc/1.0/"
                     b"revisit/identical-payload-digest",
                     b"Content-Type: application/http;msgtype=response"],
                    http_head, version))
    return path


# ---------------------------------------------------------------------------
# WET (extracted-text conversion records) — CC's derived text format
# ---------------------------------------------------------------------------

WET_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("text", pa.string()),
])


def write_wet(rows, path: str, *, gzip_members: bool | None = None,
              warcinfo: bytes = b"software: rayxt\r\n") -> str:
    """WET writer: one warcinfo record + one ``conversion`` record per
    (url, warc_ts, text) row — the payload is the raw UTF-8 text, no
    HTTP wrapper (the Common-Crawl WET layout).  ``.gz`` paths write
    one gzip member per record for seekability."""
    if gzip_members is None:
        gzip_members = path.endswith(".gz")

    def record(rtype: bytes, headers: list, payload: bytes,
               version: bytes = b"WARC/1.0") -> bytes:
        head = [version,
                b"WARC-Type: " + rtype,
                *headers,
                b"Content-Length: " + str(len(payload)).encode()]
        return (_CRLF.join(head) + _CRLF + _CRLF + payload
                + _CRLF + _CRLF)

    def emit(out, blob: bytes):
        if gzip_members:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(blob)
            out.write(buf.getvalue())
        else:
            out.write(blob)

    with open(path, "wb") as out:
        emit(out, record(b"warcinfo",
                         [b"Content-Type: application/warc-fields"],
                         warcinfo))
        for r in rows:
            date, version = _warc_date(r["warc_ts"])
            payload = (r["text"] or "").encode("utf-8")
            emit(out, record(
                b"conversion",
                [b"WARC-Target-URI: " + r["url"].encode(),
                 b"WARC-Date: " + date.encode(),
                 b"Content-Type: text/plain"],
                payload, version))
    return path


def read_wet(paths, *, batch_rows: int = 256, **kwargs):
    """WET/WET-gz files -> Dataset(url, warc_ts, text): one row per
    ``conversion`` record, payload decoded as UTF-8."""
    import ray.data as rd
    from ray.data.datasource import FileBasedDatasource

    class WetDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["wet", "warc", "gz"]

        def _read_stream(self, f, path: str):
            stream = io.BufferedReader(_NativeWrapper(f))
            if stream.peek(2)[:2] == b"\x1f\x8b":
                stream = io.BufferedReader(gzip.GzipFile(fileobj=stream))
            urls, tss, texts = [], [], []
            for url, ts, body in parse_warc_records(
                    stream, record_types=(b"conversion",)):
                urls.append(url)
                tss.append(ts)
                texts.append(body.decode("utf-8", "replace"))
                if len(urls) >= batch_rows:
                    yield _wet_table(urls, tss, texts)
                    urls, tss, texts = [], [], []
            if urls:
                yield _wet_table(urls, tss, texts)

    return rd.read_datasource(WetDatasource(paths, **kwargs))


def _wet_table(urls, tss, texts) -> pa.Table:
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "text": pa.array(texts, pa.string()),
    }, schema=WET_SCHEMA)


def export_wet(ds, out_dir: str, num_partitions: int = 64, *,
               text_col: str = "text"):
    """Distributed WET export: url-hash-partitioned ``conversion``
    records, one ``part-NNNN.warc.wet.gz`` per partition written
    atomically (tmp+rename; an existing file is SKIPPED, so a re-run
    resumes).  The only exchange carries the already-extracted text
    rows.  Returns the per-partition summary ``(part_id, rows)``."""
    import os

    import pandas as pd

    from .pipeline import add_part_id

    os.makedirs(out_dir, exist_ok=True)
    if "part_id" not in ds.columns():
        ds = add_part_id(ds, num_partitions)

    def write_group(group: pd.DataFrame) -> pd.DataFrame:
        import json

        pid = int(group["part_id"].iloc[0])
        path = os.path.join(out_dir, f"part-{pid:04d}.warc.wet.gz")
        if not os.path.exists(path):
            rows = group.sort_values("url")
            tmp = path + f".tmp{os.getpid()}"
            # the tmp suffix hides the .gz extension: say so explicitly
            write_wet(
                ({"url": u, "warc_ts": ts.to_pydatetime(), "text": tx}
                 for u, ts, tx in zip(rows["url"], rows["warc_ts"],
                                      rows[text_col])), tmp,
                gzip_members=True)
            os.rename(tmp, path)
            # P12 lineage sidecar, written AFTER the shard lands
            ldir = os.path.join(out_dir, "lineage")
            os.makedirs(ldir, exist_ok=True)
            ltmp = os.path.join(ldir, f"part-{pid:04d}.json.tmp")
            with open(ltmp, "w") as lf:
                json.dump({
                    "part_id": pid,
                    "rows": int(len(group)),
                    "bytes_out": int(os.path.getsize(path)),
                    "text_chars": int(
                        rows[text_col].str.len().fillna(0).sum()),
                    "engine_version": __version__,
                }, lf)
            os.rename(ltmp, os.path.join(ldir, f"part-{pid:04d}.json"))
        return pd.DataFrame({"part_id": [pid], "rows": [len(group)]})

    return ds.select_columns(["url", "warc_ts", text_col, "part_id"]) \
        .groupby("part_id").map_groups(write_group).to_pandas()


def read_warc_revisits(paths, *, batch_rows: int = 256,
                       dechunk: bool = False, **kwargs):
    """WARC containers -> Dataset with :data:`REVISIT_SCHEMA`: one row
    per ``response`` AND per ``revisit`` record — the capture-dedup-
    aware source (CC crawls ship revisit records; the plain
    ``read_warc`` skips them).  Feed the result to
    :func:`resolve_revisits` to reconstruct the full corpus."""
    import ray.data as rd
    from ray.data.datasource import FileBasedDatasource

    class WarcRevisitDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["warc", "gz", "zst"]

        def _read_stream(self, f, path: str):
            stream = io.BufferedReader(_NativeWrapper(f))
            magic = stream.peek(4)[:4]
            if magic == b"\x28\xb5\x2f\xfd":
                stream = io.BufferedReader(_NativeWrapper(
                    pa.CompressedInputStream(stream, "zstd")))
            elif magic[:2] == b"\x1f\x8b":
                stream = io.BufferedReader(
                    gzip.GzipFile(fileobj=stream))
            rows = []
            for rec in parse_warc_records_ext(stream, dechunk=dechunk):
                rows.append(rec)
                if len(rows) >= batch_rows:
                    yield _revisit_table(rows)
                    rows = []
            if rows:
                yield _revisit_table(rows)

    return rd.read_datasource(WarcRevisitDatasource(paths, **kwargs))


def _revisit_table(rows) -> pa.Table:
    return pa.table(
        {n: pa.array([r[n] for r in rows],
                     REVISIT_SCHEMA.field(n).type)
         for n in REVISIT_SCHEMA.names}, schema=REVISIT_SCHEMA)


def resolve_revisits(ds):
    """Reconstruct the full corpus from a capture-dedup'd read: every
    ``revisit`` row's ``html`` fills in from the ``response`` row
    sharing its ``payload_digest``.  Returns ``(url, warc_ts, html,
    lang, record_type)`` — revisits whose digest has no response in
    the dataset are DROPPED (an unresolvable revisit points outside
    the read's container set; callers diff row counts to detect it),
    and so are digest-less rows that claim to be revisits.

    Scale shape: ONE digest-keyed groupby — each group holds a
    payload's single first-capture response plus its revisit stubs
    (no bodies), so a payload's bytes cross the exchange exactly
    once.  A pathologically viral payload makes a hot group; its size
    is the dup count, not the corpus (the per-key-op envelope).
    Digest-less responses (non-dedup containers) bypass the exchange
    entirely."""
    import pandas as pd

    import pyarrow.compute as pc

    cols = ["url", "warc_ts", "html", "lang", "record_type"]

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": pc.cast(t["url"], pa.string()),
            "warc_ts": pc.cast(t["warc_ts"], pa.timestamp("us")),
            "html": pc.cast(t["html"], pa.binary()),
            "lang": pc.cast(t["lang"], pa.string()),
            "record_type": pc.cast(t["record_type"], pa.string()),
        })

    def _split(t: pa.Table, keyed_side: bool) -> pa.Table:
        has_digest = pc.is_valid(t["payload_digest"])
        if keyed_side:
            return t.filter(has_digest)
        mask = pc.and_(pc.invert(has_digest),
                       pc.equal(t["record_type"], "response"))
        return t.filter(mask)

    plain = ds.map_batches(
        lambda t: _split(t, False), batch_format="pyarrow"
    ).select_columns(cols).map_batches(shape, batch_format="pyarrow")

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        resp = g[g["record_type"] == "response"]
        if resp.empty:
            return g.head(0)[cols]  # unresolvable stubs: dropped
        resp = resp.sort_values(["url", "warc_ts"], kind="mergesort")
        html = resp["html"].iloc[0]
        out = g.copy()
        is_rev = out["record_type"] == "revisit"
        out.loc[is_rev, "html"] = pd.Series(
            [html] * int(is_rev.sum()), index=out.index[is_rev],
            dtype=object)
        return out[cols]

    keyed = ds.map_batches(
        lambda t: _split(t, True), batch_format="pyarrow") \
        .select_columns(cols + ["payload_digest"]) \
        .groupby("payload_digest").map_groups(fill) \
        .map_batches(
            lambda t: shape(t) if t.num_rows or "url" in t.column_names
            else shape(pa.table({c: pa.array([], pa.string())
                                 for c in cols})),
            batch_format="pyarrow")

    return plain.union(keyed)


def export_warc(ds, out_dir: str, num_partitions: int = 64, *,
                dedup_payloads: bool = False, key_col: str = "url"):
    """Distributed WARC re-shard: url-hash-partitioned ``response``
    containers, one ``part-NNNN.warc.gz`` per partition written
    atomically (tmp+rename; an existing shard is SKIPPED, so a re-run
    resumes), each with a P12 lineage sidecar — the write side of the
    container layer (re-packaging a filtered corpus as seekable CC
    layout).  ``dedup_payloads=True`` applies the per-file revisit
    dedup (:func:`write_warc`), so repeated bodies within a shard
    store once; route by a ``key_col`` that co-locates duplicates
    (e.g. a canonical url) to maximize its hit rate.  The only
    exchange carries the (url, ts, html) rows.  Returns the
    per-partition summary ``(part_id, rows)``."""
    import os

    import pandas as pd

    from .pipeline import add_part_id

    os.makedirs(out_dir, exist_ok=True)
    if "part_id" not in ds.columns():
        # route by a caller-chosen key (e.g. a canonical url) so
        # duplicate payloads co-locate and the per-shard dedup can fire
        ds = add_part_id(ds, num_partitions, key_col=key_col)

    def write_group(group: pd.DataFrame) -> pd.DataFrame:
        import json

        pid = int(group["part_id"].iloc[0])
        path = os.path.join(out_dir, f"part-{pid:04d}.warc.gz")
        if not os.path.exists(path):
            rows = group.sort_values(["url", "warc_ts"],
                                     kind="mergesort")
            tmp = path + f".tmp{os.getpid()}"
            # the tmp suffix hides the .gz extension: force members
            write_warc(
                ({"url": u, "warc_ts": ts.to_pydatetime(), "html": h}
                 for u, ts, h in zip(rows["url"], rows["warc_ts"],
                                     rows["html"])), tmp,
                gzip_members=True, dedup_payloads=dedup_payloads)
            os.rename(tmp, path)
            ldir = os.path.join(out_dir, "lineage")
            os.makedirs(ldir, exist_ok=True)
            ltmp = os.path.join(ldir, f"part-{pid:04d}.json.tmp")
            with open(ltmp, "w") as lf:
                json.dump({
                    "part_id": pid,
                    "rows": int(len(group)),
                    "bytes_out": int(os.path.getsize(path)),
                    "html_bytes": int(
                        rows["html"].map(len).sum()),
                    "engine_version": __version__,
                }, lf)
            os.rename(ltmp, os.path.join(ldir, f"part-{pid:04d}.json"))
        return pd.DataFrame({"part_id": [pid], "rows": [len(group)]})

    return ds.select_columns(["url", "warc_ts", "html", "part_id"]) \
        .groupby("part_id").map_groups(write_group).to_pandas()
