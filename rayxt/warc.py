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
  first CRLF CRLF (headers are not interpreted; chunked re-assembly
  belongs to the capture tool, CC WARCs store the raw bytes);
* ``.warc.gz`` files are concatenated per-record gzip members —
  Python's gzip reader walks multi-member streams natively, so one
  wrapper serves both the plain and gzip layouts.

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

__all__ = ["read_warc", "parse_warc_records", "write_warc", "WARC_SCHEMA"]

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


def parse_warc_records(f):
    """Stream (url, warc_ts, body bytes) tuples for every response
    record of one (decompressed) WARC stream."""
    while True:
        head = _read_header_block(f)
        if head is None:
            return
        _version, headers = head
        length = int(headers.get(b"content-length", b"0"))
        payload = _read_exact(f, length)
        if headers.get(b"warc-type", b"").lower() != b"response":
            continue
        url = headers.get(b"warc-target-uri", b"").decode(
            "utf-8", "replace")
        ts = _parse_warc_date(headers.get(b"warc-date", b""))
        # HTTP message: body starts after the first CRLF CRLF
        sep = payload.find(b"\r\n\r\n")
        body = payload[sep + 4:] if sep >= 0 else payload
        yield url, ts, body


def read_warc(paths, *, batch_rows: int = 256, **kwargs):
    """WARC/WARC-gz files -> Dataset(url, warc_ts, html, lang)."""
    import ray.data as rd
    from ray.data.datasource import FileBasedDatasource

    class WarcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["warc", "gz"]

        def _read_stream(self, f, path: str):
            # NOTE: Ray's FileBasedDatasource auto-decompresses ``.gz``
            # (Arrow CompressedInputStream) — ``f`` is already the
            # plain WARC byte stream for both layouts
            stream = io.BufferedReader(_NativeWrapper(f))
            urls, tss, bodies = [], [], []
            for url, ts, body in parse_warc_records(stream):
                urls.append(url)
                tss.append(ts)
                bodies.append(body)
                if len(urls) >= batch_rows:
                    yield _warc_table(urls, tss, bodies)
                    urls, tss, bodies = [], [], []
            if urls:
                yield _warc_table(urls, tss, bodies)

    return rd.read_datasource(WarcDatasource(paths, **kwargs))


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


def _warc_table(urls, tss, bodies) -> pa.Table:
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(bodies, pa.binary()),
        "lang": pa.array([None] * len(urls), pa.string()),
    })


def write_warc(rows, path: str, *, gzip_members: bool | None = None,
               warcinfo: bytes = b"software: rayxt\r\n") -> str:
    """Spec-true WARC writer (fixtures / re-export): one warcinfo
    record + one response record per (url, warc_ts, html) row.
    ``.gz`` paths write one gzip member PER RECORD (the CC layout);
    override with ``gzip_members``."""
    if gzip_members is None:
        gzip_members = path.endswith(".gz")

    def record(rtype: bytes, headers: list, payload: bytes) -> bytes:
        head = [b"WARC/1.0",
                b"WARC-Type: " + rtype,
                *headers,
                b"Content-Length: " + str(len(payload)).encode()]
        return (_CRLF.join(head) + _CRLF + _CRLF + payload
                + _CRLF + _CRLF)

    def emit(out, blob: bytes):
        if gzip_members:
            # mtime=0 for deterministic bytes
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
            ts = r["warc_ts"]
            if hasattr(ts, "isoformat"):
                date = ts.isoformat(timespec="seconds") + "Z"
            else:
                date = str(ts)
            http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    b"Content-Length: " + str(len(r["html"])).encode()
                    + b"\r\n\r\n" + r["html"])
            emit(out, record(
                b"response",
                [b"WARC-Target-URI: " + r["url"].encode(),
                 b"WARC-Date: " + date.encode(),
                 b"Content-Type: application/http;msgtype=response"],
                http))
    return path
