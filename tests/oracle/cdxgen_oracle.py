"""Independent restatement of the CDX-generation policy
(``rayxt/cdx.py`` "FROZEN row policy" comment block) for golden
generation and parity tests.

Deliberately different mechanisms from the engine end to end:

* gzip members: an RFC 1952 FIELD-LEVEL walk (magic/CM/FLG, FEXTRA /
  FNAME / FCOMMENT / FHCRC skipping), raw-deflate inflation with
  ``zlib.decompressobj(-15)``, and the 8-byte trailer VERIFIED
  (CRC-32 and ISIZE must match the inflated bytes) — the engine hands
  whole members to ``wbits=31`` and never looks inside the header.
* zstd frames: its own header arithmetic (table-free bit tests) and
  block walk; each frame slice is decompressed through pyarrow and
  re-measured against the frame's content-size field when present.
* WARC records: regex split of the header block (the engine walks
  lines); HTTP head fields via regex.
* base32: manual 5-bit repacking via integer arithmetic (the engine
  uses ``base64.b32encode``).
* urlkey: ``tests/oracle/url_oracle.oracle_surt`` (urllib-based, never
  the engine's regex transform).

The oracle loads each container fully into memory — fixtures are
small; only the engine needs the streaming shape.
"""

from __future__ import annotations

import hashlib
import re
import zlib
from datetime import datetime, timezone

from tests.oracle.url_oracle import oracle_surt

_B32_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"


def _b32(data: bytes) -> str:
    """RFC 4648 base32 via integer arithmetic (sha1 = 20 bytes = 160
    bits = exactly 32 symbols, no padding)."""
    n = int.from_bytes(data, "big")
    width = (len(data) * 8 + 4) // 5
    out = []
    for i in range(width):
        shift = (width - 1 - i) * 5
        out.append(_B32_ALPHABET[(n >> shift) & 31])
    return "".join(out)


def _gzip_members(data: bytes):
    """(offset, length, inflated bytes) per member, RFC 1952 walk with
    trailer verification."""
    pos = 0
    while pos < len(data):
        start = pos
        if data[pos:pos + 2] != b"\x1f\x8b":
            raise ValueError(f"bad gzip magic at {pos}")
        if data[pos + 2] != 8:
            raise ValueError("unknown compression method")
        flg = data[pos + 3]
        pos += 10  # magic, CM, FLG, MTIME(4), XFL, OS
        if flg & 4:  # FEXTRA
            xlen = int.from_bytes(data[pos:pos + 2], "little")
            pos += 2 + xlen
        if flg & 8:  # FNAME
            pos = data.index(b"\x00", pos) + 1
        if flg & 16:  # FCOMMENT
            pos = data.index(b"\x00", pos) + 1
        if flg & 2:  # FHCRC
            pos += 2
        d = zlib.decompressobj(-15)
        inflated = d.decompress(data[pos:])
        if not d.eof:
            raise ValueError("truncated deflate stream")
        pos = len(data) - len(d.unused_data)
        crc = int.from_bytes(data[pos:pos + 4], "little")
        isize = int.from_bytes(data[pos + 4:pos + 8], "little")
        if crc != zlib.crc32(inflated):
            raise ValueError("gzip CRC mismatch")
        if isize != len(inflated) % (1 << 32):
            raise ValueError("gzip ISIZE mismatch")
        pos += 8
        yield start, pos - start, inflated


def _zstd_frames(data: bytes):
    """(offset, length, decompressed bytes) per frame, own RFC 8878
    walk; content-size cross-checked when the frame carries one."""
    import pyarrow as pa

    pos = 0
    while pos < len(data):
        start = pos
        magic = int.from_bytes(data[pos:pos + 4], "little")
        if 0x184D2A50 <= magic <= 0x184D2A5F:
            size = int.from_bytes(data[pos + 4:pos + 8], "little")
            pos += 8 + size
            continue
        if magic != 0xFD2FB528:
            raise ValueError(f"bad zstd magic at {pos}")
        pos += 4
        desc = data[pos]
        pos += 1
        if not desc & 0x20:  # window descriptor unless single-segment
            pos += 1
        pos += (0, 1, 2, 4)[desc & 3]  # dictionary id
        fcs = None
        if desc & 0xC0 or desc & 0x20:
            n = 1 << (desc >> 6) if desc & 0xC0 else 1
            fcs = int.from_bytes(data[pos:pos + n], "little")
            if n == 2:
                fcs += 256
            pos += n
        while True:
            hdr = int.from_bytes(data[pos:pos + 3], "little")
            pos += 3
            if (hdr >> 1) & 3 == 1:  # RLE block stores a single byte
                pos += 1
            else:
                pos += hdr >> 3
            if hdr & 1:
                break
        if desc & 4:  # content checksum
            pos += 4
        blob = data[start:pos]
        out = pa.CompressedInputStream(
            pa.BufferReader(blob), "zstd").read()
        out = bytes(out)
        if fcs is not None and len(out) != fcs:
            raise ValueError("zstd content-size mismatch")
        yield start, pos - start, out


# the header dict is last-wins, so the LAST content-length counts
_CL_RE = re.compile(rb"(?im)^content-length[ \t]*:[ \t]*(\d+)[ \t]*\r?$")


def _content_length(head: bytes) -> int:
    hits = _CL_RE.findall(head)
    return int(hits[-1]) if hits else 0


def _plain_records(data: bytes):
    """(offset, length, record bytes) per record of a plain stream."""
    pos = 0
    while pos < len(data):
        while data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= len(data):
            return
        start = pos
        head_end = data.index(b"\r\n\r\n", pos)
        length = _content_length(data[pos:head_end])
        pos = head_end + 4 + length + 4
        yield start, pos - start, data[start:pos]


_HDR_RE = re.compile(rb"(?m)^([^:\r\n]+):[ \t]*(.*?)[ \t]*\r?$")
_STATUS_RE = re.compile(rb"^[ \t\f\v]*HTTP/\S*[ \t\f\v]+(\d+)(?:[ \t\f\v]|$)")
_CTYPE_RE = re.compile(
    rb"(?im)^content-type[ \t]*:[ \t]*(.*?)[ \t]*\r?$")


def _records_in(blob: bytes):
    """All WARC records inside one decompressed unit (regex parse)."""
    pos = 0
    while pos < len(blob):
        while blob[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= len(blob):
            return
        head_end = blob.index(b"\r\n\r\n", pos)
        head = blob[pos:head_end]
        # the version line carries no colon, so _HDR_RE skips it;
        # duplicate names resolve last-wins like a dict overwrite
        fields = {k.strip().lower(): v
                  for k, v in _HDR_RE.findall(head)}
        length = _content_length(head)
        payload = blob[head_end + 4:head_end + 4 + length]
        pos = head_end + 4 + length + 4
        yield fields, payload


def _ts_of(raw: bytes):
    try:
        txt = raw.decode("ascii").replace("Z", "+00:00")
        dt = datetime.fromisoformat(txt)
        if dt.tzinfo is not None:
            dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
        return dt
    except ValueError:
        return None


def oracle_index_warc(path: str):
    """CDX row dicts for one container under the frozen policy."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:2] == b"\x1f\x8b":
        units = _gzip_members(data)
    elif data[:4] == b"\x28\xb5\x2f\xfd" or (
            len(data) >= 4 and 0x50 <= data[0] <= 0x5F
            and data[1:4] == b"\x2a\x4d\x18"):
        units = _zstd_frames(data)
    else:
        units = _plain_records(data)
    filename = path.rstrip("/").rsplit("/", 1)[-1]
    out = []
    for offset, length, blob in units:
        for fields, payload in _records_in(blob):
            if fields.get(b"warc-type", b"").strip().lower() \
                    != b"response":
                continue
            url = fields.get(b"warc-target-uri", b"").decode(
                "utf-8", "replace")
            sep = payload.find(b"\r\n\r\n")
            body = payload[sep + 4:] if sep >= 0 else payload
            status = mime = None
            if sep >= 0:
                head = payload[:sep]
                sm = _STATUS_RE.match(head.split(b"\r\n", 1)[0])
                if sm:
                    status = int(sm.group(1))
                cm = _CTYPE_RE.search(head.split(b"\r\n", 1)[-1]
                                      if b"\r\n" in head else b"")
                if cm:
                    mime = cm.group(1).split(b";", 1)[0].strip() \
                        .lower().decode("utf-8", "replace") or None
            out.append({
                "urlkey": oracle_surt(url),
                "ts": _ts_of(fields.get(b"warc-date", b"")),
                "url": url or None,
                "mime": mime,
                "status": status,
                "digest": _b32(hashlib.sha1(body).digest()),
                "length": length,
                "offset": offset,
                "filename": filename,
            })
    return out
