"""Independent naive oracle for CDXJ index parsing.

Deliberately different mechanism from ``rayxt/cdx.py``: the line is
split with a REGEX, the timestamp goes through ``time.strptime``, and
the JSON blob is parsed by a from-scratch FLAT-OBJECT scanner (string
keys, string values with backslash escapes — the CC layout) — the
``json`` module is never imported.  Restates the frozen policy from
the engine module docstring, never the engine code.
"""

from __future__ import annotations

import re
import time
from datetime import datetime

_LINE = re.compile(r"^(\S+) (\d{14}) (\{.*\})\s*$")
_PAIR = re.compile(r'\s*"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"\s*')
_ESC = {"\\": "\\", '"': '"', "/": "/", "b": "\b", "f": "\f",
        "n": "\n", "r": "\r", "t": "\t"}


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt == "u":
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            out.append(_ESC.get(nxt, nxt))
            i += 2
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _flat_json(blob: str):
    """Flat object of string values, or None on anything else."""
    body = blob.strip()
    if not (body.startswith("{") and body.endswith("}")):
        return None
    body = body[1:-1].strip()
    if not body:
        return {}
    fields = {}
    pos = 0
    while True:
        m = _PAIR.match(body, pos)
        if m is None:
            return None
        fields[_unescape(m.group(1))] = _unescape(m.group(2))
        pos = m.end()
        if pos == len(body):
            return fields
        if body[pos] != ",":
            return None
        pos += 1


def oracle_cdxj_line(line: str):
    m = _LINE.match(line.rstrip("\r\n"))
    if m is None:
        return None
    urlkey, ts14, blob = m.groups()
    try:
        st = time.strptime(ts14, "%Y%m%d%H%M%S")
        # strptime under-validates (e.g. Feb 31); the constructor's
        # calendar range check is the policy
        ts = datetime(st.tm_year, st.tm_mon, st.tm_mday,
                      st.tm_hour, st.tm_min, st.tm_sec)
    except ValueError:
        return None
    fields = _flat_json(blob)
    if fields is None:
        return None

    def _int(name):
        v = fields.get(name)
        if v is None or not re.fullmatch(r"-?\d+", v):
            return None
        return int(v)

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
