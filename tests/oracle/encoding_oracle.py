"""Independent naive oracle for the S2 encoding sniff chain.

Restates the FROZEN policy from the ``rayxt/dom.py`` module docstring
(BOM -> declared ``charset`` within the first 4096 bytes, tried
strictly -> UTF-8 strict -> latin-1; ``\\r\\n`` / bare ``\\r`` -> ``\\n``
after decoding), never the code, with deliberately different
mechanics: the charset declaration is found by a hand-rolled
byte-scanner (no regex), BOM'd UTF-16 decodes through the BOM-aware
``utf-16`` codec over the WHOLE buffer (the engine strips two bytes
and picks the endian codec), and newlines normalize via splitlines
reassembly.
"""

from __future__ import annotations

_WS = b" \t\r\n\f\v"
_NAME = (b"abcdefghijklmnopqrstuvwxyz"
         b"ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_-")


def _declared_charset(data: bytes):
    """First ``charset = ["']? name`` declaration in the first 4096
    bytes, scanned by hand; None when absent."""
    head = data[:4096]
    lower = head.lower()
    pos = 0
    while True:
        hit = lower.find(b"charset", pos)
        if hit < 0:
            return None
        i = hit + len(b"charset")
        while i < len(head) and head[i:i + 1] in _WS:
            i += 1
        if head[i:i + 1] != b"=":
            pos = hit + 1
            continue
        i += 1
        while i < len(head) and head[i:i + 1] in _WS:
            i += 1
        if head[i:i + 1] in (b'"', b"'"):
            i += 1
        while i < len(head) and head[i:i + 1] in _WS:
            i += 1
        j = i
        while j < len(head) and head[j:j + 1] in _NAME:
            j += 1
        if j == i:
            pos = hit + 1
            continue
        return head[i:j].decode("ascii", "replace").lower()


def _normalize(text: str) -> str:
    # splitlines-based \r\n / \r -> \n (keepends so nothing merges)
    out = []
    for piece in text.splitlines(keepends=True):
        if piece.endswith("\r\n"):
            out.append(piece[:-2] + "\n")
        elif piece.endswith("\r"):
            out.append(piece[:-1] + "\n")
        else:
            out.append(piece)
    return "".join(out)


def oracle_sniff(data):
    """bytes | str | None -> (normalized text, encoding label) under
    the frozen chain."""
    if isinstance(data, str):
        return _normalize(data), "str"
    if data is None:
        return "", "empty"
    if data.startswith(b"\xef\xbb\xbf"):
        try:
            return _normalize(data[3:].decode("utf-8")), "utf-8-sig"
        except UnicodeDecodeError:
            pass
    elif data.startswith(b"\xff\xfe"):
        try:
            return _normalize(data.decode("utf-16")), "utf-16-le"
        except UnicodeDecodeError:
            data = data[2:]  # the chain continues on the stripped buf
    elif data.startswith(b"\xfe\xff"):
        try:
            return _normalize(data.decode("utf-16")), "utf-16-be"
        except UnicodeDecodeError:
            data = data[2:]
    declared = _declared_charset(data)
    if declared is not None:
        try:
            return _normalize(data.decode(declared)), declared
        except (UnicodeDecodeError, LookupError):
            pass
    try:
        return _normalize(data.decode("utf-8")), "utf-8"
    except UnicodeDecodeError:
        return _normalize(data.decode("latin-1")), "latin-1"
