"""Independent naive PDF text extractor (conformance oracle).

Implements the SAME documented layout policy as ``rayxt/pdf.py``
(module docstring there, items 1-5) with a deliberately DIFFERENT
mechanism, so agreement is evidence:

* objects are discovered by splitting the file on ``N G obj`` headers
  (never via the xref table — damaged xrefs are invisible here);
* dictionaries are NOT fully parsed: the few needed fields (/Type,
  /Pages, /Kids, /Contents, /Length, /Filter) are grabbed by regex
  over the dict's raw bytes;
* the content tokenizer is a regex scanner for everything except
  literal strings, which use a manual balanced-paren walk;
* state tracking / layout are re-written from the policy text.

Used to generate the committed golden for the ``pages_pdf_text``
driver query (the golden NEVER comes from the engine) and in the
full-corpus equivalence test.
"""

from __future__ import annotations

import re
import zlib

_HEAD = re.compile(rb"(\d+)[\s]+(\d+)[\s]+obj\b")
_REF = re.compile(rb"(\d+)\s+0\s+R")
_NUM = re.compile(rb"[-+]?(?:\d+\.?\d*|\.\d+)")
_NAME = re.compile(rb"/([^\s()<>\[\]{}/%]*)")
_STREAM_KW = re.compile(rb"\bstream(\r\n|\r|\n)")


class OracleFail(Exception):
    pass


def _split_objects(data: bytes) -> dict[int, bytes]:
    """obj number -> raw body bytes (between header and next header)."""
    heads = list(_HEAD.finditer(data))
    objs: dict[int, bytes] = {}
    for k, m in enumerate(heads):
        end = heads[k + 1].start() if k + 1 < len(heads) else len(data)
        body = data[m.end():end]
        # trim trailing endobj / xref noise
        cut = body.rfind(b"endobj")
        if cut >= 0:
            body = body[:cut]
        objs.setdefault(int(m.group(1)), body)
    return objs


def _dict_span(body: bytes) -> bytes:
    """The top-level << ... >> span of an object body (raw bytes)."""
    start = body.find(b"<<")
    if start < 0:
        return b""
    depth = 0
    i = start
    while i < len(body) - 1:
        two = body[i:i + 2]
        if two == b"<<":
            depth += 2
            i += 2
        elif two == b">>":
            depth -= 2
            i += 2
            if depth == 0:
                return body[start:i]
        else:
            i += 1
    return body[start:]


def _grab_ref(dict_bytes: bytes, key: bytes):
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+0\s+R", dict_bytes)
    return int(m.group(1)) if m else None


def _grab_int(dict_bytes: bytes, key: bytes):
    m = re.search(rb"/" + key + rb"\s+(\d+)(?!\d)(?!\s*0\s+R)", dict_bytes)
    return int(m.group(1)) if m else None


def _grab_array_refs(dict_bytes: bytes, key: bytes):
    m = re.search(rb"/" + key + rb"\s*\[(.*?)\]", dict_bytes, re.S)
    if not m:
        return None
    return [int(r.group(1)) for r in _REF.finditer(m.group(1))]


def _stream_of(objs: dict[int, bytes], num: int) -> bytes:
    body = objs.get(num)
    if body is None:
        raise OracleFail(f"missing object {num}")
    d = _dict_span(body)
    m = _STREAM_KW.search(body)
    if not m:
        raise OracleFail("object has no stream")
    start = m.end()
    length = _grab_int(d, b"Length")
    if length is None:
        ref = _grab_ref(d, b"Length")
        if ref is not None and ref in objs:
            lm = _NUM.search(objs[ref])
            if lm:
                length = int(lm.group(0))
    if length is not None and start + length <= len(body) and \
            body[start + length:].lstrip().startswith(b"endstream"):
        raw = body[start:start + length]
    else:
        end = body.find(b"endstream", start)
        if end < 0:
            raise OracleFail("unterminated stream")
        raw = body[start:end].rstrip(b"\r\n")
    if re.search(rb"/Filter\s*(?:\[\s*)?/FlateDecode", d):
        try:
            raw = zlib.decompress(raw)
        except zlib.error as exc:
            raise OracleFail(f"flate: {exc}")
    elif re.search(rb"/Filter\b", d):
        raise OracleFail("unsupported filter")
    return raw


def _expand_object_streams(objs: dict[int, bytes]) -> None:
    """PDF 1.5 /Type /ObjStm containers: decompress, read the
    `num offset` pair header, splice member object bodies into the
    map (the xref STREAM itself is never consulted — this oracle is
    pure sequential scan, mechanism-independent of the engine)."""
    for num in list(objs):
        d = _dict_span(objs[num])
        if not re.search(rb"/Type\s*/ObjStm\b", d):
            continue
        try:
            raw = _stream_of(objs, num)
        except OracleFail:
            continue
        n = _grab_int(d, b"N")
        first = _grab_int(d, b"First")
        if n is None or first is None:
            continue
        nums_offs = [int(x) for x in raw[:first].split()[: 2 * n]]
        pairs = list(zip(nums_offs[0::2], nums_offs[1::2]))
        for k, (onum, off) in enumerate(pairs):
            end = first + pairs[k + 1][1] if k + 1 < len(pairs) else len(raw)
            objs.setdefault(onum, raw[first + off:end])


def _page_streams(data: bytes) -> list[bytes]:
    objs = _split_objects(data)
    if not objs:
        raise OracleFail("no objects")
    _expand_object_streams(objs)
    catalog = None
    for body in objs.values():
        d = _dict_span(body)
        if re.search(rb"/Type\s*/Catalog\b", d):
            catalog = d
            break
    if catalog is None:
        raise OracleFail("no catalog")
    pages_num = _grab_ref(catalog, b"Pages")
    if pages_num is None:
        raise OracleFail("catalog has no /Pages")

    out: list[bytes] = []

    def walk(num: int, depth: int):
        if depth > 64:
            raise OracleFail("deep page tree")
        body = objs.get(num)
        if body is None:
            raise OracleFail(f"missing page-tree node {num}")
        d = _dict_span(body)
        kids = _grab_array_refs(d, b"Kids")
        if kids is not None:
            for kid in kids:
                walk(kid, depth + 1)
            return
        if not re.search(rb"/Type\s*/Page\b", d):
            raise OracleFail("node is neither Pages nor Page")
        arr = _grab_array_refs(d, b"Contents")
        if arr is not None:
            out.append(b"\n".join(_stream_of(objs, n) for n in arr))
            return
        ref = _grab_ref(d, b"Contents")
        if ref is None:
            out.append(b"")
            return
        # the ref may point at an array object instead of a stream
        target = objs.get(ref)
        if target is not None and not _STREAM_KW.search(target):
            inner = _grab_array_refs(b"/X " + _dict_wrap(target), b"X")
            if inner:
                out.append(b"\n".join(_stream_of(objs, n) for n in inner))
                return
        out.append(_stream_of(objs, ref))

    walk(pages_num, 0)
    return out


def _dict_wrap(body: bytes) -> bytes:
    """Expose a bare array object body to _grab_array_refs."""
    m = re.search(rb"\[(.*?)\]", body, re.S)
    return m.group(0) if m else b"[]"


# ---------------------------------------------------------------------------
# content scanning
# ---------------------------------------------------------------------------

_TOK = re.compile(
    rb"(?P<ws>[\x00\t\n\x0c\r ]+)"
    rb"|(?P<comment>%[^\r\n]*)"
    rb"|(?P<hex><[0-9a-fA-F\x00\t\n\x0c\r ]*>)"
    rb"|(?P<ddopen><<)|(?P<ddclose>>>)"
    rb"|(?P<num>[-+]?(?:\d+\.?\d*|\.\d+))"
    rb"|(?P<name>/[^\x00\t\n\x0c\r ()<>\[\]{}/%]*)"
    rb"|(?P<delim>[\[\]{}])"
    rb"|(?P<kw>[^\x00\t\n\x0c\r ()<>\[\]{}/%]+)"
)

_ESC_MAP = {ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
            ord("b"): b"\b", ord("f"): b"\x0c"}


def _scan_string(data: bytes, open_at: int) -> tuple[bytes, int]:
    """Balanced-paren literal string starting at '(' -> (bytes, end)."""
    i = open_at + 1
    depth = 1
    out = bytearray()
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C and i + 1 < n:
            e = data[i + 1]
            if e in _ESC_MAP:
                out += _ESC_MAP[e]
                i += 2
            elif 0x30 <= e <= 0x37:
                j = i + 1
                digits = b""
                while j < n and len(digits) < 3 and 0x30 <= data[j] <= 0x37:
                    digits += bytes([data[j]])
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
            elif e in (0x0D, 0x0A):
                i += 2
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 2
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        elif c in (0x0D, 0x0A):
            out.append(0x0A)
            i += 1
            if c == 0x0D and i < n and data[i] == 0x0A:
                i += 1
        else:
            out.append(c)
            i += 1
    raise OracleFail("unterminated string")


def _tokens(data: bytes):
    """Yield ('num', float) / ('str', bytes) / ('kw', bytes) /
    ('open',) / ('close',) content tokens."""
    i = 0
    n = len(data)
    while i < n:
        if data[i] == 0x28:  # '('
            s, i = _scan_string(data, i)
            yield ("str", s)
            continue
        m = _TOK.match(data, i)
        if m is None:
            i += 1  # junk byte
            continue
        i = m.end()
        if m.lastgroup in ("ws", "comment", "name", "ddopen", "ddclose"):
            if m.lastgroup == "name":
                yield ("name", m.group(0))
            continue
        if m.lastgroup == "hex":
            digits = re.sub(rb"[^0-9a-fA-F]", b"", m.group(0)[1:-1])
            if len(digits) % 2:
                digits += b"0"
            yield ("str", bytes.fromhex(digits.decode()))
        elif m.lastgroup == "num":
            yield ("num", float(m.group(0)))
        elif m.lastgroup == "delim":
            yield ("open",) if m.group(0) == b"[" else ("close",)
        else:
            yield ("kw", m.group(0))


def _runs_of(content: bytes):
    """Policy items 1-2, re-written: -> [(y, x, text)]."""
    x = y = 0.0
    tl = 0.0
    stack: list = []
    runs: list[tuple[float, float, str]] = []
    in_array: list | None = None
    for tok in _tokens(content):
        if tok[0] == "open":
            in_array = []
            continue
        if tok[0] == "close":
            if in_array is not None:
                stack.append(in_array)
                in_array = None
            else:
                stack.clear()
            continue
        if tok[0] in ("num", "str"):
            (in_array if in_array is not None else stack).append(tok[1])
            continue
        if tok[0] == "name":
            if in_array is not None:
                in_array.append(tok[1])
            else:
                stack.append(tok[1])
            continue
        op = tok[1]
        if in_array is not None:
            # operator inside an array is malformed; drop the array
            in_array = None
            stack.clear()
            continue
        if op == b"BT":
            x = y = 0.0
        elif op == b"Td" and len(stack) >= 2:
            x += stack[-2]
            y += stack[-1]
        elif op == b"TD" and len(stack) >= 2:
            tl = -stack[-1]
            x += stack[-2]
            y += stack[-1]
        elif op == b"TL" and stack:
            tl = stack[-1]
        elif op == b"Tm" and len(stack) >= 6:
            x = stack[-2]
            y = stack[-1]
        elif op == b"T*":
            y -= tl
        elif op == b"Tj" and stack and isinstance(stack[-1], bytes):
            t = stack[-1].decode("latin-1")
            if t:
                runs.append((y, x, t))
        elif op == b"'" and stack and isinstance(stack[-1], bytes):
            y -= tl
            t = stack[-1].decode("latin-1")
            if t:
                runs.append((y, x, t))
        elif op == b'"' and len(stack) >= 3 and isinstance(stack[-1], bytes):
            y -= tl
            t = stack[-1].decode("latin-1")
            if t:
                runs.append((y, x, t))
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            buf = []
            for el in stack[-1]:
                if isinstance(el, bytes):
                    buf.append(el.decode("latin-1"))
                elif isinstance(el, float) and el < -100.0:
                    buf.append(" ")
            t = "".join(buf)
            if t:
                runs.append((y, x, t))
        elif op == b"BI":
            break  # inline images never appear before text in fixtures
        stack.clear()
    return runs


def _page_text(runs) -> str:
    """Policy items 3-4, re-written with itertools-style grouping."""
    keyed = [(round(y, 1), x, k, t) for k, (y, x, t) in enumerate(runs) if t]
    text_lines = []
    for yk in sorted({r[0] for r in keyed}, reverse=True):
        row = sorted((r for r in keyed if r[0] == yk),
                     key=lambda r: (r[1], r[2]))
        buf = []
        last_x = None
        for _yk, rx, _k, rt in row:
            if last_x is not None and rx > last_x:
                buf.append(" ")
            buf.append(rt)
            last_x = rx
        text_lines.append("".join(buf))
    return "\n".join(text_lines)


def oracle_extract(data: bytes) -> tuple[int, str, str]:
    """-> (n_pages, text, status), same contract as engine."""
    if data is None or not data.startswith(b"%PDF-"):
        return 0, "", "not_pdf"
    try:
        streams = _page_streams(data)
        pages = [_page_text(_runs_of(c)) for c in streams]
        return len(pages), "\f".join(pages), "ok"
    except Exception:
        return 0, "", "parse_error"
