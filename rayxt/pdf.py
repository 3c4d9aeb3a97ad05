"""From-scratch PDF text extraction ("PDF/layout parse" in the north
rule, alongside the HTML boilerplate strip).

No PDF library exists in this environment, so this is a real parser
built from the ISO 32000 spec, stdlib-only (``zlib`` for FlateDecode):

* **container**: classic cross-reference tables (incl. ``/Prev``
  chains and free entries) resolved from ``startxref``; when the xref
  is damaged or offsets lie, a sequential object walk re-discovers
  ``N G obj`` bodies without ever looking inside stream payloads;
* **objects**: full recursive-descent value parser — dictionaries,
  arrays, names (with ``#xx`` escapes), literal strings (escapes,
  octal, line continuations, balanced nested parens, in-string EOL
  normalisation), hex strings, numbers, booleans, null, indirect
  references (including indirect ``/Length``);
* **streams**: ``/Filter /FlateDecode`` (scalar or 1-list) via zlib;
  other filters raise -> ``parse_error``;
* **page tree**: ``/Root -> /Pages`` with recursive ``/Kids`` walk in
  document order; ``/Contents`` as a single stream or an array of
  streams (concatenated with a newline, per spec);
* **content streams**: text operators BT ET Tf TL Td TD Tm T* Tj TJ
  ' " interpreted with the text-line origin tracked through the
  standard text-positioning state machine; every other operator only
  clears the operand stack; inline images (BI..EI) are skipped.

Layout policy (documented, deliberately simple — no font metrics are
available, so glyph advances cannot be computed; both this engine and
the independent naive oracle ``tests/oracle/pdf_oracle.py`` implement
the SAME policy from this paragraph, separately):

1. every show operation records a run ``(page, y, x, text)`` at the
   current text-line origin, in emission order; empty runs drop;
2. inside a ``TJ`` array, a number ``v < -100`` (thousandths of an em
   — the conventional kerning-as-space heuristic) appends one space
   to the run; larger offsets are ignored; one TJ = one run;
3. per page, runs group into lines by ``round(y, 1)``; lines sort by
   descending y; within a line runs sort by ascending x, stable in
   emission order (consecutive shows at one position concatenate);
4. joining a line: a run whose x is strictly greater than the
   previous run's x is preceded by exactly one space; equal x
   concatenates directly; bytes decode as latin-1;
5. lines join with ``"\n"``, pages join with ``"\f"``; extraction is
   all-or-nothing per document — any structural failure yields
   ``status='parse_error'`` with empty text (missing ``%PDF-`` header
   yields ``status='not_pdf'``).

The Ray-side surface mirrors the HTML kernel: ``ExtractPdfText`` is an
actor-pool ``map_batches`` stage (parsers are warm per-actor state,
payload bytes never leave the stage) and ``extract_pdf_text`` wires it
with pyarrow batches.
"""

from __future__ import annotations

import re
import zlib

import pyarrow as pa

__all__ = ["PDF_SCHEMA", "PdfError", "extract_text", "ExtractPdfText",
           "extract_pdf_text"]

PDF_SCHEMA = pa.schema(
    [
        ("pdf_id", pa.int64()),
        ("url", pa.string()),
        ("pdf", pa.binary()),
    ]
)

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_REGULAR_END = _WS + _DELIM

_TJ_SPACE_THRESHOLD = -100.0  # policy item 2


class PdfError(ValueError):
    """Structural failure anywhere in the container/page/content path."""


class Name(str):
    """A PDF name token (``/Foo``); subclass so dict keys stay strs."""

    __slots__ = ()


class Ref:
    """Indirect reference ``num gen R``."""

    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __repr__(self):  # pragma: no cover - debug only
        return f"Ref({self.num},{self.gen})"


# ---------------------------------------------------------------------------
# tokenizer (shared by object-level and content-level parsing)
# ---------------------------------------------------------------------------


class _Lexer:
    """Byte-level PDF tokenizer: emits (kind, value) at ``self.pos``."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self):
        data, n = self.data, len(self.data)
        pos = self.pos
        while pos < n:
            c = data[pos]
            if c in _WS:
                pos += 1
            elif c == 0x25:  # '%' comment runs to EOL
                while pos < n and data[pos] not in b"\r\n":
                    pos += 1
            else:
                break
        self.pos = pos

    def next(self):
        """-> (kind, value) where kind in num/name/str/kw/'<<'/'>>'/
        '['/']'/'{'/'}' or (None, None) at EOF."""
        self._skip_ws()
        data, n = self.data, len(self.data)
        pos = self.pos
        if pos >= n:
            return None, None
        c = data[pos]
        if c == 0x2F:  # '/'
            return self._name()
        if c == 0x28:  # '('
            return self._literal_string()
        if c == 0x3C:  # '<'
            if pos + 1 < n and data[pos + 1] == 0x3C:
                self.pos = pos + 2
                return "<<", None
            return self._hex_string()
        if c == 0x3E:  # '>'
            if pos + 1 < n and data[pos + 1] == 0x3E:
                self.pos = pos + 2
                return ">>", None
            raise PdfError("lone '>'")
        if c in b"[]{}":
            self.pos = pos + 1
            return chr(c), None
        if c in b"+-.0123456789":
            return self._number()
        return self._keyword()

    def _name(self):
        data, n = self.data, len(self.data)
        pos = self.pos + 1
        out = bytearray()
        while pos < n and data[pos] not in _REGULAR_END:
            c = data[pos]
            if c == 0x23 and pos + 2 < n:  # '#xx' escape
                try:
                    out.append(int(data[pos + 1:pos + 3], 16))
                    pos += 3
                    continue
                except ValueError:
                    pass
            out.append(c)
            pos += 1
        self.pos = pos
        return "name", Name(out.decode("latin-1"))

    def _number(self):
        data, n = self.data, len(self.data)
        pos = self.pos
        start = pos
        if data[pos] in b"+-":
            pos += 1
        seen_digit = seen_dot = False
        while pos < n:
            c = data[pos]
            if c in b"0123456789":
                seen_digit = True
            elif c == 0x2E and not seen_dot:
                seen_dot = True
            else:
                break
            pos += 1
        if not seen_digit and not seen_dot:
            raise PdfError("malformed number")
        self.pos = pos
        text = data[start:pos]
        if seen_dot:
            return "num", float(text)
        return "num", int(text)

    def _literal_string(self):
        data, n = self.data, len(self.data)
        pos = self.pos + 1
        out = bytearray()
        depth = 1
        while pos < n:
            c = data[pos]
            if c == 0x5C:  # backslash
                pos += 1
                if pos >= n:
                    break
                e = data[pos]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9,
                                0x62: 8, 0x66: 12}[e])
                    pos += 1
                elif e in b"0123456789"[:8]:  # octal, 1-3 digits
                    val = 0
                    k = 0
                    while k < 3 and pos < n and data[pos] in b"01234567":
                        val = val * 8 + (data[pos] - 0x30)
                        pos += 1
                        k += 1
                    out.append(val & 0xFF)
                elif e in b"\r\n":  # line continuation
                    pos += 1
                    if e == 0x0D and pos < n and data[pos] == 0x0A:
                        pos += 1
                else:  # \( \) \\ and unknown escapes -> literal char
                    out.append(e)
                    pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                pos += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos = pos + 1
                    return "str", bytes(out)
                out.append(c)
                pos += 1
            elif c in b"\r\n":  # in-string EOL normalises to \n
                out.append(10)
                pos += 1
                if c == 0x0D and pos < n and data[pos] == 0x0A:
                    pos += 1
            else:
                out.append(c)
                pos += 1
        raise PdfError("unterminated literal string")

    def _hex_string(self):
        data, n = self.data, len(self.data)
        pos = self.pos + 1
        digits = bytearray()
        while pos < n and data[pos] != 0x3E:
            c = data[pos]
            if c in b"0123456789abcdefABCDEF":
                digits.append(c)
            elif c not in _WS:
                raise PdfError("bad hex string char")
            pos += 1
        if pos >= n:
            raise PdfError("unterminated hex string")
        self.pos = pos + 1
        if len(digits) % 2:
            digits.append(0x30)  # odd count pads with 0
        return "str", bytes.fromhex(digits.decode("ascii"))

    def _keyword(self):
        data, n = self.data, len(self.data)
        pos = self.pos
        start = pos
        while pos < n and data[pos] not in _REGULAR_END:
            pos += 1
        if pos == start:  # lone delimiter we don't understand
            raise PdfError(f"unexpected byte {data[pos]:#x}")
        self.pos = pos
        return "kw", data[start:pos]


# ---------------------------------------------------------------------------
# object-level parsing
# ---------------------------------------------------------------------------


_KW_VALUES = {b"true": True, b"false": False, b"null": None}


def _parse_value(lx: _Lexer, first=None):
    """Recursive-descent object parser; ``first`` replays a token."""
    kind, val = first if first is not None else lx.next()
    if kind == "num":
        # could be the start of `N G R`
        if isinstance(val, int) and val >= 0:
            save = lx.pos
            k2, v2 = lx.next()
            if k2 == "num" and isinstance(v2, int) and v2 >= 0:
                save2 = lx.pos
                k3, v3 = lx.next()
                if k3 == "kw" and v3 == b"R":
                    return Ref(val, v2)
                lx.pos = save2
                # two numbers in a row only happen inside arrays /
                # operand streams; replay the second via a queue
                return _TwoNums(val, v2)
            lx.pos = save
        return val
    if kind in ("name", "str"):
        return val
    if kind == "<<":
        d = {}
        while True:
            k, v = lx.next()
            if k == ">>":
                return d
            if k != "name":
                raise PdfError("dict key is not a name")
            d[str(v)] = _strip_twonums(_parse_value(lx))
        # unreachable
    if kind == "[":
        arr = []
        while True:
            save = lx.pos
            k, v = lx.next()
            if k == "]":
                return arr
            if k is None:
                raise PdfError("unterminated array")
            item = _parse_value(lx, first=(k, v))
            if isinstance(item, _TwoNums):
                arr.extend(item.pair)
            else:
                arr.append(item)
            del save
    if kind == "kw" and val in _KW_VALUES:
        return _KW_VALUES[val]
    raise PdfError(f"unexpected token {kind} {val!r}")


class _TwoNums:
    """Two consecutive ints that were NOT an indirect ref."""

    __slots__ = ("pair",)

    def __init__(self, a, b):
        self.pair = (a, b)


def _strip_twonums(v):
    if isinstance(v, _TwoNums):
        raise PdfError("stray number pair in dict value")
    return v


_OBJ_HEAD = re.compile(rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)[\x00\t\n\x0c\r ]+obj"
                       rb"(?=[\x00\t\n\x0c\r ()<>\[\]{}/%])")


def _unpredict_png(data: bytes, columns: int) -> bytes:
    """Un-apply PNG row predictors (PDF /Predictor >= 10; one filter
    byte per `columns`-byte row, bytes-per-pixel 1 for xref streams)."""
    if columns <= 0:
        raise PdfError("bad /Columns")
    rowlen = columns + 1
    if len(data) % rowlen:
        raise PdfError("predictor data is not whole rows")
    out = bytearray()
    prev = bytearray(columns)
    for r in range(0, len(data), rowlen):
        ft = data[r]
        row = bytearray(data[r + 1:r + rowlen])
        if ft == 1:    # Sub
            for i in range(1, columns):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif ft == 2:  # Up
            for i in range(columns):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(columns):
                left = row[i - 1] if i else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(columns):
                a = row[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ft != 0:
            raise PdfError(f"unknown PNG filter {ft}")
        out += row
        prev = row
    return bytes(out)


def _apply_filters(d: dict, raw: bytes) -> bytes:
    """Decode a stream per its /Filter (+ /DecodeParms) chain.
    FlateDecode with optional PNG predictors; anything else raises."""
    filt = d.get("Filter")
    if filt is None:
        return raw
    filters = filt if isinstance(filt, list) else [filt]
    parms = d.get("DecodeParms") or d.get("DP")
    parms_list = parms if isinstance(parms, list) else [parms] * len(filters)
    for f, p in zip(filters, parms_list):
        if str(f) != "FlateDecode":
            raise PdfError(f"unsupported filter {f}")
        try:
            raw = zlib.decompress(raw)
        except zlib.error as exc:
            raise PdfError(f"bad flate stream: {exc}") from exc
        if isinstance(p, dict):
            pred = p.get("Predictor", 1)
            if pred >= 10:
                raw = _unpredict_png(raw, p.get("Columns", 1))
            elif pred != 1:
                raise PdfError(f"unsupported predictor {pred}")
    return raw


class PdfDocument:
    """Parsed container: object offsets, trailer, page walk."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise PdfError("missing %PDF- header")
        self.data = data
        self._offsets: dict[int, int] = {}
        self._in_objstm: dict[int, tuple[int, int]] = {}
        self._cache: dict[int, object] = {}
        self._streams: dict[int, bytes] = {}
        self.trailer: dict = {}
        try:
            self._load_xref_chain()
            self._check_offsets()
        except Exception:
            self._offsets.clear()
            self._in_objstm.clear()
            self._cache.clear()
            self._streams.clear()
            self.trailer.clear()
            self._sequential_scan()
        if "Root" not in self.trailer:
            self._find_root_by_scan()

    # -- xref path ---------------------------------------------------------

    def _load_xref_chain(self):
        data = self.data
        at = data.rfind(b"startxref")
        if at < 0:
            raise PdfError("no startxref")
        lx = _Lexer(data, at + len(b"startxref"))
        kind, start = lx.next()
        if kind != "num" or not isinstance(start, int):
            raise PdfError("bad startxref offset")
        seen = set()
        while start is not None and start not in seen:
            seen.add(start)
            start = self._load_one_xref(start)

    def _load_one_xref(self, offset: int):
        """Classic `xref` table OR a PDF 1.5+ cross-reference STREAM
        (`/Type /XRef`, binary W-packed entries, trailer fields in the
        stream dict) — dispatched on what the offset points at."""
        lx = _Lexer(self.data, offset)
        save = lx.pos
        kind, val = lx.next()
        if kind == "num":
            lx.pos = save
            return self._load_xref_stream(offset)
        if kind != "kw" or val != b"xref":
            raise PdfError("offset does not point at an xref table")
        while True:
            save = lx.pos
            kind, val = lx.next()
            if kind == "kw" and val == b"trailer":
                break
            if kind != "num":
                raise PdfError("bad xref section header")
            first = val
            kind, count = lx.next()
            if kind != "num":
                raise PdfError("bad xref section count")
            for k in range(count):
                kind, off = lx.next()
                k2, _gen = lx.next()
                k3, typ = lx.next()
                if kind != "num" or k2 != "num" or k3 != "kw":
                    raise PdfError("bad xref entry")
                num = first + k
                if typ == b"n" and num not in self._offsets:
                    self._offsets[num] = off
                elif typ not in (b"n", b"f"):
                    raise PdfError("bad xref entry type")
            del save
        trailer = _parse_value(lx)
        if not isinstance(trailer, dict):
            raise PdfError("trailer is not a dict")
        for k, v in trailer.items():
            self.trailer.setdefault(k, v)
        prev = trailer.get("Prev")
        return prev if isinstance(prev, int) else None

    def _load_xref_stream(self, offset: int):
        lx = _Lexer(self.data, offset)
        lx._skip_ws()
        m = _OBJ_HEAD.match(self.data, lx.pos)
        if m is None:
            raise PdfError("xref offset hits neither table nor object")
        value, stream, _end = self._parse_object_body(m.end())
        if not isinstance(value, dict) or value.get("Type") != "XRef" \
                or stream is None:
            raise PdfError("object at startxref is not an XRef stream")
        data = _apply_filters(value, stream)
        w = value.get("W")
        if (not isinstance(w, list) or len(w) != 3
                or not all(isinstance(x, int) and x >= 0 for x in w)):
            raise PdfError("bad /W")
        a, b, c = w
        rw = a + b + c
        size = value.get("Size")
        index = value.get("Index", [0, size])
        if not isinstance(index, list) or len(index) % 2:
            raise PdfError("bad /Index")
        pos = 0
        for k in range(0, len(index), 2):
            start, count = index[k], index[k + 1]
            for j in range(count):
                row = data[pos:pos + rw]
                if len(row) < rw:
                    raise PdfError("short xref stream")
                pos += rw
                typ = int.from_bytes(row[:a], "big") if a else 1
                f2 = int.from_bytes(row[a:a + b], "big")
                f3 = int.from_bytes(row[a + b:], "big")
                num = start + j
                if num in self._offsets or num in self._in_objstm:
                    continue  # newer section wins
                if typ == 1:
                    self._offsets[num] = f2
                elif typ == 2:
                    self._in_objstm[num] = (f2, f3)
                # typ 0 = free
        for k, v in value.items():
            self.trailer.setdefault(k, v)
        prev = value.get("Prev")
        return prev if isinstance(prev, int) else None

    def _check_offsets(self):
        """Cheap validation that xref offsets actually hit `N G obj`."""
        if not self._offsets and not self._in_objstm:
            raise PdfError("empty xref")
        for num, off in self._offsets.items():
            if not (0 <= off < len(self.data)):
                raise PdfError("xref offset out of range")
            m = _OBJ_HEAD.match(self.data, off)
            if m is None or int(m.group(1)) != num:
                raise PdfError("xref offset does not hit its object")

    # -- sequential fallback ----------------------------------------------

    def _sequential_scan(self):
        """Walk `N G obj` bodies front-to-back, never entering stream
        payloads (the stream span is skipped via /Length, or by the
        next literal `endstream` when /Length is indirect)."""
        data = self.data
        pos = 0
        while True:
            m = _OBJ_HEAD.search(data, pos)
            if m is None:
                break
            num = int(m.group(1))
            try:
                value, stream, end = self._parse_object_body(m.end())
            except PdfError:
                pos = m.end()
                continue
            self._cache[num] = value
            if stream is not None:
                self._streams[num] = stream
            self._offsets.setdefault(num, m.start())
            pos = end
        if not self._cache:
            raise PdfError("no objects found")
        # expand object streams the scan surfaced (modern layouts keep
        # the catalog/page dicts inside /Type /ObjStm containers)
        for num, value in list(self._cache.items()):
            if (isinstance(value, dict) and value.get("Type") == "ObjStm"
                    and num in self._streams):
                try:
                    filt = value.get("Filter")
                    d = value
                    if isinstance(filt, Ref):
                        d = dict(value, Filter=self._cache.get(filt.num))
                    self._cache_objstm_members(
                        d, _apply_filters(d, self._streams[num]))
                except PdfError:
                    continue
        at = data.rfind(b"trailer")
        if at >= 0:
            try:
                trailer = _parse_value(_Lexer(data, at + len(b"trailer")))
                if isinstance(trailer, dict):
                    for k, v in trailer.items():
                        self.trailer.setdefault(k, v)
            except PdfError:
                pass

    def _find_root_by_scan(self):
        for num, value in list(self._cache.items()):
            if isinstance(value, dict) and value.get("Type") == "Catalog":
                self.trailer["Root"] = Ref(num, 0)
                return
        for num in sorted(self._offsets):
            try:
                value = self._load_num(num)
            except PdfError:
                continue
            if isinstance(value, dict) and value.get("Type") == "Catalog":
                self.trailer["Root"] = Ref(num, 0)
                return
        raise PdfError("no document catalog")

    # -- object access -----------------------------------------------------

    def _parse_object_body(self, pos: int):
        """value [stream] -> (value, stream_bytes | None, end_pos)."""
        lx = _Lexer(self.data, pos)
        value = _parse_value(lx)
        save = lx.pos
        kind, val = lx.next()
        if kind == "kw" and val == b"stream":
            data = self.data
            p = lx.pos
            if data[p:p + 2] == b"\r\n":
                p += 2
            elif p < len(data) and data[p] in b"\r\n":
                p += 1
            if not isinstance(value, dict):
                raise PdfError("stream without a dict")
            length = value.get("Length")
            if isinstance(length, Ref):
                length = self._resolve_length(length)
            if isinstance(length, int) and 0 <= length <= len(data) - p and \
                    data[p + length:].lstrip(_WS).startswith(b"endstream"):
                raw = data[p:p + length]
                end = data.index(b"endstream", p + length) + len(b"endstream")
            else:
                end = data.find(b"endstream", p)
                if end < 0:
                    raise PdfError("unterminated stream")
                raw = data[p:end].rstrip(b"\r\n")
                end += len(b"endstream")
            lx2 = _Lexer(data, end)
            save2 = lx2.pos
            kind, val = lx2.next()
            if not (kind == "kw" and val == b"endobj"):
                lx2.pos = save2
            return value, raw, lx2.pos
        if kind == "kw" and val == b"endobj":
            return value, None, lx.pos
        lx.pos = save
        return value, None, lx.pos

    def _resolve_length(self, ref: Ref):
        """Indirect /Length: resolve through xref offsets if known,
        else scan for the small integer object directly."""
        if ref.num in self._cache:
            return self._cache[ref.num]
        off = self._offsets.get(ref.num)
        if off is not None:
            m = _OBJ_HEAD.match(self.data, off)
            if m:
                lx = _Lexer(self.data, m.end())
                kind, val = lx.next()
                if kind == "num":
                    return val
        for m in _OBJ_HEAD.finditer(self.data):
            if int(m.group(1)) == ref.num:
                lx = _Lexer(self.data, m.end())
                kind, val = lx.next()
                if kind == "num":
                    return val
        return None

    def _load_num(self, num: int):
        if num in self._cache:
            return self._cache[num]
        if num in self._in_objstm and num not in self._offsets:
            self._load_objstm(self._in_objstm[num][0])
            if num not in self._cache:
                raise PdfError(f"object {num} missing from its ObjStm")
            return self._cache[num]
        off = self._offsets.get(num)
        if off is None:
            raise PdfError(f"object {num} not in xref")
        m = _OBJ_HEAD.match(self.data, off)
        if m is None or int(m.group(1)) != num:
            raise PdfError(f"xref offset for {num} is stale")
        value, stream, _end = self._parse_object_body(m.end())
        self._cache[num] = value
        if stream is not None:
            self._streams[num] = stream
        return value

    def resolve(self, v):
        seen = 0
        while isinstance(v, Ref):
            v = self._load_num(v.num)
            seen += 1
            if seen > 32:
                raise PdfError("reference cycle")
        return v

    def stream_bytes(self, ref: Ref) -> bytes:
        d = self.resolve(ref)
        if not isinstance(d, dict) or ref.num not in self._streams:
            raise PdfError("contents ref is not a stream")
        filt = d.get("Filter")
        if isinstance(filt, Ref):
            d = dict(d, Filter=self.resolve(filt))
        return _apply_filters(d, self._streams[ref.num])

    # -- object streams (PDF 1.5 /Type /ObjStm) ----------------------------

    def _load_objstm(self, stm_num: int):
        """Decompress one object stream and cache every member object
        (header = N pairs of `num offset`, bodies at /First+offset)."""
        d = self.resolve(Ref(stm_num, 0))
        if not isinstance(d, dict) or d.get("Type") != "ObjStm":
            raise PdfError("xref type-2 entry does not point at ObjStm")
        raw = self.stream_bytes(Ref(stm_num, 0))
        self._cache_objstm_members(d, raw)

    def _cache_objstm_members(self, d: dict, raw: bytes):
        n = d.get("N")
        first = d.get("First")
        if not isinstance(n, int) or not isinstance(first, int):
            raise PdfError("bad ObjStm header")
        lx = _Lexer(raw)
        pairs = []
        for _ in range(n):
            k1, num = lx.next()
            k2, off = lx.next()
            if k1 != "num" or k2 != "num":
                raise PdfError("bad ObjStm pair table")
            pairs.append((num, off))
        for num, off in pairs:
            if num not in self._cache:
                self._cache[num] = _parse_value(_Lexer(raw, first + off))

    # -- page tree ---------------------------------------------------------

    def page_contents(self) -> list[bytes]:
        """Decoded content-stream bytes per page, in document order."""
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise PdfError("bad /Root")
        pages_ref = root.get("Pages")
        top = self.resolve(pages_ref)
        if not isinstance(top, dict):
            raise PdfError("bad /Pages")
        out: list[bytes] = []
        self._walk(top, out, depth=0)
        return out

    def _walk(self, node: dict, out: list[bytes], depth: int):
        if depth > 64:
            raise PdfError("page tree too deep")
        kids = node.get("Kids")
        if kids is not None:
            kids = self.resolve(kids)
            if not isinstance(kids, list):
                raise PdfError("bad /Kids")
            for kid in kids:
                child = self.resolve(kid)
                if not isinstance(child, dict):
                    raise PdfError("bad page-tree child")
                self._walk(child, out, depth + 1)
            return
        if node.get("Type") == "Page" or "Contents" in node:
            out.append(self._contents_of(node))
            return
        raise PdfError("page-tree node is neither Pages nor Page")

    def _contents_of(self, page: dict) -> bytes:
        contents = page.get("Contents")
        if contents is None:
            return b""
        if isinstance(contents, Ref):
            resolved = self.resolve(contents)
            if isinstance(resolved, list):
                contents = resolved
            else:
                return self.stream_bytes(contents)
        if isinstance(contents, list):
            # spec: array streams concatenate with whitespace between
            return b"\n".join(
                self.stream_bytes(c) if isinstance(c, Ref)
                else _raise(PdfError("contents array item is not a ref"))
                for c in contents
            )
        raise PdfError("bad /Contents")


def _raise(exc):  # expression-position raise helper
    raise exc


# ---------------------------------------------------------------------------
# content-stream interpretation (policy items 1-2)
# ---------------------------------------------------------------------------


def interpret_content(content: bytes) -> list[tuple[float, float, str]]:
    """One page's content stream -> runs [(y, x, text)] in emission
    order.  Only the text operators move state; everything else just
    clears the operand stack (policy item 1-2)."""
    lx = _Lexer(content)
    stack: list = []
    runs: list[tuple[float, float, str]] = []
    lx_x = lx_y = 0.0   # text-line origin
    leading = 0.0       # TL (persists across BT per spec)

    def show(raw: bytes):
        if raw:
            runs.append((lx_y, lx_x, raw.decode("latin-1")))

    def show_tj(arr: list):
        parts: list[str] = []
        for el in arr:
            if isinstance(el, bytes):
                parts.append(el.decode("latin-1"))
            elif isinstance(el, (int, float)):
                if el < _TJ_SPACE_THRESHOLD:
                    parts.append(" ")
        text = "".join(parts)
        if text:
            runs.append((lx_y, lx_x, text))

    while True:
        try:
            kind, val = lx.next()
        except PdfError:
            # tolerant: skip one byte of junk inside a content stream
            lx.pos += 1
            continue
        if kind is None:
            break
        if kind == "num" or kind == "str" or kind == "name":
            stack.append(val)
            continue
        if kind == "[":
            try:
                arr = _parse_value(lx, first=("[", None))
            except PdfError:
                stack.clear()
                continue
            stack.append(arr)
            continue
        if kind == "<<":
            try:
                stack.append(_parse_value(lx, first=("<<", None)))
            except PdfError:
                stack.clear()
            continue
        if kind in ("]", ">>", "{", "}"):
            stack.clear()
            continue
        op = val  # keyword bytes
        if op == b"BT":
            lx_x = lx_y = 0.0
        elif op == b"Td" and len(stack) >= 2:
            lx_x += _f(stack[-2])
            lx_y += _f(stack[-1])
        elif op == b"TD" and len(stack) >= 2:
            leading = -_f(stack[-1])
            lx_x += _f(stack[-2])
            lx_y += _f(stack[-1])
        elif op == b"Tm" and len(stack) >= 6:
            lx_x = _f(stack[-2])
            lx_y = _f(stack[-1])
        elif op == b"T*":
            lx_y -= leading
        elif op == b"TL" and len(stack) >= 1:
            leading = _f(stack[-1])
        elif op == b"Tj" and stack and isinstance(stack[-1], bytes):
            show(stack[-1])
        elif op == b"'" and stack and isinstance(stack[-1], bytes):
            lx_y -= leading
            show(stack[-1])
        elif op == b'"' and len(stack) >= 3 and isinstance(stack[-1], bytes):
            lx_y -= leading
            show(stack[-1])
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            show_tj(stack[-1])
        elif op == b"BI":
            # inline image: skip to EI
            at = content.find(b"EI", lx.pos)
            lx.pos = len(content) if at < 0 else at + 2
        stack.clear()
    return runs


def _f(v) -> float:
    if isinstance(v, (int, float)):
        return float(v)
    raise PdfError("numeric operand expected")


# ---------------------------------------------------------------------------
# layout (policy items 3-5)
# ---------------------------------------------------------------------------


def layout_runs(runs: list[tuple[float, float, str]]) -> str:
    """Runs of ONE page -> page text per policy items 3-4."""
    lines: dict[float, list[tuple[float, int, str]]] = {}
    for seq, (y, x, text) in enumerate(runs):
        if not text:
            continue
        lines.setdefault(round(y, 1), []).append((x, seq, text))
    out_lines: list[str] = []
    for yk in sorted(lines, reverse=True):
        row = sorted(lines[yk], key=lambda t: (t[0], t[1]))
        parts: list[str] = []
        prev_x = None
        for x, _seq, text in row:
            if prev_x is not None and x > prev_x:
                parts.append(" ")
            parts.append(text)
            prev_x = x
        out_lines.append("".join(parts))
    return "\n".join(out_lines)


def extract_text(data: bytes) -> tuple[int, str, str]:
    """One document -> (n_pages, text, status); policy item 5."""
    if data is None or not data.startswith(b"%PDF-"):
        return 0, "", "not_pdf"
    try:
        doc = PdfDocument(data)
        contents = doc.page_contents()
        pages = [layout_runs(interpret_content(c)) for c in contents]
        return len(pages), "\f".join(pages), "ok"
    except Exception:
        return 0, "", "parse_error"


# ---------------------------------------------------------------------------
# Ray stage
# ---------------------------------------------------------------------------


class ExtractPdfText:
    """Actor-pool stage: (pdf_id, url, pdf) -> extracted text rows.

    Parsing is inherently per-document Python (like the HTML kernel,
    ``rayxt/kernel.py``); the heavy ``pdf`` bytes are dropped before
    the batch leaves the stage, so only text crosses the object store
    downstream."""

    def __init__(self, max_bytes: int = 64 << 20):
        self._extract = extract_text  # warm per-actor handle
        self._max_bytes = max_bytes   # skew guard, like the html hard_cap

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_pages: list[int] = []
        texts: list[str] = []
        n_chars: list[int] = []
        status: list[str] = []
        for payload in batch["pdf"].to_pylist():
            if payload is not None and len(payload) > self._max_bytes:
                np_, text, st = 0, "", "too_large"
            else:
                np_, text, st = self._extract(payload)
            n_pages.append(np_)
            texts.append(text)
            n_chars.append(len(text))
            status.append(st)
        out = batch.drop_columns(["pdf"])
        out = out.append_column("n_pages", pa.array(n_pages, pa.int32()))
        out = out.append_column("text", pa.array(texts, pa.string()))
        out = out.append_column("n_chars", pa.array(n_chars, pa.int32()))
        return out.append_column("status", pa.array(status, pa.string()))


def extract_pdf_text(ds, *, batch_size: int = 32, concurrency=(1, 8),
                     max_bytes: int = 64 << 20):
    """PDF payload bytes bound memory, not row count — keep batches
    small like the media stages; ``max_bytes`` short-circuits
    pathological giants to ``status='too_large'`` without parsing."""
    return ds.map_batches(
        ExtractPdfText, fn_constructor_kwargs=dict(max_bytes=max_bytes),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )
