"""Deterministic synthetic PDF corpus (the "PDF/layout parse" leg of
the north rule's main-content extraction).

Every document is a pure function of the row index (counter-based
SHA-256, no randomness): a spec-true classic PDF — header, numbered
objects, catalog / page tree / page / font objects, content streams,
a correct cross-reference table, trailer, ``startxref`` — written by
the minimal ``_PdfWriter`` below.  Variants per index:

* ``i % 4 == 1``  -> content streams are FlateDecode (zlib);
* ``i % 5 == 2``  -> page contents split into an ARRAY of two streams;
* ``i % 7 == 3``  -> stream ``/Length`` is an indirect reference;
* ``i % 23 == 21``-> the body is intact but ``startxref`` points at
  garbage (extractors must fall back to a sequential object scan;
  full text is still the ground truth);
* ``i % 23 == 22``-> the document is truncated mid-body
  (``status='parse_error'``, empty text);
* ``i % 29 == 17``-> the payload is not a PDF at all
  (``status='not_pdf'``).

Line content cycles through the features an extractor must get right:
plain ``Tj``, ``TJ`` kerning arrays (offset < -100 is a space, -20 is
not), two runs on one line at different x (joined with one space),
consecutive shows at one position (concatenated with none), hex
strings, escape/octal/nested-paren literal strings, in-string EOL,
``'`` and ``"`` show operators, ``Tm``/``Td``/``TD``/``T*`` movement,
and graphics-operator noise between text blocks.

``pdf_ground_truth(i)`` computes the expected extraction from the
SAME layout policy the engine and the independent oracle document
(``rayxt/pdf.py`` module docstring) — but structurally, from what the
generator placed where, never by running either extractor.
"""

from __future__ import annotations

import hashlib
import os
import sys
import zlib

import pyarrow as pa

try:  # ship by value: Ray workers may not have fixtures/ on sys.path
    from ray import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

PDF_WORDS = (
    "archive corpus shard segment token stream batch vector column page "
    "render layout anchor margin header footer caption figure outline "
    "extract filter sample window bucket digest marker lineage"
).split()


def _h(i: int, salt: str) -> int:
    return int.from_bytes(
        hashlib.sha256(f"pdf:{salt}:{i}".encode()).digest()[:8], "big"
    )


def _words(i: int, salt: str, n: int) -> str:
    base = _h(i, salt)
    return " ".join(
        PDF_WORDS[(base + 7 * k) % len(PDF_WORDS)] for k in range(n)
    )


# ---------------------------------------------------------------------------
# minimal spec-true PDF writer
# ---------------------------------------------------------------------------


def _esc(s: str) -> bytes:
    """Escape a python str for a PDF literal string."""
    out = s.encode("latin-1")
    return out.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(
        b")", b"\\)"
    )


class _PdfWriter:
    """Accumulates numbered objects, then emits body + xref + trailer."""

    def __init__(self):
        self._objs: dict[int, bytes] = {}
        self._next = 1

    def reserve(self) -> int:
        num = self._next
        self._next += 1
        return num

    def put(self, num: int, body: bytes) -> int:
        self._objs[num] = body
        return num

    def add(self, body: bytes) -> int:
        return self.put(self.reserve(), body)

    def add_stream(self, data: bytes, *, flate: bool,
                   indirect_length: bool) -> int:
        extra = b""
        if flate:
            data = zlib.compress(data, 6)
            extra = b" /Filter /FlateDecode"
        num = self.reserve()
        if indirect_length:
            len_num = self.add(b"%d" % len(data))
            head = b"<< /Length %d 0 R%s >>" % (len_num, extra)
        else:
            head = b"<< /Length %d%s >>" % (len(data), extra)
        return self.put(num, head + b"\nstream\n" + data + b"\nendstream")

    def render(self, root_num: int, *, break_xref: bool = False) -> bytes:
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets: dict[int, int] = {}
        for num in sorted(self._objs):
            offsets[num] = len(out)
            out += b"%d 0 obj\n" % num
            out += self._objs[num]
            out += b"\nendobj\n"
        xref_at = len(out)
        max_num = max(self._objs)
        out += b"xref\n0 %d\n" % (max_num + 1)
        out += b"0000000000 65535 f \n"
        for num in range(1, max_num + 1):
            off = offsets.get(num, 0)
            typ = b"n" if num in offsets else b"f"
            out += b"%010d %05d %s \n" % (off, 0, typ)
        out += b"trailer\n<< /Size %d /Root %d 0 R >>\n" % (
            max_num + 1, root_num
        )
        out += b"startxref\n%d\n%%%%EOF\n" % (
            (xref_at + 13) if break_xref else xref_at
        )
        return bytes(out)


# ---------------------------------------------------------------------------
# per-line content variants: each returns (ops_bytes, expected_line)
# ---------------------------------------------------------------------------
#
# Every variant receives the line index and the document index; the ops
# assume the text cursor is already at the line's (72, y) origin via a
# movement op chosen by the caller.


def _line_plain(i: int, li: int):
    s = _words(i, f"plain{li}", 4 + (li % 3))
    return b"(%s) Tj" % _esc(s), s


def _line_tj_kern(i: int, li: int):
    a = _words(i, f"tja{li}", 2)
    b = _words(i, f"tjb{li}", 2)
    # -250 < -100 -> space; -20 >= -100 -> nothing
    ops = b"[(%s) -20 (%s) -250 (%s)] TJ" % (
        _esc(a[: len(a) // 2]), _esc(a[len(a) // 2:]), _esc(b)
    )
    return ops, a + " " + b


def _line_two_runs(i: int, li: int):
    left = _words(i, f"left{li}", 2)
    right = _words(i, f"right{li}", 2)
    # second run at x=300, same y (Td with ty=0); policy joins with one
    # space because 300 > 72
    ops = b"(%s) Tj 228 0 Td (%s) Tj -228 0 Td" % (_esc(left), _esc(right))
    return ops, left + " " + right


def _line_concat(i: int, li: int):
    a = _words(i, f"cata{li}", 1)
    b = _words(i, f"catb{li}", 1)
    # consecutive shows at one position concatenate with NO separator
    return b"(%s) Tj (%s) Tj" % (_esc(a), _esc(b)), a + b


def _line_hex(i: int, li: int):
    s = _words(i, f"hex{li}", 3)
    hx = s.encode("latin-1").hex().upper()
    # odd final digit pads with 0 -> append chr(0x30+pad)? keep even but
    # split with whitespace inside the hex string (legal, ignored)
    mid = len(hx) // 2
    return b"<%s %s> Tj" % (hx[:mid].encode(), hx[mid:].encode()), s


def _line_escapes(i: int, li: int):
    w = _words(i, f"esc{li}", 1)
    # raw bytes: escapes, octal, nested balanced parens, line feed escape
    ops = b"(a\\(%s\\) b\\\\c \\101ct (nested) tail\\012end) Tj" % _esc(w)
    expected = f"a({w}) b\\c Act (nested) tail\nend"
    return ops, expected


def _line_quote(i: int, li: int):
    s = _words(i, f"qt{li}", 3)
    # caller positions the PREVIOUS line; ' moves down by leading first.
    # Used only via _page_ops which accounts for the extra line step.
    return b"(%s) '" % _esc(s), s


def _line_dquote(i: int, li: int):
    s = _words(i, f"dq{li}", 3)
    return b"0.5 0.1 (%s) \"" % _esc(s), s


_GRAPHICS_NOISE = (
    b"q 1 0 0 1 10 10 cm 0.5 0.5 0.5 RG 2 w 72 40 468 12 re S "
    b"100 50 m 200 60 l S Q"
)

_LINE_VARIANTS = (
    _line_plain, _line_tj_kern, _line_two_runs, _line_concat,
    _line_hex, _line_escapes,
)


def _page_ops(i: int, p: int) -> tuple[bytes, list[str], int]:
    """One page -> (content_ops, expected_lines, split_at_byte).

    ``split_at_byte`` is a safe boundary for the contents-array variant
    (between two complete op groups)."""
    n_lines = 3 + (_h(i, f"nl{p}") % 4)
    chunks: list[bytes] = [b"BT /F1 12 Tf 14 TL 72 720 Td"]
    expected: list[str] = []
    y = 720
    for li in range(n_lines):
        variant = _LINE_VARIANTS[(_h(i, f"lv{p}:{li}") + li) % len(_LINE_VARIANTS)]
        ops, text = variant(i, li + 10 * p)
        if li > 0:
            mover = (_h(i, f"mv{p}:{li}")) % 4
            if mover == 0:
                chunks.append(b"0 -16 Td")
                y -= 16
            elif mover == 1:
                chunks.append(b"0 -16 TD")  # also sets leading=16
                y -= 16
            elif mover == 2:
                chunks.append(b"T*")        # leading: 14 until a TD ran
                y -= _current_leading(i, p, li)
            else:
                y -= 16
                chunks.append(b"1 0 0 1 72 %d Tm" % y)
        chunks.append(ops)
        expected.append(text)
    # one ' line and one " line at the end (each advances by leading)
    lead = _current_leading(i, p, n_lines)
    ops, text = _line_quote(i, n_lines + 10 * p)
    chunks.append(ops)
    y -= lead
    expected.append(text)
    ops, text = _line_dquote(i, n_lines + 1 + 10 * p)
    chunks.append(ops)
    y -= lead
    expected.append(text)
    chunks.append(b"ET")
    chunks.append(_GRAPHICS_NOISE)
    body = b"\n".join(chunks)
    # split between the movement op groups near the middle
    half = b"\n".join(chunks[: len(chunks) // 2])
    return body, expected, len(half)


def _current_leading(i: int, p: int, upto_li: int) -> int:
    """Leading in effect after lines < upto_li: 14 from Tf-time TL,
    16 once any TD movement has run."""
    for li in range(1, upto_li):
        if (_h(i, f"mv{p}:{li}")) % 4 == 1:
            return 16
    return 14


# ---------------------------------------------------------------------------
# document assembly
# ---------------------------------------------------------------------------


def _build_pdf(i: int) -> tuple[bytes, int, str]:
    """-> (payload, n_pages, expected_text) for a WELL-FORMED doc."""
    flate = i % 4 == 1
    split_contents = i % 5 == 2
    indirect_len = i % 7 == 3
    broken_xref = i % 23 == 21
    n_pages = 1 + (_h(i, "np") % 3)

    w = _PdfWriter()
    catalog = w.reserve()
    pages_node = w.reserve()
    font = w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    page_nums: list[int] = []
    page_texts: list[str] = []
    for p in range(n_pages):
        ops, expected_lines, split_at = _page_ops(i, p)
        if split_contents:
            c1 = w.add_stream(ops[:split_at], flate=flate,
                              indirect_length=indirect_len)
            c2 = w.add_stream(ops[split_at:], flate=flate,
                              indirect_length=False)
            contents = b"[%d 0 R %d 0 R]" % (c1, c2)
        else:
            c = w.add_stream(ops, flate=flate, indirect_length=indirect_len)
            contents = b"%d 0 R" % c
        page = w.add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %s >>"
            % (pages_node, font, contents)
        )
        page_nums.append(page)
        page_texts.append("\n".join(expected_lines))

    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    w.put(pages_node,
          b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages))
    w.put(catalog, b"<< /Type /Catalog /Pages %d 0 R >>" % pages_node)
    payload = w.render(catalog, break_xref=broken_xref)
    return payload, n_pages, "\f".join(page_texts)


def _apply_png_up_predictor(data: bytes, columns: int) -> bytes:
    """PNG Up (filter 2) per row — what real writers emit for xref
    streams (/Predictor 12)."""
    out = bytearray()
    prev = bytes(columns)
    for r in range(0, len(data), columns):
        row = data[r:r + columns]
        out.append(2)
        out += bytes((row[k] - prev[k]) & 0xFF for k in range(columns))
        prev = row
    return bytes(out)


def _build_pdf_modern(i: int) -> tuple[bytes, int, str]:
    """PDF 1.5+ layout: catalog / pages node / font / page dicts live
    inside a FlateDecode /Type /ObjStm; the cross-reference is a
    /Type /XRef STREAM with W=[1,4,2] binary entries under Flate +
    PNG-Up /Predictor 12 — the dominant real-world file shape."""
    flate_content = i % 4 == 1
    n_pages = 1 + (_h(i, "np") % 3)

    # object numbering: 1..n content streams, then objstm container,
    # then xref stream; members get numbers after that
    content_nums = list(range(1, n_pages + 1))
    objstm_num = n_pages + 1
    xref_num = n_pages + 2
    catalog = n_pages + 3
    pages_node = n_pages + 4
    font = n_pages + 5
    page_nums = [n_pages + 6 + p for p in range(n_pages)]

    page_texts: list[str] = []
    content_bodies: list[bytes] = []
    for p in range(n_pages):
        ops, expected_lines, _split = _page_ops(i, p)
        data = zlib.compress(ops, 6) if flate_content else ops
        extra = b" /Filter /FlateDecode" if flate_content else b""
        content_bodies.append(
            b"<< /Length %d%s >>\nstream\n" % (len(data), extra)
            + data + b"\nendstream")
        page_texts.append("\n".join(expected_lines))

    members: list[tuple[int, bytes]] = [
        (catalog, b"<< /Type /Catalog /Pages %d 0 R >>" % pages_node),
        (pages_node, b"<< /Type /Pages /Kids [%s] /Count %d >>" % (
            b" ".join(b"%d 0 R" % n for n in page_nums), n_pages)),
        (font, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    for p, pnum in enumerate(page_nums):
        members.append((pnum,
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (pages_node, font, content_nums[p])))

    bodies = b" ".join(m[1] for m in members)
    header_parts = []
    off = 0
    for num, body in members:
        header_parts.append(b"%d %d" % (num, off))
        off += len(body) + 1  # the single joining space
    header = b" ".join(header_parts) + b"\n"
    objstm_payload = header + bodies
    objstm_z = zlib.compress(objstm_payload, 6)
    objstm_body = (
        b"<< /Type /ObjStm /N %d /First %d /Length %d "
        b"/Filter /FlateDecode >>\nstream\n"
        % (len(members), len(header), len(objstm_z))
    ) + objstm_z + b"\nendstream"

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num, body in zip(content_nums, content_bodies):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    offsets[objstm_num] = len(out)
    out += b"%d 0 obj\n" % objstm_num + objstm_body + b"\nendobj\n"

    # xref stream: W=[1,4,2]; entries for 0..max_num
    xref_at = len(out)
    offsets[xref_num] = xref_at
    max_num = page_nums[-1]
    rows = bytearray()
    for num in range(max_num + 1):
        if num == 0:
            rows += b"\x00" + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
        elif num in offsets:
            rows += b"\x01" + offsets[num].to_bytes(4, "big") + b"\x00\x00"
        else:
            idx = next(k for k, m in enumerate(members) if m[0] == num)
            rows += b"\x02" + objstm_num.to_bytes(4, "big") \
                + idx.to_bytes(2, "big")
    packed = zlib.compress(_apply_png_up_predictor(bytes(rows), 7), 6)
    xref_body = (
        b"<< /Type /XRef /Size %d /W [1 4 2] /Index [0 %d] "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >> "
        b"/Root %d 0 R /Length %d >>\nstream\n"
        % (max_num + 1, max_num + 1, catalog, len(packed))
    ) + packed + b"\nendstream"
    out += b"%d 0 obj\n" % xref_num + xref_body + b"\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out), n_pages, "\f".join(page_texts)


def _is_modern(i: int) -> bool:
    return i % 11 == 4 and i % 23 not in (21, 22) and i % 29 != 17


def pdf_row(i: int) -> dict:
    url = f"https://docs.example-{_h(i, 'host') % 97}.org/p/{i}.pdf"
    if i % 29 == 17:  # not a PDF at all
        payload = b"<html><body>not a pdf %d</body></html>" % i
    elif i % 23 == 22:  # truncated mid-body
        full, _np, _txt = _build_pdf(i)
        payload = full[: int(len(full) * 0.6)]
    elif _is_modern(i):  # PDF 1.5 xref-stream + ObjStm layout
        payload, _np, _txt = _build_pdf_modern(i)
    else:
        payload, _np, _txt = _build_pdf(i)
    return {"pdf_id": i, "url": url, "pdf": payload}


def pdf_ground_truth(i: int) -> dict:
    """Expected extraction per the documented layout policy."""
    url = pdf_row(i)["url"]
    if i % 29 == 17:
        return {"pdf_id": i, "url": url, "n_pages": 0, "text": "",
                "n_chars": 0, "status": "not_pdf"}
    if i % 23 == 22:
        return {"pdf_id": i, "url": url, "n_pages": 0, "text": "",
                "n_chars": 0, "status": "parse_error"}
    if _is_modern(i):
        _payload, n_pages, text = _build_pdf_modern(i)
    else:
        _payload, n_pages, text = _build_pdf(i)
    return {"pdf_id": i, "url": url, "n_pages": n_pages, "text": text,
            "n_chars": len(text), "status": "ok"}


def generate_pdf_table(n_rows: int) -> pa.Table:
    from rayxt.pdf import PDF_SCHEMA

    rows = [pdf_row(i) for i in range(n_rows)]
    return pa.Table.from_pylist(rows, schema=PDF_SCHEMA)


def ensure_pdf_parquet(path: str, n_rows: int) -> str:
    if os.path.exists(path):
        return path
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(generate_pdf_table(n_rows), tmp)
    os.rename(tmp, path)
    return path
