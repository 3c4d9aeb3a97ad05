"""HTML table extraction: ``<table>`` elements to structured grid rows.

Turns each page's tables into one output row per CELL with resolved
grid coordinates — the operator a web-scale pipeline runs to mine
tabular training data (entity tables, infoboxes, data sheets) out of
raw HTML.  One actor-pool DOM stage; html is pruned to the stage and
dies inside it, only narrow cell rows reach the stream.

FROZEN extraction policy (the oracle in ``tests/oracle/tables_oracle.py``
restates every item independently — parent-map ancestor filtering and a
dict-occupancy grid, never this module's single-pass walk):

1. Tables are ``table`` elements in document pre-order (NESTED tables
   included — each is its own table), numbered ``table_idx`` 0.. per
   page.
2. The rows of table T are the ``tr`` descendants whose NEAREST
   ``table`` ancestor is T, in document order (``thead``/``tbody``/
   ``tfoot``/any wrappers are transparent); ``row_idx`` is the index in
   that list.  A ``tr`` with no ``table`` ancestor is ignored.
3. The cells of row R are the ``td``/``th`` descendants whose nearest
   ``tr`` ancestor is R AND whose nearest ``table`` ancestor is R's
   table, in document order.  A ``td`` outside any such row is ignored.
4. Span attributes: the value stripped of ASCII whitespace must be all
   ASCII digits, else it counts 1; the integer is clamped to
   [1, 1000] (0 -> 1; HTML's rowspan=0 "rest of section" is NOT
   honored — documented divergence, bounded output).
5. Grid placement per the HTML table model: scanning each row left to
   right, a cell lands on the first column whose slot is not occupied
   by an earlier cell's span; it then occupies ``rowspan x colspan``
   slots.  Only the ORIGIN slot is collision-checked — a wide cell may
   overlap a later blocked column (an HTML "table model error",
   browsers place it the same way).  ``col_idx``/``row_idx`` are the
   cell's top-left grid coordinates.  One output row per origin cell,
   never per occupied slot.
6. ``cell_text``: the cell subtree's text with ``SKIP_SUBTREE`` tags
   (script/style/comments/...) and NESTED ``table`` subtrees excised —
   excised neighbours concatenate with NO separator (the
   ``rayxt.dom.extract_text`` rule) — then whitespace-normalized
   (``" ".join(s.split())``), untruncated.
7. ``is_header``: the cell's tag is ``th``.
8. Unparseable / null html yields no rows (the outlinks policy); pages
   without tables yield no rows.
"""

from __future__ import annotations

import pyarrow as pa

from .dom import SKIP_SUBTREE, parse_html

__all__ = [
    "SPAN_CAP",
    "page_tables",
    "ExtractTables",
    "extract_tables",
]

SPAN_CAP = 1000
_WS = " \t\n\r\f"

#: output schema (after url)
TABLE_FIELDS = (
    ("table_idx", pa.int64()),
    ("row_idx", pa.int64()),
    ("col_idx", pa.int64()),
    ("rowspan", pa.int64()),
    ("colspan", pa.int64()),
    ("is_header", pa.bool_()),
    ("cell_text", pa.string()),
)


def _span_of(attrs: dict, name: str) -> int:
    v = attrs.get(name)
    if v is None:
        return 1
    v = v.strip(_WS)
    if not v or not v.isascii() or not v.isdigit():
        return 1
    return min(max(int(v), 1), SPAN_CAP)


def _local(tag: str) -> str:
    if tag.startswith("{"):
        return tag.rsplit("}", 1)[1]
    return tag


def _cell_text(cell) -> str:
    """Policy item 6: subtree text, SKIP_SUBTREE + nested tables
    excised, no separator, whitespace-normalized."""
    parts: list[str] = []
    stack: list = list(reversed(cell.children))
    if cell.text:
        parts.append(cell.text)
    while stack:
        item = stack.pop()
        if isinstance(item, str):
            parts.append(item)
            continue
        local = _local(item.tag)
        if local in SKIP_SUBTREE or local == "table":
            if item.tail:
                parts.append(item.tail)
            continue
        if item.tail:
            stack.append(item.tail)
        for c in reversed(item.children):
            stack.append(c)
        if item.text:
            parts.append(item.text)
    return " ".join("".join(parts).split())


def page_tables(url: str, html) -> list:
    """Per-document kernel: list of cell dicts under the frozen policy
    (single document-order walk carrying (table, row) context)."""
    out: list = []
    if html is None:
        return out
    try:
        root = parse_html(html)
    except Exception:
        return out

    # tables[i] = list of rows; each row = list of
    # (is_header, rowspan, colspan, text) origin cells in doc order.
    # Single pre-order walk carrying (nearest-table, nearest-row)
    # context; cell subtrees are NOT short-circuited, so tables nested
    # inside cells are enumerated and their rows bind to THEM (a td
    # under the nested table fails the row-table identity check).
    tables: list = []
    stack = [(root, None, None)]
    while stack:
        node, tbl, row = stack.pop()
        local = _local(node.tag)
        if local in SKIP_SUBTREE:
            continue
        if local == "table":
            tbl, row = [], None
            tables.append(tbl)
        elif local == "tr":
            if tbl is not None:
                row = (tbl, [])
                tbl.append(row[1])
        elif local in ("td", "th") and row is not None and row[0] is tbl:
            row[1].append((local == "th", _span_of(node.attrs, "rowspan"),
                           _span_of(node.attrs, "colspan"),
                           _cell_text(node)))
        for c in reversed(node.children):
            if not isinstance(c, str):
                stack.append((c, tbl, row))

    grid_rows = []
    for t_idx, rows in enumerate(tables):
        # occupied[col] = first row index at which the column is free
        # again (absolute expiry — no per-row decrement bookkeeping)
        occupied: dict = {}
        for r_idx, cells in enumerate(rows):
            col = 0
            for is_header, rs, cs, text in cells:
                while occupied.get(col, 0) > r_idx:
                    col += 1
                if rs > 1:
                    for k in range(col, col + cs):
                        # a wide cell may overlap a column a LONGER
                        # earlier rowspan still holds (the model-error
                        # case) — occupancy extends, never shrinks,
                        # matching the oracle's slot-set semantics
                        occupied[k] = max(occupied.get(k, 0),
                                          r_idx + rs)
                grid_rows.append({
                    "url": url, "table_idx": t_idx, "row_idx": r_idx,
                    "col_idx": col, "rowspan": rs, "colspan": cs,
                    "is_header": is_header, "cell_text": text,
                })
                col += cs
    return grid_rows


class ExtractTables:
    """Actor-pool stage: ``(url, html)`` -> one row per table cell."""

    def __init__(self):
        self._kernel = page_tables  # warm per-actor handle

    def __call__(self, batch: pa.Table) -> pa.Table:
        kernel = self._kernel
        rows: list = []
        for u, h in zip(batch["url"].to_pylist(),
                        batch["html"].to_pylist()):
            rows.extend(kernel(u, h))
        cols: dict = {
            "url": pa.array([r["url"] for r in rows], pa.string())}
        for f, typ in TABLE_FIELDS:
            cols[f] = pa.array([r[f] for r in rows], typ)
        return pa.table(cols)


def extract_tables(ds, *, batch_size: int = 64, concurrency=(1, 8)):
    """Table-cell rows for every page: zero-exchange narrow output
    (html is pruned to the stage and dropped inside it)."""
    return ds.select_columns(["url", "html"]).map_batches(
        ExtractTables, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )
