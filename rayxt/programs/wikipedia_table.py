"""Wikipedia-table-style record extraction (SURVEY.md section 3.3).

The reference's README example: rules with tag+attribute conditions walk
an HTML table and accumulate row records into a context list via
``append``; the transformation's result is the plain Python structure
(``result_object='context.records'``).

FROZEN SEMANTICS: for every ``<table class~=wikitable>`` in document
order, read the first ``<tr>`` containing ``<th>`` cells as the header
row (header names = frozen-policy text of each ``th``); every later
``<tr>`` with ``<td>`` cells becomes one record ``{header_i:
cell_text_i}`` (zip-truncated to the shorter of header/cells); rows
with no ``td`` are skipped.  Records carry ``table_idx`` and
``row_idx`` (0-based, per table).
"""

from __future__ import annotations

from ..dom import Node, extract_text
from ..lib import append
from ..rules import Ref, Rule, Transformation


def _cell_text(cell: Node) -> str:
    return extract_text(cell)


def _rows_of(table: Node):
    for n in table.iter():
        if n.tag == "tr":
            yield n


def collect_table_records(element, context):
    """Handler: element is a matched table; append its row records."""
    records = getattr(context, "records", None)
    if records is None:
        records = []
        context.records = records
    tables_seen = getattr(context, "_tables_seen", 0)
    header = None
    row_idx = 0
    for tr in _rows_of(element):
        ths = [c for c in tr.children if c.tag == "th"]
        tds = [c for c in tr.children if c.tag == "td"]
        if header is None and ths:
            header = [_cell_text(th) for th in ths]
            continue
        if not tds:
            continue
        cells = [_cell_text(td) for td in tds]
        if header is None:
            header = [f"col{i}" for i in range(len(cells))]
        rec = {"table_idx": tables_seen, "row_idx": row_idx}
        for name, value in zip(header, cells):
            rec[name] = value
        records.append(rec)
        row_idx += 1
    context._tables_seen = tables_seen + 1
    return records


def wikitable_program() -> Transformation:
    return Transformation(
        Rule(
            ("table", {"class": lambda v: "wikitable" in v.split()}),
            collect_table_records,
            name="wikitable",
        ),
        copy=False,
        result_object="context.records",
        name="wikipedia_table",
    )
