"""Independent restatement of the table-extraction policy
(``rayxt/tables.py`` module docstring) for golden generation.

Deliberately different mechanism from the engine end to end: the
engine's single pre-order walk carries (table, row) context and places
cells with an absolute-expiry column map; this oracle builds a full
parent map by recursion, selects rows/cells by walking each node's
ancestor chain, and fills a set-of-(row, col)-slots occupancy grid.
Only the policy text is shared.  Parsing uses the frozen tag-soup DOM
(``rayxt.dom.parse_html`` — itself pinned by its own fuzz/differential
suites), as the boilerplate/markdown oracles do.
"""

from __future__ import annotations

from rayxt.dom import SKIP_SUBTREE, parse_html

SPAN_CAP = 1000
_WS = " \t\n\r\f"


def _local(tag):
    return tag.rsplit("}", 1)[1] if tag.startswith("{") else tag


def _all_nodes(root):
    """(node, parent) pairs in document pre-order, by recursion."""
    out = []

    def rec(n, parent):
        out.append((n, parent))
        for c in n.children:
            rec(c, n)

    rec(root, None)
    return out


def _nearest(node, parents, names):
    """Nearest ancestor whose local name is in ``names`` (or None)."""
    cur = parents.get(id(node))
    while cur is not None:
        if _local(cur.tag) in names:
            return cur
        cur = parents.get(id(cur))
    return None


def _skipped(node, parents, limit):
    """True when any ancestor strictly below ``limit`` (exclusive) is a
    SKIP_SUBTREE tag — such nodes are invisible to the policy."""
    cur = node
    while cur is not None and cur is not limit:
        if _local(cur.tag) in SKIP_SUBTREE:
            return True
        cur = parents.get(id(cur))
    return False


def _span(attrs, name):
    v = attrs.get(name)
    if v is None:
        return 1
    v = v.strip(_WS)
    if not v or not v.isascii() or not v.isdigit():
        return 1
    return min(max(int(v), 1), SPAN_CAP)


def _text_of(cell):
    """Recursive subtree text: SKIP_SUBTREE + nested tables excised,
    neighbours concatenate with no separator, then ws-normalized."""

    def rec(n):
        s = n.text or ""
        for c in n.children:
            lc = _local(c.tag)
            if lc not in SKIP_SUBTREE and lc != "table":
                s += rec(c)
            s += c.tail or ""
        return s

    return " ".join(rec(cell).split())


def oracle_page_tables(url, html):
    if html is None:
        return []
    try:
        root = parse_html(html)
    except Exception:
        return []
    pairs = _all_nodes(root)
    parents = {id(n): p for n, p in pairs}
    order = [n for n, _ in pairs
             if not _skipped(n, parents, None)]

    tables = [n for n in order if _local(n.tag) == "table"]
    t_index = {id(t): i for i, t in enumerate(tables)}
    rows_of = {id(t): [] for t in tables}
    for n in order:
        if _local(n.tag) == "tr":
            t = _nearest(n, parents, ("table",))
            if t is not None and id(t) in rows_of:
                rows_of[id(t)].append(n)
    row_index = {}
    for t in tables:
        for r_i, r in enumerate(rows_of[id(t)]):
            row_index[id(r)] = (id(t), r_i)
    cells_of = {id(r): [] for rs in rows_of.values() for r in rs}
    for n in order:
        if _local(n.tag) in ("td", "th"):
            r = _nearest(n, parents, ("tr",))
            t = _nearest(n, parents, ("table",))
            if (r is not None and t is not None and id(r) in row_index
                    and row_index[id(r)][0] == id(t)):
                cells_of[id(r)].append(n)

    out = []
    for t in tables:
        slots = set()  # (row, col) occupied by earlier spans
        for r_i, r in enumerate(rows_of[id(t)]):
            col = 0
            for cell in cells_of[id(r)]:
                while (r_i, col) in slots:
                    col += 1
                rs = _span(cell.attrs, "rowspan")
                cs = _span(cell.attrs, "colspan")
                for rr in range(r_i, r_i + rs):
                    for cc in range(col, col + cs):
                        slots.add((rr, cc))
                out.append({
                    "url": url, "table_idx": t_index[id(t)],
                    "row_idx": r_i, "col_idx": col,
                    "rowspan": rs, "colspan": cs,
                    "is_header": _local(cell.tag) == "th",
                    "cell_text": _text_of(cell),
                })
                col += cs
    return out
