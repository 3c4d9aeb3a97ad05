"""Independent naive restatement of the main-content heuristic
(policy in ``rayxt/boilerplate.py``'s module docstring, items 1-6).

Shares the frozen DOM layer (``rayxt.dom.parse_html`` — locked by its
own differential/fuzz suites) but re-implements the HEURISTIC itself
from the policy text with different code: plain recursion instead of
explicit stacks, a flat unit-record list instead of ancestor-credit
dicts.  Generates the committed golden for ``pages_main_content``;
the engine is never consulted.
"""

from __future__ import annotations

from rayxt.dom import parse_html

_UNITS = {"p", "h1", "h2", "h3", "h4", "li", "pre", "blockquote"}
_BOILER = {"script", "style", "nav", "header", "footer", "aside"}
_CANDIDATES = {"body", "div", "article", "main", "section", "td"}


def _visible(n) -> bool:
    return n.is_element() and n.tag not in _BOILER


def _raw_text(n) -> str:
    buf = n.text or ""
    for c in n.children:
        if _visible(c):
            buf += _raw_text(c)
        buf += c.tail or ""
    return buf


def _squash(s: str) -> str:
    return " ".join(s.split())


def _links_len(n) -> int:
    total = 0
    for c in n.children:
        if not _visible(c):
            continue
        if c.tag == "a":
            total += len(_squash(_raw_text(c)))
        else:
            total += _links_len(c)
    return total


def _collect_units(n, acc) -> None:
    for c in n.children:
        if not _visible(c):
            continue
        if c.tag in _UNITS:
            acc.append(c)
        else:
            _collect_units(c, acc)


def _nearest_candidate(unit, body):
    p = unit.parent
    while p is not None:
        if p.tag in _CANDIDATES:
            return p
        p = p.parent
    return body


def oracle_main_content(html) -> tuple[str, int, str]:
    """-> (text, n_blocks, status), same contract as the engine."""
    if html is None or len(html) == 0:
        return "", 0, "empty_html"
    try:
        root = parse_html(html)
    except Exception:
        return "", 0, "error"
    body = root
    for n in root.iter():
        if n.tag == "body":
            body = n
            break
    units: list = []
    _collect_units(body, units)
    if body.tag in _UNITS:  # degenerate: body itself can't be a unit
        pass
    if not units:
        return "", 0, "no_content"

    doc_pos = {id(n): k for k, n in enumerate(body.iter())}
    records = []  # (candidate_node, credit)
    for u in units:
        credit = len(_squash(_raw_text(u))) - 2 * _links_len(u)
        records.append((_nearest_candidate(u, body), max(0, credit)))

    totals: list[tuple[int, int, object]] = []  # (-score, pos, node)
    seen: dict[int, int] = {}
    nodes: dict[int, object] = {}
    for cand, credit in records:
        seen[id(cand)] = seen.get(id(cand), 0) + credit
        nodes[id(cand)] = cand
    for key, score in seen.items():
        if score > 0:
            totals.append((-score, doc_pos.get(key, -1), nodes[key]))
    if not totals:
        return "", 0, "no_content"
    totals.sort(key=lambda t: (t[0], t[1]))
    winner = totals[0][2]

    win_units: list = []
    _collect_units(winner, win_units)
    lines = []
    for u in win_units:
        t = _squash(_raw_text(u))
        if t:
            lines.append(t)
    return "\n".join(lines), len(lines), "ok"
