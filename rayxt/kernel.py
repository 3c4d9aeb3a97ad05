"""Per-row extraction kernel: html bytes -> result struct.

This is the inner function of the ``map_batches`` extraction stage
(SURVEY.md P3).  It never raises for malformed input — every failure
mode becomes a ``status`` value so a poison document can never kill a
block (Ray task retries are for infrastructure faults, not data).

Status values (frozen): ``ok | empty | too_large | error``; with the
opt-in per-row deadline (``timeout_s``, SURVEY P15): ``timeout`` — a
pathological document stops cooperatively at the parser's check points
instead of stalling its whole batch.
"""

from __future__ import annotations

import traceback
from time import monotonic

from .dom import Node, ParseTimeout, parse_html
from .rules import Transformation

__all__ = ["extract_one", "DEFAULT_HARD_CAP"]

# documents larger than this are not parsed at all (SURVEY 7.5 item 5);
# the big-tier pipeline may raise it explicitly.
DEFAULT_HARD_CAP = 32 * 1024 * 1024


def _spans_of(root: Node):
    """Retained-region spans: (src_start, src_end, tag) of every direct
    child element of <body> (or of the root when no body) that survived
    pruning and has source offsets.  Frozen definition."""
    body = next((c for c in root.children if c.tag == "body"), root)
    spans = []
    for c in body.children:
        if c.is_element() and c.src_start >= 0 and c.src_end >= 0:
            spans.append((c.src_start, c.src_end, c.localname))
    return spans


def extract_one(html, program: Transformation, hard_cap: int = DEFAULT_HARD_CAP,
                timeout_s: float | None = None):
    """Run a compiled program over one raw html payload.

    Returns a dict: ``text`` (str), ``status`` (str), ``error`` (str),
    ``n_chars`` (int), ``rule_hits`` (list[(rule, hits)] sorted by rule),
    ``spans`` (list[(start, end, kind)]).

    ``timeout_s`` arms the cooperative per-row deadline: the parser
    checks it periodically and a breach yields ``status='timeout'``
    (the deadline bounds the parse, which dominates pathological rows;
    rule execution runs to completion once parsing finished).
    """
    if html is None or len(html) == 0:
        return {"text": "", "status": "empty", "error": "",
                "n_chars": 0, "rule_hits": [], "spans": []}
    if len(html) > hard_cap:
        return {"text": "", "status": "too_large", "error": "",
                "n_chars": 0, "rule_hits": [], "spans": []}
    deadline = monotonic() + timeout_s if timeout_s else None
    try:
        root = parse_html(html, deadline=deadline)
        result, hits = program.call_with_stats(root)
        text = getattr(result, "text", None)
        if text is None:
            text = "" if result is None else str(result)
        pruned_root = getattr(result, "root", root)
        spans = _spans_of(pruned_root if isinstance(pruned_root, Node) else root)
        return {
            "text": text,
            "status": "ok",
            "error": "",
            "n_chars": len(text),
            "rule_hits": sorted(hits.items()),
            "spans": spans,
        }
    except ParseTimeout as exc:
        return {"text": "", "status": "timeout", "error": str(exc)[:500],
                "n_chars": 0, "rule_hits": [], "spans": []}
    except Exception as exc:  # noqa: BLE001 — poison rows must not kill blocks
        err = f"{type(exc).__name__}: {exc}"[:500]
        return {"text": "", "status": "error", "error": err,
                "n_chars": 0, "rule_hits": [], "spans": []}
