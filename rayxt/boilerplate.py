"""Rule-free DOM-heuristic main-content extraction ("DOM heuristics"
in the north rule, complementing the rule-based engine).

A readability-class text-density scorer over the frozen tag-soup DOM
(``rayxt.dom.parse_html`` — its policy is locked by the differential
parser suites), no site rules required.  The heuristic is this exact
documented policy; the independent naive restatement in
``tests/oracle/boilerplate_oracle.py`` re-implements the SAME policy
with different code over the same locked DOM layer, and generates the
committed golden for the ``pages_main_content`` driver query:

1. **Units** are the top-most elements tagged ``p h1 h2 h3 h4 li pre
   blockquote`` (a unit's descendants are never units themselves).
2. **Boiler subtrees** — ``script style nav header footer aside`` and
   comment nodes — are invisible: never walked for units, and their
   text never counts (their ``tail`` still belongs to the parent
   flow).
3. A unit's text is the whitespace-normalized (``" ".join(s.split())``)
   concatenation of its subtree flow (text + child flows + tails),
   boiler subtrees excluded.  Its link length is the sum of normalized
   lengths of its ``a``-descendant subtrees.
4. Each unit credits ``max(0, len(text) - 2*link_len)`` to its nearest
   ancestor tagged ``body div article main section td`` (the
   *candidates*); a unit with no candidate ancestor credits the body.
5. The **winner** is the highest-scoring candidate, earliest in
   document order on ties.  No positive score -> empty result.
6. Output text: the winner's units in document order, each unit's
   normalized text on its own line (empties dropped), joined with
   ``"\\n"``.

Statuses: ``ok`` (winner found), ``empty_html`` (null/empty payload),
``no_content`` (parsed but no positive-scoring unit), ``error``
(parse failure) — counts are always 0-filled, never null (driver
hash-gate convention).
"""

from __future__ import annotations

import pyarrow as pa

from .dom import Node, parse_html

__all__ = ["UNIT_TAGS", "BOILER_TAGS", "CANDIDATE_TAGS", "main_content",
           "main_content_from_root", "ExtractMainContent",
           "extract_main_content"]

UNIT_TAGS = frozenset({"p", "h1", "h2", "h3", "h4", "li", "pre",
                       "blockquote"})
BOILER_TAGS = frozenset({"script", "style", "nav", "header", "footer",
                         "aside"})
CANDIDATE_TAGS = frozenset({"body", "div", "article", "main", "section",
                            "td"})


def _is_boiler(node: Node) -> bool:
    return node.tag in BOILER_TAGS or not node.is_element()


def _flow(node: Node) -> str:
    """Raw text flow of a subtree, boiler subtrees excluded (their
    tails included — policy item 2/3).  Iterative to survive deep
    soup."""
    parts: list[str] = []
    # stack holds ('text', s) emissions and ('node', n) expansions
    stack: list = [("node", node, True)]
    while stack:
        kind, item, include_text = stack.pop()
        if kind == "text":
            parts.append(item)
            continue
        n = item
        if include_text and n.text:
            parts.append(n.text)
        # push children (+ their tails) in reverse so pops run in order
        for c in reversed(n.children):
            if c.tail:
                stack.append(("text", c.tail, False))
            if not _is_boiler(c):
                stack.append(("node", c, True))
        del include_text
    return "".join(parts)


def _norm(s: str) -> str:
    return " ".join(s.split())


def _unit_score(unit: Node, norm_text: str) -> int:
    text_len = len(norm_text)
    link_len = 0
    stack = [unit]
    while stack:
        n = stack.pop()
        for c in n.children:
            if _is_boiler(c):
                continue
            if c.tag == "a":
                link_len += len(_norm(_flow(c)))
            else:
                stack.append(c)
    return max(0, text_len - 2 * link_len)


def _topmost_units(root: Node) -> list[Node]:
    """Units in document order; a unit's subtree is consumed (item 1),
    boiler subtrees are never entered (item 2)."""
    out: list[Node] = []
    stack = [root]
    while stack:
        n = stack.pop()
        if _is_boiler(n):
            continue
        if n.tag in UNIT_TAGS and n is not root:
            out.append(n)
            continue
        stack.extend(reversed(n.children))
    return out


def main_content(html) -> tuple[str, int, str]:
    """One document -> (text, n_blocks, status) per the policy."""
    if html is None or len(html) == 0:
        return "", 0, "empty_html"
    try:
        root = parse_html(html)
    except Exception:
        return "", 0, "error"
    return main_content_from_root(root)


def main_content_from_root(root: Node) -> tuple[str, int, str]:
    """The heuristic over an already-parsed tree — the entry the
    ``heuristic_content`` rule program uses so the resumable
    extraction job / CLI / two-tier paths run it unchanged."""
    body = next((n for n in root.iter() if n.tag == "body"), root)
    units = _topmost_units(body)
    if not units:
        return "", 0, "no_content"

    # candidate document order for deterministic tie-breaks
    order: dict[int, int] = {}
    for pos, n in enumerate(body.iter()):
        if n.tag in CANDIDATE_TAGS:
            order[id(n)] = pos
    order.setdefault(id(body), -1)

    scores: dict[int, int] = {}
    owners: dict[int, Node] = {}
    norm_cache: dict[int, str] = {}
    for unit in units:
        norm_cache[id(unit)] = _norm(_flow(unit))
        credit = _unit_score(unit, norm_cache[id(unit)])
        anc = unit.parent
        while anc is not None and anc.tag not in CANDIDATE_TAGS:
            anc = anc.parent
        target = anc if anc is not None else body
        owners[id(target)] = target
        scores[id(target)] = scores.get(id(target), 0) + credit

    best_id = None
    best = (0, 0)
    for key, sc in scores.items():
        if sc <= 0:
            continue
        rank = (-sc, order.get(key, -1))
        if best_id is None or rank < best:
            best_id = key
            best = rank
    if best_id is None:
        return "", 0, "no_content"

    winner = owners[best_id]
    # unit text was computed during scoring; only units not under body
    # (impossible) would miss the cache
    lines = [t for t in
             (norm_cache.get(id(u)) if id(u) in norm_cache
              else _norm(_flow(u)) for u in _topmost_units(winner))
             if t]
    return "\n".join(lines), len(lines), "ok"


class ExtractMainContent:
    """Actor-pool stage: (url, html, ...) -> main-content rows.

    Like the rules kernel (``rayxt/kernel.py``), per-document DOM work
    is inherently Python; the html bytes are dropped in-stage."""

    def __init__(self):
        self._extract = main_content  # warm per-actor handle

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts: list[str] = []
        blocks: list[int] = []
        status: list[str] = []
        for html in batch["html"].to_pylist():
            t, nb, st = self._extract(html)
            texts.append(t)
            blocks.append(nb)
            status.append(st)
        out = batch.drop_columns(["html"])
        out = out.append_column("text", pa.array(texts, pa.string()))
        out = out.append_column("n_chars", pa.array(
            [len(t) for t in texts], pa.int32()))
        out = out.append_column("n_blocks", pa.array(blocks, pa.int32()))
        return out.append_column("status", pa.array(status, pa.string()))


def extract_main_content(ds, *, batch_size: int = 64, concurrency=(1, 8)):
    return ds.map_batches(
        ExtractMainContent, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )
