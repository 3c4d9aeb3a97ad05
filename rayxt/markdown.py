"""HTML -> Markdown conversion: structure-preserving text export for
LLM training corpora (headings, lists, links, emphasis, code fences,
blockquotes, pipe tables), the format modern web-text pipelines emit
alongside plain extracted text.

SURVEY §2 parity note: the reference (funkyfuture/inxs, SURVEY §2.1)
exposes DOM transformation primitives, not a fixed export format; this
module is the LLM-pipeline operator layer on top of the same frozen
tag-soup DOM (``rayxt/dom.py``), like ``rayxt/metadata.py`` and
``rayxt/linkgraph.py``.

FROZEN MARKDOWN POLICY (the independent oracle in
``tests/oracle/markdown_oracle.py`` restates it from this spec text —
never from this code; changing any of it changes golden bytes):

* The tree is the frozen tag-soup DOM; ``SKIP_SUBTREE`` tags (script,
  style, noscript, template, iframe, svg, head, #comment) contribute
  nothing anywhere — their *tail* text still belongs to the parent
  flow.
* INLINE tags (the frozen ``INLINE_TAGS`` set below) accumulate into
  the surrounding inline run; every other element is a block.
* Inline rendering produces a whitespace-normalized string
  (``" ".join(s.split())`` — unicode-aware, both ends stripped):
  - ``a``: inner inline content; with a non-empty stripped ``href``
    and non-empty inner -> ``[inner](href)``; empty inner -> nothing;
    missing/empty href -> the inner text alone.  The href is emitted
    verbatim after ASCII-whitespace strip — no resolution, no
    escaping.
  - ``strong``/``b`` -> ``**inner**``; ``em``/``i`` -> ``*inner*``;
    empty inner emits nothing.  Leading/trailing whitespace inside the
    element is dropped by the inner normalization (never moved out).
  - ``code``/``kbd``/``samp``/``var`` -> a code span over the
    whitespace-normalized *plain subtree text* (nested markup
    contributes text only).  Delimiter: one backtick, doubled with
    one-space padding (`` `` ``inner`` `` ``) when the text contains a
    backtick; empty -> nothing.
  - ``img``: with a non-empty stripped ``src`` ->
    ``![alt](src)`` where alt is the whitespace-normalized ``alt``
    attribute (possibly empty); missing/empty src -> nothing.
  - ``br`` -> a single space.
  - every other INLINE tag is transparent (children render in place).
* Blocks, emitted in document order and joined with one blank line
  (``"\\n\\n"``):
  - ``h1``..``h6`` -> ``#``*level + space + inline content of the
    whole subtree flattened; empty -> no block.
  - ``ul``/``ol`` -> one block.  Items are the direct ``li`` children
    only; each item renders its children as blocks (recursively,
    via the container rule) joined with a SINGLE newline; the first
    line gets the marker (``- `` for ul, ``{k}. `` for ol, k counting
    li children from 1, ``start`` ignored), every other line is
    indented by ``len(marker)`` spaces, except lines that are empty
    stay empty.  An li with no content is dropped; a list with no
    items emits no block.
  - ``pre`` -> a fenced code block over the *raw* subtree text (SKIP
    excision only, no whitespace normalization) with leading and
    trailing newlines stripped (``.strip("\\n")``); content that is
    pure whitespace emits no block.  The fence is ```` ``` ````,
    extended by one backtick while the fence appears in the content.
  - ``blockquote`` -> child blocks joined with a blank line, then
    every line prefixed with ``"> "`` and right-stripped.
  - ``table`` -> a GitHub pipe table.  Rows are the ``tr`` elements
    that are direct children of the table or of its direct
    ``thead``/``tbody``/``tfoot`` children; cells are each row's
    direct ``td``/``th`` children, rendered as inline content with
    every ``|`` then escaped as ``\\|``.  Column count is the maximum
    cell count over rows; short rows pad with empty cells.  The first
    row is the header; a separator row of ``---`` per column follows
    it.  Line shape: ``| c1 | c2 |``.  A table with no rows emits no
    block; ``caption`` content is dropped.
  - ``hr`` -> ``---``.
  - every other block tag (p, div, section, li-outside-lists, dt, dd,
    td-outside-tables, ...) is a transparent CONTAINER: its text and
    inline children accumulate into implicit paragraph runs, flushed
    (whitespace-normalized; empty runs dropped) whenever a block child
    starts, and its block children render recursively.
* Document result: the container rendering of the root, blocks joined
  with ``"\\n\\n"``.  No trailing newline.
* ``status``: ``ok`` | ``empty`` (null/zero-byte html) | ``error``
  (parse or render raised, incl. RecursionError on pathological
  nesting); non-ok rows carry a null ``markdown``.

Scale shape: one actor-pool ``map_batches`` stage (per-document DOM
work is inherently Python — the same envelope as ``ExtractDocs``);
html bytes are dropped in-stage, so only (url, markdown, status) rows
ever reach an exchange or sink.
"""

from __future__ import annotations

import pyarrow as pa

from .dom import SKIP_SUBTREE, parse_html

__all__ = [
    "INLINE_TAGS",
    "to_markdown",
    "markdown_of",
    "ExtractMarkdown",
    "extract_markdown",
]

# Frozen inline set.  Everything else (and every unknown tag) is a
# block container.
INLINE_TAGS = frozenset(
    (
        "a abbr b bdi bdo big br cite code data del dfn em font i img ins "
        "kbd mark q rt ruby s samp small span strike strong sub sup time "
        "tt u var wbr"
    ).split()
)

_HEADINGS = {f"h{i}": i for i in range(1, 7)}
_CODE_TAGS = frozenset("code kbd samp var".split())
_ASCII_WS = " \t\n\r\f"


def _localname(tag: str) -> str:
    if tag.startswith("{"):
        return tag.rsplit("}", 1)[1]
    return tag


def _ws_norm(s: str) -> str:
    return " ".join(s.split())


def _raw_text(node) -> str:
    """Unnormalized subtree text under SKIP excision (for ``pre``)."""
    parts: list[str] = []
    stack = [node]
    while stack:
        item = stack.pop()
        if isinstance(item, str):
            parts.append(item)
            continue
        if _localname(item.tag) in SKIP_SUBTREE:
            continue
        if item.text:
            parts.append(item.text)
        for c in reversed(item.children):
            if c.tail:
                stack.append(c.tail)
            stack.append(c)
    return "".join(parts)


def _inline_children(node, parts: list) -> None:
    if node.text:
        parts.append(node.text)
    for c in node.children:
        _inline_node(c, parts)
        if c.tail:
            parts.append(c.tail)


def _inline_str(node) -> str:
    parts: list = []
    _inline_children(node, parts)
    return _ws_norm("".join(parts))


def _inline_node(n, parts: list) -> None:
    local = _localname(n.tag)
    if local in SKIP_SUBTREE:
        return
    if local == "br":
        parts.append(" ")
        return
    if local == "img":
        src = n.attrs.get("src", "").strip(_ASCII_WS)
        if src:
            alt = _ws_norm(n.attrs.get("alt", ""))
            parts.append(f"![{alt}]({src})")
        return
    if local == "a":
        inner = _inline_str(n)
        if not inner:
            return
        href = n.attrs.get("href", "").strip(_ASCII_WS)
        parts.append(f"[{inner}]({href})" if href else inner)
        return
    if local in ("strong", "b"):
        inner = _inline_str(n)
        if inner:
            parts.append(f"**{inner}**")
        return
    if local in ("em", "i"):
        inner = _inline_str(n)
        if inner:
            parts.append(f"*{inner}*")
        return
    if local in _CODE_TAGS:
        inner = _ws_norm(_raw_text(n))
        if inner:
            parts.append(f"`` {inner} ``" if "`" in inner else f"`{inner}`")
        return
    # transparent inline (span, u, q, time, ...)
    _inline_children(n, parts)


def _container_blocks(node) -> list:
    """The transparent-container rule: implicit paragraph runs +
    recursive block children."""
    blocks: list = []
    run: list = []

    def flush() -> None:
        s = _ws_norm("".join(run))
        run.clear()
        if s:
            blocks.append(s)

    if node.text:
        run.append(node.text)
    for c in node.children:
        local = _localname(c.tag)
        if local in SKIP_SUBTREE:
            pass
        elif local in INLINE_TAGS:
            _inline_node(c, run)
        else:
            flush()
            blocks.extend(_block_node(c))
        if c.tail:
            run.append(c.tail)
    flush()
    return blocks


def _list_block(node, ordered: bool) -> list:
    lines: list = []
    k = 0
    for c in node.children:
        if _localname(c.tag) != "li":
            continue
        k += 1
        inner = _container_blocks(c)
        if not inner:
            continue
        marker = f"{k}. " if ordered else "- "
        indent = " " * len(marker)
        item_lines = "\n".join(inner).split("\n")
        lines.append(marker + item_lines[0])
        lines.extend(indent + l if l else l for l in item_lines[1:])
    return ["\n".join(lines)] if lines else []


def _table_block(node) -> list:
    rows: list = []
    for c in node.children:
        local = _localname(c.tag)
        if local == "tr":
            rows.append(c)
        elif local in ("thead", "tbody", "tfoot"):
            rows.extend(g for g in c.children if _localname(g.tag) == "tr")
    if not rows:
        return []
    cells = [
        [
            _inline_str(cell).replace("|", "\\|")
            for cell in tr.children
            if _localname(cell.tag) in ("td", "th")
        ]
        for tr in rows
    ]
    ncols = max(len(r) for r in cells)
    if ncols == 0:
        return []
    lines = []
    for i, r in enumerate(cells):
        r = r + [""] * (ncols - len(r))
        lines.append("| " + " | ".join(r) + " |")
        if i == 0:
            lines.append("| " + " | ".join(["---"] * ncols) + " |")
    return ["\n".join(lines)]


def _block_node(n) -> list:
    local = _localname(n.tag)
    level = _HEADINGS.get(local)
    if level is not None:
        inner = _inline_str(n)
        return [f"{'#' * level} {inner}"] if inner else []
    if local in ("ul", "ol"):
        return _list_block(n, ordered=local == "ol")
    if local == "pre":
        raw = _raw_text(n).strip("\n")
        if not raw.strip():
            return []
        fence = "```"
        while fence in raw:
            fence += "`"
        return [f"{fence}\n{raw}\n{fence}"]
    if local == "blockquote":
        inner = _container_blocks(n)
        if not inner:
            return []
        lines = [("> " + l).rstrip() for l in "\n\n".join(inner).split("\n")]
        return ["\n".join(lines)]
    if local == "table":
        return _table_block(n)
    if local == "hr":
        return ["---"]
    return _container_blocks(n)


def markdown_of(root) -> str:
    """Markdown string for a parsed tree under the frozen policy."""
    return "\n\n".join(_container_blocks(root))


def to_markdown(html) -> dict:
    """Per-document kernel: ``{"markdown": str|None, "status": str}``."""
    if html is None or len(html) == 0:
        return {"markdown": None, "status": "empty"}
    try:
        root = parse_html(html)
        return {"markdown": markdown_of(root), "status": "ok"}
    except Exception:  # incl. RecursionError on pathological nesting
        return {"markdown": None, "status": "error"}


class ExtractMarkdown:
    """Actor-pool stage: ``(url, html, ...)`` ->
    ``(url, markdown, status)`` rows."""

    def __init__(self):
        self._kernel = to_markdown  # warm per-actor handle

    def __call__(self, batch: pa.Table) -> pa.Table:
        kernel = self._kernel
        urls = batch["url"].to_pylist()
        rows = [kernel(h) for h in batch["html"].to_pylist()]
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "markdown": pa.array([r["markdown"] for r in rows], pa.string()),
            "status": pa.array([r["status"] for r in rows], pa.string()),
        })


def extract_markdown(ds, *, batch_size: int = 64, concurrency=(1, 8)):
    """Markdown rows for every page: zero-exchange narrow output
    (html is pruned to the stage and dropped inside it)."""
    return ds.select_columns(["url", "html"]).map_batches(
        ExtractMarkdown, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )
