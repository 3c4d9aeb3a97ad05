"""Independent naive oracle for HTML -> Markdown conversion.

Restates the FROZEN MARKDOWN POLICY from the spec text in
``rayxt/markdown.py``'s module docstring — never from its code — with
a deliberately different mechanism: a two-pass design that first
compiles the DOM into a typed intermediate representation (nested
tagged tuples for blocks and inline pieces) and then serializes the IR
in a separate pass, instead of the engine's single-pass string
emission during the tree walk.  The DOM itself is the shared frozen
substrate (``rayxt/dom.py``, SURVEY §7.4) so parser quirks cancel out
and disagreements are about the markdown policy only.

Goldens are generated from THIS module only
(``fixtures/make_markdown_golden.py``), never from the engine.
"""

from __future__ import annotations

from rayxt.dom import SKIP_SUBTREE, parse_html

_INLINE = frozenset(
    (
        "a abbr b bdi bdo big br cite code data del dfn em font i img ins "
        "kbd mark q rt ruby s samp small span strike strong sub sup time "
        "tt u var wbr"
    ).split()
)
_CODE = frozenset("code kbd samp var".split())
_HEAD = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_AWS = " \t\n\r\f"


def _local(tag):
    return tag.rsplit("}", 1)[1] if tag.startswith("{") else tag


# ---------------------------------------------------------------------------
# pass 1: DOM -> IR
#
# inline IR items: ("raw", s) | ("link", [items], href) |
#   ("strong", [items]) | ("em", [items]) | ("code", s) |
#   ("img", alt, src) | ("brk",)
# block IR items: ("heading", n, [items]) | ("para", [items]) |
#   ("list", ordered, [[blocks], ...]) | ("fence", s) |
#   ("quote", [blocks]) | ("table", [[[items], ...], ...]) | ("rule",)
# ---------------------------------------------------------------------------

def _plain(node):
    """Raw subtree text, SKIP excision only (code spans / pre)."""
    out = []

    def walk(n):
        if _local(n.tag) in SKIP_SUBTREE:
            return
        if n.text:
            out.append(n.text)
        for c in n.children:
            walk(c)
            if c.tail:
                out.append(c.tail)

    walk(node)
    return "".join(out)


def _inline_ir(node):
    """Inline IR items for node's children (text + inline elements)."""
    items = []
    if node.text:
        items.append(("raw", node.text))
    for c in node.children:
        items.extend(_inline_item(c))
        if c.tail:
            items.append(("raw", c.tail))
    return items


def _inline_item(n):
    local = _local(n.tag)
    if local in SKIP_SUBTREE:
        return []
    if local == "br":
        return [("brk",)]
    if local == "img":
        src = n.attrs.get("src", "").strip(_AWS)
        if not src:
            return []
        return [("img", n.attrs.get("alt", ""), src)]
    if local == "a":
        return [("link", _inline_ir(n), n.attrs.get("href", "").strip(_AWS))]
    if local in ("strong", "b"):
        return [("strong", _inline_ir(n))]
    if local in ("em", "i"):
        return [("em", _inline_ir(n))]
    if local in _CODE:
        return [("code", _plain(n))]
    return _inline_ir(n)  # transparent inline


def _block_ir(container):
    """Block IR for a transparent container (implicit-paragraph rule)."""
    blocks = []
    pending = []

    def cut():
        if pending:
            blocks.append(("para", list(pending)))
            pending.clear()

    if container.text:
        pending.append(("raw", container.text))
    for c in container.children:
        local = _local(c.tag)
        if local in SKIP_SUBTREE:
            pass
        elif local in _INLINE:
            pending.extend(_inline_item(c))
        else:
            cut()
            blocks.extend(_block_item(c, local))
        if c.tail:
            pending.append(("raw", c.tail))
    cut()
    return blocks


def _block_item(n, local):
    lvl = _HEAD.get(local)
    if lvl:
        return [("heading", lvl, _inline_ir(n))]
    if local in ("ul", "ol"):
        items = [_block_ir(c) for c in n.children if _local(c.tag) == "li"]
        return [("list", local == "ol", items)]
    if local == "pre":
        return [("fence", _plain(n))]
    if local == "blockquote":
        return [("quote", _block_ir(n))]
    if local == "table":
        trs = []
        for c in n.children:
            cl = _local(c.tag)
            if cl == "tr":
                trs.append(c)
            elif cl in ("thead", "tbody", "tfoot"):
                trs.extend(g for g in c.children if _local(g.tag) == "tr")
        rows = [
            [_inline_ir(cell) for cell in tr.children
             if _local(cell.tag) in ("td", "th")]
            for tr in trs
        ]
        return [("table", rows)]
    if local == "hr":
        return [("rule",)]
    return _block_ir(n)  # transparent container


# ---------------------------------------------------------------------------
# pass 2: IR -> strings
# ---------------------------------------------------------------------------

def _norm(s):
    return " ".join(s.split())


def _ser_inline(items):
    buf = []
    for it in items:
        kind = it[0]
        if kind == "raw":
            buf.append(it[1])
        elif kind == "brk":
            buf.append(" ")
        elif kind == "img":
            buf.append("![%s](%s)" % (_norm(it[1]), it[2]))
        elif kind == "link":
            inner = _ser_inline(it[1])
            if inner:
                buf.append("[%s](%s)" % (inner, it[2]) if it[2] else inner)
        elif kind == "strong":
            inner = _ser_inline(it[1])
            if inner:
                buf.append("**%s**" % inner)
        elif kind == "em":
            inner = _ser_inline(it[1])
            if inner:
                buf.append("*%s*" % inner)
        elif kind == "code":
            inner = _norm(it[1])
            if inner:
                if "`" in inner:
                    buf.append("`` %s ``" % inner)
                else:
                    buf.append("`%s`" % inner)
    return _norm("".join(buf))


def _ser_block(b):
    """One IR block -> rendered string, or None when it emits nothing."""
    kind = b[0]
    if kind == "para":
        return _ser_inline(b[1]) or None
    if kind == "heading":
        inner = _ser_inline(b[2])
        return "%s %s" % ("#" * b[1], inner) if inner else None
    if kind == "rule":
        return "---"
    if kind == "fence":
        body = b[1].strip("\n")
        if not body.strip():
            return None
        fence = "```"
        while fence in body:
            fence += "`"
        return "%s\n%s\n%s" % (fence, body, fence)
    if kind == "quote":
        inner = _ser_blocks(b[1])
        if not inner:
            return None
        return "\n".join(
            ("> " + ln).rstrip() for ln in "\n\n".join(inner).split("\n"))
    if kind == "list":
        ordered, items = b[1], b[2]
        out = []
        for k, item_blocks in enumerate(items, 1):
            body = _ser_blocks(item_blocks)
            if not body:
                continue
            marker = "%d. " % k if ordered else "- "
            pad = " " * len(marker)
            lines = "\n".join(body).split("\n")
            out.append(marker + lines[0])
            out.extend((pad + ln) if ln else ln for ln in lines[1:])
        return "\n".join(out) if out else None
    if kind == "table":
        rows = [[_ser_inline(cell).replace("|", "\\|") for cell in row]
                for row in b[1]]
        if not rows:
            return None
        width = max(len(r) for r in rows)
        if width == 0:
            return None
        out = []
        for i, r in enumerate(rows):
            padded = r + [""] * (width - len(r))
            out.append("| " + " | ".join(padded) + " |")
            if i == 0:
                out.append("| " + " | ".join(["---"] * width) + " |")
        return "\n".join(out)
    raise AssertionError("unknown IR block %r" % (kind,))


def _ser_blocks(blocks):
    out = []
    for b in blocks:
        s = _ser_block(b)
        if s is not None:
            out.append(s)
    return out


def oracle_markdown(html):
    """``{"markdown": str|None, "status": str}`` under the frozen
    policy, restated via the IR pipeline above."""
    if html is None or len(html) == 0:
        return {"markdown": None, "status": "empty"}
    try:
        ir = _block_ir(parse_html(html))
        return {"markdown": "\n\n".join(_ser_blocks(ir)), "status": "ok"}
    except Exception:
        return {"markdown": None, "status": "error"}
