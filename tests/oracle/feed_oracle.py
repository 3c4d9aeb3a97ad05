"""Independent naive oracle for RSS/Atom feed parsing.

Deliberately a different parser from ``rayxt/feeds.py`` (which walks
ElementTree): this oracle parses with stdlib ``xml.dom.minidom``
(expat DOM — a separate codebase and node model) and selects fields by
walking DIRECT child nodes by localName, per the frozen "direct
children only" policy.  An earlier regex-block restatement matched
NESTED descendants (``<source><link>…`` inside an item) and diverged
from the policy; the DOM walk enforces it structurally.  Restates the
frozen policy from the ``rayxt/feeds.py`` docstring — never the
engine code.
"""

from __future__ import annotations

from xml.dom.minidom import parseString

from tests.oracle.sitemap_oracle import _payload


def _local(node) -> str:
    return node.localName or ""


def _children(node, name: str):
    return [c for c in node.childNodes
            if c.nodeType == c.ELEMENT_NODE and _local(c) == name]


def _direct_text(el) -> str:
    """The element's own text nodes only (markup children contribute
    nothing — the ET ``.text`` analogue is text BEFORE the first child,
    but the policy only ever reads elements whose direct text is the
    whole content; for markup-only elements both yield empty)."""
    parts = []
    for c in el.childNodes:
        if c.nodeType in (c.TEXT_NODE, c.CDATA_SECTION_NODE):
            parts.append(c.data)
        else:
            break  # ET .text stops at the first child element
    return "".join(parts)


def _first_field(entry, name: str):
    kids = _children(entry, name)
    if not kids:
        return None
    return _direct_text(kids[0]).strip() or None


def _rss_link_of(item):
    for link in _children(item, "link"):
        text = _direct_text(link).strip()
        if text:
            return text
    return None


def _atom_link_of(entry):
    for link in _children(entry, "link"):
        rel = link.getAttribute("rel") if link.hasAttribute("rel") \
            else None
        if rel is None or rel == "alternate":
            href = (link.getAttribute("href") or "").strip()
            return href or None
    return None


def oracle_parse_feed(body, *, max_entries: int = 10_000):
    """(kind, [(title, link, entry_id, published), ...]) — the frozen
    policy restated."""
    if body is None:
        return "invalid", []
    try:
        payload = _payload(body)
    except Exception:
        return "invalid", []
    try:
        doc = parseString(payload)
    except Exception:
        return "invalid", []
    root = doc.documentElement
    if _local(root) == "rss":
        kind = "rss"
        channels = _children(root, "channel")
        items = _children(channels[0], "item") if channels else []
    elif _local(root) == "feed":
        kind = "atom"
        items = _children(root, "entry")
    else:
        return "invalid", []
    entries = []
    for item in items[:max_entries]:
        if kind == "rss":
            link = _rss_link_of(item)
            entry_id = _first_field(item, "guid")
            published = _first_field(item, "pubDate")
        else:
            link = _atom_link_of(item)
            entry_id = _first_field(item, "id")
            published = (_first_field(item, "published")
                         or _first_field(item, "updated"))
        if not link or not link.lower().startswith(
                ("http://", "https://")):
            continue
        entries.append((_first_field(item, "title"), link, entry_id,
                        published))
    return kind, entries
