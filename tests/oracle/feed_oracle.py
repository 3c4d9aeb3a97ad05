"""Independent naive oracle for RSS/Atom feed parsing.

Deliberately different mechanism from ``rayxt/feeds.py``: documents
are scanned with REGULAR EXPRESSIONS over the decoded text (channel /
item / entry blocks by prefix-tolerant block regexes, fields by
per-field child regexes that also match self-closing forms, XML
entities decoded by the sitemap oracle's explicit table), never with
an XML parser — except for VALIDITY, which reuses stdlib minidom (a
different parser from the engine's ElementTree).  Restates the frozen
policy from the ``rayxt/feeds.py`` docstring — never the engine code.
"""

from __future__ import annotations

import re

from tests.oracle.sitemap_oracle import _is_wellformed, _payload, _unxml

_ROOT = re.compile(r"<\s*(?:[\w.-]+:)?([\w.-]+)[\s>/]")


def _block(text: str, name: str):
    m = re.search(
        rf"<(?:[\w.-]+:)?{name}(?:\s[^>]*)?>(.*?)</(?:[\w.-]+:)?{name}\s*>",
        text, re.S)
    return m.group(1) if m else None


def _blocks(text: str, name: str):
    return re.findall(
        rf"<(?:[\w.-]+:)?{name}(?:\s[^>]*)?>(.*?)</(?:[\w.-]+:)?{name}\s*>",
        text, re.S)


def _first_field(block: str, name: str):
    """Direct text of the first ``name`` element (self-closing counts
    as empty), stripped + entity-decoded; empty -> None.  The
    attribute run is LAZY so a self-closing tag's ``/>`` wins before
    the ``>``-plus-content branch can swallow a following sibling."""
    m = re.search(
        rf"<(?:[\w.-]+:)?{name}(?:\s[^>]*?)?(?:/>|>(.*?)"
        rf"</(?:[\w.-]+:)?{name}\s*>)",
        block, re.S)
    if m is None or m.group(1) is None:
        return None
    # DIRECT text only: drop from the first nested tag on
    raw = m.group(1).split("<", 1)[0]
    return _unxml(raw).strip() or None


def _rss_link_of(block: str):
    """First link element with non-empty direct text."""
    for m in re.finditer(
            r"<(?:[\w.-]+:)?link(?:\s[^>]*?)?(?:/>|>(.*?)"
            r"</(?:[\w.-]+:)?link\s*>)", block, re.S):
        if m.group(1) is None:
            continue
        text = _unxml(m.group(1).split("<", 1)[0]).strip()
        if text:
            return text
    return None


_ATTR = re.compile(r"([\w:.-]+)\s*=\s*(\"[^\"]*\"|'[^']*')")


def _atom_link_of(block: str):
    """href of the first link whose rel is absent or 'alternate'."""
    for m in re.finditer(r"<(?:[\w.-]+:)?link\b([^>]*?)/?>", block):
        attrs = {k.rsplit(":", 1)[-1]: _unxml(v[1:-1])
                 for k, v in _ATTR.findall(m.group(1))}
        rel = attrs.get("rel")
        if rel is None or rel == "alternate":
            return attrs.get("href", "").strip() or None
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
    if not _is_wellformed(payload):
        return "invalid", []
    text = payload.decode("utf-8", "replace")
    if text and text[0] == "﻿":
        text = text[1:]
    m = _ROOT.search(re.sub(r"<\?.*?\?>|<!--.*?-->", "", text,
                            flags=re.S))
    root = m.group(1) if m else ""
    if root == "rss":
        kind = "rss"
        channel = _block(text, "channel")
        raw_items = _blocks(channel, "item") if channel else []
    elif root == "feed":
        kind = "atom"
        raw_items = _blocks(text, "entry")
    else:
        return "invalid", []
    entries = []
    for block in raw_items[:max_entries]:
        if kind == "rss":
            link = _rss_link_of(block)
            entry_id = _first_field(block, "guid")
            published = _first_field(block, "pubDate")
        else:
            link = _atom_link_of(block)
            entry_id = _first_field(block, "id")
            published = (_first_field(block, "published")
                         or _first_field(block, "updated"))
        if not link or not link.lower().startswith(
                ("http://", "https://")):
            continue
        entries.append((_first_field(block, "title"), link, entry_id,
                        published))
    return kind, entries
