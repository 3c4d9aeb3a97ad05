"""RSS 2.0 / Atom 1.0 feed parsing — the syndication side of crawl
discovery, next to :mod:`rayxt.sitemaps`: feeds announce NEW documents
(with titles and publish dates) where sitemaps enumerate the full URL
universe, so a freshness-driven recrawl pipeline parses both.

SURVEY §2 parity note: like :mod:`rayxt.sitemaps`, an LLM-pipeline
operator layered on the engine, not a reference primitive.

Frozen parsing policy (the independent oracle in
``tests/oracle/feed_oracle.py`` restates it from this spec text with
regex block scanning + minidom validity — never from the code):

* body bytes whose first two octets are the gzip magic are gunzipped
  first; a broken gzip stream makes the document invalid.
* the payload is parsed as XML; any parse error makes the document
  invalid.  An invalid document yields exactly ONE row with
  ``kind='invalid'`` and null entry fields.
* element names compare by LOCAL name (any or no namespace prefix),
  case-sensitively.
* root ``rss`` -> ``kind='rss'``: entries are the ``item`` DIRECT
  children (document order) of the FIRST direct ``channel`` child; no
  channel -> a valid document with zero entries.  Root ``feed`` ->
  ``kind='atom'``: entries are the root's direct ``entry`` children.
  Any other root -> invalid (RSS 1.0 ``RDF`` is out of scope).
* per entry, reading DIRECT children only:
  - ``link``: RSS — the direct text of the FIRST ``link`` child whose
    text is non-empty after ASCII strip (a self-closing
    ``atom:link href=…/`` therefore never wins).  Atom — the ``href``
    attribute (ASCII-stripped) of the FIRST ``link`` child whose
    ``rel`` attribute is absent or equals ``alternate``.  The entry is
    SKIPPED when the resolved link is missing or does not start with
    ``http://`` / ``https://`` (case-insensitive).
  - ``title``: direct text of the FIRST ``title`` child, stripped;
    empty/missing -> null (rich Atom titles keep only the element's
    own text — markup children are not serialized).
  - ``entry_id``: RSS first ``guid`` text / Atom first ``id`` text,
    stripped; empty -> null.
  - ``published``: RSS first ``pubDate`` text; Atom first
    ``published`` text, else first ``updated`` text.  Stripped RAW
    string (RFC 822 / RFC 3339 variants are data, not parsed);
    empty -> null.
* entries emit in document order, capped at ``max_entries`` per
  document, counted BEFORE link validation skips.

Scale shape: one stateless ``map_batches`` stage — feed documents are
per-host artifacts, orders of magnitude smaller than the page corpus;
bodies die in-stage, only narrow entry rows reach an exchange.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET

import pyarrow as pa

__all__ = ["MAX_ENTRIES", "parse_feed", "parse_feeds"]

MAX_ENTRIES = 10_000

_GZIP_MAGIC = b"\x1f\x8b"


def _local(tag) -> str:
    if not isinstance(tag, str):  # comments / PIs
        return ""
    return tag.rsplit("}", 1)[-1]


def _first_text(entry, name: str):
    for child in entry:
        if _local(child.tag) == name:
            return (child.text or "").strip() or None
    return None


def _rss_link(item):
    for child in item:
        if _local(child.tag) == "link":
            text = (child.text or "").strip()
            if text:
                return text
    return None


def _atom_link(entry):
    for child in entry:
        if _local(child.tag) != "link":
            continue
        rel = child.attrib.get("rel")
        if rel is None or rel == "alternate":
            href = (child.attrib.get("href") or "").strip()
            return href or None
    return None


def parse_feed(body, *, max_entries: int = MAX_ENTRIES):
    """``(kind, entries)`` for one feed document body.

    ``kind`` is ``'rss'`` / ``'atom'`` / ``'invalid'``; ``entries`` is
    ``[(title, link, entry_id, published), ...]`` (empty for invalid
    documents — the caller emits the sentinel row)."""
    if body is None:
        return "invalid", []
    if isinstance(body, str):
        body = body.encode("utf-8")
    if body[:2] == _GZIP_MAGIC:
        try:
            body = gzip.decompress(body)
        except Exception:
            return "invalid", []
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return "invalid", []
    root_name = _local(root.tag)
    if root_name == "rss":
        kind = "rss"
        channel = next((c for c in root if _local(c.tag) == "channel"),
                       None)
        items = ([c for c in channel if _local(c.tag) == "item"]
                 if channel is not None else [])
    elif root_name == "feed":
        kind = "atom"
        items = [c for c in root if _local(c.tag) == "entry"]
    else:
        return "invalid", []
    entries = []
    for item in items[:max_entries]:
        if kind == "rss":
            link = _rss_link(item)
            entry_id = _first_text(item, "guid")
            published = _first_text(item, "pubDate")
        else:
            link = _atom_link(item)
            entry_id = _first_text(item, "id")
            published = (_first_text(item, "published")
                         or _first_text(item, "updated"))
        if not link or not link.lower().startswith(
                ("http://", "https://")):
            continue
        entries.append((_first_text(item, "title"), link, entry_id,
                        published))
    return kind, entries


_OUT_SCHEMA = pa.schema([
    ("feed_url", pa.string()),
    ("kind", pa.string()),
    ("title", pa.string()),
    ("link", pa.string()),
    ("entry_id", pa.string()),
    ("published", pa.string()),
])


def _parse_batch(batch: pa.Table, url_col: str, body_col: str,
                 max_entries: int) -> pa.Table:
    cols = {n: [] for n in _OUT_SCHEMA.names}
    for src, body in zip(batch[url_col].to_pylist(),
                         batch[body_col].to_pylist()):
        kind, entries = parse_feed(body, max_entries=max_entries)
        if kind == "invalid":
            for n, v in zip(_OUT_SCHEMA.names,
                            (src, "invalid", None, None, None, None)):
                cols[n].append(v)
            continue
        for title, link, entry_id, published in entries:
            for n, v in zip(_OUT_SCHEMA.names,
                            (src, kind, title, link, entry_id,
                             published)):
                cols[n].append(v)
    return pa.table(
        {n: pa.array(cols[n], _OUT_SCHEMA.field(n).type)
         for n in _OUT_SCHEMA.names}, schema=_OUT_SCHEMA)


def parse_feeds(ds, *, url_col: str = "feed_url",
                body_col: str = "body",
                max_entries: int = MAX_ENTRIES):
    """Dataset of feed documents ``(url_col, body_col)`` -> one row per
    entry ``(feed_url, kind, title, link, entry_id, published)`` —
    stateless, zero exchanges; bodies die in-stage."""
    return ds.map_batches(
        lambda t: _parse_batch(t, url_col, body_col, max_entries),
        batch_format="pyarrow",
    )
