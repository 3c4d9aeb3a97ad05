"""XML sitemap parsing (sitemaps.org protocol) — the crawl-frontier
companion to :mod:`rayxt.robots`: a fetch corpus discovers sitemap URLs
from robots.txt ``Sitemap:`` directives and expands them into the
per-host URL universe a recrawl prioritizes.

SURVEY §2 parity note: like :mod:`rayxt.metadata`, this is an
LLM-pipeline operator layered on the engine, not a reference primitive.

Frozen parsing policy (the independent oracle in
``tests/oracle/sitemap_oracle.py`` restates it from this spec text —
never from the code):

* body bytes whose first two octets are the gzip magic ``1f 8b`` are
  gunzipped first; a broken gzip stream makes the document invalid.
* the payload is parsed as XML; any parse error makes the document
  invalid.  An invalid document yields exactly ONE row with
  ``kind='invalid'`` and null entry fields.
* element names are compared by LOCAL name (any or no namespace),
  case-sensitively, lowercase per the protocol.
* a root ``urlset`` yields one row per ``url`` child (``kind='url'``);
  a root ``sitemapindex`` yields one row per ``sitemap`` child
  (``kind='sitemap'``); any other root is invalid.  A valid document
  with no entries yields zero rows.
* per entry, reading the DIRECT text of the entry's FIRST child with
  each local name (XML predefined entities and numeric character
  references decode; no CDATA in scope):
  - ``loc``: ASCII-stripped; the entry is SKIPPED when loc is missing,
    empty after stripping, or does not start with ``http://`` /
    ``https://`` (case-insensitive).
  - ``lastmod``: ASCII-stripped raw string (W3C datetime variants are
    data, not parsed); empty -> null.
  - ``changefreq`` (urlset only): ASCII-stripped and lowercased;
    empty -> null.
  - ``priority`` (urlset only): ``float()`` of the stripped text;
    missing or unparsable -> null.
* entries are emitted in document order, capped at ``max_entries``
  (protocol limit 50,000) per document — entries beyond the cap are
  dropped, counted against the cap BEFORE loc validation skips.

Scale shape: one stateless ``map_batches`` stage — sitemap documents
are per-HOST artifacts (orders of magnitude fewer and smaller than the
page corpus); bodies are dropped in-stage so only the narrow entry
rows reach an exchange or sink.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET

import pyarrow as pa

__all__ = [
    "MAX_ENTRIES",
    "parse_sitemap",
    "parse_sitemaps",
]

MAX_ENTRIES = 50_000

_GZIP_MAGIC = b"\x1f\x8b"

#: root local name -> (entry local name, kind)
_ROOTS = {"urlset": ("url", "url"), "sitemapindex": ("sitemap", "sitemap")}


def _local(tag) -> str:
    if not isinstance(tag, str):  # comments / PIs
        return ""
    return tag.rsplit("}", 1)[-1]


def _child_text(entry, name: str):
    for child in entry:
        if _local(child.tag) == name:
            return child.text
    return None


def parse_sitemap(body, *, max_entries: int = MAX_ENTRIES):
    """``(kind, entries)`` for one sitemap document body.

    ``kind`` is ``'url'`` / ``'sitemap'`` / ``'invalid'``; ``entries``
    is ``[(loc, lastmod, changefreq, priority), ...]`` (empty for
    invalid documents — the caller emits the invalid sentinel row).
    """
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
    spec = _ROOTS.get(_local(root.tag))
    if spec is None:
        return "invalid", []
    entry_name, kind = spec
    entries = []
    seen = 0
    for child in root:
        if _local(child.tag) != entry_name:
            continue
        if seen >= max_entries:
            break
        seen += 1
        loc = _child_text(child, "loc")
        loc = loc.strip() if loc else ""
        if not loc or not loc.lower().startswith(("http://", "https://")):
            continue
        lastmod = _child_text(child, "lastmod")
        lastmod = (lastmod or "").strip() or None
        if kind == "url":
            changefreq = _child_text(child, "changefreq")
            changefreq = (changefreq or "").strip().lower() or None
            prio_text = (_child_text(child, "priority") or "").strip()
            try:
                priority = float(prio_text) if prio_text else None
            except ValueError:
                priority = None
        else:
            changefreq = priority = None
        entries.append((loc, lastmod, changefreq, priority))
    return kind, entries


_OUT_SCHEMA = pa.schema([
    ("sitemap_url", pa.string()),
    ("kind", pa.string()),
    ("loc", pa.string()),
    ("lastmod", pa.string()),
    ("changefreq", pa.string()),
    ("priority", pa.float64()),
])


def _parse_batch(batch: pa.Table, url_col: str, body_col: str,
                 max_entries: int) -> pa.Table:
    urls, kinds, locs, lastmods, freqs, prios = [], [], [], [], [], []
    for src, body in zip(batch[url_col].to_pylist(),
                         batch[body_col].to_pylist()):
        kind, entries = parse_sitemap(body, max_entries=max_entries)
        if kind == "invalid":
            urls.append(src)
            kinds.append("invalid")
            locs.append(None)
            lastmods.append(None)
            freqs.append(None)
            prios.append(None)
            continue
        for loc, lastmod, changefreq, priority in entries:
            urls.append(src)
            kinds.append(kind)
            locs.append(loc)
            lastmods.append(lastmod)
            freqs.append(changefreq)
            prios.append(priority)
    return pa.table({
        "sitemap_url": pa.array(urls, pa.string()),
        "kind": pa.array(kinds, pa.string()),
        "loc": pa.array(locs, pa.string()),
        "lastmod": pa.array(lastmods, pa.string()),
        "changefreq": pa.array(freqs, pa.string()),
        "priority": pa.array(prios, pa.float64()),
    }, schema=_OUT_SCHEMA)


def parse_sitemaps(ds, *, url_col: str = "sitemap_url",
                   body_col: str = "body",
                   max_entries: int = MAX_ENTRIES):
    """Dataset of sitemap documents ``(url_col, body_col)`` -> one row
    per entry ``(sitemap_url, kind, loc, lastmod, changefreq,
    priority)`` — stateless, zero exchanges; bodies die in-stage."""
    return ds.map_batches(
        lambda t: _parse_batch(t, url_col, body_col, max_entries),
        batch_format="pyarrow",
    )
