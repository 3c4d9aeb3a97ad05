"""Independent naive oracle for HTML head-metadata extraction.

Deliberately different mechanism end-to-end from ``rayxt/metadata.py``:
a source-order regex tag scanner (comments excised up front, attributes
parsed by a quoting-aware regex with first-wins duplicates, title inner
HTML tag-stripped then entity-unescaped) instead of the engine's DOM
walk, and ``urllib.parse.urljoin`` instead of the engine's from-scratch
RFC 3986 resolver.  It restates the frozen policy from the spec text in
``rayxt/metadata.py``'s module docstring — never from the engine code.
Goldens are generated from THIS module only.
"""

from __future__ import annotations

import re
from html import unescape
from urllib.parse import urljoin

_WS = " \t\n\r\f"
_COMMENT = re.compile(r"<!--.*?-->", re.S)
_HEADTAG = re.compile(r"<(title|meta|link|base|html|time)\b([^>]*)>", re.I)
_CLOSE_TITLE = re.compile(r"</title\s*>", re.I)
_INNER_TAG = re.compile(r"<[^>]*>")
_ATTR = re.compile(
    r"""([A-Za-z][A-Za-z0-9_-]*)\s*(?:=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]*)))?"""
)

TITLE_MAX_CHARS = 300
META_MAX_CHARS = 500

FIELDS = (
    "title", "meta_description", "meta_keywords", "meta_robots",
    "og_title", "og_description", "og_image", "canonical", "html_lang",
    "published_time",
)

_NAME_KEYS = {"description": "meta_description",
              "keywords": "meta_keywords", "robots": "meta_robots"}
_OG_KEYS = {"og:title": "og_title", "og:description": "og_description",
            "og:image": "og_image",
            "article:published_time": "published_time"}


def _attrs_of(raw: str) -> dict:
    out: dict = {}
    for m in _ATTR.finditer(raw):
        name = m.group(1).lower()
        if name in out:
            continue  # first-wins
        val = m.group(2)
        if val is None:
            val = m.group(3)
        if val is None:
            val = m.group(4)
        out[name] = unescape(val) if val else ""
    return out


def _has_attr(raw: str, name: str) -> bool:
    return any(m.group(1).lower() == name for m in _ATTR.finditer(raw))


def _is_http(u: str) -> bool:
    return u.startswith("http://") or u.startswith("https://")


def _norm(s: str, cap: int) -> str:
    return " ".join(s.split())[:cap]


def oracle_metadata(url: str, html) -> dict:
    out: dict = {k: None for k in FIELDS}
    if html is None or len(html) == 0:
        out["status"] = "empty"
        return out
    out["status"] = "ok"
    text = html.decode("utf-8", "replace") if isinstance(html, bytes) \
        else html
    text = _COMMENT.sub("", text)
    # document base: the FIRST <base href>, resolved against the page
    # url, http(s)-only
    base = url
    for m in _HEADTAG.finditer(text):
        if m.group(1).lower() == "base":
            a = _attrs_of(m.group(2))
            if "href" in a:
                cand = urljoin(url, a["href"].strip(_WS))
                if _is_http(cand):
                    base = cand
            break
    claimed: set = set()
    for m in _HEADTAG.finditer(text):
        tag = m.group(1).lower()
        raw = m.group(2)
        if tag == "html" and "html_lang" not in claimed:
            claimed.add("html_lang")
            a = _attrs_of(raw)
            lang = a.get("lang", "").strip(_WS).lower()
            out["html_lang"] = lang or None
        elif tag == "title" and "title" not in claimed:
            claimed.add("title")
            close = _CLOSE_TITLE.search(text, m.end())
            inner = text[m.end(): close.start()] if close else text[m.end():]
            t = _norm(unescape(_INNER_TAG.sub("", inner)),
                      TITLE_MAX_CHARS)
            out["title"] = t or None
        elif tag == "meta":
            if not _has_attr(raw, "content"):
                continue
            a = _attrs_of(raw)
            field = _NAME_KEYS.get(a.get("name", "").strip(_WS).lower())
            if field is None:
                prop = a.get("property", "").strip(_WS).lower()
                field = _OG_KEYS.get(prop)
                if field is None and not _has_attr(raw, "property"):
                    field = _OG_KEYS.get(a.get("name", "").strip(_WS).lower())
            if field is None or field in claimed:
                continue
            claimed.add(field)
            content = a["content"]
            if field == "og_image":
                cand = urljoin(base, content.strip(_WS))
                out[field] = cand if _is_http(cand) else None
            else:
                out[field] = _norm(content, META_MAX_CHARS) or None
        elif tag == "time" and "published_time" not in claimed:
            if not _has_attr(raw, "datetime"):
                continue
            claimed.add("published_time")
            a = _attrs_of(raw)
            out["published_time"] = \
                _norm(a.get("datetime", ""), META_MAX_CHARS) or None
        elif tag == "link" and "canonical" not in claimed:
            a = _attrs_of(raw)
            rel = a.get("rel", "").lower().split()
            if "canonical" not in rel or not _has_attr(raw, "href"):
                continue
            claimed.add("canonical")
            cand = urljoin(base, a["href"].strip(_WS))
            out["canonical"] = cand if _is_http(cand) else None
    return out
