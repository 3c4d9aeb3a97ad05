"""Independent naive oracle for sitemap parsing and robots.txt
directive extraction.

Deliberately different mechanism from ``rayxt/sitemaps.py`` /
``rayxt/robots.py``: documents are scanned with REGULAR EXPRESSIONS
over the decoded text (entry blocks by a namespace-prefix-tolerant
block regex, fields by per-field child regexes, XML entities decoded
by an explicit 5-entity + charref table), never with an XML parser —
except for VALIDITY, which reuses stdlib minidom (a different parser
from the engine's ElementTree).  Directive extraction walks lines with
``re`` groups and collects sitemaps via one file-wide ``findall``.
Both restate the frozen policies from the engine module docstrings —
never the engine code.  Goldens are generated from THIS module only.
"""

from __future__ import annotations

import gzip
import re

_ENT = {"amp": "&", "lt": "<", "gt": ">", "apos": "'", "quot": '"'}


def _unxml(s: str) -> str:
    def sub(m):
        body = m.group(1)
        if body.startswith("#x") or body.startswith("#X"):
            return chr(int(body[2:], 16))
        if body.startswith("#"):
            return chr(int(body[1:]))
        return _ENT.get(body, m.group(0))

    return re.sub(r"&(#?[xX]?[0-9a-zA-Z]+);", sub, s)


def _payload(body):
    if isinstance(body, str):
        body = body.encode("utf-8")
    if body[:2] == b"\x1f\x8b":
        body = gzip.decompress(body)  # caller guards invalid gzip
    return body


def _is_wellformed(body: bytes) -> bool:
    from xml.dom.minidom import parseString

    try:
        parseString(body)
        return True
    except Exception:
        return False


_ROOT = re.compile(r"<\s*(?:[\w.-]+:)?([\w.-]+)[\s>/]")


def _field(block: str, name: str):
    m = re.search(
        rf"<(?:[\w.-]+:)?{name}\b[^>]*>(.*?)</(?:[\w.-]+:)?{name}\s*>",
        block, re.S)
    if m is None:
        return None
    return _unxml(m.group(1))


def oracle_parse_sitemap(body, max_entries: int = 50_000):
    """``(kind, [(loc, lastmod, changefreq, priority), ...])`` — the
    regex restatement of the frozen policy."""
    if body is None:
        return "invalid", []
    try:
        payload = _payload(body)
    except Exception:
        return "invalid", []
    if not _is_wellformed(payload):
        return "invalid", []
    text = payload.decode("utf-8", "replace")
    if text.startswith("﻿"):
        text = text[1:]
    # skip the XML declaration before sniffing the root element
    root_m = _ROOT.search(re.sub(r"<\?.*?\?>", "", text, flags=re.S))
    root = root_m.group(1) if root_m else ""
    if root == "urlset":
        entry_name, kind = "url", "url"
    elif root == "sitemapindex":
        entry_name, kind = "sitemap", "sitemap"
    else:
        return "invalid", []
    blocks = re.findall(
        rf"<(?:[\w.-]+:)?{entry_name}\s*>(.*?)</(?:[\w.-]+:)?{entry_name}\s*>",
        text, re.S)
    out = []
    for block in blocks[:max_entries]:
        loc = _field(block, "loc")
        loc = loc.strip() if loc else ""
        if not loc or not re.match(r"(?i)https?://", loc):
            continue
        lastmod = _field(block, "lastmod")
        lastmod = (lastmod or "").strip() or None
        if kind == "url":
            freq = (_field(block, "changefreq") or "").strip().lower() or None
            ptxt = (_field(block, "priority") or "").strip()
            try:
                prio = float(ptxt) if ptxt else None
            except ValueError:
                prio = None
        else:
            freq = prio = None
        out.append((loc, lastmod, freq, prio))
    return kind, out


# --- robots.txt directives ------------------------------------------------

_DIRECTIVE = re.compile(
    r"^\s*(user-agent|allow|disallow|crawl-delay|sitemap)\s*:\s*(.*?)\s*$",
    re.I)


def _lines(body):
    if isinstance(body, bytes):
        body = body.decode("utf-8", "replace")
    if body.startswith("﻿"):
        body = body[1:]
    return [re.sub(r"#.*", "", ln) for ln in re.split(r"\r\n|\r|\n", body)]


def oracle_directives(body, agent: str):
    """``(crawl_delay, [sitemap_url, ...])`` — regex restatement."""
    if body is None:
        return None, []
    sitemaps, seen = [], set()
    groups = []
    uas: list = []
    members: list = []
    in_body = False
    for ln in _lines(body):
        m = _DIRECTIVE.match(ln)
        if m is None:
            continue
        key, value = m.group(1).lower(), m.group(2)
        if key == "sitemap":
            if (value and re.match(r"(?i)https?://", value)
                    and value not in seen):
                seen.add(value)
                sitemaps.append(value)
        elif key == "user-agent":
            if in_body:
                groups.append((set(uas), members))
                uas, members, in_body = [], [], False
            uas.append(value.lower())
        else:  # allow / disallow / crawl-delay
            if not uas:
                continue
            in_body = True
            if key == "crawl-delay" and value:
                members.append(value)
    if uas:
        groups.append((set(uas), members))

    token = agent.lower()
    specific = [len(ua) for g_uas, _ in groups for ua in g_uas
                if ua != "*" and token.startswith(ua)]
    want = max(specific) if specific else None
    delay = None
    for g_uas, delays in groups:
        if want is not None:
            picked = any(ua != "*" and len(ua) == want
                         and token.startswith(ua) for ua in g_uas)
        else:
            picked = "*" in g_uas
        if not picked:
            continue
        for v in delays:
            if re.fullmatch(r"\+?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", v):
                delay = float(v)
                break
        if delay is not None:
            break
    return delay, sitemaps
