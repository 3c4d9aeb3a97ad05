"""Independent naive oracle for outlink extraction and PageRank.

Deliberately different mechanism end-to-end from ``rayxt/linkgraph.py``:
a regex tag scanner (comments and script/style bodies excised up front,
attributes parsed by a quoting-aware regex with first-wins duplicates)
instead of the engine's DOM walk, ``urllib.parse.urljoin``/``urlsplit``
instead of the engine's from-scratch RFC 3986 resolver, and a dense
numpy power iteration instead of the engine's distributed
join+aggregate rounds.  Goldens are generated from THIS module only
(``fixtures/make_linkgraph_golden.py``), never from the engine.
"""

from __future__ import annotations

import re
from collections import Counter
from html import unescape
from urllib.parse import urljoin, urlsplit

import numpy as np

_WS = " \t\n\r\f"
_COMMENT = re.compile(r"<!--.*?-->", re.S)
_SCRIPTSTYLE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.S | re.I)
_TAG = re.compile(r"<(a|base)\b([^>]*)>", re.I)
_ATTR = re.compile(
    r"""([A-Za-z][A-Za-z0-9_-]*)\s*(?:=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]*)))?"""
)


def _attrs_of(raw: str) -> dict:
    out: dict = {}
    for m in _ATTR.finditer(raw):
        name = m.group(1).lower()
        if name in out:
            continue  # first-wins, like the engine's parser
        val = m.group(2)
        if val is None:
            val = m.group(3)
        if val is None:
            val = m.group(4)
        out[name] = unescape(val) if val else ""
    return out


def _is_http(u: str) -> bool:
    return u.startswith("http://") or u.startswith("https://")


_INNER_TAG = re.compile(r"<[^>]*>")
_CLOSE_A = re.compile(r"</a\s*>", re.I)
ANCHOR_MAX_CHARS = 200


def oracle_anchor_text(inner: str) -> str:
    """Normalized anchor text from raw inner HTML: strip tags (NO
    separator — skipped subtrees concatenate their neighbours, matching
    the engine's frozen policy), unescape entities, collapse
    whitespace, truncate."""
    return " ".join(unescape(_INNER_TAG.sub("", inner)).split())[
        :ANCHOR_MAX_CHARS]


def oracle_outlinks(url: str, html, with_anchor: bool = False) -> Counter:
    """Counter[(dst_url, dst_host, nofollow[, anchor])] -> count."""
    out: Counter = Counter()
    if html is None:
        return out
    text = html.decode("utf-8", "replace") if isinstance(
        html, (bytes, bytearray)) else str(html)
    # excise with NO replacement: a skipped subtree's neighbours
    # concatenate directly (the engine's SKIP_SUBTREE concatenation)
    text = _SCRIPTSTYLE.sub("", _COMMENT.sub("", text))
    tags = [(m.group(1).lower(), _attrs_of(m.group(2)), m.end())
            for m in _TAG.finditer(text)]
    base = url
    for tag, attrs, _ in tags:
        if tag == "base" and "href" in attrs:
            cand = urljoin(url, attrs["href"].strip(_WS)).split("#", 1)[0]
            if _is_http(cand):
                base = cand
            break
    for tag, attrs, end in tags:
        if tag != "a" or "href" not in attrs:
            continue
        dst = urljoin(base, attrs["href"].strip(_WS)).split("#", 1)[0]
        if not _is_http(dst):
            continue
        nf = 1 if "nofollow" in attrs.get("rel", "").lower().split() else 0
        host = (urlsplit(dst).hostname or "")
        if with_anchor:
            close = _CLOSE_A.search(text, end)
            inner = text[end:close.start()] if close else text[end:]
            out[(dst, host, nf, oracle_anchor_text(inner))] += 1
        else:
            out[(dst, host, nf)] += 1
    return out


def oracle_pagerank(edges, damping: float = 0.85,
                    iters: int = 12) -> dict:
    """Dense power iteration over distinct (src, dst) pairs: uniform
    teleport + dangling-mass redistribution, fixed iteration count.
    Returns {host: rank}; ranks sum to 1."""
    pairs = sorted(set(edges))
    hosts = sorted({s for s, _ in pairs} | {d for _, d in pairs})
    n = len(hosts)
    if n == 0:
        return {}
    idx = {h: i for i, h in enumerate(hosts)}
    deg = np.zeros(n)
    for s, _ in pairs:
        deg[idx[s]] += 1.0
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = r[deg == 0].sum()
        contrib = np.zeros(n)
        for s, d in pairs:
            contrib[idx[d]] += r[idx[s]] / deg[idx[s]]
        r = (1.0 - damping) / n + damping * (contrib + dang / n)
    return {h: float(r[idx[h]]) for h in hosts}
