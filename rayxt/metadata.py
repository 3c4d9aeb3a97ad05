"""Per-page HTML head-metadata extraction: title, meta description /
keywords / robots, OpenGraph fields, the canonical URL and the root
``lang`` attribute — the signals a real web index keeps next to the
extracted text.

SURVEY §2 parity note: the reference (funkyfuture/inxs, SURVEY §2.1)
exposes DOM transformation primitives, not a fixed metadata schema;
this module is the LLM-pipeline operator layer on top of the same
frozen tag-soup DOM (``rayxt/dom.py``), like ``rayxt/linkgraph.py``.

Frozen extraction policy (the independent oracle in
``tests/oracle/metadata_oracle.py`` restates it from the spec text
below — never from this code):

* Document-order FIRST occurrence claims each field.
* ``title``: whitespace-normalized subtree text of the first
  ``<title>`` under the ``SKIP_SUBTREE`` concatenation policy (the
  same :func:`rayxt.linkgraph.anchor_text` walk), truncated to
  ``TITLE_MAX_CHARS``; normalizes-to-empty -> null.
* ``meta_description`` / ``meta_keywords`` / ``meta_robots``: the
  ``content=`` of the first ``<meta>`` whose ``name`` (ASCII-stripped,
  case-insensitive) equals the key AND that carries a ``content``
  attribute — a matching ``<meta>`` without ``content=`` is ignored
  and does NOT claim the slot.  Values are whitespace-normalized and
  truncated to ``META_MAX_CHARS``; normalizes-to-empty -> null (but
  the slot is claimed: later duplicates never override).
* ``og_title`` / ``og_description`` / ``og_image``: same rule keyed on
  ``property`` OR (fallback, same tag) ``name`` equal to
  ``og:title`` / ``og:description`` / ``og:image``.  ``og_image`` is
  additionally ASCII-whitespace-stripped and resolved against the
  document base like a URL; a non-http(s) resolution stores null
  (slot still claimed).
* ``canonical``: the ``href`` of the first ``<link>`` whose ``rel``
  token list (case-insensitive, ASCII-whitespace-split) contains
  ``canonical`` and that carries ``href=``; stripped, resolved against
  the document base, http(s)-only else null (slot claimed).
* ``html_lang``: the ``lang`` attribute of the first ``html`` element,
  stripped and lowercased; empty -> null.
* ``published_time``: document-order first of (a) a ``<meta>`` whose
  ``property`` — or, same fallback rule as og:, ``name`` when no
  ``property`` attribute exists — equals ``article:published_time``
  AND that carries ``content``, or (b) a ``<time>`` element carrying a
  ``datetime`` attribute.  The value is whitespace-normalized and
  truncated like the other meta fields; normalizes-to-empty -> null
  (slot claimed).  The raw string is data — no date parsing.
* Document base: the first ``<base href>`` (resolved against the page
  url, http(s)-only) rebases canonical and og:image wherever they
  appear — whole-document ``document.baseURI`` semantics, identical to
  the outlink extractor's policy.
* ``status``: ``ok`` | ``empty`` (null/zero-byte html) | ``error``
  (parser raised); non-ok rows carry all-null fields.

Scale shape: one actor-pool ``map_batches`` stage (per-document DOM
work is inherently Python — the same envelope as ``ExtractDocs``);
html bytes are dropped in-stage, so only the narrow metadata rows ever
reach an exchange or sink.
"""

from __future__ import annotations

import pyarrow as pa

from .dom import parse_html
from .linkgraph import _WS, _is_http, anchor_text, resolve_url

__all__ = [
    "TITLE_MAX_CHARS",
    "META_MAX_CHARS",
    "page_metadata",
    "ExtractMetadata",
    "extract_metadata",
    "METADATA_FIELDS",
]

TITLE_MAX_CHARS = 300
META_MAX_CHARS = 500

#: output field order (after ``url``; before ``status``)
METADATA_FIELDS = (
    "title",
    "meta_description",
    "meta_keywords",
    "meta_robots",
    "og_title",
    "og_description",
    "og_image",
    "canonical",
    "html_lang",
    "published_time",
)

_NAME_KEYS = {
    "description": "meta_description",
    "keywords": "meta_keywords",
    "robots": "meta_robots",
}
_OG_KEYS = {
    "og:title": "og_title",
    "og:description": "og_description",
    "og:image": "og_image",
    "article:published_time": "published_time",
}


def _norm(s: str, cap: int) -> str:
    return " ".join(s.split())[:cap]


def page_metadata(url: str, html) -> dict:
    """Per-document kernel: the frozen-policy metadata dict (every
    ``METADATA_FIELDS`` key, value ``str | None``, plus ``status``)."""
    out: dict = {k: None for k in METADATA_FIELDS}
    if html is None or len(html) == 0:
        out["status"] = "empty"
        return out
    try:
        root = parse_html(html)
        nodes = list(root.iter())
    except Exception:
        out["status"] = "error"
        return out
    out["status"] = "ok"
    base = url
    for n in nodes:
        if n.tag == "base" and "href" in n.attrs:
            cand = resolve_url(url, n.attrs["href"].strip(_WS))
            if _is_http(cand):
                base = cand
            break
    claimed: set = set()
    for n in nodes:
        tag = n.tag
        if tag == "html" and "html_lang" not in claimed:
            claimed.add("html_lang")
            lang = n.attrs.get("lang", "").strip(_WS).lower()
            out["html_lang"] = lang or None
        elif tag == "title" and "title" not in claimed:
            claimed.add("title")
            out["title"] = anchor_text(n, TITLE_MAX_CHARS) or None
        elif tag == "meta":
            content = n.attrs.get("content")
            if content is None:
                continue
            field = _NAME_KEYS.get(n.attrs.get("name", "").strip(_WS).lower())
            if field is None:
                prop = n.attrs.get("property", "").strip(_WS).lower()
                field = _OG_KEYS.get(prop)
                if field is None and "property" not in n.attrs:
                    field = _OG_KEYS.get(
                        n.attrs.get("name", "").strip(_WS).lower())
            if field is None or field in claimed:
                continue
            claimed.add(field)
            if field == "og_image":
                cand = resolve_url(base, content.strip(_WS))
                out[field] = cand if _is_http(cand) else None
            else:
                out[field] = _norm(content, META_MAX_CHARS) or None
        elif tag == "time" and "published_time" not in claimed \
                and "datetime" in n.attrs:
            claimed.add("published_time")
            out["published_time"] = \
                _norm(n.attrs["datetime"], META_MAX_CHARS) or None
        elif tag == "link" and "canonical" not in claimed:
            rel = n.attrs.get("rel", "").lower().split()
            href = n.attrs.get("href")
            if "canonical" not in rel or href is None:
                continue
            claimed.add("canonical")
            cand = resolve_url(base, href.strip(_WS))
            out["canonical"] = cand if _is_http(cand) else None
        if len(claimed) == len(METADATA_FIELDS):
            break
    return out


class ExtractMetadata:
    """Actor-pool stage: ``(url, html, ...)`` -> one metadata row per
    page (``url`` + ``METADATA_FIELDS`` + ``status``)."""

    def __init__(self):
        self._kernel = page_metadata  # warm per-actor handle

    def __call__(self, batch: pa.Table) -> pa.Table:
        kernel = self._kernel
        urls = batch["url"].to_pylist()
        rows = [kernel(u, h) for u, h in zip(urls, batch["html"].to_pylist())]
        cols: dict = {"url": pa.array(urls, pa.string())}
        for f in METADATA_FIELDS:
            cols[f] = pa.array([r[f] for r in rows], pa.string())
        cols["status"] = pa.array([r["status"] for r in rows], pa.string())
        return pa.table(cols)


def extract_metadata(ds, *, batch_size: int = 64, concurrency=(1, 8)):
    """Metadata rows for every page: zero-exchange narrow output
    (html is pruned to the stage and dropped inside it)."""
    return ds.select_columns(["url", "html"]).map_batches(
        ExtractMetadata, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


# FROZEN robots-meta exclusion policy: a page is non-indexable when its
# (ASCII-lowercased) meta_robots directive list contains the token
# ``noindex`` or ``none`` — token = comma-delimited, surrounding
# ASCII whitespace ignored.  One RE2 pattern expresses exactly that;
# the DuckDB oracle runs the SAME pattern (both engines are RE2), so
# the gate pins the policy without a golden.
NOINDEX_RE = r"(^|,)[ \t\r\n\f]*(noindex|none)[ \t\r\n\f]*(,|$)"


def filter_noindex(ds, *, col: str = "meta_robots",
                   status_col: str = "status"):
    """Keep indexable metadata rows: ``status == 'ok'`` and no
    noindex/none robots-meta token (null directives are indexable).
    Vectorized — two Arrow kernels per batch, no shuffle."""
    import pyarrow.compute as pc

    def keep(t: pa.Table) -> pa.Table:
        ok = pc.equal(t[status_col], "ok")
        hit = pc.match_substring_regex(
            pc.utf8_lower(pc.fill_null(t[col], "")), NOINDEX_RE)
        return t.filter(pc.and_(ok, pc.invert(hit)))

    return ds.map_batches(keep, batch_format="pyarrow")
