"""Flagship-corpus derivation: conformance pages + deterministic mirrors.

The composed WARC-to-training-batches pipeline (``rayxt/flagship.py``)
needs a corpus that exercises EVERY stage — re-fetched urls (the base
conformance corpus already has ~0.5%), quality rejects (it has those
too), and near-duplicate documents (it does NOT: every conformance page
has distinct text).  This module derives the flagship corpus as the
committed ``pages_conf.parquet`` rows PLUS deterministic "mirror" rows:

* mirror candidates = pages whose committed ORACLE extraction golden is
  ``ok``, whose text is 80..3000 single-space tokens, whose url appears
  exactly once in the corpus, and whose html contains ``</article>``
  (so the mutation has a defined insertion point) — every 7th such page
  in ascending-url order, capped at :data:`MIRROR_CAP`;
* even-indexed mirrors copy the html byte-for-byte (EXACT dups: MinHash
  est 1.0); odd-indexed mirrors insert one short paragraph before
  ``</article>`` (NEAR dups: est well above the 0.8 threshold for
  80+-token docs, below 1.0);
* mirror url = ``https://mirror-<rest>``; mirror ts = base ts + 777 s;
* re-fetch rows (the base corpus's own ~0.5% url re-fetches are all
  giant articles that the token filter rejects, so they never reach
  the url-dedup stage): every 14th candidate starting at 3 (disjoint
  from the mirror slice by construction) is re-emitted under the SAME
  url with ts + 1 day and one inserted "updated revision" paragraph —
  the later, slightly different version must win ``dedup_latest_by_url``.

Derivation reads only committed fixture files (the corpus and the
oracle-generated extraction golden — never engine output) and is a
pure function of them, so the golden maker and the gate query stage
byte-identical inputs.
"""

from __future__ import annotations

import os
import sys
from datetime import timedelta

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # allow both module and script use
    sys.path.insert(0, REPO)

DATA_DIR = os.path.join(REPO, "fixtures", "data")
MIRROR_CAP = 400
MIRROR_STEP = 7
MIRROR_NOTE = b"<p>mirrored copy syndicated note appended here.</p>"
REFETCH_CAP = 100
REFETCH_STEP = 14
REFETCH_START = 3
REFETCH_NOTE = b"<p>updated revision of this page after refetch.</p>"
_TS_OFFSET_US = 777_000_000  # +777 s
_DAY_US = 86_400_000_000


def flagship_rows(data_dir: str = DATA_DIR) -> pa.Table:
    """-> (url, warc_ts, html): the 5000 base pages + mirror rows."""
    from collections import Counter

    pages = pq.read_table(
        os.path.join(data_dir, "pages_conf.parquet"),
        columns=["url", "warc_ts", "html"],
    )
    golden = pq.read_table(
        os.path.join(data_dir, "golden_extract.parquet"))
    urls = pages["url"].to_pylist()
    tss = pages["warc_ts"].to_pylist()
    htmls = pages["html"].to_pylist()
    url_counts = Counter(urls)
    # golden rows align 1:1 with pages rows (same generation order)
    texts = golden["text"].to_pylist()
    statuses = golden["status"].to_pylist()

    cands = []
    for u, ts, html, text, status in zip(urls, tss, htmls, texts, statuses):
        if status != "ok" or url_counts[u] != 1:
            continue
        n_tok = len((text or "").split(" "))
        if not (80 <= n_tok <= 3000):
            continue
        if b"</article>" not in html:
            continue
        cands.append((u, ts, html))
    cands.sort(key=lambda r: r[0])

    m_urls, m_tss, m_htmls = [], [], []
    for k, (u, ts, html) in enumerate(cands[::MIRROR_STEP][:MIRROR_CAP]):
        assert u.startswith("https://")
        m_urls.append("https://mirror-" + u[len("https://"):])
        m_tss.append(ts + timedelta(microseconds=_TS_OFFSET_US))
        if k % 2 == 0:
            m_htmls.append(html)
        else:
            m_htmls.append(
                html.replace(b"</article>", MIRROR_NOTE + b"</article>", 1))
    for u, ts, html in cands[REFETCH_START::REFETCH_STEP][:REFETCH_CAP]:
        m_urls.append(u)
        m_tss.append(ts + timedelta(microseconds=_DAY_US))
        m_htmls.append(
            html.replace(b"</article>", REFETCH_NOTE + b"</article>", 1))
    return pa.table({
        "url": pa.array(urls + m_urls, pa.string()),
        "warc_ts": pa.array(tss + m_tss, pa.timestamp("us")),
        "html": pa.array(htmls + m_htmls, pa.binary()),
    })


def stage_flagship_warc(out_dir: str, data_dir: str = DATA_DIR) -> list:
    """Write the flagship corpus as three WARC files (two plain, one
    per-record-gzip — the CC layout mix) under ``out_dir``; returns the
    paths.  Idempotent via a ``.done`` marker."""
    from rayxt.warc import write_warc

    paths = [os.path.join(out_dir, "flagship-a.warc"),
             os.path.join(out_dir, "flagship-b.warc"),
             os.path.join(out_dir, "flagship-c.warc.gz")]
    done = os.path.join(out_dir, ".done")
    if os.path.exists(done):
        return paths
    os.makedirs(out_dir, exist_ok=True)
    rows = flagship_rows(data_dir).to_pylist()
    third = (len(rows) + 2) // 3
    write_warc(rows[:third], paths[0])
    write_warc(rows[third:2 * third], paths[1])
    write_warc(rows[2 * third:], paths[2])
    with open(done, "w", encoding="utf-8") as fh:
        fh.write(f"rows={len(rows)}\n")
    return paths
