"""Generate the golden for ``pages_markdown`` from the independent
IR-pipeline restatement (``tests/oracle/markdown_oracle.py``) — never
from the engine.

Run once (``python fixtures/make_markdown_golden.py``); the output
under ``fixtures/data/`` is committed.  Keep N_MARKDOWN in sync with
``__ray_entry__._N_MARKDOWN``.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fixtures.gen_pages import generate_markdown_table  # noqa: E402
from tests.oracle.linkgraph_oracle import oracle_outlinks  # noqa: E402
from tests.oracle.markdown_oracle import oracle_markdown  # noqa: E402
from tests.oracle.metadata_oracle import oracle_metadata  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")
N_MARKDOWN = 400


def main() -> None:
    t = generate_markdown_table(N_MARKDOWN)
    urls = t["url"].to_pylist()
    htmls = t["html"].to_pylist()
    rows = [oracle_markdown(h) for h in htmls]
    out = pa.table({
        "url": pa.array(urls, pa.string()),
        "markdown": pa.array([r["markdown"] for r in rows], pa.string()),
        "status": pa.array([r["status"] for r in rows], pa.string()),
    })
    pq.write_table(out, os.path.join(DATA_DIR, "golden_markdown.parquet"))
    from collections import Counter

    statuses = Counter(out["status"].to_pylist())
    n_chars = sum(len(m or "") for m in out["markdown"].to_pylist())
    print(f"golden_markdown.parquet: {out.num_rows} rows, "
          f"statuses={dict(statuses)}, markdown chars={n_chars}")

    # per-stage goldens for the pages_index_record composition: the
    # SAME family through the independent metadata and linkgraph
    # oracles, so the composition's oracle is a SQL join of
    # independently-generated tables
    meta = [oracle_metadata(u, h) for u, h in zip(urls, htmls)]
    mt = pa.table({
        "url": pa.array(urls, pa.string()),
        "title": pa.array([m["title"] for m in meta], pa.string()),
        "status": pa.array([m["status"] for m in meta], pa.string()),
    })
    pq.write_table(mt, os.path.join(DATA_DIR,
                                    "golden_markdown_meta.parquet"))
    lk_urls, lk_ns = [], []
    for u, h in zip(urls, htmls):
        if h is None or len(h) == 0:
            continue
        try:
            links = oracle_outlinks(u, h)
        except Exception:
            continue
        n = sum(links.values())
        if n:
            lk_urls.append(u)
            lk_ns.append(int(n))
    lt = pa.table({
        "url": pa.array(lk_urls, pa.string()),
        "n_links": pa.array(lk_ns, pa.int64()),
    })
    pq.write_table(lt, os.path.join(DATA_DIR,
                                    "golden_markdown_links.parquet"))
    print(f"golden_markdown_meta.parquet: {mt.num_rows} rows, "
          f"{mt['title'].null_count} null titles; "
          f"golden_markdown_links.parquet: {lt.num_rows} rows, "
          f"{sum(lk_ns)} links")

    # markdown golden over the 5000-page CONFORMANCE corpus (the
    # committed pages_conf.parquet) — the oracle for the end-to-end
    # WARC -> markdown -> JSONL chain (pages_warc_markdown)
    conf = pq.read_table(os.path.join(DATA_DIR, "pages_conf.parquet"),
                         columns=["url", "html"])
    crows = [oracle_markdown(h) for h in conf.column("html").to_pylist()]
    ct = pa.table({
        "url": pa.array(conf.column("url").to_pylist(), pa.string()),
        "markdown": pa.array([r["markdown"] for r in crows], pa.string()),
        "status": pa.array([r["status"] for r in crows], pa.string()),
    })
    pq.write_table(ct, os.path.join(DATA_DIR,
                                    "golden_markdown_conf.parquet"))
    cstat = Counter(ct["status"].to_pylist())
    print(f"golden_markdown_conf.parquet: {ct.num_rows} rows, "
          f"statuses={dict(cstat)}")


if __name__ == "__main__":
    main()
