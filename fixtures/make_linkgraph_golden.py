"""Generate the goldens for ``pages_outlinks`` / ``pages_host_pagerank``
from the independent restatement (``tests/oracle/linkgraph_oracle.py``)
— never from the engine.

Run once (``python fixtures/make_linkgraph_golden.py``); outputs under
``fixtures/data/`` are committed.  Keep N_LINKS in sync with
``__ray_entry__._N_LINKS``.
"""

from __future__ import annotations

import os
import sys
from urllib.parse import urlsplit

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fixtures.gen_pages import generate_link_table  # noqa: E402
from tests.oracle.linkgraph_oracle import (  # noqa: E402
    oracle_outlinks, oracle_pagerank)

DATA_DIR = os.path.join(REPO, "fixtures", "data")
N_LINKS = 400


def main() -> None:
    t = generate_link_table(N_LINKS)
    srcs, shosts, dsts, dhosts, nofollow, anchors, ns = \
        [], [], [], [], [], [], []
    edges = []
    for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
        sh = urlsplit(url).hostname or ""
        links = oracle_outlinks(url, html, with_anchor=True)
        for (dst, dh, nf, anchor), n in links.items():
            srcs.append(url)
            shosts.append(sh)
            dsts.append(dst)
            dhosts.append(dh)
            nofollow.append(nf)
            anchors.append(anchor)
            ns.append(n)
            if nf == 0 and sh and dh:
                edges.append((sh, dh))
    out = pa.table({
        "url": pa.array(srcs, pa.string()),
        "src_host": pa.array(shosts, pa.string()),
        "dst_url": pa.array(dsts, pa.string()),
        "dst_host": pa.array(dhosts, pa.string()),
        "nofollow": pa.array(nofollow, pa.int32()),
        "anchor": pa.array(anchors, pa.string()),
        "n": pa.array(ns, pa.int64()),
    })
    pq.write_table(out, os.path.join(DATA_DIR, "golden_outlinks.parquet"))
    ranks = oracle_pagerank(edges, damping=0.85, iters=12)
    hosts = sorted(ranks)
    pr = pa.table({
        "host": pa.array(hosts, pa.string()),
        "pagerank": pa.array([ranks[h] for h in hosts], pa.float64()),
    })
    pq.write_table(pr, os.path.join(DATA_DIR, "golden_pagerank.parquet"))
    print(f"golden_outlinks.parquet: {out.num_rows} rows; "
          f"golden_pagerank.parquet: {pr.num_rows} hosts, "
          f"sum={sum(ranks.values()):.12f}")


if __name__ == "__main__":
    main()
