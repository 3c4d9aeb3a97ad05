"""Generate the goldens for ``pages_sitemaps`` and
``pages_robots_directives`` from the independent restatement
(``tests/oracle/sitemap_oracle.py``) — never from the engine.

Run once (``python fixtures/make_sitemap_golden.py``); the outputs
under ``fixtures/data/`` are committed.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fixtures.gen_pages import (  # noqa: E402
    _SM_HOSTS, robots_sm_of_host, sitemap_docs_of_host)
from tests.oracle.sitemap_oracle import (  # noqa: E402
    oracle_directives, oracle_parse_sitemap)

DATA_DIR = os.path.join(REPO, "fixtures", "data")
AGENT = "rayxtbot/1.0"  # keep in sync with fixtures.gen_pages.AGENT


def main() -> None:
    rows = {k: [] for k in ("sitemap_url", "kind", "loc", "lastmod",
                            "changefreq", "priority")}
    for k in range(_SM_HOSTS):
        for url, body in sitemap_docs_of_host(k):
            kind, entries = oracle_parse_sitemap(body)
            if kind == "invalid":
                entries = [(None, None, None, None)]
            for loc, lastmod, freq, prio in entries:
                rows["sitemap_url"].append(url)
                rows["kind"].append(kind)
                rows["loc"].append(loc)
                rows["lastmod"].append(lastmod)
                rows["changefreq"].append(freq)
                rows["priority"].append(prio)
    sm = pa.table({
        "sitemap_url": pa.array(rows["sitemap_url"], pa.string()),
        "kind": pa.array(rows["kind"], pa.string()),
        "loc": pa.array(rows["loc"], pa.string()),
        "lastmod": pa.array(rows["lastmod"], pa.string()),
        "changefreq": pa.array(rows["changefreq"], pa.string()),
        "priority": pa.array(rows["priority"], pa.float64()),
    })
    pq.write_table(sm, os.path.join(DATA_DIR, "golden_sitemaps.parquet"))
    n_invalid = rows["kind"].count("invalid")
    print(f"golden_sitemaps.parquet: {sm.num_rows} rows "
          f"({n_invalid} invalid docs)")

    hosts, delays, maps = [], [], []
    for k in range(_SM_HOSTS):
        body = robots_sm_of_host(k)
        if body is None:
            continue
        delay, sitemaps = oracle_directives(body, AGENT)
        for sm_url in sitemaps or [None]:
            hosts.append(f"sm{k}.example.org")
            delays.append(delay)
            maps.append(sm_url)
    rb = pa.table({
        "host": pa.array(hosts, pa.string()),
        "crawl_delay": pa.array(delays, pa.float64()),
        "sitemap_url": pa.array(maps, pa.string()),
    })
    pq.write_table(rb, os.path.join(DATA_DIR,
                                    "golden_robots_directives.parquet"))
    n_delay = sum(d is not None for d in delays)
    print(f"golden_robots_directives.parquet: {rb.num_rows} rows "
          f"({n_delay} with crawl_delay)")


if __name__ == "__main__":
    main()
