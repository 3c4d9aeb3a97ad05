"""Generate the golden for ``pages_fetch_plan`` — the politeness-aware
crawl scheduler composition — from independent restatements only:

* permissions: the committed oracle-generated ``golden_robots.parquet``
  (regex-translation restatement, never the engine);
* crawl delays: ``oracle_directives`` (the sitemap oracle's line-walk
  restatement) over the same robots fixture;
* host + rank: ``urllib.parse`` + a plain python sort (the engine uses
  an RE2 kernel + a hash-exchange map_groups).

Plan policy (restated by this maker AND implemented by the query):
allowed urls only; per host, urls rank ascending (1-based ``pos``);
``fetch_at_s = round((pos - 1) * crawl_delay, 6)`` with a missing /
null delay counting 0 (fetch immediately, back to back).

Run once (``python fixtures/make_fetchplan_golden.py``); the output
under ``fixtures/data/`` is committed.
"""

from __future__ import annotations

import os
import sys
from urllib.parse import urlsplit

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fixtures.gen_pages import AGENT, ensure_robots_parquet  # noqa: E402
from tests.oracle.sitemap_oracle import oracle_directives  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")


def main() -> None:
    allowed = pq.read_table(
        os.path.join(DATA_DIR, "golden_robots.parquet"))
    robots = pq.read_table(ensure_robots_parquet("/tmp/rayxt_robots_fp.parquet"))
    delay_of = {}
    for host, body in zip(robots["host"].to_pylist(),
                          robots["robots_txt"].to_pylist()):
        delay_of[host] = oracle_directives(body, AGENT)[0]

    by_host: dict = {}
    for url, ok in zip(allowed["url"].to_pylist(),
                       allowed["allowed"].to_pylist()):
        if not ok:
            continue
        by_host.setdefault(urlsplit(url).hostname, []).append(url)

    urls, hosts, poss, delays, fetch_ats = [], [], [], [], []
    for host in sorted(by_host):
        delay = delay_of.get(host)
        for pos, url in enumerate(sorted(by_host[host]), start=1):
            urls.append(url)
            hosts.append(host)
            poss.append(pos)
            delays.append(delay)
            fetch_ats.append(round((pos - 1) * (delay or 0.0), 6))
    out = pa.table({
        "url": pa.array(urls, pa.string()),
        "host": pa.array(hosts, pa.string()),
        "pos": pa.array(poss, pa.int64()),
        "crawl_delay": pa.array(delays, pa.float64()),
        "fetch_at_s": pa.array(fetch_ats, pa.float64()),
    })
    pq.write_table(out,
                   os.path.join(DATA_DIR, "golden_fetchplan.parquet"))
    n_delayed = sum(1 for d in delays if d)
    print(f"golden_fetchplan.parquet: {out.num_rows} fetches over "
          f"{len(by_host)} hosts ({n_delayed} delay-governed, "
          f"max fetch_at {max(fetch_ats):.1f}s)")


if __name__ == "__main__":
    main()
