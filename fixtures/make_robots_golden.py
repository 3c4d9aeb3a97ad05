"""Generate the golden for ``pages_robots_check`` from the independent
restatement (``tests/oracle/robots_oracle.py``) — never from the
engine.

Run once (``python fixtures/make_robots_golden.py``); the output under
``fixtures/data/`` is committed.  Keep N_CRAWL in sync with
``__ray_entry__._N_CRAWL``.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fixtures.gen_pages import (  # noqa: E402
    AGENT, _RB_HOSTS, crawl_url_of, robots_of_host)
from tests.oracle.robots_oracle import oracle_allowed  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")
N_CRAWL = 2000


def main() -> None:
    from urllib.parse import urlsplit

    bodies = {f"rb{k}.example.org": robots_of_host(k)
              for k in range(_RB_HOSTS)}
    urls = [crawl_url_of(i) for i in range(N_CRAWL)]
    ok = [int(oracle_allowed(bodies[urlsplit(u).hostname], AGENT, u))
          for u in urls]
    out = pa.table({"url": pa.array(urls, pa.string()),
                    "allowed": pa.array(ok, pa.int8())})
    pq.write_table(out, os.path.join(DATA_DIR, "golden_robots.parquet"))
    print(f"golden_robots.parquet: {out.num_rows} rows, "
          f"{out.num_rows - sum(ok)} blocked")


if __name__ == "__main__":
    main()
