"""Generate the golden for ``pages_domains`` from the independent
trie-walk restatement (``tests/oracle/psl_oracle.py``) — never from
the engine.

Run once (``python fixtures/make_domains_golden.py``); the output
under ``fixtures/data/`` is committed.  Keep N_HOSTS in sync with
``__ray_entry__._N_HOSTS``.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fixtures.gen_pages import generate_host_table  # noqa: E402
from tests.oracle.psl_oracle import oracle_registered_domain  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")
N_HOSTS = 400


def main() -> None:
    t = generate_host_table(N_HOSTS)
    domains = [oracle_registered_domain(h)
               for h in t["host"].to_pylist()]
    out = pa.table({
        "host_id": t["host_id"],
        "host": t["host"],
        "domain": pa.array(domains, pa.string()),
    })
    pq.write_table(out, os.path.join(DATA_DIR,
                                     "golden_domains.parquet"))
    nulls = sum(1 for d in domains if d is None)
    print(f"golden_domains.parquet: {out.num_rows} rows, "
          f"{nulls} null domains, "
          f"{len(set(d for d in domains if d))} distinct")


if __name__ == "__main__":
    main()
