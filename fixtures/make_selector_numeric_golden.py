"""Generate the golden for ``pages_selector_numeric`` (numeric XPath
predicates over the tables family + CSS pseudo probes over the
conformance pages) from the naive
document-order-walk restatement (``tests.oracle.
oracle_selector_numeric``) — never the selector engine.

Run once (``python fixtures/make_selector_numeric_golden.py``); the
output under ``fixtures/data/`` is committed.  Runs over the SAME
tables fixture family as pages_tables (keep N_TABLES in sync with
``__ray_entry__._N_TABLES``).
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fixtures.gen_pages import generate_tables_table  # noqa: E402
from tests.oracle import (oracle_selector_numeric,  # noqa: E402
                          oracle_selector_pseudo)

DATA_DIR = os.path.join(REPO, "fixtures", "data")
N_TABLES = 400


def main() -> None:
    t = generate_tables_table(N_TABLES)
    totals: Counter = Counter()
    for html in t["html"].to_pylist():
        totals.update(oracle_selector_numeric(html))
    pages = pq.read_table(os.path.join(DATA_DIR, "pages_conf.parquet"),
                          columns=["html"])
    for html in pages["html"].to_pylist():
        totals.update(oracle_selector_pseudo(html))
    out = pa.table({
        "probe": pa.array(sorted(totals), pa.string()),
        "hits": pa.array([totals[k] for k in sorted(totals)],
                         pa.int64()),
    })
    pq.write_table(out, os.path.join(
        DATA_DIR, "golden_selector_numeric.parquet"))
    print(f"golden_selector_numeric.parquet: {dict(totals)}")


if __name__ == "__main__":
    main()
