"""Generate the golden for ``pages_feeds`` from the independent
regex+minidom restatement (``tests/oracle/feed_oracle.py``) — never
from the engine.

Run once (``python fixtures/make_feeds_golden.py``); the output under
``fixtures/data/`` is committed.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fixtures.gen_pages import generate_feed_table  # noqa: E402
from tests.oracle.feed_oracle import oracle_parse_feed  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")


def main() -> None:
    t = generate_feed_table()
    rows = []
    for u, b in zip(t["feed_url"].to_pylist(), t["body"].to_pylist()):
        kind, entries = oracle_parse_feed(b)
        if kind == "invalid":
            rows.append((u, "invalid", None, None, None, None))
        else:
            rows.extend((u, kind, *e) for e in entries)
    names = ("feed_url", "kind", "title", "link", "entry_id",
             "published")
    out = pa.table({n: pa.array([r[i] for r in rows], pa.string())
                    for i, n in enumerate(names)})
    pq.write_table(out, os.path.join(DATA_DIR, "golden_feeds.parquet"))
    kinds = out["kind"].to_pylist()
    print(f"golden_feeds.parquet: {out.num_rows} rows "
          f"(rss {kinds.count('rss')}, atom {kinds.count('atom')}, "
          f"invalid {kinds.count('invalid')})")


if __name__ == "__main__":
    main()
