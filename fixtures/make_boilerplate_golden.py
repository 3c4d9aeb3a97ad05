"""Generate the golden parquet for ``pages_main_content`` from the
independent naive heuristic restatement
(``tests/oracle/boilerplate_oracle.py``) — never from the engine.

Run once (``python fixtures/make_boilerplate_golden.py``); the output
under ``fixtures/data/`` is committed.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.oracle.boilerplate_oracle import oracle_main_content  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")


def main() -> None:
    pages = pq.read_table(os.path.join(DATA_DIR, "pages_conf.parquet"),
                          columns=["url", "html"])
    urls = pages.column("url").to_pylist()
    htmls = pages.column("html").to_pylist()
    texts, blocks, status = [], [], []
    for h in htmls:
        t, nb, st = oracle_main_content(h)
        texts.append(t)
        blocks.append(nb)
        status.append(st)
    table = pa.table({
        "url": pa.array(urls, pa.string()),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int32()),
        "n_blocks": pa.array(blocks, pa.int32()),
        "status": pa.array(status, pa.string()),
    })
    pq.write_table(table, os.path.join(DATA_DIR,
                                       "golden_main_content.parquet"))
    from collections import Counter

    print(f"golden_main_content.parquet: {len(urls)} rows,",
          dict(Counter(status)))


if __name__ == "__main__":
    main()
