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
from tests.oracle.markdown_oracle import oracle_markdown  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")
N_MARKDOWN = 400


def main() -> None:
    t = generate_markdown_table(N_MARKDOWN)
    urls = t["url"].to_pylist()
    rows = [oracle_markdown(h) for h in t["html"].to_pylist()]
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


if __name__ == "__main__":
    main()
