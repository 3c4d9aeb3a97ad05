"""Generate the golden for ``pages_tables`` from the independent
restatement (``tests/oracle/tables_oracle.py``) — never from the
engine.

Run once (``python fixtures/make_tables_golden.py``); the output under
``fixtures/data/`` is committed.  Keep N_TABLES in sync with
``__ray_entry__._N_TABLES``.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fixtures.gen_pages import generate_tables_table  # noqa: E402
from tests.oracle.tables_oracle import oracle_page_tables  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")
N_TABLES = 400


def main() -> None:
    t = generate_tables_table(N_TABLES)
    rows: list = []
    for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
        rows.extend(oracle_page_tables(u, h))
    out = pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "table_idx": pa.array([r["table_idx"] for r in rows], pa.int64()),
        "row_idx": pa.array([r["row_idx"] for r in rows], pa.int64()),
        "col_idx": pa.array([r["col_idx"] for r in rows], pa.int64()),
        "rowspan": pa.array([r["rowspan"] for r in rows], pa.int64()),
        "colspan": pa.array([r["colspan"] for r in rows], pa.int64()),
        "is_header": pa.array([r["is_header"] for r in rows], pa.bool_()),
        "cell_text": pa.array([r["cell_text"] for r in rows], pa.string()),
    })
    pq.write_table(out, os.path.join(DATA_DIR, "golden_tables.parquet"))
    print(f"golden_tables.parquet: {out.num_rows} cells over "
          f"{len(set(out['url'].to_pylist()))} pages, "
          f"max colspan {max(out['colspan'].to_pylist())}, "
          f"headers {sum(out['is_header'].to_pylist())}")


if __name__ == "__main__":
    main()
