"""Generate the golden for ``doc_script_profile`` from the independent
restatement (``tests/oracle/script_oracle.py``) — never from the
engine.  Keep N_SCRIPT in sync with ``__ray_entry__._N_SCRIPT``."""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fixtures.gen_pages import script_text_of  # noqa: E402
from tests.oracle.script_oracle import oracle_script_profile  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")
N_SCRIPT = 800


def main() -> None:
    rows = [oracle_script_profile(script_text_of(i))
            for i in range(N_SCRIPT)]
    out = pa.table({
        "doc_id": pa.array(range(N_SCRIPT), pa.int64()),
        "dominant_script": pa.array([r[0] for r in rows], pa.string()),
        "script_ratio": pa.array([r[1] for r in rows], pa.float64()),
        "n_script_chars": pa.array([r[2] for r in rows], pa.int64()),
    })
    pq.write_table(out, os.path.join(DATA_DIR, "golden_scripts.parquet"))
    n_null = sum(r[0] is None for r in rows)
    print(f"golden_scripts.parquet: {out.num_rows} rows "
          f"({n_null} unclassified)")


if __name__ == "__main__":
    main()
