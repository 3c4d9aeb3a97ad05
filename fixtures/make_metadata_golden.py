"""Generate the golden for ``pages_metadata`` from the independent
restatement (``tests/oracle/metadata_oracle.py``) — never from the
engine.

Run once (``python fixtures/make_metadata_golden.py``); the output
under ``fixtures/data/`` is committed.  Keep N_META in sync with
``__ray_entry__._N_META``.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fixtures.gen_pages import generate_meta_table  # noqa: E402
from tests.oracle.metadata_oracle import FIELDS, oracle_metadata  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")
N_META = 400


def main() -> None:
    t = generate_meta_table(N_META)
    urls = t["url"].to_pylist()
    rows = [oracle_metadata(u, h)
            for u, h in zip(urls, t["html"].to_pylist())]
    cols = {"url": pa.array(urls, pa.string())}
    for f in FIELDS:
        cols[f] = pa.array([r[f] for r in rows], pa.string())
    cols["status"] = pa.array([r["status"] for r in rows], pa.string())
    out = pa.table(cols)
    pq.write_table(out, os.path.join(DATA_DIR, "golden_metadata.parquet"))
    n_titles = out["title"].null_count
    print(f"golden_metadata.parquet: {out.num_rows} rows, "
          f"{n_titles} null titles, "
          f"{out['canonical'].null_count} null canonicals, "
          f"statuses={set(out['status'].to_pylist())}")


if __name__ == "__main__":
    main()
