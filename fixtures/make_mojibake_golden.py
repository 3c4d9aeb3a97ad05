"""Generate the golden for ``doc_fix_mojibake`` from the independent
restatement (``tests/oracle/mojibake_oracle.py``) — never from the
engine.

Run once (``python fixtures/make_mojibake_golden.py``); the output
under ``fixtures/data/`` is committed.  Keep N_MOJI in sync with
``__ray_entry__._N_MOJI``.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fixtures.gen_pages import mojibake_text_of  # noqa: E402
from tests.oracle.mojibake_oracle import oracle_fix  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")
N_MOJI = 1000


def main() -> None:
    ids, texts, rounds = [], [], []
    for i in range(N_MOJI):
        fixed, n = oracle_fix(mojibake_text_of(i))
        ids.append(i)
        texts.append(fixed)
        rounds.append(n)
    out = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "mojibake_rounds": pa.array(rounds, pa.int32()),
    })
    pq.write_table(out, os.path.join(DATA_DIR, "golden_mojibake.parquet"))
    n_fixed = sum(1 for r in rounds if r)
    print(f"golden_mojibake.parquet: {out.num_rows} rows, "
          f"{n_fixed} repaired")


if __name__ == "__main__":
    main()
