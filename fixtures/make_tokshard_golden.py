"""Generate the golden for ``doc_token_shards`` from the independent
restatement (``tests/oracle/tokshard_oracle.py``) — never from the
engine.

Input = the committed extraction golden's ok rows (url, text), the
same rows the gate query feeds ``write_token_shards``; parameters must
stay in sync with ``__ray_entry__._q_doc_token_shards``.

Run once (``python fixtures/make_tokshard_golden.py``); the output
under ``fixtures/data/`` is committed.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.oracle.tokshard_oracle import oracle_sequences  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")
KW = dict(seq_len=128, vocab_size=4096, num_partitions=8)


def main() -> None:
    t = pq.read_table(os.path.join(DATA_DIR, "golden_extract.parquet"),
                      columns=["url", "text", "status"])
    rows = [r for r in t.to_pylist() if r["status"] == "ok"]
    seqs = oracle_sequences(rows, **KW)
    out = pa.table({
        "part_id": pa.array([s["part_id"] for s in seqs], pa.int64()),
        "seq_idx": pa.array([s["seq_idx"] for s in seqs], pa.int64()),
        "tokens_str": pa.array([s["tokens_str"] for s in seqs],
                               pa.string()),
    })
    pq.write_table(out, os.path.join(DATA_DIR,
                                     "golden_tokshard.parquet"))
    n_parts = len(set(out["part_id"].to_pylist()))
    print(f"golden_tokshard.parquet: {out.num_rows} sequences over "
          f"{n_parts} partitions from {len(rows)} ok docs")


if __name__ == "__main__":
    main()
