"""Generate the golden for ``doc_token_shards_shuffled`` from the
oracle's own-CRC-table permutation restatement
(``tests.oracle.tokshard_oracle.oracle_shuffle_order``) over the
committed tokshard golden's shard sizes — never the engine.

Run once (``python fixtures/make_tokshuffle_golden.py``); the output
under ``fixtures/data/`` is committed.
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.oracle.tokshard_oracle import oracle_shuffle_order  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")
SEED = 7


def main() -> None:
    t = pq.read_table(os.path.join(DATA_DIR, "golden_tokshard.parquet"),
                      columns=["part_id"])
    sizes = Counter(t["part_id"].to_pylist())
    pids, seqs, poss = [], [], []
    for pid in sorted(sizes):
        order = oracle_shuffle_order(SEED, int(pid), sizes[pid])
        for pos, seq in enumerate(order):
            pids.append(int(pid))
            seqs.append(seq)
            poss.append(pos)
    out = pa.table({
        "part_id": pa.array(pids, pa.int64()),
        "seq_idx": pa.array(seqs, pa.int64()),
        "shuffle_pos": pa.array(poss, pa.int64()),
    })
    pq.write_table(out, os.path.join(
        DATA_DIR, "golden_tokshard_shuffle.parquet"))
    print(f"golden_tokshard_shuffle.parquet: {out.num_rows} rows over "
          f"{len(sizes)} shards")


if __name__ == "__main__":
    main()
