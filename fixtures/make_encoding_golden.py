"""Generate the golden for ``pages_encoding`` from the independent
sniff restatement (``tests/oracle/encoding_oracle.py``) — never from
the engine.

Run once (``python fixtures/make_encoding_golden.py``); the output
under ``fixtures/data/`` is committed.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.oracle.encoding_oracle import oracle_sniff  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")


def main() -> None:
    t = pq.read_table(os.path.join(DATA_DIR, "pages_conf.parquet"),
                      columns=["url", "html"])
    encs = []
    counts = []
    for data in t["html"].to_pylist():
        text, enc = oracle_sniff(data)
        encs.append(enc)
        counts.append(len(text))
    out = pa.table({
        "url": t["url"],
        "encoding": pa.array(encs, pa.string()),
        "n_chars_decoded": pa.array(counts, pa.int64()),
    })
    pq.write_table(out, os.path.join(DATA_DIR,
                                     "golden_encoding.parquet"))
    import collections

    hist = collections.Counter(encs)
    print(f"golden_encoding.parquet: {out.num_rows} rows, {dict(hist)}")


if __name__ == "__main__":
    main()
