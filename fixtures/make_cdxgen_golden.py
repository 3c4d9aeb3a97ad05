"""Generate the golden for ``pages_cdx_index`` from the independent
container-walk restatement (``tests/oracle/cdxgen_oracle.py``) — never
from the engine.

Stages the SAME three WARC conformance containers the gate query uses
(``fixtures.gen_pages.ensure_warc_conf`` over the committed
``pages_conf.parquet`` — write_warc is deterministic: gzip mtime=0,
one-shot zstd frames), indexes them with the oracle, and applies the
``write_cdxj`` read-back policy the query's round trip implies: rows
with a null urlkey are skipped and ``ts`` truncates to whole seconds.

Run once (``python fixtures/make_cdxgen_golden.py``); the output under
``fixtures/data/`` is committed.  (``make_cdx_golden.py`` is the
CDXJ *source* golden — this one is the *indexer* golden.)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fixtures.gen_pages import ensure_warc_conf  # noqa: E402
from tests.oracle.cdxgen_oracle import oracle_index_warc  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")
PAGES = os.path.join(DATA_DIR, "pages_conf.parquet")

_SCHEMA = pa.schema([
    ("urlkey", pa.string()),
    ("ts", pa.timestamp("us")),
    ("url", pa.string()),
    ("mime", pa.string()),
    ("status", pa.int32()),
    ("digest", pa.string()),
    ("length", pa.int64()),
    ("offset", pa.int64()),
    ("filename", pa.string()),
])


def main() -> None:
    paths = ensure_warc_conf("/tmp/rayxt_warc_conf_v2", PAGES)
    rows = []
    for p in paths:
        for r in oracle_index_warc(p):
            if not r["urlkey"] or r["ts"] is None:
                continue  # write_cdxj skips unindexable rows
            r = dict(r, ts=r["ts"].replace(microsecond=0))
            rows.append(r)
    out = pa.table(
        {n: pa.array([r[n] for r in rows], _SCHEMA.field(n).type)
         for n in _SCHEMA.names}, schema=_SCHEMA)
    pq.write_table(out, os.path.join(DATA_DIR, "golden_cdxgen.parquet"))
    by_file: dict = {}
    for r in rows:
        by_file[r["filename"]] = by_file.get(r["filename"], 0) + 1
    print(f"golden_cdxgen.parquet: {out.num_rows} captures, "
          f"per file {by_file}, "
          f"distinct urlkeys {len(set(out['urlkey'].to_pylist()))}")


if __name__ == "__main__":
    main()
