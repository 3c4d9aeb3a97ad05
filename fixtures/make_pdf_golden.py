"""Generate the golden parquet for the ``pages_pdf_text`` driver query
from the INDEPENDENT naive PDF oracle (``tests/oracle/pdf_oracle.py``)
— never from the engine; same discipline as ``make_golden.py``.

Run once (``python fixtures/make_pdf_golden.py``); the output under
``fixtures/data/`` is committed.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fixtures.gen_pdf import pdf_row  # noqa: E402
from tests.oracle.pdf_oracle import oracle_extract  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")
N_PDF = 250  # keep in sync with __ray_entry__._q_pages_pdf_text


def main() -> None:
    os.makedirs(DATA_DIR, exist_ok=True)
    rows = []
    for i in range(N_PDF):
        row = pdf_row(i)
        n_pages, text, status = oracle_extract(row["pdf"])
        rows.append({
            "pdf_id": row["pdf_id"], "url": row["url"], "n_pages": n_pages,
            "text": text, "n_chars": len(text), "status": status,
        })
    table = pa.Table.from_pylist(rows, schema=pa.schema([
        ("pdf_id", pa.int64()), ("url", pa.string()),
        ("n_pages", pa.int32()), ("text", pa.string()),
        ("n_chars", pa.int32()), ("status", pa.string()),
    ]))
    pq.write_table(table, os.path.join(DATA_DIR, "golden_pdf_text.parquet"))
    ok = sum(1 for r in rows if r["status"] == "ok")
    print(f"golden_pdf_text.parquet: {len(rows)} rows, {ok} ok, "
          f"{sum(1 for r in rows if r['status'] == 'parse_error')} "
          f"parse_error, {sum(1 for r in rows if r['status'] == 'not_pdf')} "
          f"not_pdf")


if __name__ == "__main__":
    main()
