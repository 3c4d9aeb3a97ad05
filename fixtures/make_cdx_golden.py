"""Generate the goldens for ``pages_surt`` and ``pages_cdx_read`` from
the independent restatements (``tests/oracle/url_oracle.oracle_surt``,
``tests/oracle/cdx_oracle.oracle_cdxj_line``) — never from the engine.

Run once (``python fixtures/make_cdx_golden.py``); outputs under
``fixtures/data/`` are committed.  Keep N_CDX in sync with
``__ray_entry__._N_CDX`` and the url count with ``_N_URLS``.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fixtures.gen_pages import cdxj_line_of, generate_url_table  # noqa: E402
from tests.oracle.cdx_oracle import oracle_cdxj_line  # noqa: E402
from tests.oracle.url_oracle import oracle_surt  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")
N_URLS = 400  # the messy-URL family size (__ray_entry__._N_URLS)
N_CDX = 1200


def main() -> None:
    urls = generate_url_table(N_URLS)
    keys = [oracle_surt(u) for u in urls["url"].to_pylist()]
    surt_tbl = pa.table({
        "url_id": urls["url_id"],
        "url": urls["url"],
        "urlkey": pa.array(keys, pa.string()),
    })
    pq.write_table(surt_tbl, os.path.join(DATA_DIR, "golden_surt.parquet"))
    n_null = sum(k is None for k in keys)
    print(f"golden_surt.parquet: {surt_tbl.num_rows} rows "
          f"({n_null} out-of-policy nulls)")

    rows = [r for r in (oracle_cdxj_line(cdxj_line_of(i))
                        for i in range(N_CDX)) if r is not None]
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    cdx_tbl = pa.table({
        "urlkey": pa.array(cols["urlkey"], pa.string()),
        "ts": pa.array(cols["ts"], pa.timestamp("us")),
        "url": pa.array(cols["url"], pa.string()),
        "mime": pa.array(cols["mime"], pa.string()),
        "status": pa.array(cols["status"], pa.int32()),
        "digest": pa.array(cols["digest"], pa.string()),
        "length": pa.array(cols["length"], pa.int64()),
        "offset": pa.array(cols["offset"], pa.int64()),
        "filename": pa.array(cols["filename"], pa.string()),
    })
    pq.write_table(cdx_tbl, os.path.join(DATA_DIR, "golden_cdx.parquet"))
    print(f"golden_cdx.parquet: {cdx_tbl.num_rows} rows "
          f"({N_CDX - cdx_tbl.num_rows} lines skipped)")




def snapshot_b() -> None:
    """Also commit snapshot B's golden (same oracle, v2 lines + the
    fresh tail) for the pages_cdx_diff real-SQL oracle."""
    from fixtures.gen_pages import cdxj_line_of_v2

    lines = [ln for ln in (cdxj_line_of_v2(i) for i in range(N_CDX))
             if ln is not None]
    lines += [cdxj_line_of(i) for i in range(N_CDX, N_CDX + N_CDX // 10)]
    rows = [r for r in (oracle_cdxj_line(ln) for ln in lines)
            if r is not None]
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    tbl = pa.table({
        "urlkey": pa.array(cols["urlkey"], pa.string()),
        "ts": pa.array(cols["ts"], pa.timestamp("us")),
        "url": pa.array(cols["url"], pa.string()),
        "mime": pa.array(cols["mime"], pa.string()),
        "status": pa.array(cols["status"], pa.int32()),
        "digest": pa.array(cols["digest"], pa.string()),
        "length": pa.array(cols["length"], pa.int64()),
        "offset": pa.array(cols["offset"], pa.int64()),
        "filename": pa.array(cols["filename"], pa.string()),
    })
    pq.write_table(tbl, os.path.join(DATA_DIR, "golden_cdx_b.parquet"))
    print(f"golden_cdx_b.parquet: {tbl.num_rows} rows")


if __name__ == "__main__":
    main()
    snapshot_b()
