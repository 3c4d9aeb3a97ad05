"""Generate the golden for ``pages_warc_revisit`` by restating the
capture-dedup policy over the staged rows (never the engine): the
first row carrying each distinct payload is a ``response``, every
later one a ``revisit``; after reconstruction each row's html equals
its source bytes, so ``n_bytes``/``html_sha`` come straight from the
staging list.

Run once (``python fixtures/make_revisit_golden.py``); the output
under ``fixtures/data/`` is committed.
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fixtures.gen_pages import revisit_rows_of  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")


def main() -> None:
    rows = revisit_rows_of(os.path.join(DATA_DIR, "pages_conf.parquet"))
    seen: set = set()
    urls, kinds, sizes, shas = [], [], [], []
    for r in rows:
        sha = hashlib.sha1(r["html"]).hexdigest()
        urls.append(r["url"])
        kinds.append("revisit" if sha in seen else "response")
        seen.add(sha)
        sizes.append(len(r["html"]))
        shas.append(sha)
    out = pa.table({
        "url": pa.array(urls, pa.string()),
        "record_type": pa.array(kinds, pa.string()),
        "n_bytes": pa.array(sizes, pa.int64()),
        "html_sha": pa.array(shas, pa.string()),
    })
    pq.write_table(out, os.path.join(DATA_DIR, "golden_revisit.parquet"))
    print(f"golden_revisit.parquet: {out.num_rows} captures "
          f"({kinds.count('revisit')} revisits)")


if __name__ == "__main__":
    main()
