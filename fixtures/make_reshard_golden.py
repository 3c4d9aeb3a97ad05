"""Generate the golden for ``pages_warc_reshard`` by restating the
distributed capture-dedup policy over the staging rows (never the
engine): a row routes to shard ``crc32(canonical url) % 8`` (the
mirror- prefix stripped, co-locating duplicate payloads); within a shard the
writer orders by (url, warc_ts); the first row carrying each distinct
payload IN ITS SHARD is a ``response``, later ones ``revisit``; after
reconstruction every row's html equals its source bytes.

Run once (``python fixtures/make_reshard_golden.py``); the output
under ``fixtures/data/`` is committed.
"""

from __future__ import annotations

import hashlib
import os
import sys
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fixtures.gen_pages import revisit_rows_of  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")
N_PARTS = 8


def main() -> None:
    rows = revisit_rows_of(os.path.join(DATA_DIR, "pages_conf.parquet"))
    shards: dict = {}
    for r in rows:
        canon = r["url"].replace("://mirror-", "://", 1)
        pid = zlib.crc32(canon.encode("utf-8")) % N_PARTS
        shards.setdefault(pid, []).append(r)
    urls, kinds, sizes, shas = [], [], [], []
    for pid in sorted(shards):
        seen: set = set()
        for r in sorted(shards[pid],
                        key=lambda r: (r["url"], r["warc_ts"])):
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
    pq.write_table(out, os.path.join(DATA_DIR, "golden_reshard.parquet"))
    print(f"golden_reshard.parquet: {out.num_rows} captures over "
          f"{len(shards)} shards ({kinds.count('revisit')} revisits)")


if __name__ == "__main__":
    main()
