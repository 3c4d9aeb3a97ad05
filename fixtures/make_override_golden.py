"""Generate the golden for ``pages_extract_override`` by composing the
two already-verified per-program oracles row-wise — ``oracle_extract``
(the main_content restatement) for ordinary hosts and
``oracle_main_content`` (the boilerplate-policy restatement) for the
override hosts — never the engine.

The override host set is every conformance host whose crc32 is 0 mod 5
(deterministic, restated identically in ``__ray_entry__``).
"""

from __future__ import annotations

import os
import sys
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.oracle import ORACLE_HARD_CAP, oracle_extract  # noqa: E402
from tests.oracle.boilerplate_oracle import oracle_main_content  # noqa: E402

DATA_DIR = os.path.join(REPO, "fixtures", "data")


def override_host(host: str) -> bool:
    return zlib.crc32(host.encode()) % 5 == 0


def host_of(url: str) -> str:
    return url.split("://", 1)[1].split("/", 1)[0].lower()


def main() -> None:
    pages = pq.read_table(os.path.join(DATA_DIR, "pages_conf.parquet"),
                          columns=["url", "warc_ts", "html"])
    urls = pages["url"].to_pylist()
    htmls = pages["html"].to_pylist()
    texts, statuses, n_override = [], [], 0
    for url, html in zip(urls, htmls):
        if override_host(host_of(url)):
            n_override += 1
            # restate extract_one's envelope around the heuristic
            # program: empty / too_large short-circuit BEFORE the parse
            if html is None or len(html) == 0:
                texts.append("")
                statuses.append("empty")
                continue
            if len(html) > ORACLE_HARD_CAP:
                texts.append("")
                statuses.append("too_large")
                continue
            text, _n_blocks, st = oracle_main_content(html)
            texts.append(text)
            # the oracle's 'error' = parse raised, which extract_one
            # also reports; its other statuses (no_content) are 'ok'
            # program runs with empty text
            statuses.append("error" if st == "error" else "ok")
        else:
            r = oracle_extract(html)
            texts.append(r["text"])
            statuses.append(r["status"])
    out = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pages["warc_ts"],
        "text": pa.array(texts, pa.string()),
        "status": pa.array(statuses, pa.string()),
    })
    pq.write_table(out, os.path.join(DATA_DIR,
                                     "golden_extract_override.parquet"))
    print(f"golden_extract_override.parquet: {out.num_rows} rows "
          f"({n_override} on override hosts)")


if __name__ == "__main__":
    main()
