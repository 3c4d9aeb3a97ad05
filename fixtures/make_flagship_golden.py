"""Composition oracle for the flagship WARC-to-training-batches pipeline.

Restates every stage of ``rayxt/flagship.py`` with the vendored NAIVE
oracles (plain loops, ``tests/oracle``) over the derived flagship
corpus and writes ``golden_flagship_pack.parquet`` — one row per
surviving document with its pack assignment.  The engine never touches
this file's values; stage parity comes from the per-stage goldens
already in the gate (extraction byte-identity, langid, minhash pairs,
components, packing).

Knife-edge guard: the entropy threshold compares a float — the script
ASSERTS no document lands within 1e-4 of the 3.0 boundary, so engine
(numpy) and oracle (Counter + math.log2) rounding can never disagree
on a keep/drop decision.  Token counts are integers and MinHash
estimates are exact multiples of 1/64, so the other thresholds are
exact by construction.
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fixtures.gen_flagship import DATA_DIR, flagship_rows  # noqa: E402
from tests.oracle import oracle_extract  # noqa: E402
from tests.oracle.sketches import (  # noqa: E402
    oracle_components,
    oracle_langid,
    oracle_minhash_pairs,
    oracle_pack_documents,
    sha1_int64,
)

# frozen flagship parameters — keep in sync with rayxt.flagship.DEFAULTS
LANG_KEEP = ("en", "fr")
MIN_TOKENS = 30
MAX_TOKENS = 5000
MIN_ENTROPY = 3.0
THRESHOLD = 0.8
PACK_BUDGET = 512
ENTROPY_MARGIN = 1e-4


def naive_entropy(text: str) -> float:
    """Shannon entropy over codepoints — plain Counter restatement."""
    if not text:
        return 0.0
    counts = Counter(text)
    n = len(text)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def main() -> None:
    corpus = flagship_rows(DATA_DIR)
    golden_extract = pq.read_table(
        os.path.join(DATA_DIR, "golden_extract.parquet"))
    # the committed golden covers the base rows 1:1 (same order); run
    # the naive extractor only on the appended mirror rows
    n_base = golden_extract.num_rows
    urls = corpus["url"].to_pylist()
    tss = corpus["warc_ts"].to_pylist()
    htmls = corpus["html"].to_pylist()
    texts = golden_extract["text"].to_pylist()
    statuses = golden_extract["status"].to_pylist()
    for html in htmls[n_base:]:
        r = oracle_extract(html)
        texts.append(r["text"])
        statuses.append(r["status"])
    assert len(texts) == len(urls)
    n_mirror = len(urls) - n_base

    # stage: status + language + quality envelope
    filtered = []  # (url, ts, text, n_tokens)
    for u, ts, text, status in zip(urls, tss, texts, statuses):
        if status != "ok":
            continue
        lang = oracle_langid(text or "")
        if lang not in LANG_KEEP:
            continue
        n_tok = len((text or "").split(" "))
        if not (MIN_TOKENS <= n_tok <= MAX_TOKENS):
            continue
        ent = round(naive_entropy(text or ""), 6)
        assert abs(ent - MIN_ENTROPY) > ENTROPY_MARGIN, (
            f"knife-edge entropy {ent} for {u}")
        if ent < MIN_ENTROPY:
            continue
        filtered.append((u, ts, text, n_tok))
    # knife-edge check for DROPPED-by-entropy docs too: any ok-lang-tok
    # doc near the boundary is a hazard regardless of side
    for u, ts, text, status in zip(urls, tss, texts, statuses):
        if status == "ok" and oracle_langid(text or "") in LANG_KEEP:
            n_tok = len((text or "").split(" "))
            if MIN_TOKENS <= n_tok <= MAX_TOKENS:
                ent = round(naive_entropy(text or ""), 6)
                assert abs(ent - MIN_ENTROPY) > ENTROPY_MARGIN, (u, ent)

    # stage: exact re-fetch dedup — latest warc_ts per url (assert the
    # fixture never ties, so max-ts alone determines the survivor)
    by_url: dict = {}
    for u, ts, text, n_tok in filtered:
        prev = by_url.get(u)
        if prev is not None:
            assert prev[0] != ts, f"warc_ts tie for {u}"
        if prev is None or ts > prev[0]:
            by_url[u] = (ts, text, n_tok)

    # stage: near-dup removal — minhash pairs + components, drop
    # non-representative members (cluster label = min id)
    survivors = sorted(by_url.items())
    ids = [sha1_int64(u) for u, _ in survivors]
    assert len(set(ids)) == len(ids), "sha1_int64 collision in fixture"
    s_texts = [v[1] for _, v in survivors]
    pairs = oracle_minhash_pairs(ids, s_texts, threshold=THRESHOLD)
    comp = oracle_components([(a, b) for a, b, _ in pairs])
    drop = {i for i, c in comp if i != c}
    n_exact = sum(1 for _, _, j in pairs if j == 1.0)
    kept = [(u, v) for (u, v), i in zip(survivors, ids) if i not in drop]

    # stage: sequence packing over the survivors (ids = urls)
    k_urls = [u for u, _ in kept]
    k_texts = [v[1] for _, v in kept]
    packed = oracle_pack_documents(k_urls, k_texts, max_tokens=PACK_BUDGET)

    out = pa.table({
        "url": pa.array(k_urls, pa.string()),
        "n_tokens": pa.array([packed[u][0] for u in k_urls], pa.int64()),
        "pack_id": pa.array([packed[u][1] for u in k_urls], pa.int64()),
        "pack_pos": pa.array([packed[u][2] for u in k_urls], pa.int64()),
        "oversize": pa.array([packed[u][3] for u in k_urls], pa.bool_()),
    })
    path = os.path.join(DATA_DIR, "golden_flagship_pack.parquet")
    pq.write_table(out, path)
    print(f"corpus rows:        {len(urls)} ({n_base} base + {n_mirror} mirrors)")
    print(f"after quality:      {len(filtered)}")
    print(f"after url dedup:    {len(by_url)}")
    print(f"minhash pairs:      {len(pairs)} ({n_exact} exact est=1.0)")
    print(f"near-dup dropped:   {len(drop)}")
    print(f"packed survivors:   {len(kept)}")
    print(f"distinct packs:     {len({packed[u][1] for u in k_urls})}")
    assert len(pairs) >= 100, "fixture must exercise near-dup removal"
    assert n_exact >= 50 and len(pairs) - n_exact >= 50, (
        "need both exact and near mirrors to fire")
    print(f"wrote {path}: {out.num_rows} rows")

    # PASS-4 golden: the token-shard sequences over the SAME survivor
    # set, via the independent tokshard restatement (own CRC table +
    # struct packing).  Parameters mirror rayxt.flagship.SHARD_*.
    from tests.oracle.tokshard_oracle import oracle_sequences

    seqs = oracle_sequences(
        [{"url": u, "text": t} for u, t in zip(k_urls, k_texts)],
        seq_len=256, vocab_size=8192, num_partitions=8,
        id_col="url", text_col="text")
    shard_tbl = pa.table({
        "part_id": pa.array([s["part_id"] for s in seqs], pa.int64()),
        "seq_idx": pa.array([s["seq_idx"] for s in seqs], pa.int64()),
        "tokens_str": pa.array([s["tokens_str"] for s in seqs],
                               pa.string()),
    })
    spath = os.path.join(DATA_DIR, "golden_flagship_shards.parquet")
    pq.write_table(shard_tbl, spath)
    print(f"wrote {spath}: {shard_tbl.num_rows} sequences over "
          f"{len(set(shard_tbl['part_id'].to_pylist()))} partitions")


if __name__ == "__main__":
    main()
