"""End-to-end tests for the composed WARC-to-training-batches pipeline
(rayxt/flagship.py) against an in-test naive-oracle composition."""

from __future__ import annotations

import glob
import os
from datetime import datetime, timedelta

import numpy as np
import pyarrow.parquet as pq
import pytest

from rayxt.flagship import training_assignments, warc_to_training
from rayxt.manifest import scan_done
from rayxt.warc import write_warc
from tests.oracle.sketches import (
    oracle_components,
    oracle_langid,
    oracle_minhash_pairs,
    oracle_pack_documents,
    sha1_int64,
)

T0 = datetime(2025, 3, 1, 12, 0, 0)

# enough distinct english filler to stay inside the quality envelope
_EN = ("the quick brown fox jumps over a lazy dog and then runs back "
       "into the deep green forest where it finds many other animals "
       "that live near the old stone bridge by the quiet river while "
       "birds sing in the tall trees above the winding path").split()


def _text(seed: int, n: int) -> str:
    import hashlib

    words = [
        _EN[int.from_bytes(
            hashlib.sha256(f"{seed}:{k}".encode()).digest()[:4],
            "big") % len(_EN)]
        for k in range(n)
    ]
    return " ".join(words)


def _html(text: str) -> bytes:
    paras = "".join(f"<p>{text}</p>" for _ in range(1))
    return (f"<html><head><title>t</title></head><body>"
            f"<article><h1>head</h1>{paras}</article>"
            f"</body></html>").encode()


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """12-row corpus exercising every stage; returns (paths, rows)."""
    rows = []

    def add(url, ts, text):
        rows.append({"url": url, "warc_ts": ts, "html": _html(text),
                     "text": text})

    for k in range(8):  # base docs, 90 tokens each
        add(f"https://base-{k}.example.com/a", T0 + timedelta(seconds=k),
            _text(k, 90))
    add("https://short.example.com/a", T0, "too short to keep")  # reject
    # url re-fetch: same url as base-0, later ts, revised text — the
    # revision must win the exact-url dedup
    add("https://base-0.example.com/a", T0 + timedelta(days=1),
        _text(0, 90) + " plus one extra revised sentence here now")
    # exact mirror of base-1 under a new url
    add("https://mirror-base-1.example.com/a", T0 + timedelta(hours=1),
        _text(1, 90))
    # near mirror of base-2 (appended words; est jaccard ~0.9)
    add("https://near-base-2.example.com/a", T0 + timedelta(hours=2),
        _text(2, 90) + " a tiny appended syndication note")

    d = tmp_path_factory.mktemp("flagship_warc")
    paths = [str(d / "x.warc"), str(d / "y.warc.gz")]
    write_warc(rows[:6], paths[0])
    write_warc(rows[6:], paths[1])
    return paths, rows


def _oracle_assignments(rows, *, min_tokens=30, threshold=0.8,
                        pack_budget=512):
    """Naive composition over the EXPECTED extracted texts.  The html
    template extracts to 'head\\n<text>' (heading + paragraph) — the
    per-stage extraction identity is covered by the byte-identity
    goldens; here the composition logic is under test."""
    filtered = {}
    for r in rows:
        text = "head\n" + r["text"]
        n_tok = len(text.split(" "))
        if oracle_langid(text) not in ("en", "fr") or not (
                min_tokens <= n_tok <= 5000):
            continue
        prev = filtered.get(r["url"])
        if prev is None or r["warc_ts"] > prev[0]:
            filtered[r["url"]] = (r["warc_ts"], text, n_tok)
    survivors = sorted(filtered.items())
    ids = [sha1_int64(u) for u, _ in survivors]
    texts = [v[1] for _, v in survivors]
    pairs = oracle_minhash_pairs(ids, texts, threshold=threshold)
    drop = {i for i, c in oracle_components([(a, b) for a, b, _ in pairs])
            if i != c}
    kept = [(u, v[1]) for (u, v), i in zip(survivors, ids) if i not in drop]
    packed = oracle_pack_documents([u for u, _ in kept],
                                   [t for _, t in kept],
                                   max_tokens=pack_budget)
    return {u: packed[u] for u, _ in kept}


def test_flagship_matches_naive_composition(ray_session, corpus, tmp_path):
    paths, rows = corpus
    work = str(tmp_path / "work")
    out = training_assignments(paths, work, num_partitions=8,
                               concurrency=(1, 2)).to_pandas()
    got = {r.url: (r.n_tokens, r.pack_id, r.pack_pos, bool(r.oversize))
           for r in out.itertuples()}
    want = _oracle_assignments(rows)
    assert got == want
    # stage accounting: 8 base + refetch-winner replaces base-0; exact
    # and near mirrors both dropped; short doc rejected
    assert len(got) == 8
    assert "https://short.example.com/a" not in got
    # the mirror pair survivor is whichever of (base-1, mirror) has the
    # smaller sha1 id — exactly one of the two remains
    pair = [u for u in ("https://base-1.example.com/a",
                        "https://mirror-base-1.example.com/a") if u in got]
    assert len(pair) == 1


def test_flagship_full_sink_and_resume(ray_session, corpus, tmp_path):
    paths, _rows = corpus
    work = str(tmp_path / "work2")
    summary = warc_to_training(paths, work, num_partitions=8,
                               concurrency=(1, 2))
    assert summary["packed_rows"] == 8
    assert summary["neardup_dropped"] == 2
    # quality keeps 11 of 12 (short doc rejected); exact-url dedup
    # collapses the base-0 re-fetch pair -> 10 checkpointed rows
    assert summary["clean_rows"] == 10

    # packed sink: hive dirs by pack bucket; joined rows carry text
    shard_files = glob.glob(os.path.join(work, "packs", "part_id=*",
                                         "*.parquet"))
    assert shard_files
    packed = pq.read_table(shard_files[0])
    for col in ("url", "text", "pack_id", "pack_pos", "n_tokens",
                "lang_guess", "warc_ts"):
        assert col in packed.column_names

    total = sum(pq.read_metadata(f).num_rows for f in shard_files)
    assert total == 8
    # every row's sink partition dir equals its pack bucket
    for f in shard_files:
        t = pq.read_table(f, columns=["pack_id"])
        bucket = int(os.path.basename(os.path.dirname(f)).split("=")[1])
        assert set(np.asarray(t["pack_id"]) >> 40) == {bucket}

    # resume: the clean checkpoint holds markers for every partition
    # that received rows; a second run reuses it and returns identical
    # assignments
    clean_dir = os.path.join(work, "clean")
    assert scan_done(clean_dir)
    again = training_assignments(paths, work, num_partitions=8,
                                 concurrency=(1, 2)).to_pandas()
    assert len(again) == 8
