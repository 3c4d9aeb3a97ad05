"""Token shards: engine bin bytes == oracle bytes (layout, order,
endianness, padding), read-back fidelity, resume, and the frozen
tokenizer/hash policy."""

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rayxt.tokshard import (TOK_EOD, TOK_PAD, hash_token_ids,
                            read_token_shards, tokenize_ids,
                            write_token_shards)
from tests.oracle.tokshard_oracle import (oracle_sequences,
                                          oracle_shards, token_id,
                                          tokens_of)

KW = dict(seq_len=16, vocab_size=256, num_partitions=4)

ROWS = [
    {"url": "https://a.example/1", "text": "the quick brown fox"},
    {"url": "https://a.example/2", "text": "  leading and trailing  "},
    {"url": "https://a.example/3", "text": ""},          # only EOD
    {"url": "https://a.example/4", "text": None},        # only EOD
    {"url": "https://a.example/5", "text": "tab\tnewline\nmix\r\n"},
    {"url": "https://a.example/6",
     "text": "nbsp stays one token \x1cas-well"},
    {"url": "https://a.example/7", "text": "x " * 50},   # spans seqs
    {"url": "https://b.example/8", "text": "the the the repeated"},
]


def test_oracle_crc_matches_zlib():
    import zlib

    from tests.oracle.tokshard_oracle import crc32

    for s in [b"", b"a", b"the quick brown fox", "naïve".encode()]:
        assert crc32(s) == zlib.crc32(s)


def test_token_policy():
    assert tokens_of("  a  b\t\nc ") == ["a", "b", "c"]
    # non-ASCII whitespace is TOKEN BYTES under the frozen policy
    assert tokens_of("a b") == ["a b"]
    assert tokens_of("a\x1cb") == ["a\x1cb"]
    assert tokens_of(None) == [] and tokens_of("") == []


def test_hash_token_ids_matches_oracle():
    toks = pa.array(["the", "quick", "the", "naïve", "a b"])
    got = hash_token_ids(toks, 256)
    want = [token_id(t, 256) for t in toks.to_pylist()]
    assert list(got) == want
    assert all(2 <= v < 256 for v in got)  # never PAD/EOD


def test_tokenize_ids_batch():
    t = pa.table({"url": [r["url"] for r in ROWS],
                  "text": pa.array([r["text"] for r in ROWS],
                                   pa.string())})
    out = tokenize_ids(t, text_col="text", id_col="url",
                       vocab_size=256, num_partitions=4)
    for row, want_src in zip(out.to_pylist(), ROWS):
        want = [token_id(tok, 256) for tok in tokens_of(want_src["text"])]
        assert row["ids"] == want, want_src["url"]


def test_shards_byte_identical_to_oracle(tmp_path, ray_session):
    out = os.path.join(str(tmp_path), "shards")
    t = pa.table({"url": [r["url"] for r in ROWS],
                  "text": pa.array([r["text"] for r in ROWS],
                                   pa.string())})
    summary = write_token_shards(
        rd.from_arrow(t).repartition(3), out, id_col="url",
        text_col="text", **KW)
    want = oracle_shards(ROWS, **KW)
    bins = sorted(glob.glob(os.path.join(out, "part-*.bin")))
    assert len(bins) == len(want)
    for p in bins:
        pid = int(p.rsplit("part-", 1)[1][:4])
        blob, idx = want[pid]
        assert open(p, "rb").read() == blob, pid
        got_idx = json.load(open(p.replace(".bin", ".idx.json")))
        for k, v in idx.items():
            assert got_idx[k] == v, (pid, k)
    assert int(summary["n_docs"].sum()) == len(ROWS)
    assert int(summary["n_seqs"].sum()) == \
        sum(i["n_seqs"] for _, i in want.values())


def test_read_back_and_padding(tmp_path, ray_session):
    out = os.path.join(str(tmp_path), "shards")
    t = pa.table({"url": [r["url"] for r in ROWS],
                  "text": pa.array([r["text"] for r in ROWS],
                                   pa.string())})
    write_token_shards(rd.from_arrow(t), out, **KW)
    got = read_token_shards(
        sorted(glob.glob(os.path.join(out, "part-*.bin")))).to_pandas()
    want = oracle_sequences(ROWS, **KW)
    assert len(got) == len(want)
    got = got.sort_values(["part_id", "seq_idx"]).reset_index(drop=True)
    for g, w in zip(got.itertuples(), want):
        assert g.part_id == w["part_id"]
        assert g.seq_idx == w["seq_idx"]
        assert " ".join(map(str, g.tokens)) == w["tokens_str"]
    # every sequence is exactly seq_len; PAD only in the tail
    flat = np.concatenate([np.asarray(x) for x in got["tokens"]])
    assert len(flat) % KW["seq_len"] == 0
    assert (flat == TOK_EOD).sum() == \
        sum(1 for r in ROWS)  # one EOD per doc
    assert TOK_PAD not in flat[:1]  # stream starts with real tokens


def test_resume_skips_existing_shards(tmp_path, ray_session):
    out = os.path.join(str(tmp_path), "shards")
    t = pa.table({"url": [r["url"] for r in ROWS],
                  "text": pa.array([r["text"] for r in ROWS],
                                   pa.string())})
    write_token_shards(rd.from_arrow(t), out, **KW)
    bins = sorted(glob.glob(os.path.join(out, "part-*.bin")))
    mt = {p: os.path.getmtime(p) for p in bins}
    write_token_shards(rd.from_arrow(t), out, **KW)
    assert {p: os.path.getmtime(p) for p in bins} == mt


def test_batching_independence(tmp_path, ray_session):
    # identical shard bytes no matter the block layout
    t = pa.table({"url": [r["url"] for r in ROWS],
                  "text": pa.array([r["text"] for r in ROWS],
                                   pa.string())})
    blobs = []
    for parts in (1, 5):
        out = os.path.join(str(tmp_path), f"s{parts}")
        write_token_shards(rd.from_arrow(t).repartition(parts), out, **KW)
        blobs.append({os.path.basename(p): open(p, "rb").read()
                      for p in glob.glob(os.path.join(out, "*.bin"))})
    assert blobs[0] == blobs[1]


def test_shuffled_read_deterministic_and_complete(ray_session,
                                                  tmp_path):
    import glob

    from rayxt.tokshard import read_token_shards, write_token_shards
    from tests.oracle.tokshard_oracle import oracle_shuffle_order

    rows = [{"url": f"https://s.example/{i}",
             "text": f"tok{i} " * (3 + i % 5)} for i in range(120)]
    out = str(tmp_path / "sh")
    write_token_shards(
        rd.from_items(rows), out, seq_len=8, vocab_size=1 << 16,
        num_partitions=4)
    paths = sorted(glob.glob(out + "/part-*.bin"))

    plain = read_token_shards(paths).to_pandas()
    got = read_token_shards(paths, shuffle_seed=7,
                            batch_seqs=5).to_pandas()
    # same multiset of sequences, new order + a position column
    assert len(got) == len(plain)
    key = ["part_id", "seq_idx"]
    a = plain.sort_values(key).reset_index(drop=True)
    b = got.sort_values(key).reset_index(drop=True)
    assert (a["part_id"] == b["part_id"]).all()
    assert all(list(x) == list(y)
               for x, y in zip(a["tokens"], b["tokens"]))
    # the order is EXACTLY the oracle's permutation, per shard
    for pid, grp in got.groupby("part_id"):
        grp = grp.sort_values("shuffle_pos")
        want = oracle_shuffle_order(7, int(pid), len(grp))
        assert list(grp["seq_idx"]) == want, pid
        assert list(grp["shuffle_pos"]) == list(range(len(grp)))
    # batching-independent: a different batch_seqs gives the same rows
    again = read_token_shards(paths, shuffle_seed=7,
                              batch_seqs=64).to_pandas()
    assert again.sort_values(key).reset_index(drop=True)[
        ["part_id", "seq_idx", "shuffle_pos"]].equals(
        got.sort_values(key).reset_index(drop=True)[
            ["part_id", "seq_idx", "shuffle_pos"]])
    # a different seed is a different permutation
    other = read_token_shards(paths, shuffle_seed=8).to_pandas()
    assert list(other.sort_values(["part_id", "shuffle_pos"])
                ["seq_idx"]) != list(got.sort_values(
                    ["part_id", "shuffle_pos"])["seq_idx"])
