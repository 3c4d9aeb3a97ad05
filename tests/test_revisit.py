"""WARC revisit records: capture-dedup writer layout (verified with
the independent cdxgen-oracle record walk), the revisit-aware source,
and full-corpus reconstruction."""

import hashlib
import os
from datetime import datetime

import pytest

from rayxt.warc import (read_warc, read_warc_revisits, resolve_revisits,
                        write_warc)
from tests.oracle.cdxgen_oracle import _b32, _gzip_members, _records_in

ROWS = [
    {"url": "https://r.example/a", "warc_ts": datetime(2026, 1, 1),
     "html": b"<html>alpha</html>"},
    {"url": "https://r.example/b", "warc_ts": datetime(2026, 1, 2),
     "html": b"<html>beta</html>"},
    {"url": "https://r.example/a2", "warc_ts": datetime(2026, 1, 3),
     "html": b"<html>alpha</html>"},      # dup of /a
    {"url": "https://r.example/c", "warc_ts": datetime(2026, 1, 4),
     "html": b""},                        # empty body
    {"url": "https://r.example/a3", "warc_ts": datetime(2026, 1, 5),
     "html": b"<html>alpha</html>"},      # second dup of /a
    {"url": "https://r.example/c2", "warc_ts": datetime(2026, 1, 6),
     "html": b""},                        # dup of the EMPTY body
]


def _stage(tmp_path, name="d.warc.gz"):
    path = os.path.join(str(tmp_path), name)
    write_warc(ROWS, path, dedup_payloads=True)
    return path


def _oracle_records(path):
    data = open(path, "rb").read()
    out = []
    for _off, _len, blob in _gzip_members(data):
        out.extend(_records_in(blob))
    return out


def test_writer_layout_via_oracle_walk(tmp_path):
    recs = _oracle_records(_stage(tmp_path))
    kinds = [f[b"warc-type"] for f, _ in recs]
    assert kinds == [b"warcinfo", b"response", b"response", b"revisit",
                     b"response", b"revisit", b"revisit"]
    by_url = {f.get(b"warc-target-uri", b"").decode(): (f, p)
              for f, p in recs[1:]}
    # revisit refers to the FIRST capture of the digest
    f, payload = by_url["https://r.example/a2"]
    assert f[b"warc-refers-to-target-uri"] == b"https://r.example/a"
    assert f[b"warc-refers-to-date"] == b"2026-01-01T00:00:00Z"
    want = b"sha1:" + _b32(
        hashlib.sha1(b"<html>alpha</html>").digest()).encode()
    assert f[b"warc-payload-digest"] == want
    # revisit payload is the HTTP head only — no body after CRLFCRLF
    assert payload.endswith(b"\r\n\r\n")
    assert b"<html>" not in payload
    # responses carry the digest too, and the full body
    f, payload = by_url["https://r.example/a"]
    assert f[b"warc-payload-digest"] == want
    assert payload.endswith(b"<html>alpha</html>")


def test_plain_reader_skips_revisits(tmp_path, ray_session):
    path = _stage(tmp_path)
    df = read_warc([path]).to_pandas()
    assert len(df) == 3  # only the first captures
    assert set(df["url"]) == {"https://r.example/a",
                              "https://r.example/b",
                              "https://r.example/c"}


def test_revisit_reader_and_resolution(tmp_path, ray_session):
    path = _stage(tmp_path)
    raw = read_warc_revisits([path])
    df = raw.to_pandas()
    assert len(df) == len(ROWS)
    assert (df["record_type"] == "revisit").sum() == 3
    rv = df[df["url"] == "https://r.example/a3"].iloc[0]
    assert rv["html"] is None
    assert rv["revisit_of_url"] == "https://r.example/a"
    assert rv["revisit_of_ts"] == datetime(2026, 1, 1)

    full = resolve_revisits(read_warc_revisits([path])).to_pandas()
    assert len(full) == len(ROWS)
    got = {r["url"]: bytes(h) if h is not None else None
           for r, h in zip(full.to_dict("records"), full["html"])}
    for r in ROWS:
        assert got[r["url"]] == r["html"], r["url"]


def test_unresolvable_revisit_dropped(tmp_path, ray_session):
    # stage, then keep only the REVISIT records' file slice by writing
    # a second file with just the dup rows referring outside it
    import pyarrow as pa
    import ray.data as rd

    from rayxt.warc import REVISIT_SCHEMA, _revisit_table

    rows = [{"url": "https://r.example/x", "warc_ts": datetime(2026, 1, 1),
             "html": None, "lang": None, "record_type": "revisit",
             "payload_digest": "sha1:NOPE", "revisit_of_url": "u",
             "revisit_of_ts": None}]
    ds = rd.from_arrow(_revisit_table(rows))
    assert resolve_revisits(ds).count() == 0


def test_dedup_off_is_unchanged(tmp_path):
    # the default path writes no digests and no revisits — byte layout
    # of earlier rounds is preserved
    p1 = os.path.join(str(tmp_path), "plain.warc.gz")
    write_warc(ROWS, p1)
    recs = _oracle_records(p1)
    assert all(f[b"warc-type"] != b"revisit" for f, _ in recs)
    assert all(b"warc-payload-digest" not in f for f, _ in recs)


def test_export_warc_resharding(tmp_path, ray_session):
    import glob

    import ray.data as rd

    from rayxt.warc import export_warc

    # canon strips the path's trailing digit so /a, /a2, /a3 share a
    # shard (and /c, /c2 likewise) — duplicate payloads co-locate
    rows = [dict(r, canon=r["url"].rstrip("23")) for r in ROWS]
    out = os.path.join(str(tmp_path), "reshard")
    summary = export_warc(rd.from_items(rows), out, num_partitions=3,
                          dedup_payloads=True, key_col="canon")
    shards = sorted(glob.glob(os.path.join(out, "part-*.warc.gz")))
    assert shards and int(summary["rows"].sum()) == len(ROWS)
    full = resolve_revisits(read_warc_revisits(shards)).to_pandas()
    assert len(full) == len(ROWS)
    got = {r: bytes(h) for r, h in zip(full["url"], full["html"])}
    for r in ROWS:
        assert got[r["url"]] == r["html"], r["url"]
    # same canon -> same shard, so dup payloads became revisits
    assert (full["record_type"] == "revisit").sum() == 3
    # resume: re-run leaves shard mtimes untouched
    mt = {p: os.path.getmtime(p) for p in shards}
    export_warc(rd.from_items(rows), out, num_partitions=3,
                dedup_payloads=True, key_col="canon")
    assert {p: os.path.getmtime(p) for p in shards} == mt
    # lineage sidecars
    assert len(glob.glob(os.path.join(out, "lineage", "*.json"))) == \
        len(shards)
