"""CDX generation: engine==oracle parity over every container layout,
the seek-coordinate semantics (offset/length really fetch the record),
CDXJ write/read round trip, and the Dataset stage end to end."""

import gzip
import io
import os
from datetime import datetime

import pyarrow as pa
import pytest

from rayxt.cdx import _index_units, build_cdx, read_cdxj, write_cdxj
from rayxt.warc import write_warc, write_wet
from tests.oracle.cdxgen_oracle import oracle_index_warc

ROWS = [
    {"url": "https://www.Example.org/A?b=2&a=1",
     "warc_ts": datetime(2026, 1, 2, 3, 4, 5), "html": b"<html>1</html>"},
    {"url": "ftp://odd.example/x",  # out of SURT scope -> null urlkey
     "warc_ts": datetime(2026, 1, 2, 3, 4, 6), "html": b"two"},
    {"url": "https://t.example/c",  # microsecond ts, empty body
     "warc_ts": datetime(2026, 1, 2, 3, 4, 7, 123456), "html": b""},
    {"url": "http://t.example:8080/d",  # body spans several read chunks
     "warc_ts": datetime(2026, 5, 2), "html": b"x" * 70000},
    {"url": "https://t.example/e", "warc_ts": datetime(2026, 5, 3),
     "html": b"<p>five</p>", "status": 404,
     "content_type": "Text/HTML; charset=UTF-8"},
]


def _stage(tmp_path, name):
    path = os.path.join(tmp_path, name)
    write_warc(ROWS, str(path))
    return str(path)


@pytest.mark.parametrize("name", ["a.warc", "b.warc.gz", "c.warc.zst"])
def test_engine_equals_oracle(tmp_path, name):
    path = _stage(str(tmp_path), name)
    eng = list(_index_units(path))
    assert eng == oracle_index_warc(path)
    assert len(eng) == len(ROWS)
    assert eng[1]["urlkey"] is None  # ftp out of scope
    assert eng[4]["status"] == 404
    assert eng[4]["mime"] == "text/html"  # before ';', lowercased


def test_gz_offsets_fetch_the_record(tmp_path):
    path = _stage(str(tmp_path), "x.warc.gz")
    data = open(path, "rb").read()
    for row, want in zip(_index_units(path), ROWS):
        blob = gzip.decompress(data[row["offset"]:
                                    row["offset"] + row["length"]])
        assert (b"WARC-Target-URI: " + want["url"].encode()) in blob


def test_zst_offsets_fetch_the_record(tmp_path):
    path = _stage(str(tmp_path), "x.warc.zst")
    data = open(path, "rb").read()
    for row, want in zip(_index_units(path), ROWS):
        blob = bytes(pa.CompressedInputStream(
            pa.BufferReader(data[row["offset"]:
                                 row["offset"] + row["length"]]),
            "zstd").read())
        assert (b"WARC-Target-URI: " + want["url"].encode()) in blob


def test_plain_offsets_span_whole_records(tmp_path):
    path = _stage(str(tmp_path), "x.warc")
    data = open(path, "rb").read()
    for row in _index_units(path):
        rec = data[row["offset"]:row["offset"] + row["length"]]
        assert rec.startswith(b"WARC/1.")
        assert rec.endswith(b"\r\n\r\n")


def test_multi_record_member_shares_span(tmp_path):
    # a single gzip member holding the ENTIRE file: every record
    # attributes to the one member span (the documented degenerate
    # whole-file-gz case)
    plain = _stage(str(tmp_path), "x.warc")
    path = os.path.join(str(tmp_path), "whole.warc.gz")
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(open(plain, "rb").read())
    open(path, "wb").write(buf.getvalue())
    rows = list(_index_units(path))
    assert len(rows) == len(ROWS)
    assert {(r["offset"], r["length"]) for r in rows} == \
        {(0, os.path.getsize(path))}
    assert rows == oracle_index_warc(path)


def test_zst_skippable_frame_is_skipped(tmp_path):
    path = _stage(str(tmp_path), "x.warc.zst")
    data = open(path, "rb").read()
    junk = (0x184D2A50).to_bytes(4, "little") + \
        (6).to_bytes(4, "little") + b"junk!!"
    shifted = os.path.join(str(tmp_path), "shifted.warc.zst")
    open(shifted, "wb").write(data[:0] + junk + data)
    rows = list(_index_units(shifted))
    assert [r["url"] for r in rows] == [r["url"] for r in ROWS]
    assert all(r["offset"] >= len(junk) for r in rows)
    assert rows == oracle_index_warc(shifted)


def test_non_response_records_skipped(tmp_path):
    path = os.path.join(str(tmp_path), "t.warc.wet.gz")
    write_wet([{"url": "https://t.example/a",
                "warc_ts": datetime(2026, 1, 1), "text": "hi"}], path)
    assert list(_index_units(path)) == []
    assert oracle_index_warc(path) == []


def test_payload_without_http_head(tmp_path):
    # hand-built response record whose payload has no CRLF CRLF head:
    # null mime/status, digest over the WHOLE payload
    import hashlib
    import base64

    payload = b"no http head here"
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://t.example/r\r\n"
           b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
           b"Content-Length: " + str(len(payload)).encode()
           + b"\r\n\r\n" + payload + b"\r\n\r\n")
    path = os.path.join(str(tmp_path), "h.warc")
    open(path, "wb").write(rec)
    rows = list(_index_units(path))
    assert rows == oracle_index_warc(path)
    (r,) = rows
    assert r["mime"] is None and r["status"] is None
    assert r["digest"] == base64.b32encode(
        hashlib.sha1(payload).digest()).decode()


def test_write_cdxj_round_trip(tmp_path, ray_session):
    src = _stage(str(tmp_path), "rt.warc.gz")
    rows = list(_index_units(src))
    for ext in ("cdxj", "cdxj.gz"):
        shard = os.path.join(str(tmp_path), f"i.{ext}")
        write_cdxj(rows, shard)
        got = read_cdxj([shard]).to_pandas()
        # null-urlkey row skipped; ts truncated to seconds
        keep = [r for r in rows if r["urlkey"]]
        assert len(got) == len(keep)
        assert list(got["urlkey"]) == sorted(r["urlkey"] for r in keep)
        by_key = {r["urlkey"]: r for r in keep}
        for _, g in got.iterrows():
            want = by_key[g["urlkey"]]
            assert g["digest"] == want["digest"]
            assert int(g["offset"]) == want["offset"]
            assert int(g["length"]) == want["length"]
            assert g["ts"].to_pydatetime() == \
                want["ts"].replace(microsecond=0)


def test_build_cdx_dataset(tmp_path, ray_session):
    paths = [_stage(str(tmp_path), n)
             for n in ("a.warc", "b.warc.gz", "c.warc.zst")]
    got = build_cdx(paths).to_pandas()
    want = []
    for p in paths:
        want.extend(oracle_index_warc(p))
    assert len(got) == len(want)
    key = ["filename", "offset"]
    got = got.sort_values(key).reset_index(drop=True)
    import pandas as pd
    wdf = pd.DataFrame(want).sort_values(key).reset_index(drop=True)
    for c in ("urlkey", "url", "mime", "digest", "length", "offset",
              "filename"):
        assert list(got[c].fillna("~")) == \
            [("~" if v is None else v) for v in wdf[c]], c


def test_export_cdxj_partitioned_resumable(tmp_path, ray_session):
    import glob

    import ray.data as rd

    paths = [_stage(str(tmp_path), n)
             for n in ("a.warc", "b.warc.gz", "c.warc.zst")]
    out = os.path.join(str(tmp_path), "cdxj")
    from rayxt.cdx import export_cdxj

    summary = export_cdxj(build_cdx(paths), out, num_partitions=4)
    shards = sorted(glob.glob(os.path.join(out, "part-*.cdxj.gz")))
    assert shards
    # null-urlkey rows (the ftp capture per file) dropped pre-exchange
    want = [r for p in paths for r in oracle_index_warc(p)
            if r["urlkey"]]
    assert int(summary["rows"].sum()) == len(want)
    got = read_cdxj(shards).to_pandas()
    assert len(got) == len(want)
    assert set(got["digest"]) == {r["digest"] for r in want}
    # lineage sidecars, one per shard
    assert len(glob.glob(os.path.join(out, "lineage", "*.json"))) == \
        len(shards)
    # resume: a re-run skips every existing shard (mtimes unchanged)
    mt = {p: os.path.getmtime(p) for p in shards}
    export_cdxj(build_cdx(paths), out, num_partitions=4)
    assert {p: os.path.getmtime(p) for p in shards} == mt


@pytest.mark.parametrize("name", ["s.warc", "s.warc.gz", "s.warc.zst"])
def test_read_records_at_fetches_referenced_records(
        ray_session, tmp_path, name):
    import ray.data as rd

    from rayxt.warc import read_records_at

    path = _stage(str(tmp_path), name)
    coords = [r for r in _index_units(path)]
    ds = rd.from_items([
        {"filename": os.path.basename(path), "offset": r["offset"],
         "length": r["length"], "url": r["url"]} for r in coords])
    got = read_records_at(ds, str(tmp_path)).to_pandas()
    assert len(got) == len(ROWS)
    by_url = {r["url"]: r for _, r in got.iterrows()}
    for want in ROWS:
        r = by_url[want["url"]]
        assert bytes(r["html"]) == want["html"]
        # warc_ts truncation follows the writer's own date policy
        assert r["warc_ts"].to_pydatetime() == want["warc_ts"]


def test_read_records_at_subset_null_and_locality(ray_session,
                                                  tmp_path):
    import ray.data as rd

    from rayxt.warc import read_records_at

    path = _stage(str(tmp_path), "s.warc.gz")
    coords = list(_index_units(path))[1:3]
    items = [{"filename": os.path.basename(path), "offset": r["offset"],
              "length": r["length"]} for r in coords]
    items.append({"filename": None, "offset": None, "length": None})
    for loc in (True, False):
        got = read_records_at(rd.from_items(items), str(tmp_path),
                              locality=loc).to_pandas()
        assert sorted(got["url"]) == sorted(
            r["url"] for r in coords)
