"""JSONL sink/source: frozen serialization policy, typed round trips
(timestamps, binary-as-hex, nulls), shard byte-determinism, resume and
lineage."""

import glob
import gzip
import os
from datetime import datetime

import pyarrow as pa

from rayxt.jsonl import jsonl_dumps


def test_dumps_policy():
    assert jsonl_dumps({"b": 1, "a": "x"}) == '{"a":"x","b":1}'
    assert jsonl_dumps({"t": datetime(2025, 1, 2, 3, 4, 5, 123456)}) \
        == '{"t":"2025-01-02T03:04:05.123456"}'
    assert jsonl_dumps({"z": b"\x00\xff"}) == '{"z":"00ff"}'
    assert jsonl_dumps({"n": None}) == '{"n":null}'
    assert jsonl_dumps({"u": "héllo"}) == '{"u":"héllo"}'  # no \\u escapes


def _events_table(n=60):
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([datetime(2025, 1, 1 + i % 27, i % 24, 0, 0,
                                 i * 7919 % 1000000) for i in range(n)],
                       pa.timestamp("us")),
        "name": pa.array([None if i % 9 == 4 else f"e{i}"
                          for i in range(n)], pa.string()),
        "blob": pa.array([None if i % 11 == 7 else bytes([i % 256, 255])
                          for i in range(n)], pa.binary()),
        "value": pa.array([None if i % 13 == 5 else i * 0.1 + 1e-9
                           for i in range(n)], pa.float64()),
    })


def test_roundtrip_resume_and_determinism(ray_session, tmp_path):
    import ray.data as rd

    from rayxt.jsonl import read_jsonl, write_jsonl

    src = _events_table()
    out = str(tmp_path / "a")
    s = write_jsonl(rd.from_arrow(src).repartition(5), out, 4,
                    key_col="event_id")
    assert int(s["rows"].sum()) == src.num_rows
    files = sorted(glob.glob(os.path.join(out, "part-*.jsonl.gz")))
    assert files and len(glob.glob(os.path.join(out, "lineage", "*.json"))) \
        == len(files)
    # resume: shards untouched on re-run
    m = {f: os.path.getmtime(f) for f in files}
    write_jsonl(rd.from_arrow(src).repartition(3), out, 4,
                key_col="event_id")
    assert {f: os.path.getmtime(f) for f in files} == m
    # byte determinism: a different block layout writes identical bytes
    out2 = str(tmp_path / "b")
    write_jsonl(rd.from_arrow(src).repartition(7), out2, 4,
                key_col="event_id")
    for f in files:
        g = os.path.join(out2, os.path.basename(f))
        with gzip.open(f, "rb") as fa, gzip.open(g, "rb") as fb:
            assert fa.read() == fb.read(), f
    # typed read-back equals the source exactly
    got = read_jsonl(files, schema=src.schema).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = src.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert got.equals(want)


def test_reader_rejects_malformed(ray_session, tmp_path):
    import pytest
    import ray.data as rd

    from rayxt.jsonl import read_jsonl

    p = str(tmp_path / "bad.jsonl")
    with open(p, "w") as f:
        f.write('{"event_id":1}\nnot json\n')
    schema = pa.schema([("event_id", pa.int64())])
    with pytest.raises(Exception):
        read_jsonl([p], schema=schema).materialize()
