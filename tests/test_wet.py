"""WET conversion-record format: writer/reader byte round trip,
mixed-record filtering, distributed export + resume."""

import glob
import gzip
import io
import os
from datetime import datetime

import pyarrow as pa

from rayxt.warc import (export_wet, parse_warc_records, read_wet,
                        write_warc, write_wet)

ROWS = [
    {"url": "https://a/x", "warc_ts": datetime(2025, 1, 2, 3, 4, 5, 123456),
     "text": "héllo\nwörld — ’quotes’"},
    {"url": "https://b/y", "warc_ts": datetime(2025, 1, 2, 3, 4, 5),
     "text": ""},
    {"url": "https://c/z", "warc_ts": datetime(2024, 6, 1),
     "text": "x" * 10_000},
]


def _parse(path):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        return list(parse_warc_records(io.BufferedReader(f),
                                       record_types=(b"conversion",)))


def test_wet_roundtrip_plain_and_gz(tmp_path):
    for name in ("t.warc.wet", "t.warc.wet.gz"):
        path = str(tmp_path / name)
        write_wet(ROWS, path)
        got = _parse(path)
        assert len(got) == len(ROWS)
        for (u, ts, body), r in zip(got, ROWS):
            assert u == r["url"]
            assert ts == r["warc_ts"]  # microsecond precision survives
            assert body.decode("utf-8") == r["text"]


def test_response_records_invisible_to_wet_reader(tmp_path):
    path = str(tmp_path / "mixed.warc")
    write_warc([{"url": "https://a/x",
                 "warc_ts": datetime(2025, 1, 1),
                 "html": b"<p>hi</p>"}], path)
    assert _parse(path) == []  # response-only file: no conversion rows


def test_export_wet_roundtrip_and_resume(ray_session, tmp_path):
    import ray.data as rd

    src = pa.table({
        "url": [f"https://h{i % 7}.example.org/p/{i}" for i in range(120)],
        "warc_ts": pa.array(
            [datetime(2025, 1, 1 + i % 28, i % 24, 0, 0, i * 7 % 1000000)
             for i in range(120)], pa.timestamp("us")),
        "text": [f"doc {i} body é{i}" for i in range(120)],
    })
    out = str(tmp_path / "wet")
    summary = export_wet(rd.from_arrow(src), out, num_partitions=8)
    assert int(summary["rows"].sum()) == 120
    files = sorted(glob.glob(os.path.join(out, "*.wet.gz")))
    assert 0 < len(files) <= 8

    back = read_wet(files).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    want = src.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(back["url"]) == list(want["url"])
    assert list(back["text"]) == list(want["text"])
    assert list(back["warc_ts"]) == list(want["warc_ts"])

    # resume: a second export skips every existing shard (bytes equal)
    before = {f: open(f, "rb").read() for f in files}
    export_wet(rd.from_arrow(src), out, num_partitions=8)
    for f in files:
        assert open(f, "rb").read() == before[f]


def test_export_wet_lineage_sidecars(ray_session, tmp_path):
    import json

    import ray.data as rd
    from datetime import datetime

    src = pa.table({
        "url": [f"https://h{i % 3}.org/{i}" for i in range(30)],
        "warc_ts": pa.array([datetime(2025, 1, 1)] * 30,
                            pa.timestamp("us")),
        "text": [f"t{i}" for i in range(30)],
    })
    out = str(tmp_path / "wet")
    summary = export_wet(rd.from_arrow(src), out, num_partitions=4)
    sidecars = sorted(glob.glob(os.path.join(out, "lineage", "*.json")))
    assert len(sidecars) == len(summary)
    total = 0
    for f in sidecars:
        rec = json.load(open(f))
        assert rec["bytes_out"] > 0 and rec["engine_version"]
        total += rec["rows"]
    assert total == 30
