"""WAT metadata-record format: envelope policy vs the independent
outlink/metadata oracles, writer/reader round trip, distributed export
+ resume + lineage, and the read-back link flattener."""

import glob
import gzip
import io
import json
import os
from datetime import datetime

from fixtures.gen_pages import generate_meta_table, link_page_of
from rayxt.wat import wat_of, write_wat
from rayxt.warc import parse_warc_records


def _parse(path):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        return list(parse_warc_records(io.BufferedReader(f),
                                       record_types=(b"metadata",)))


def _env(url, html):
    r = wat_of(url, datetime(2025, 1, 2, 3, 4, 5), html)
    assert r["status"] == "ok"
    return json.loads(r["wat"])["Envelope"]


def test_envelope_links_match_linkgraph_oracle():
    from tests.oracle.linkgraph_oracle import oracle_outlinks

    checked = 0
    for i in range(60):
        url, html = link_page_of(i)
        env = _env(url, html)
        got = {(o["url"], o["text"], 1 if o.get("rel") == "nofollow" else 0):
               o["count"]
               for o in env["Payload-Metadata"]["HTTP-Response-Metadata"]
               ["HTML-Metadata"]["Links"]}
        want = {(dst, anchor, nf): n
                for (dst, _dh, nf, anchor), n
                in oracle_outlinks(url, html, with_anchor=True).items()}
        assert got == want, url
        checked += len(want)
    assert checked > 50  # the family actually exercises links


def test_envelope_title_matches_metadata_oracle():
    from tests.oracle.metadata_oracle import oracle_metadata

    t = generate_meta_table(60)
    for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
        r = wat_of(u, datetime(2025, 1, 1), h)
        want = oracle_metadata(u, h)
        assert r["status"] == want["status"]
        if r["status"] != "ok":
            assert r["wat"] is None
            continue
        head = json.loads(r["wat"])["Envelope"]["Payload-Metadata"] \
            ["HTTP-Response-Metadata"]["HTML-Metadata"]["Head"]
        assert head.get("Title") == (want["title"]
                                     if want["title"] is not None else None)


def test_envelope_header_metadata_and_determinism():
    url, html = link_page_of(3)
    env = _env(url, html)
    hm = env["WARC-Header-Metadata"]
    assert hm["WARC-Target-URI"] == url
    assert hm["WARC-Type"] == "response"
    assert hm["WARC-Date"] == "2025-01-02T03:04:05Z"
    # deterministic serialization: same input -> same bytes
    a = wat_of(url, datetime(2025, 1, 2, 3, 4, 5), html)["wat"]
    b = wat_of(url, datetime(2025, 1, 2, 3, 4, 5), html)["wat"]
    assert a == b


def test_wat_roundtrip_plain_and_gz(tmp_path):
    rows = [
        {"url": "https://a/x",
         "warc_ts": datetime(2025, 1, 2, 3, 4, 5, 123456),
         "wat": '{"Envelope":{"x":"é—’"}}'},
        {"url": "https://b/y", "warc_ts": datetime(2025, 1, 2, 3, 4, 5),
         "wat": "{}"},
    ]
    for name in ("t.warc.wat", "t.warc.wat.gz"):
        path = str(tmp_path / name)
        write_wat(rows, path)
        got = _parse(path)
        assert len(got) == len(rows)
        for (u, ts, body), r in zip(got, rows):
            assert u == r["url"]
            assert ts == r["warc_ts"]  # microsecond precision survives
            assert body.decode("utf-8") == r["wat"]


def test_export_wat_roundtrip_resume_and_flatten(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from rayxt.wat import export_wat, flatten_wat_links, read_wat

    pages = [link_page_of(i) for i in range(40)]
    src = pa.table({
        "url": [p[0] for p in pages],
        "warc_ts": pa.array(
            [datetime(2025, 1, 1 + i % 28, i % 24, 0, 0, i * 7 % 1000000)
             for i in range(40)], pa.timestamp("us")),
        "html": pa.array([p[1] for p in pages] , pa.binary()),
    })
    out = str(tmp_path / "wat")
    summary = export_wat(rd.from_arrow(src).repartition(4), out,
                         num_partitions=4)
    assert int(summary["rows"].sum()) == 40
    files = sorted(glob.glob(os.path.join(out, "part-*.warc.wat.gz")))
    assert files
    # lineage sidecars land after the shards
    lineage = sorted(glob.glob(os.path.join(out, "lineage", "*.json")))
    assert len(lineage) == len(files)
    # resume: second run rewrites nothing
    mtimes = {f: os.path.getmtime(f) for f in files}
    export_wat(rd.from_arrow(src).repartition(4), out, num_partitions=4)
    assert {f: os.path.getmtime(f) for f in files} == mtimes
    # read-back + flatten equals the kernel's own link policy
    got = flatten_wat_links(read_wat(files)).to_pandas()
    from rayxt.linkgraph import page_outlinks

    want_n = sum(len(page_outlinks(u, h, with_anchor=True))
                 for u, h in pages)
    assert len(got) == want_n


def test_non_ok_pages_dropped_by_export(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from rayxt.wat import export_wat

    src = pa.table({
        "url": ["https://a/1", "https://a/2"],
        "warc_ts": pa.array([datetime(2025, 1, 1)] * 2, pa.timestamp("us")),
        "html": pa.array([b"<p><a href='/x'>l</a></p>", None], pa.binary()),
    })
    out = str(tmp_path / "wat2")
    summary = export_wat(rd.from_arrow(src), out, num_partitions=2)
    assert int(summary["rows"].sum()) == 1
