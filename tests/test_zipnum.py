"""ZipNum cluster index: structural layout vs the independent oracle,
seek-based lookup parity, determinism / batching independence, tie
runs spanning blocks, resume, and full-scan read-back."""

import glob
import os
from datetime import datetime, timedelta

import pyarrow as pa
import pytest

from rayxt.cdx import (_CDX_SCHEMA, export_zipnum, load_cluster_idx,
                       read_cdxj, write_zipnum_part, zipnum_lookup)
from tests.oracle.zipnum_oracle import (oracle_zipnum_lookup,
                                        parse_cluster_idx,
                                        verify_zipnum_layout)


def _rows(n=400, hosts=40):
    rows = []
    for i in range(n):
        h = i % hosts
        rows.append({
            "urlkey": f"com,example,h{h:03d})/p/{i:05d}",
            "ts": datetime(2026, 1, 1) + timedelta(seconds=i),
            "url": f"https://h{h:03d}.example.com/p/{i:05d}",
            "mime": "text/html",
            "status": 200 if i % 7 else 404,
            "digest": f"D{i:05d}",
            "length": 100 + i,
            "offset": 13 * i,
            "filename": "seg-0.warc.gz",
        })
    # unindexable rows the exporter must drop
    rows.append({"urlkey": None, "ts": datetime(2026, 1, 1),
                 "url": "ftp://x/", "mime": None, "status": None,
                 "digest": None, "length": None, "offset": None,
                 "filename": None})
    rows.append({"urlkey": "zz,late)/x", "ts": None, "url": None,
                 "mime": None, "status": None, "digest": None,
                 "length": None, "offset": None, "filename": None})
    return rows


def _table(rows):
    cols = {n: [r[n] for r in rows] for n in _CDX_SCHEMA.names}
    return pa.table({n: pa.array(cols[n], _CDX_SCHEMA.field(n).type)
                     for n in _CDX_SCHEMA.names}, schema=_CDX_SCHEMA)


def _export(ray_session, tmp, rows, **kw):
    import ray.data as rd

    kw.setdefault("num_parts", 6)
    kw.setdefault("lines_per_block", 32)
    kw.setdefault("sample_mod", 4)
    export_zipnum(rd.from_arrow(_table(rows)), tmp, **kw)
    return tmp


def test_layout_verifies_and_drops_unindexable(ray_session, tmp_path):
    out = _export(ray_session, str(tmp_path / "z"), _rows())
    lines = verify_zipnum_layout(out, 32)
    assert len(lines) == 400  # the two null-key/ts rows dropped
    assert len(glob.glob(os.path.join(out, "cdx-*.gz"))) > 1
    assert len(glob.glob(os.path.join(out, "lineage", "*.json"))) > 1


def test_lookup_parity_with_oracle(ray_session, tmp_path):
    out = _export(ray_session, str(tmp_path / "z"), _rows())
    lines = verify_zipnum_layout(out, 32)
    probes = [
        ("com,example,h003)", False),      # one host prefix
        ("com,example,h00", False),        # broad prefix, many hosts
        ("com,example,h003)/p/00003", False),
        ("com,example,h039)/p/00399", True),   # exact key, last line
        ("com,example,h000)/p/00000", True),   # exact key, first line
        ("org,absent)", False),            # no match
        ("com,example,h", False),          # everything
    ]
    for prefix, exact in probes:
        got = zipnum_lookup(out, prefix, exact=exact).to_pylist()
        want = oracle_zipnum_lookup(lines, prefix, exact=exact)
        assert got == want, prefix
    # multi-prefix call concatenates in prefix order
    got = zipnum_lookup(
        out, ["com,example,h001)", "com,example,h002)"]).to_pylist()
    want = (oracle_zipnum_lookup(lines, "com,example,h001)")
            + oracle_zipnum_lookup(lines, "com,example,h002)"))
    assert got == want


def test_tie_run_spans_blocks(ray_session, tmp_path):
    # >lines_per_block captures of ONE urlkey: the tie run must span
    # gzip blocks and the lookup must still return every capture
    rows = []
    for i in range(90):
        rows.append({
            "urlkey": "com,example,tie)/only",
            "ts": datetime(2026, 2, 1) + timedelta(seconds=i),
            "url": "https://tie.example.com/only",
            "mime": "text/html", "status": 200, "digest": f"T{i}",
            "length": 1, "offset": i, "filename": "f.warc.gz"})
    rows += _rows(40)
    out = _export(ray_session, str(tmp_path / "z"), rows,
                  lines_per_block=16)
    lines = verify_zipnum_layout(out, 16)
    got = zipnum_lookup(out, "com,example,tie)/only",
                        exact=True).to_pylist()
    assert len(got) == 90
    assert got == oracle_zipnum_lookup(lines, "com,example,tie)/only",
                                       exact=True)


def _dir_bytes(out):
    blobs = {}
    for p in sorted(glob.glob(os.path.join(out, "cdx-*.gz"))):
        blobs[os.path.basename(p)] = open(p, "rb").read()
    blobs["cluster.idx"] = open(os.path.join(out, "cluster.idx"),
                                "rb").read()
    return blobs


def test_deterministic_and_batching_independent(ray_session, tmp_path):
    import ray.data as rd

    rows = _rows()
    a = _export(ray_session, str(tmp_path / "a"), rows)
    out_b = str(tmp_path / "b")
    export_zipnum(rd.from_arrow(_table(rows)).repartition(7), out_b,
                  num_parts=6, lines_per_block=32, sample_mod=4)
    assert _dir_bytes(a) == _dir_bytes(out_b)


def test_resume_rewrites_only_missing_part(ray_session, tmp_path):
    rows = _rows()
    out = _export(ray_session, str(tmp_path / "z"), rows)
    parts = sorted(glob.glob(os.path.join(out, "cdx-*.gz")))
    victim = parts[1]
    keep = parts[0]
    before = os.path.getmtime(keep)
    os.remove(victim)
    os.remove(os.path.join(out, "cluster.idx"))
    _export(ray_session, out, rows)
    assert os.path.exists(victim)
    assert os.path.getmtime(keep) == before  # untouched -> resumed
    verify_zipnum_layout(out, 32)


def test_full_scan_readback(ray_session, tmp_path):
    rows = _rows()
    out = _export(ray_session, str(tmp_path / "z"), rows)
    got = read_cdxj(sorted(glob.glob(os.path.join(out, "cdx-*.gz"))))
    assert got.count() == 400


def test_empty_dataset(ray_session, tmp_path):
    out = _export(ray_session, str(tmp_path / "z"), [])
    assert load_cluster_idx(out) == []
    assert zipnum_lookup(out, "anything").num_rows == 0


def test_write_part_block_geometry(tmp_path):
    rows = _rows(70, hosts=7)
    path = str(tmp_path / "cdx-00000.gz")
    entries = write_zipnum_part(rows, path, lines_per_block=32)
    assert [e[1] for e in entries] == [0, entries[1][1], entries[2][1]]
    assert entries[0][1] == 0
    assert sum(e[2] for e in entries) == os.path.getsize(path)
    assert len(entries) == 3  # 32 + 32 + 6


def test_zipnum_fetch_parity_and_modes(ray_session, tmp_path):
    import ray.data as rd

    from rayxt.cdx import zipnum_fetch

    out = _export(ray_session, str(tmp_path / "z"), _rows())
    lines = verify_zipnum_layout(out, 32)

    # prefix mode, with a no-match and a null probe in the stream
    probes = ["com,example,h003)", "org,absent)", None,
              "com,example,h01", "com,example,h000)/p/00000"]
    pds = rd.from_items([{"urlkey": p} for p in probes])
    got = zipnum_fetch(pds, out, exact=False,
                       concurrency=(1, 2)).to_pandas()
    for p in probes:
        if p is None:
            continue
        want = oracle_zipnum_lookup(lines, p)
        sub = got[got["probe"] == p].drop(columns=["probe"])
        assert sub.to_dict("records") == [
            {**r, "ts": __import__("pandas").Timestamp(r["ts"])}
            for r in want]
    assert got[got["probe"] == "org,absent)"].empty

    # exact mode + locality sort: every key fetches its own captures
    keys = sorted({ln.split(" ", 1)[0] for ln in lines})
    kds = rd.from_items([{"urlkey": k} for k in keys]).repartition(3)
    got2 = zipnum_fetch(kds, out, exact=True, locality=True,
                        concurrency=(1, 2)).to_pandas()
    assert len(got2) == len(lines)
    assert (got2["probe"] == got2["urlkey"]).all()


def test_randomized_lookup_parity_brute_force(tmp_path):
    """Randomized corpora through write_zipnum_part + a hand-assembled
    cluster.idx (the documented format), then zipnum_lookup for
    random prefixes vs a linear scan — exercises the summary bisect
    arithmetic on ties, block boundaries, absent keys and the empty
    prefix, with no Ray in the loop."""
    import random
    from datetime import datetime, timedelta

    from tests.oracle.zipnum_oracle import verify_zipnum_layout

    rng = random.Random(1234)
    alphabet = ["com,a)", "com,ab)", "com,abc)", "com,b)", "net,x)",
                "org,zz)"]
    for trial in range(40):
        n = rng.randrange(1, 60)
        rows = []
        for i in range(n):
            key = (rng.choice(alphabet)
                   + rng.choice(["/", "/p", "/p/q", "/q"]))
            rows.append({
                "urlkey": key,
                "ts": datetime(2026, 1, 1)
                + timedelta(seconds=rng.randrange(5)),
                "url": f"https://u/{i}", "mime": "text/html",
                "status": 200, "digest": None, "length": None,
                "offset": None, "filename": None})
        lpb = rng.randrange(1, 6)
        out = tmp_path / f"t{trial}"
        out.mkdir()
        # split the sorted key space into 1-3 range parts by cutting
        # the sorted row list (any cut preserves global order)
        rows.sort(key=lambda r: (r["urlkey"],
                                 r["ts"].strftime("%Y%m%d%H%M%S"),
                                 r["url"]))
        cuts = sorted(rng.sample(range(n + 1),
                                 rng.randrange(0, min(3, n + 1))))
        pieces = []
        prev = 0
        for c in cuts + [n]:
            pieces.append(rows[prev:c])
            prev = c
        seq = 0
        with open(out / "cluster.idx", "w") as idxf:
            for pid, piece in enumerate(p for p in pieces if p):
                name = f"cdx-{pid:05d}.gz"
                entries = write_zipnum_part(
                    piece, str(out / name), lines_per_block=lpb)
                for key, off, length in entries:
                    seq += 1
                    idxf.write(f"{key}\t{name}\t{off}\t{length}\t{seq}\n")
        all_lines = verify_zipnum_layout(str(out), lpb)
        probes = (["", "com,", "zz", "com,ab)", "com,abc)/p"]
                  + [rng.choice(all_lines)[:rng.randrange(1, 20)]
                     for _ in range(5)])
        for p in probes:
            got = [f"{r['urlkey']} {r['ts'].strftime('%Y%m%d%H%M%S')}"
                   for r in zipnum_lookup(str(out), p).to_pylist()]
            want = [" ".join(ln.split(" ", 2)[:2])
                    for ln in all_lines if ln.startswith(p)]
            assert got == want, (trial, p)


def test_cli_index_lookup(ray_session, tmp_path, capsys):
    from rayxt.cli import main

    out = _export(ray_session, str(tmp_path / "z"), _rows())
    rc = main(["index-lookup", out, "com,example,h003)"])
    text = capsys.readouterr().out
    lines = text.strip().split("\n")
    assert rc == 0
    assert lines[0].split("\t")[0] == "urlkey"
    assert len(lines) - 1 == 10  # h003 carries 10 captures
    assert all(ln.startswith("com,example,h003)")
               for ln in lines[1:])
    # absent prefix: empty result, exit code 1
    rc = main(["index-lookup", out, "org,absent)"])
    assert rc == 1
    assert capsys.readouterr().out.strip().split("\n") == [
        "urlkey\tts\turl\tmime\tstatus\tdigest\tlength\toffset"
        "\tfilename"]
