"""Ray Data pipeline tests (SURVEY P1-P15): extract, dedup, stats,
partitioned sink, manifest resume, two-tier skew split."""

import os
import shutil
import zlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fixtures.gen_pages import ensure_pages_parquet, generate_table
from rayxt.manifest import marker_path, read_lineage, scan_done
from rayxt.pipeline import (
    ExtractDocs,
    corpus_stats,
    dedup_latest_by_url,
    extract_pages,
    read_pages,
    rule_hit_totals,
    write_partitioned,
)

N_ROWS = 400
GIANT_CAP = 131072


@pytest.fixture(scope="module")
def pages_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    return ensure_pages_parquet(path, N_ROWS, giant_cap=GIANT_CAP)


def test_extract_docs_batch_direct():
    # smoke the actor class in-process (init errors surface early)
    batch = generate_table(50, GIANT_CAP)
    out = ExtractDocs()(batch.select(["url", "warc_ts", "html", "lang"]))
    assert out.num_rows == 50
    assert set(out.column("status").to_pylist()) <= {"ok", "empty", "error", "too_large"}
    ok = [t for t, s in zip(out.column("text").to_pylist(),
                            out.column("status").to_pylist()) if s == "ok"]
    assert any(ok)


def test_row_timeout_yields_timeout_status():
    """SURVEY P15 row-level deadline: a pathological document stops
    cooperatively with status='timeout'; generous deadlines and the
    default (None) leave results untouched."""
    import time

    from rayxt.kernel import extract_one
    from rayxt.programs import get_program_factory

    prog = get_program_factory("main_content")()
    # ~8 MB of dense tiny elements: far more than a few ms of parsing
    nasty = (b"<html><body>" + b"<p a='1'>x</p>" * 600_000 + b"</body></html>")
    t0 = time.time()
    r = extract_one(nasty, prog, timeout_s=0.005)
    assert r["status"] == "timeout"
    assert time.time() - t0 < 2.0  # stopped early, not after full parse
    ok = extract_one(b"<p>fine</p>", prog, timeout_s=5.0)
    assert ok["status"] == "ok" and ok["text"] == "fine"
    default = extract_one(b"<p>fine</p>", prog)
    assert default == ok


def test_extract_pipeline_and_stats(ray_session, pages_path):
    ds = read_pages(pages_path)
    ex = extract_pages(ds, concurrency=2, batch_size=32)
    stats = corpus_stats(ex).to_pandas()
    assert stats["docs"].sum() == N_ROWS
    assert stats["ok_docs"].sum() > 0.9 * N_ROWS
    hits = rule_hit_totals(
        extract_pages(read_pages(pages_path), concurrency=2)
    ).to_pandas()
    assert set(hits["rule"]) >= {"drop_tag", "drop_class"}
    assert (hits["hits"] > 0).all()


def test_two_tier_matches_single_tier(ray_session, pages_path):
    base = extract_pages(read_pages(pages_path), concurrency=1)
    # concurrency=1 per tier: the test session has 4 CPUs and two actor
    # pools plus task operators must all fit without starving each other
    tiered = extract_pages(
        read_pages(pages_path), concurrency=1, two_tier=True,
        size_threshold=32 * 1024,
    )
    a = base.select_columns(["url", "warc_ts", "text", "status"]).to_pandas()
    b = tiered.select_columns(["url", "warc_ts", "text", "status"]).to_pandas()
    key = ["url", "warc_ts"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_dedup_latest_by_url(ray_session, pages_path):
    ex = extract_pages(read_pages(pages_path), concurrency=2)
    before = ex.count()
    deduped = dedup_latest_by_url(ex)
    df = deduped.to_pandas()
    assert len(df) < before  # corpus contains duplicate urls by construction
    assert df["url"].is_unique
    # the kept row per duplicated url is the max-warc_ts one
    raw = extract_pages(read_pages(pages_path), concurrency=2).to_pandas()
    expected = raw.sort_values("warc_ts", kind="stable").groupby("url").tail(1)
    got = df.set_index("url")["warc_ts"].sort_index()
    want = expected.set_index("url")["warc_ts"].sort_index()
    assert got.equals(want)


def test_write_partitioned_lineage_and_resume(ray_session, pages_path, tmp_path):
    out_dir = str(tmp_path / "out")
    P = 8
    ex = extract_pages(read_pages(pages_path), concurrency=2)
    summary = write_partitioned(ex, out_dir, P, program_name="main_content")
    assert summary["rows"].sum() == N_ROWS
    assert scan_done(out_dir) == set(summary["part_id"])
    lineage = read_lineage(out_dir)
    assert sum(r["row_count"] for r in lineage) == N_ROWS
    assert all(r["engine_version"] and r["program"] == "main_content" for r in lineage)

    # all rows present, partitioned by crc32(url) % P
    total = 0
    for rec in lineage:
        pdir = os.path.join(out_dir, f"part_id={rec['part_id']:04d}", "part.parquet")
        t = pq.read_table(pdir)
        total += t.num_rows
    assert total == N_ROWS

    # resume: delete two markers, rerun -> only those partitions rewritten
    victims = sorted(scan_done(out_dir))[:2]
    mtimes_before = {}
    for pid in sorted(scan_done(out_dir)):
        f = os.path.join(out_dir, f"part_id={pid:04d}", "part.parquet")
        mtimes_before[pid] = os.stat(f).st_mtime_ns
    for pid in victims:
        os.remove(marker_path(out_dir, pid))
    ex2 = extract_pages(read_pages(pages_path), concurrency=2)
    summary2 = write_partitioned(ex2, out_dir, P, program_name="main_content")
    assert set(summary2["part_id"]) == set(victims)
    for pid, before_mtime in mtimes_before.items():
        f = os.path.join(out_dir, f"part_id={pid:04d}", "part.parquet")
        after = os.stat(f).st_mtime_ns
        if pid in victims:
            assert after != before_mtime
        else:
            assert after == before_mtime  # untouched partitions not rewritten


def test_streaming_sink_matches_exchange_sink(ray_session, pages_path, tmp_path):
    """Streaming (no-exchange) sink: same rows/values as the exchange
    sink, resume-compatible manifest, stale shards cleaned up."""
    import pandas as pd

    from rayxt.manifest import clean_partial_shards
    from rayxt.pipeline import write_partitioned_streaming

    P = 8
    out_a = str(tmp_path / "stream")
    out_b = str(tmp_path / "exchange")
    ex = extract_pages(read_pages(pages_path), concurrency=2)
    s_a = write_partitioned_streaming(ex, out_a, P)
    ex2 = extract_pages(read_pages(pages_path), concurrency=2)
    s_b = write_partitioned(ex2, out_b, P)
    assert s_a["rows"].sum() == N_ROWS == s_b["rows"].sum()
    assert scan_done(out_a) == scan_done(out_b) == set(s_a["part_id"])
    assert sum(r["row_count"] for r in read_lineage(out_a)) == N_ROWS

    def load(out_dir):
        frames = []
        for pid in scan_done(out_dir):
            pdir = os.path.join(out_dir, f"part_id={pid:04d}")
            t = pq.read_table(pdir).select(["url", "warc_ts", "text", "status"])
            frames.append(t.to_pandas())
        return (pd.concat(frames).sort_values(["url", "warc_ts"])
                .reset_index(drop=True))

    assert load(out_a).equals(load(out_b))

    # stale-shard cleanup: drop one marker, plant a fake leftover shard,
    # rerun -> the partial partition is rewritten without duplicates
    victim = sorted(scan_done(out_a))[0]
    os.remove(marker_path(out_a, victim))
    fake = os.path.join(out_a, f"part_id={victim:04d}", "shard-stale.parquet")
    vdir = os.path.dirname(fake)
    shutil.copy(os.path.join(vdir, sorted(os.listdir(vdir))[0]), fake)
    assert clean_partial_shards(out_a, scan_done(out_a)) >= 2
    ex3 = extract_pages(read_pages(pages_path), concurrency=2)
    s_resume = write_partitioned_streaming(ex3, out_a, P)
    assert set(s_resume["part_id"]) == {victim}
    assert load(out_a).equals(load(out_b))


def test_run_extraction_job_resume_skips_extraction(ray_session, pages_path, tmp_path):
    import time

    from rayxt.pipeline import run_extraction_job

    out_dir = str(tmp_path / "job_out")
    t0 = time.time()
    s1 = run_extraction_job(pages_path, out_dir, 8, concurrency=2, batch_size=64)
    t_full = time.time() - t0
    assert s1["rows"].sum() == N_ROWS

    # delete ONE marker; the rerun must re-extract only that partition's
    # rows (the filter sits before the parse stage)
    victims = sorted(scan_done(out_dir))[:1]
    for pid in victims:
        os.remove(marker_path(out_dir, pid))
    t0 = time.time()
    s2 = run_extraction_job(pages_path, out_dir, 8, concurrency=2, batch_size=64)
    t_resume = time.time() - t0
    assert set(s2["part_id"]) == set(victims)
    # resumed run processes ~1/8 of the rows; it must be clearly cheaper
    assert s2["rows"].sum() < N_ROWS / 2
    # final state equals a complete run (streaming sink: shard files per
    # partition directory, part_id recovered from the hive dir name)
    total = 0
    for pid in scan_done(out_dir):
        pdir = os.path.join(out_dir, f"part_id={pid:04d}")
        total += pq.read_table(pdir).num_rows
    assert total == N_ROWS


def test_shard_writes_are_retry_idempotent(tmp_path):
    """Replaying the SAME batch (Ray task retry) must overwrite the
    shard file, not add a duplicate — names derive from content."""
    from rayxt.pipeline import _write_shard_batch

    batch = pa.table({
        "url": pa.array([f"http://e{i}.com/x" for i in range(20)]),
        "warc_ts": pa.array(list(range(20)), pa.int64()),
        "text": pa.array(["t"] * 20),
        "status": pa.array(["ok"] * 20),
        "part_id": pa.array([3] * 10 + [5] * 10, pa.int64()),
    })
    out = str(tmp_path / "sink")
    _write_shard_batch(batch, out_dir=out)
    files_1 = {
        (d, f) for d in os.listdir(out)
        for f in os.listdir(os.path.join(out, d))
    }
    _write_shard_batch(batch, out_dir=out)  # simulated retry
    files_2 = {
        (d, f) for d in os.listdir(out)
        for f in os.listdir(os.path.join(out, d))
    }
    assert files_1 == files_2 and len(files_1) == 2
    total = sum(
        pq.read_table(os.path.join(out, d)).num_rows
        for d in os.listdir(out)
    )
    assert total == 20  # no duplicated rows
    # different content -> different name (no accidental overwrite)
    batch2 = batch.set_column(0, "url", pa.array(
        [f"http://f{i}.com/y" for i in range(20)]))
    _write_shard_batch(batch2, out_dir=out)
    files_3 = {
        (d, f) for d in os.listdir(out)
        for f in os.listdir(os.path.join(out, d))
    }
    assert len(files_3) == 4


def test_fresh_run_resets_markers_and_lineage(ray_session, pages_path, tmp_path):
    """resume=False must not inherit a previous run's commit state."""
    from rayxt.manifest import read_lineage
    from rayxt.pipeline import write_partitioned_streaming

    out = str(tmp_path / "fresh")
    P = 8
    s1 = write_partitioned_streaming(
        extract_pages(read_pages(pages_path), concurrency=2), out, P)
    assert len(scan_done(out)) > 1
    # second run sees only part of the data (simulates a narrower input):
    # stale markers/lineage of partitions ABSENT from this run must go
    keep = sorted(s1["part_id"])[0]
    narrow = extract_pages(read_pages(pages_path), concurrency=2).filter(
        lambda r: (zlib.crc32(r["url"].encode()) % P) == keep)
    s2 = write_partitioned_streaming(narrow, out, P, resume=False)
    assert set(s2["part_id"]) == {keep}
    assert scan_done(out) == {keep}
    assert {r["part_id"] for r in read_lineage(out)} == {keep}


def test_runtime_env_py_modules_ships_engine(tmp_path):
    """Multi-node realism (VERDICT r3 item 8): a worker whose sys.path
    cannot see this repo must still run the extraction kernel when the
    package ships via the job-level runtime_env={"py_modules": [...]}
    — the real cluster deployment story.  Runs in a SUBPROCESS with its
    own ray.init because py_modules upload is job-level only; the
    worker scrubs every repo path and drops preloaded rayxt modules
    BEFORE importing, then proves the import resolved to the shipped
    copy and produces byte-identical text."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "ship_check.py"
    script.write_text("""
import os, sys
repo = sys.argv[1]
sys.path.insert(0, repo)
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR",
         runtime_env={"py_modules": [os.path.join(repo, "rayxt")]})
html = (b"<html><body><article><h1>T</h1><p>hello</p>"
        b"<script>x()</script><p>world</p></article></body></html>")
from rayxt.kernel import extract_one
from rayxt.programs import get_program_factory
local = extract_one(html, get_program_factory("main_content")())

@ray.remote(num_cpus=1)
def extract_remote(payload, repo_root):
    import sys
    sys.path = [p for p in sys.path if not (p or "").startswith(repo_root)]
    for name in [m for m in sys.modules if m.split(".")[0] == "rayxt"]:
        del sys.modules[name]
    import rayxt  # must resolve via the shipped py_modules copy
    from rayxt.kernel import extract_one as ex
    from rayxt.programs import get_program_factory as gpf
    out = ex(payload, gpf("main_content")())
    return rayxt.__file__, out["status"], out["text"]

mod_file, status, text = ray.get(extract_remote.remote(html, repo))
assert not mod_file.startswith(repo), mod_file
assert "_ray_pkg" in mod_file or "runtime_resources" in mod_file, mod_file
assert status == local["status"] == "ok"
assert text.encode() == local["text"].encode()
ray.shutdown()
print("SHIP_OK")
""")
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # force a brand-new local instance
    proc = subprocess.run(
        [sys.executable, str(script), repo], capture_output=True,
        text=True, timeout=240, env=env, cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "SHIP_OK" in proc.stdout


def test_program_overrides_route_by_host(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rayxt.pipeline import extract_pages

    html = (b"<html><body><nav>menu</nav>"
            b"<article><p>real content words here for density scoring "
            b"and more real content words here</p></article>"
            b"<footer>f</footer></body></html>")
    from datetime import datetime

    src = pa.table({
        "url": ["https://a.example.com/1", "https://b.example.com/2"],
        "warc_ts": pa.array([datetime(2025, 1, 1)] * 2,
                            pa.timestamp("us")),
        "html": [html, html],
        "lang": [None, None],
    })
    plain = extract_pages(rd.from_arrow(src), concurrency=1) \
        .to_pandas().set_index("url")
    mixed = extract_pages(
        rd.from_arrow(src), concurrency=1,
        program_overrides={"b.example.com": "heuristic_content"},
    ).to_pandas().set_index("url")
    # non-override host identical to the plain run
    assert mixed.loc["https://a.example.com/1", "text"] == \
        plain.loc["https://a.example.com/1", "text"]
    # override host ran the heuristic program
    from rayxt.boilerplate import main_content_from_root
    from rayxt.dom import parse_html

    want, _, _ = main_content_from_root(parse_html(html))
    assert mixed.loc["https://b.example.com/2", "text"] == want
    assert (mixed["status"] == "ok").all()
