"""WAT (web-archive metadata) derived format — the third of Common
Crawl's record layouts next to WARC (``rayxt/warc.py``) and WET.

A WAT file is a WARC whose records are ``WARC-Type: metadata`` with a
JSON "Envelope" payload describing the capture: the original record's
WARC headers plus HTML metadata (head title, outgoing links).  This
module implements a FROZEN SUBSET of that layout, built entirely from
operators whose policies are already golden-pinned:

* ``Links``: one entry per distinct ``(dst_url, anchor, nofollow)`` in
  first-occurrence document order — the outlink extractor's policy
  (``rayxt/linkgraph.py``: RFC 3986 resolution, base rebase, nofollow
  rel, 200-char normalized anchors).  Each entry always carries
  ``url`` (the resolved destination), ``text`` (the anchor, possibly
  empty) and ``count``; ``rel: "nofollow"`` appears only on nofollow
  links.  Aggregating with counts instead of repeating occurrences is
  a deliberate divergence from CC's WAT (documented here; it keeps the
  envelope lossless w.r.t. the outlinks operator).
* ``Head.Title``: the head-metadata policy's title
  (``rayxt/metadata.py``); the key is absent when the title is null.
* Envelope JSON is serialized deterministically:
  ``json.dumps(sort_keys=True, separators=(",", ":"),
  ensure_ascii=False)``.
* Record headers: ``WARC-Target-URI``, ``WARC-Date`` (the same
  second/microsecond precision policy as ``write_warc``),
  ``Content-Type: application/json``.
* Pages with null/zero-byte html are ``status=empty``, parse failures
  ``status=error``; both carry a null ``wat`` and are dropped by the
  exporter (CC emits WAT only for captures it could parse).

Scale shape mirrors the WET exporter: envelope construction is one
actor-pool ``map_batches`` stage (html dropped in-stage, only narrow
JSON rows reach the exchange); ``export_wat`` hash-partitions by url
and writes one atomic ``part-NNNN.warc.wat.gz`` per partition with
resume-on-rerun and P12 lineage sidecars; ``read_wat`` is a
``FileBasedDatasource`` streaming the record walk.
"""

from __future__ import annotations

import gzip
import io
import json

import pyarrow as pa

# module-level so the by-value pickle captures the value: a runtime
# relative import inside a worker-side UDF dies when the driver runs
# from outside the repo (see the ExtractDocs NOTE)
from . import __version__
from .linkgraph import page_outlinks
from .metadata import page_metadata
from .warc import _CRLF, _NativeWrapper, _warc_date, parse_warc_records

__all__ = ["WAT_SCHEMA", "wat_envelope", "build_wat", "write_wat",
           "read_wat", "export_wat", "flatten_wat_links"]

WAT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("wat", pa.string()),
])


def wat_envelope(url: str, warc_date: str, links, title) -> str:
    """Deterministic envelope JSON for one capture.

    ``links``: iterable of ``(dst_url, anchor, nofollow, count)``.
    """
    link_objs = []
    for dst, anchor, nofollow, count in links:
        obj = {"url": dst, "text": anchor, "count": int(count)}
        if nofollow:
            obj["rel"] = "nofollow"
        link_objs.append(obj)
    head = {}
    if title is not None:
        head["Title"] = title
    env = {"Envelope": {
        "WARC-Header-Metadata": {
            "WARC-Target-URI": url,
            "WARC-Date": warc_date,
            "WARC-Type": "response",
        },
        "Payload-Metadata": {"HTTP-Response-Metadata": {"HTML-Metadata": {
            "Head": head,
            "Links": link_objs,
        }}},
    }}
    return json.dumps(env, sort_keys=True, separators=(",", ":"),
                      ensure_ascii=False)


def wat_of(url: str, warc_ts, html) -> dict:
    """Per-document kernel: ``{"wat": str|None, "status": str}``."""
    if html is None or len(html) == 0:
        return {"wat": None, "status": "empty"}
    try:
        meta = page_metadata(url, html)
        if meta["status"] != "ok":
            return {"wat": None, "status": meta["status"]}
        links = page_outlinks(url, html, with_anchor=True)
        date, _version = _warc_date(warc_ts)
        env = wat_envelope(
            url, date,
            ((dst, anchor, nf, n)
             for (dst, _dh, nf, anchor), n in links.items()),
            meta["title"])
        return {"wat": env, "status": "ok"}
    except Exception:
        return {"wat": None, "status": "error"}


class BuildWat:
    """Actor-pool stage: ``(url, warc_ts, html, ...)`` ->
    ``(url, warc_ts, wat, status)`` rows."""

    def __init__(self):
        self._kernel = wat_of  # warm per-actor handle

    def __call__(self, batch: pa.Table) -> pa.Table:
        kernel = self._kernel
        urls = batch["url"].to_pylist()
        tss = batch["warc_ts"].to_pylist()
        rows = [kernel(u, ts, h) for u, ts, h
                in zip(urls, tss, batch["html"].to_pylist())]
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "wat": pa.array([r["wat"] for r in rows], pa.string()),
            "status": pa.array([r["status"] for r in rows], pa.string()),
        })


def build_wat(ds, *, batch_size: int = 64, concurrency=(1, 8)):
    """WAT envelope rows for every page: zero-exchange narrow output
    (html is pruned to the stage and dropped inside it)."""
    return ds.select_columns(["url", "warc_ts", "html"]).map_batches(
        BuildWat, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


def write_wat(rows, path: str, *, gzip_members: bool | None = None,
              warcinfo: bytes = b"software: rayxt\r\n") -> str:
    """WAT writer: one warcinfo record + one ``metadata`` record per
    (url, warc_ts, wat) row.  ``.gz`` paths write one gzip member per
    record for seekability."""
    if gzip_members is None:
        gzip_members = path.endswith(".gz")

    def record(rtype: bytes, headers: list, payload: bytes,
               version: bytes = b"WARC/1.0") -> bytes:
        head = [version,
                b"WARC-Type: " + rtype,
                *headers,
                b"Content-Length: " + str(len(payload)).encode()]
        return (_CRLF.join(head) + _CRLF + _CRLF + payload
                + _CRLF + _CRLF)

    def emit(out, blob: bytes):
        if gzip_members:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(blob)
            out.write(buf.getvalue())
        else:
            out.write(blob)

    with open(path, "wb") as out:
        emit(out, record(b"warcinfo",
                         [b"Content-Type: application/warc-fields"],
                         warcinfo))
        for r in rows:
            date, version = _warc_date(r["warc_ts"])
            payload = (r["wat"] or "").encode("utf-8")
            emit(out, record(
                b"metadata",
                [b"WARC-Target-URI: " + r["url"].encode(),
                 b"WARC-Date: " + date.encode(),
                 b"Content-Type: application/json"],
                payload, version))
    return path


def read_wat(paths, *, batch_rows: int = 256, **kwargs):
    """WAT/WAT-gz files -> Dataset(url, warc_ts, wat): one row per
    ``metadata`` record, payload decoded as UTF-8."""
    import ray.data as rd
    from ray.data.datasource import FileBasedDatasource

    class WatDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["wat", "warc", "gz"]

        def _read_stream(self, f, path: str):
            stream = io.BufferedReader(_NativeWrapper(f))
            if stream.peek(2)[:2] == b"\x1f\x8b":
                stream = io.BufferedReader(gzip.GzipFile(fileobj=stream))
            urls, tss, wats = [], [], []
            for url, ts, body in parse_warc_records(
                    stream, record_types=(b"metadata",)):
                urls.append(url)
                tss.append(ts)
                wats.append(body.decode("utf-8", "replace"))
                if len(urls) >= batch_rows:
                    yield _wat_table(urls, tss, wats)
                    urls, tss, wats = [], [], []
            if urls:
                yield _wat_table(urls, tss, wats)

    return rd.read_datasource(WatDatasource(paths, **kwargs))


def _wat_table(urls, tss, wats) -> pa.Table:
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "wat": pa.array(wats, pa.string()),
    }, schema=WAT_SCHEMA)


def export_wat(ds, out_dir: str, num_partitions: int = 64):
    """Distributed WAT export from a pages dataset: build envelopes in
    an actor pool, drop non-ok rows, url-hash-partition and write one
    atomic ``part-NNNN.warc.wat.gz`` per partition (existing files are
    SKIPPED, so a re-run resumes), with a P12 lineage sidecar per
    shard.  The only exchange carries the narrow JSON rows.  Returns
    the per-partition summary ``(part_id, rows)``."""
    import os

    import pandas as pd
    import pyarrow.compute as pc

    from .pipeline import add_part_id

    os.makedirs(out_dir, exist_ok=True)
    wat = build_wat(ds).map_batches(
        lambda t: t.filter(pc.equal(t["status"], "ok")),
        batch_format="pyarrow")
    wat = add_part_id(wat, num_partitions)

    def write_group(group: pd.DataFrame) -> pd.DataFrame:
        pid = int(group["part_id"].iloc[0])
        path = os.path.join(out_dir, f"part-{pid:04d}.warc.wat.gz")
        if not os.path.exists(path):
            rows = group.sort_values("url")
            tmp = path + f".tmp{os.getpid()}"
            # the tmp suffix hides the .gz extension: say so explicitly
            write_wat(
                ({"url": u, "warc_ts": ts.to_pydatetime(), "wat": w}
                 for u, ts, w in zip(rows["url"], rows["warc_ts"],
                                     rows["wat"])), tmp,
                gzip_members=True)
            os.rename(tmp, path)
            # P12 lineage sidecar, written AFTER the shard lands
            ldir = os.path.join(out_dir, "lineage")
            os.makedirs(ldir, exist_ok=True)
            ltmp = os.path.join(ldir, f"part-{pid:04d}.json.tmp")
            with open(ltmp, "w") as lf:
                json.dump({
                    "part_id": pid,
                    "rows": int(len(group)),
                    "bytes_out": int(os.path.getsize(path)),
                    "wat_chars": int(
                        rows["wat"].str.len().fillna(0).sum()),
                    "engine_version": __version__,
                }, lf)
            os.rename(ltmp, os.path.join(ldir, f"part-{pid:04d}.json"))
        return pd.DataFrame({"part_id": [pid], "rows": [len(group)]})

    return wat.select_columns(["url", "warc_ts", "wat", "part_id"]) \
        .groupby("part_id").map_groups(write_group).to_pandas()


def flatten_wat_links(ds):
    """Dataset(url, warc_ts, wat) -> exploded link rows
    ``(url, dst_url, nofollow, anchor, n)`` by parsing each envelope —
    the read-back inverse of the ``Links`` policy, used by the gate to
    pin the whole write/read/JSON path against the outlinks golden."""

    def explode(t: pa.Table) -> pa.Table:
        urls, dsts, nfs, anchors, ns = [], [], [], [], []
        for url, wat in zip(t["url"].to_pylist(), t["wat"].to_pylist()):
            env = json.loads(wat)["Envelope"]
            meta = env["Payload-Metadata"]["HTTP-Response-Metadata"]
            for obj in meta["HTML-Metadata"]["Links"]:
                urls.append(url)
                dsts.append(obj["url"])
                nfs.append(1 if obj.get("rel") == "nofollow" else 0)
                anchors.append(obj["text"])
                ns.append(obj["count"])
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "dst_url": pa.array(dsts, pa.string()),
            "nofollow": pa.array(nfs, pa.int32()),
            "anchor": pa.array(anchors, pa.string()),
            "n": pa.array(ns, pa.int64()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")
