"""JSONL (newline-delimited JSON) sink + source — the interchange
format training pipelines actually exchange shards in.

SURVEY §2 parity note: the reference exposes parse/serialize entry
points (S2/S3); this is the same operator layer applied to the
LLM-pipeline interchange format, shaped like the engine's other
derived-format exporters (WET/WAT).

FROZEN SERIALIZATION POLICY (changing any of this changes shard
bytes):

* One JSON object per row, one row per ``\\n``-terminated line;
  ``json.dumps(sort_keys=True, separators=(",", ":"),
  ensure_ascii=False)``.
* Values: JSON-native types pass through; ``datetime`` /
  ``pandas.Timestamp`` serialize as ISO-8601 strings with microsecond
  precision (``isoformat()``); ``bytes`` serialize as lowercase hex
  strings (explicit and greppable; base64 is shorter but this format
  targets inspectable text shards); numpy scalars unwrap to their
  Python equivalents; anything else fails loudly.
* Nulls (None / NaN / NaT) serialize as JSON ``null``.
* Rows within a shard are sorted by serialized line bytes — a shard's
  content is a pure function of its row SET, independent of block
  arrival order.

Scale shape mirrors the WET/WAT exporters: ``write_jsonl``
hash-partitions by a key column (crc32 of its string form, the P6
policy generalized beyond urls) and writes one atomic
``part-NNNN.jsonl.gz`` per partition — existing shards are SKIPPED so
a re-run resumes — with a P12 lineage sidecar per shard.
``read_jsonl`` is a ``FileBasedDatasource``: one task per file, the
line walk streams in ``batch_rows`` slices, gzip sniffed by magic.
Malformed lines raise (a training shard with undecodable rows is a
pipeline bug, not data).
"""

from __future__ import annotations

import gzip
import io
import json
import zlib
from datetime import datetime

import numpy as np
import pyarrow as pa

# module-level so the by-value pickle captures the value (worker-side
# UDFs must not re-import the package at runtime; see ExtractDocs NOTE)
from . import __version__
from .warc import _NativeWrapper

__all__ = ["write_jsonl", "read_jsonl", "jsonl_dumps"]


def _default(o):
    if isinstance(o, datetime):
        return o.isoformat()
    if isinstance(o, (bytes, bytearray)):
        return bytes(o).hex()
    if isinstance(o, np.generic):
        return o.item()
    raise TypeError(f"jsonl cannot serialize {type(o).__name__}")


def jsonl_dumps(row: dict) -> str:
    """One row -> its frozen-policy JSON line (no trailing newline)."""
    return json.dumps(row, sort_keys=True, separators=(",", ":"),
                      ensure_ascii=False, default=_default)


def write_jsonl(ds, out_dir: str, num_partitions: int = 64, *,
                key_col: str, columns=None):
    """Resumable partitioned JSONL export.  Returns the per-partition
    summary ``(part_id, rows)``."""
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    if columns is not None:
        ds = ds.select_columns(list(dict.fromkeys([key_col] + columns)))

    def tag(batch: pa.Table) -> pa.Table:
        pid = np.fromiter(
            (zlib.crc32(str(k).encode("utf-8")) % num_partitions
             for k in batch.column(key_col).to_pylist()),
            dtype=np.int64, count=batch.num_rows)
        return batch.append_column("part_id", pa.array(pid, pa.int64()))

    def write_group(group: pd.DataFrame) -> pd.DataFrame:
        pid = int(group["part_id"].iloc[0])
        path = os.path.join(out_dir, f"part-{pid:04d}.jsonl.gz")
        if not os.path.exists(path):
            body = group.drop(columns=["part_id"])
            body = body.astype(object).where(pd.notna(body), None)
            lines = sorted(
                jsonl_dumps(rec) for rec in body.to_dict("records"))
            blob = ("\n".join(lines) + "\n").encode("utf-8")
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as out:
                with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
                    gz.write(blob)
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
                    "engine_version": __version__,
                }, lf)
            os.rename(ltmp, os.path.join(ldir, f"part-{pid:04d}.json"))
        return pd.DataFrame({"part_id": [pid], "rows": [len(group)]})

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("part_id").map_groups(write_group).to_pandas())


def read_jsonl(paths, *, schema: pa.Schema, batch_rows: int = 1024,
               **kwargs):
    """JSONL / JSONL-gz files -> Dataset with the given Arrow schema.

    The schema is explicit (never inferred from a shard's first rows —
    an all-null column would flip types between shards).  Timestamp
    columns parse from the writer's ISO-8601 strings; binary columns
    from lowercase hex."""
    import ray.data as rd
    from ray.data.datasource import FileBasedDatasource

    names = schema.names
    kinds = []
    for f in schema:
        if pa.types.is_timestamp(f.type):
            kinds.append("ts")
        elif pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type):
            kinds.append("hex")
        else:
            kinds.append("plain")

    def table_of(rows: list) -> pa.Table:
        cols = {}
        for name, kind in zip(names, kinds):
            vals = [r.get(name) for r in rows]
            if kind == "ts":
                vals = [None if v is None else datetime.fromisoformat(v)
                        for v in vals]
            elif kind == "hex":
                vals = [None if v is None else bytes.fromhex(v)
                        for v in vals]
            cols[name] = vals
        return pa.table(
            {n: pa.array(cols[n], schema.field(n).type) for n in names},
            schema=schema)

    class JsonlDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["jsonl", "gz", "json"]

        def _read_stream(self, f, path: str):
            stream = io.BufferedReader(_NativeWrapper(f))
            if stream.peek(2)[:2] == b"\x1f\x8b":
                stream = io.BufferedReader(gzip.GzipFile(fileobj=stream))
            rows = []
            for line in stream:
                line = line.strip()
                if not line:
                    continue
                rows.append(json.loads(line))
                if len(rows) >= batch_rows:
                    yield table_of(rows)
                    rows = []
            if rows:
                yield table_of(rows)

    return rd.read_datasource(JsonlDatasource(paths, **kwargs))
