"""Incremental (append-only) aggregation across runs.

Production corpora grow by appending files; recomputing a corpus
aggregate from scratch on every arrival is the wall the manifest/resume
machinery already removes for extraction (SURVEY P13) — this module
removes it for ANALYTICS: per-FILE partial aggregates persist under a
state directory, a run processes only files it has never seen, and the
final result merges ALL partials (old + new).

Scale shape: new files read in ONE Dataset with ``include_paths=True``;
per-(path, key) partials combine inside each batch BEFORE the exchange,
one Sum groupby merges, and each file's partial lands in its own
atomically-renamed parquet (idempotent under retry: the name is a pure
function of the file's identity, a replay overwrites).  The merge reads
only the partial files — ``n_files x n_keys`` rows, never the corpus.

File identity = crc32(absolute path) + basename + size, so same-named
files in different directories never collide; when a file is REWRITTEN
in place (size change — append-only corpora shouldn't, but fixtures and
backfills do), its old-size partial is invalidated before the new one
is written, so the merge never double-counts.  Every new file gets a
partial — zero-row files get a typed empty one — so each file is read
exactly once across all runs.  A ``FORMAT`` marker versions the state
layout; a mismatch wipes and rebuilds rather than merging stale
partials of an older scheme.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil
import zlib

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["incremental_group_stats"]

_FORMAT = "2"


def _path_tag(path: str) -> str:
    return f"{zlib.crc32(os.path.abspath(path).encode('utf-8')):08x}"


def _identity(path: str) -> str:
    return f"{_path_tag(path)}-{os.path.basename(path)}.{os.path.getsize(path)}"


def incremental_group_stats(input_path, state_dir: str, *, key_col: str,
                            sum_col: str, pattern: str = "*.parquet"):
    """Maintain ``key -> (n rows, sum(sum_col))`` across runs.

    ``input_path`` is a parquet file, a directory of them, or a list.
    Returns ``(result_df, n_new_files)``: the merged aggregate over
    every file ever seen (columns ``key_col, n, s`` with ``n`` =
    COUNT(*), null-inclusive), and how many files THIS run processed.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    if isinstance(input_path, str):
        if os.path.isdir(input_path):
            files = sorted(_glob.glob(os.path.join(input_path, pattern)))
        else:
            files = [input_path]
    else:
        files = sorted(input_path)

    partial_dir = os.path.join(state_dir, "partials")
    fmt_path = os.path.join(state_dir, "FORMAT")
    os.makedirs(partial_dir, exist_ok=True)
    stamped = None
    if os.path.exists(fmt_path):
        with open(fmt_path) as fh:
            stamped = fh.read().strip()
    if stamped != _FORMAT and os.listdir(partial_dir):
        # unknown or older layout: rebuild rather than merge stale shapes
        shutil.rmtree(partial_dir)
        os.makedirs(partial_dir)
    with open(fmt_path, "w") as fh:
        fh.write(_FORMAT)

    have = {f[:-len(".parquet")] for f in os.listdir(partial_dir)
            if f.endswith(".parquet")}
    new = [p for p in files if _identity(p) not in have]

    if new:
        # invalidate stale partials of rewritten-in-place files (same
        # path tag, different size) BEFORE writing the new identities
        tags = {_path_tag(p) for p in new}
        for f in os.listdir(partial_dir):
            if f.endswith(".parquet") and f.split("-", 1)[0] in tags:
                os.remove(os.path.join(partial_dir, f))

        ds = rd.read_parquet(new, columns=[key_col, sum_col],
                             include_paths=True)

        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by(["path", key_col]).aggregate(
                [(sum_col, "sum"), ([], "count_all")])
            # select by GENERATED names, never positionally (pyarrow
            # group_by column order has differed across versions)
            return pa.table({
                "path": g["path"],
                key_col: g[key_col],
                "s": g[f"{sum_col}_sum"],
                "n": g["count_all"],
            })

        agg = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["path", key_col])
               .aggregate(Sum("s", alias_name="s"),
                          Sum("n", alias_name="n"))
               .to_pandas())  # n_new_files x n_keys rows — tiny
        if "path" not in agg.columns:  # all-new-files-empty: schema-less
            agg = pd.DataFrame({"path": pd.Series([], dtype=object),
                                key_col: pd.Series([], dtype=object),
                                "s": pd.Series([], dtype="float64"),
                                "n": pd.Series([], dtype="int64")})
        by_path = {str(path): grp for path, grp in agg.groupby("path")}
        key_type = None
        for p in new:
            grp = by_path.get(os.path.abspath(p), by_path.get(p))
            if grp is not None:
                out = pa.Table.from_pandas(
                    grp[[key_col, "s", "n"]].reset_index(drop=True),
                    preserve_index=False).replace_schema_metadata(None)
                key_type = out.schema.field(key_col).type
            else:
                # zero-row file: a typed EMPTY partial marks it seen so
                # it is never re-read (and never crashes a later merge)
                out = pa.table({
                    key_col: pa.array([], key_type or pa.string()),
                    "s": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                })
            dest = os.path.join(partial_dir, _identity(p) + ".parquet")
            tmp = dest + ".tmp"
            pq.write_table(out, tmp)
            os.rename(tmp, dest)
        with open(os.path.join(state_dir, "last_run.json"), "w") as fh:
            json.dump({"processed": [_identity(p) for p in new]}, fh)

    parts = [pq.read_table(os.path.join(partial_dir, f)).to_pandas()
             for f in sorted(os.listdir(partial_dir))
             if f.endswith(".parquet")]
    parts = [p for p in parts if len(p)]
    if not parts:
        return (pd.DataFrame({key_col: pd.Series([], dtype=object),
                              "n": pd.Series([], dtype="int64"),
                              "s": pd.Series([], dtype="float64")}), len(new))
    merged = (pd.concat(parts, ignore_index=True)
              .groupby(key_col, as_index=False)[["n", "s"]].sum())
    merged["n"] = merged["n"].astype("int64")
    return merged.sort_values(key_col).reset_index(drop=True), len(new)
