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

File identity = basename + size (append-only corpora never rewrite a
file in place; a changed size reprocesses under a new identity).
"""

from __future__ import annotations

import glob as _glob
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["incremental_group_stats"]


def _identity(path: str) -> str:
    return f"{os.path.basename(path)}.{os.path.getsize(path)}"


def incremental_group_stats(input_path, state_dir: str, *, key_col: str,
                            sum_col: str, pattern: str = "*.parquet"):
    """Maintain ``key -> (n rows, sum(sum_col))`` across runs.

    ``input_path`` is a parquet file, a directory of them, or a list.
    Returns ``(result_df, n_new_files)``: the merged aggregate over
    every file ever seen, and how many files THIS run processed.
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
    os.makedirs(partial_dir, exist_ok=True)
    have = {f[:-len(".parquet")] for f in os.listdir(partial_dir)
            if f.endswith(".parquet")}
    new = [p for p in files if _identity(p) not in have]

    if new:
        ds = rd.read_parquet(new, columns=[key_col, sum_col],
                             include_paths=True)

        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by(["path", key_col]).aggregate(
                [(sum_col, "sum"), (sum_col, "count")])
            return g.rename_columns(["path", key_col, "s", "n"])

        agg = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["path", key_col])
               .aggregate(Sum("s", alias_name="s"),
                          Sum("n", alias_name="n"))
               .to_pandas())  # n_new_files x n_keys rows — tiny
        for path, grp in agg.groupby("path"):
            out = grp[[key_col, "s", "n"]].reset_index(drop=True)
            dest = os.path.join(partial_dir, _identity(str(path)) + ".parquet")
            tmp = dest + ".tmp"
            pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                           tmp)
            os.rename(tmp, dest)
        with open(os.path.join(state_dir, "last_run.json"), "w") as fh:
            json.dump({"processed": [ _identity(p) for p in new ]}, fh)

    parts = [pq.read_table(os.path.join(partial_dir, f)).to_pandas()
             for f in sorted(os.listdir(partial_dir))
             if f.endswith(".parquet")]
    if not parts:
        return (pd.DataFrame({key_col: pd.Series([], dtype=object),
                              "n": pd.Series([], dtype="int64"),
                              "s": pd.Series([], dtype="float64")}), 0)
    merged = (pd.concat(parts, ignore_index=True)
              .groupby(key_col, as_index=False)[["n", "s"]].sum())
    merged["n"] = merged["n"].astype("int64")
    return merged.sort_values(key_col).reset_index(drop=True), len(new)
