"""Event-time window operators: sessionization and grouped quantiles.

Both are keyed time-series operators: one hash exchange on the entity
key, then vectorized pandas/numpy per group.  The documented
partitioning assumption is the same as :mod:`rayxt.joins` — one key's
rows fit in one worker (per-entity event streams).  For corpus-scale
quantiles over a single giant group, swap the exact per-group kernel
for a mergeable sketch (t-digest) built per batch — the surrounding
Ray shape (partial per ``map_batches``, merge in a tiny groupby) is
the same one :func:`rayxt.pipeline.corpus_stats` already uses.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["sessionize", "group_quantiles", "grouped_topk"]


def grouped_topk(ds, *, key: str, order_col: str, k: int = 10,
                 descending: bool = True, tie_cols: tuple = ()):
    """Per-key top-k rows by ``order_col`` (ties broken ascending on
    ``tie_cols`` — deterministic, partition-independent).

    Scale shape: a vectorized per-batch PARTIAL top-k per key runs
    before the exchange (a row outside its batch's per-key top-k can
    never be in the global top-k), so the shuffle moves at most
    ``n_keys * k`` rows per input batch — the same partial-merge
    pattern as :mod:`rayxt.ann`'s top-k, applied per group.
    """
    sort_cols = [order_col, *tie_cols]
    ascending = [not descending] + [True] * len(tie_cols)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        return df.groupby(key, sort=False).head(k).reset_index(drop=True)

    partials = ds.map_batches(topk, batch_format="pandas")
    return partials.groupby(key).map_groups(topk, batch_format="pandas")


def sessionize(ds, *, key: str = "user_id", ts_col: str = "ts",
               gap_s: float = 1800.0):
    """Split each key's event stream into sessions at gaps > ``gap_s``.

    Returns one row per session: ``(key, session_start, n_events,
    duration_us)``.  Equal timestamps always share a session (gap 0),
    so output is independent of tie order.
    """

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        t = g[ts_col]
        gaps = t.diff().dt.total_seconds()
        sess_id = (gaps.isna() | (gaps > gap_s)).cumsum()
        grouped = g.groupby(sess_id)[ts_col]
        start = grouped.min()
        end = grouped.max()
        return pd.DataFrame({
            key: pd.Series([g[key].iloc[0]] * len(start),
                           dtype=g[key].dtype),
            "session_start": start.reset_index(drop=True),
            "n_events": grouped.size().reset_index(drop=True).astype("int64"),
            "duration_us": pd.Series(
                (end.to_numpy() - start.to_numpy())
                .astype("timedelta64[us]").astype("int64")
            ),
        })

    return ds.groupby(key).map_groups(sess, batch_format="pandas")


def group_quantiles(ds, *, key: str, value_col: str,
                    qs: tuple = (0.5, 0.95), ndigits: int = 6):
    """Exact linear-interpolation quantiles per key (numpy 'linear' ==
    SQL ``quantile_cont``), rounded for cross-engine float parity."""
    names = [f"p{int(q * 100)}" for q in qs]

    def gq(g: pd.DataFrame) -> pd.DataFrame:
        vals = np.percentile(g[value_col].to_numpy(dtype=np.float64),
                             [q * 100 for q in qs])
        out = {key: pd.Series([g[key].iloc[0]], dtype=g[key].dtype)}
        for n, v in zip(names, vals):
            out[n] = pd.Series([round(float(v), ndigits)], dtype="float64")
        return pd.DataFrame(out)

    return ds.groupby(key).map_groups(gq, batch_format="pandas")
