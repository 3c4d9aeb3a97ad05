"""Distributed statistical aggregates built from mergeable partial
sums — the co-moment family (correlation, covariance) and broadcast
standardization (z-scores).

Scale shape shared by both operators: a vectorized per-batch partial
(``n, Σx, Σy, Σx², Σy², Σxy`` as plain float64 columns) runs BEFORE
the exchange, the shuffle carries one tiny row per (block, key), pure
``Sum`` aggregates merge them, and a driver-side finalize touches only
``n_keys`` rows (the documented small-aggregate exception).  Numeric
caveat: plain co-moments cancel catastrophically when |mean| >> std —
callers should pass bounded-magnitude columns (derive an hour-of-day,
not an epoch-microsecond).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["grouped_corr", "zscore", "logreg_train", "logreg_predict",
           "winsorize", "profile_table", "group_keep_keys",
           "group_stats_filter"]


def _moment_partials(key: str, x_col: str, y_col: str):
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(dtype=np.float64)
        y = df[y_col].to_numpy(dtype=np.float64)
        g = pd.DataFrame({
            key: df[key].to_numpy(), "n": 1.0, "sx": x, "sy": y,
            "sxx": x * x, "syy": y * y, "sxy": x * y,
        }).groupby(key, sort=False).sum().reset_index()
        return g

    return partial


def grouped_corr(ds, *, key: str, x_col: str, y_col: str,
                 ndigits: int = 6, out_col: str = "corr"):
    """Per-key sample (Pearson) correlation of two columns —
    ``corr = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²)(n·Σy² − Σy²))``,
    rounded to ``ndigits`` on both sides of the oracle contract.
    Keys with fewer than 2 rows or zero variance yield NaN (matching
    SQL ``corr``'s NULL -> emitted as NaN float, never a null int).
    """
    from ray.data.aggregate import Sum

    agg = (ds.map_batches(_moment_partials(key, x_col, y_col),
                          batch_format="pandas")
           .groupby(key)
           .aggregate(*[Sum(c, alias_name=c)
                        for c in ("n", "sx", "sy", "sxx", "syy", "sxy")])
           .to_pandas())
    if "n" not in agg.columns:  # empty aggregates lose the schema
        agg = pd.DataFrame({key: pd.Series([], dtype=object),
                            **{c: pd.Series([], dtype="float64")
                               for c in ("n", "sx", "sy", "sxx", "syy",
                                         "sxy")}})
    n = agg["n"].to_numpy()
    sx, sy = agg["sx"].to_numpy(), agg["sy"].to_numpy()
    sxx, syy = agg["sxx"].to_numpy(), agg["syy"].to_numpy()
    sxy = agg["sxy"].to_numpy()
    with np.errstate(invalid="ignore", divide="ignore"):
        cov = n * sxy - sx * sy
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        corr = cov / np.sqrt(varx * vary)
    corr = np.where((n >= 2) & (varx > 0) & (vary > 0), corr, np.nan)
    return pd.DataFrame({
        key: agg[key],
        out_col: np.round(corr, ndigits),
        "n": n.astype(np.int64),
    }).sort_values(key).reset_index(drop=True)


def zscore(ds, *, key: str, value_col: str, ndigits: int = 6,
           keep_cols: tuple = (), out_col: str = "z", ddof: int = 1):
    """Per-row standardization against per-key mean/stddev (SQL
    ``(v − AVG(v) OVER (PARTITION BY key)) / STDDEV_SAMP(v) OVER ...``).

    Two passes, zero extra shuffles of the big table: pass 1 reduces
    per-key ``(n, Σv, Σv²)`` partials to a tiny stats table, broadcast
    once via ``ray.put``; pass 2 is a stateless vectorized
    ``map_batches`` lookup — rows never co-locate by key.  Keys with
    undefined stddev produce NaN.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.float64)
        return (pd.DataFrame({key: df[key].to_numpy(), "n": 1.0,
                              "sv": v, "svv": v * v})
                .groupby(key, sort=False).sum().reset_index())

    stats = (ds.map_batches(partial, batch_format="pandas")
             .groupby(key)
             .aggregate(*[Sum(c, alias_name=c) for c in ("n", "sv", "svv")])
             .to_pandas())
    if "n" not in stats.columns:  # empty aggregates lose the schema
        stats = pd.DataFrame({key: pd.Series([], dtype=object),
                              **{c: pd.Series([], dtype="float64")
                                 for c in ("n", "sv", "svv")}})
    n = stats["n"].to_numpy()
    mean = stats["sv"].to_numpy() / n
    with np.errstate(invalid="ignore", divide="ignore"):
        var = (stats["svv"].to_numpy() - n * mean * mean) / (n - ddof)
        std = np.sqrt(var)
    std = np.where((n > ddof) & (var > 0), std, np.nan)
    # broadcast as parallel Arrow arrays; per-batch lookup stays fully
    # vectorized (pc.index_in + numpy take), no per-row Python
    ref = ray.put((pa.array(stats[key]), mean, std))

    def norm(t: pa.Table) -> pa.Table:
        keys, means, stds = ray.get(ref)
        idx = pc.index_in(t[key], value_set=keys).to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore"):
            z = np.round((v - means[idx]) / stds[idx], ndigits)
        cols = {c: t[c] for c in (key, value_col, *keep_cols)}
        cols[out_col] = pa.array(z, pa.float64())
        return pa.table(cols)

    return ds.map_batches(norm, batch_format="pyarrow")


def logreg_train(ds, *, feature_cols, label_col, iters: int = 20,
                 lr: float = 1.0, ndigits: int = 9):
    """Distributed batch gradient descent for logistic regression.

    FROZEN spec (the naive full-matrix oracle restates it): X' = [1 | X]
    (bias first), w starts all-zero; per iteration the FULL-corpus
    gradient g = X'^T (sigmoid(X' w) - y) and row count n aggregate
    distributedly, then ``w <- round(w - lr * g / n, ndigits)`` on the
    driver.  The per-iteration ROUNDING is the kmeans determinism
    pattern: float partials merge in nondeterministic order, but the
    rounded weight vector is a pure function of the data for any
    batching, so the whole trajectory is reproducible.

    Scale shape: each iteration runs one streaming pass; every BLOCK
    contributes a single d+2-value partial row (gradient entries +
    count), which the driver sums directly — no shuffle at all, and the
    collected partial table is n_blocks x (d+2) values, tiny at any
    corpus size (a 100 TB corpus in 64 MB blocks is ~10^6 rows of a few
    floats).  Feature rows never leave their blocks.  Returns the
    weight vector as a list ``[bias, w_1, ...]``.
    """
    d = len(feature_cols)
    w = np.zeros(d + 1)
    narrow = ds.select_columns(list(feature_cols) + [label_col]).materialize()

    for _ in range(iters):
        w_iter = w.copy()

        def partial(t: pa.Table, w_=w_iter) -> pa.Table:
            x = np.column_stack(
                [np.ones(t.num_rows)] +
                [t[c].to_numpy(zero_copy_only=False).astype(np.float64)
                 for c in feature_cols])
            y = t[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
            p = 1.0 / (1.0 + np.exp(-(x @ w_)))
            g = x.T @ (p - y)
            v = np.concatenate([g, [float(t.num_rows)]])
            return pa.table({"v": pa.array(v, pa.float64())})

        df = narrow.map_batches(partial, batch_format="pyarrow").to_pandas()
        if "v" not in df.columns or not len(df):
            break  # empty input: schema-less partials, weights stay put
        vals = df["v"].to_numpy().reshape(-1, d + 2).sum(axis=0)
        n = vals[-1]
        if n == 0:
            break
        w = np.round(w - lr * vals[:-1] / n, ndigits)
    return w.tolist()


def logreg_predict(ds, weights, *, feature_cols, out: str = "score",
                   ndigits: int = 6):
    """Vectorized sigmoid scores under trained weights (stateless second
    pass; the tiny weight vector ships with the task)."""
    w = np.asarray(weights, dtype=np.float64)

    def score(t: pa.Table) -> pa.Table:
        x = np.column_stack(
            [np.ones(t.num_rows)] +
            [t[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in feature_cols])
        p = np.round(1.0 / (1.0 + np.exp(-(x @ w))), ndigits)
        return t.append_column(out, pa.array(p, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")


def winsorize(ds, *, value_col: str, q_lo: float = 0.01,
              q_hi: float = 0.99, alpha: float = 0.01,
              out: str = None, ndigits: int = 6):
    """Sketch-based outlier clipping (winsorization): corpus-wide
    DDSketch quantiles at ``q_lo``/``q_hi`` (bounded bucket partials,
    one Sum merge, driver finalize — no worker ever holds the raw
    column; :func:`rayxt.windows.corpus_quantiles_sketch`), then a
    stateless vectorized second pass clips every value into
    ``[lo, hi]`` and rounds.  The two clip bounds ship with the task.

    Oracle story: the bounds come from the same frozen sketch spec the
    naive ``ddsketch_group_quantiles`` restatement computes, so a
    golden generated from the oracle bounds + a plain clip matches the
    engine exactly.  Empty input: values pass through unclipped.
    """
    from .windows import corpus_quantiles_sketch

    out = out or f"{value_col}_w"
    q = corpus_quantiles_sketch(ds, value_col=value_col, qs=(q_lo, q_hi),
                                alpha=alpha, ndigits=ndigits)
    if not len(q):
        def passthrough(t: pa.Table) -> pa.Table:
            vals = np.round(np.asarray(
                t[value_col].to_numpy(zero_copy_only=False),
                dtype=np.float64), ndigits)
            return t.append_column(out, pa.array(vals, pa.float64()))
        return ds.map_batches(passthrough, batch_format="pyarrow")
    lo, hi = float(q.iloc[0, 0]), float(q.iloc[0, 1])

    def clip(t: pa.Table) -> pa.Table:
        vals = np.asarray(t[value_col].to_numpy(zero_copy_only=False),
                          dtype=np.float64)
        w = np.round(np.clip(vals, lo, hi), ndigits)
        return t.append_column(out, pa.array(w, pa.float64()))

    return ds.map_batches(clip, batch_format="pyarrow")


def profile_table(ds, *, columns, ndigits: int = 6):
    """ANALYZE-style column profile: one row per column with ``n``,
    ``n_null``, ``n_distinct`` (exact), ``min_v`` / ``max_v`` /
    ``mean_v`` — numeric columns profile their values, string columns
    their UTF-8 lengths (SQL ``LENGTH``), so everything lands in one
    typed float schema.

    Scale shape: scalar stats are per-batch partial rows (one per
    column per batch) merged by pure ``Sum/Min/Max`` aggregates;
    distinct counts go through ONE shuffle for ALL columns — values
    cast to strings (injective per column type), in-batch pre-deduped
    with ``pc.unique``, exchanged as ``(column, value)`` rows, counted
    by two pure ``Count`` aggregates.  Driver work = ``n_columns``
    rows.  Envelope: exact distinct ships each column's distinct
    values once — for open-ended columns at corpus scale use the HLL
    sketch (:func:`rayxt.sketches.group_distinct_hll`) instead.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Min, Sum

    columns = list(columns)

    def is_str(typ) -> bool:
        return pa.types.is_string(typ) or pa.types.is_large_string(typ)

    def scalar_partial(t: pa.Table) -> pa.Table:
        names, ns, nulls, vmin, vmax, vsum = [], [], [], [], [], []
        for c in columns:
            col = t[c]
            if is_str(col.type):
                v = pc.cast(pc.utf8_length(col), pa.float64())
            elif pa.types.is_timestamp(col.type):
                v = pc.cast(pc.cast(col, pa.int64()), pa.float64())
            else:
                v = pc.cast(col, pa.float64())
            names.append(c)
            ns.append(len(col))
            nulls.append(col.null_count)
            mn = pc.min(v).as_py()
            mx = pc.max(v).as_py()
            sm = pc.sum(v).as_py()
            vmin.append(np.inf if mn is None else float(mn))
            vmax.append(-np.inf if mx is None else float(mx))
            vsum.append(0.0 if sm is None else float(sm))
        return pa.table({
            "column": pa.array(names, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "n_null": pa.array(nulls, pa.int64()),
            "vmin": pa.array(vmin, pa.float64()),
            "vmax": pa.array(vmax, pa.float64()),
            "vsum": pa.array(vsum, pa.float64()),
        })

    scal = (ds.map_batches(scalar_partial, batch_format="pyarrow")
            .groupby("column")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("n_null", alias_name="n_null"),
                       Min("vmin", alias_name="vmin"),
                       Max("vmax", alias_name="vmax"),
                       Sum("vsum", alias_name="vsum"))
            .to_pandas())

    def distinct_partial(t: pa.Table) -> pa.Table:
        out_c, out_v = [], []
        for c in columns:
            u = pc.unique(pc.cast(pc.drop_null(
                t[c].combine_chunks()), pa.string()))
            out_c.append(pa.array([c] * len(u), pa.string()))
            out_v.append(u)
        return pa.table({
            "column": pa.concat_arrays(out_c),
            "v": pa.concat_arrays([a.cast(pa.string()) for a in out_v]),
        })

    dist = (ds.map_batches(distinct_partial, batch_format="pyarrow")
            .groupby(["column", "v"]).aggregate(Count(alias_name="__c"))
            .groupby("column").aggregate(Count(alias_name="n_distinct"))
            .to_pandas())

    out = scal.merge(dist, on="column", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    nn = (out["n"] - out["n_null"]).to_numpy(dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = np.where(nn > 0, out["vsum"].to_numpy() / nn, np.nan)
    out["min_v"] = np.round(out["vmin"].replace(np.inf, np.nan), ndigits)
    out["max_v"] = np.round(out["vmax"].replace(-np.inf, np.nan), ndigits)
    out["mean_v"] = np.round(mean, ndigits)
    out = out[["column", "n", "n_null", "n_distinct",
               "min_v", "max_v", "mean_v"]]
    return out.sort_values("column").reset_index(drop=True)


def group_keep_keys(ds, *, key_col: str, value_col: str,
                    min_count: int | None = None,
                    min_mean: float | None = None,
                    max_mean: float | None = None,
                    ndigits: int = 6):
    """Dataset of the DISTINCT ``key_col`` values whose group passes
    every given aggregate gate (count of non-null ``value_col`` rows,
    mean of ``value_col`` — the RefinedWeb / Gopher "judge the whole
    host, not the page" shape).  Same scale shape as
    :func:`grouped_corr`: per-batch ``(key, n, sum)`` partials before
    the exchange, pure ``Sum`` merges, the mean compared after an
    ``ndigits`` round on both the engine and any SQL restatement (the
    float-association rule every gated mean in this repo follows)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        narrow = pa.table({key_col: t[key_col],
                           "v": pc.cast(t[value_col], pa.float64())})
        narrow = narrow.filter(pc.and_(pc.is_valid(narrow[key_col]),
                                       pc.is_valid(narrow["v"])))
        g = narrow.group_by(key_col).aggregate(
            [("v", "count"), ("v", "sum")])
        return g.rename_columns([key_col, "n", "s"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(key_col)
           .aggregate(Sum("n", alias_name="n"),
                      Sum("s", alias_name="s")))

    def gate(t: pa.Table) -> pa.Table:
        if "n" not in t.column_names:  # schema-less empty block
            return pa.table({key_col: pa.array([], pa.string())})
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        mean = np.round(t["s"].to_numpy(zero_copy_only=False)
                        / np.maximum(n, 1), ndigits)
        keep = np.ones(len(n), dtype=bool)
        if min_count is not None:
            keep &= n >= min_count
        if min_mean is not None:
            keep &= mean >= min_mean
        if max_mean is not None:
            keep &= mean <= max_mean
        return pa.table({key_col: t[key_col].filter(pa.array(keep))})

    return agg.map_batches(gate, batch_format="pyarrow")


def group_stats_filter(ds, *, key_col: str, value_col: str,
                       min_count: int | None = None,
                       min_mean: float | None = None,
                       max_mean: float | None = None,
                       ndigits: int = 6, mode: str = "broadcast",
                       num_partitions: int = 16):
    """Keep only rows whose GROUP passes the aggregate gates — drop a
    whole host when its page count / mean quality fails, never judge
    pages one by one (the RefinedWeb per-host heuristic).  Two passes
    over ``ds`` (inherent: the gate needs the group aggregate before
    any row can be judged — checkpoint upstream if it is expensive).
    ``broadcast`` ships the passing-key set once via ``ray.put``
    (:func:`rayxt.joins.broadcast_semi_filter`); ``mode="join"`` is
    the beyond-broadcast hash ``left_semi`` path."""
    keys = group_keep_keys(ds, key_col=key_col, value_col=value_col,
                           min_count=min_count, min_mean=min_mean,
                           max_mean=max_mean, ndigits=ndigits)
    if mode == "broadcast":
        from .joins import broadcast_semi_filter

        return broadcast_semi_filter(ds, keys, key_col=key_col,
                                     keys_key=key_col)
    if mode != "join":
        raise ValueError(f"unknown mode {mode!r}")
    return ds.join(keys, "left_semi", num_partitions=num_partitions,
                   on=(key_col,))
