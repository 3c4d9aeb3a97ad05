"""Temporal / keyed join operators Ray Data lacks natively.

``asof_join`` is the classic "latest right row at or before the left
row's timestamp" join (market-data style).  Ray Data has no native
as-of join, so it is composed per the task's custom-operator ladder:
one union + ``groupby(key).map_groups`` co-partitions both sides with a
SINGLE exchange, then each group resolves matches with a vectorized
``numpy.searchsorted`` over the sorted right side.

Partitioning assumption (documented, load-bearing): all rows of one
key fit in one worker — keys are per-entity time series (a user's
events, an instrument's quotes), which is the workload this operator
exists for.  Hot keys should be pre-capped or salted upstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["asof_join", "broadcast_lookup", "broadcast_semi_filter",
           "range_join_count"]


def broadcast_lookup(ds, *, key_col: str, keys, values, out_col: str,
                     drop_missing: bool = False):
    """Broadcast hash-join against a small side: ``(keys, values)`` go
    through ``ray.put`` ONCE as zero-copy Arrow arrays, every task
    fetches them from the local object store (no reshipping per batch),
    and the per-batch lookup is ``pc.index_in`` + ``take`` — fully
    vectorized, no pandas, no shuffle.  Missing keys yield nulls
    (or are dropped with ``drop_missing=True``).
    """
    import pyarrow.compute as pc
    import ray

    karr = keys if isinstance(keys, pa.Array) else pa.array(keys)
    varr = values if isinstance(values, pa.Array) else pa.array(values)
    lookup_ref = ray.put((karr, varr))

    def add(t: pa.Table) -> pa.Table:
        k, v = ray.get(lookup_ref)  # plasma-local after the first fetch
        idx = pc.index_in(t[key_col], value_set=k)
        out = t.append_column(out_col, pc.take(v, idx))
        if drop_missing:
            out = out.filter(pc.is_valid(out[out_col]))
        return out

    return ds.map_batches(add, batch_format="pyarrow")


def broadcast_semi_filter(ds, keys_ds, *, key_col: str, keys_key: str,
                          negate: bool = False):
    """Broadcast semi (``EXISTS``) / anti (``negate=True``) join: the
    right side's DISTINCT keys collapse to a small table (distributed
    ``groupby`` count — the big rows never leave their blocks), ship
    through ``ray.put`` ONCE, and the big side filters per batch with
    ``pc.is_in`` — zero shuffles of the probe table, versus the hash
    ``Dataset.join("left_semi")`` path which exchanges both sides.
    Use when the distinct key set is broadcast-small (the documented
    small-side assumption shared with :func:`broadcast_lookup`); keep
    the shuffle join for large-x-large.
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    distinct = (keys_ds.groupby(keys_key)
                .aggregate(Count(alias_name="__c")).to_pandas())
    if keys_key not in distinct.columns:  # empty aggregate, schema-less
        distinct = pd.DataFrame({keys_key: pd.Series([], dtype=object)})
    key_set = ray.put(pa.array(distinct[keys_key]))

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[key_col], value_set=ray.get(key_set))
        if negate:
            mask = pc.invert(mask)
        return t.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def asof_join(left, right, *, key: str, on: str,
              left_cols: list[str], right_cols: list[str],
              right_suffix: str = "_r", bucket_width=None):
    """Inner backward as-of join.

    For every left row, attach the right row of the same ``key`` with
    the greatest ``on`` value <= the left row's ``on``; ties on the
    right timestamp break deterministically toward the greatest
    ``right_cols`` tuple (so output is a pure function of the data,
    independent of partitioning).  Left rows with no prior right row
    are dropped (inner semantics).

    Returns columns ``left_cols`` + ``right_cols`` (a right column
    colliding with a left name gets ``right_suffix``).  ``key`` and
    ``on`` must be members of ``left_cols``.

    ``bucket_width`` (opt-in hot-key mode, in ``on``'s units — raw
    microseconds for timestamp columns) lifts the one-key-fits-one-
    worker assumption: rows co-group on ``(key, floor(on/width))``
    instead of the bare key, and each bucket additionally receives ONE
    carry row — the latest right row from all earlier buckets — so a
    left row whose bucket holds no prior right still finds the correct
    global predecessor.  Exactness: a left row's match is either inside
    its own bucket (the local searchsorted finds it) or it is the
    latest right before the bucket start, which is exactly the carry
    (``on`` values in different buckets can never tie, so cross-bucket
    tie-breaks don't arise).  Asserted equal to the unsalted path by
    tests.
    """
    lcols = list(left_cols)
    rcols = list(right_cols)
    out_rnames = [c + right_suffix if c in lcols else c for c in rcols]

    lschema = left.schema()
    rschema = right.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))

    def left_side(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {"__side": pa.array([0] * n, pa.int8())}
        for c in lcols:
            cols[c] = t[c]
        for c, oc in zip(rcols, out_rnames):
            cols["__r_" + oc] = pa.nulls(n, rtypes[c])
        return pa.table(cols)

    def right_side(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {"__side": pa.array([1] * n, pa.int8())}
        for c in lcols:
            if c in (key, on):
                cols[c] = t[c]
            else:
                cols[c] = pa.nulls(n, ltypes[c])
        for c, oc in zip(rcols, out_rnames):
            cols["__r_" + oc] = t[c]
        return pa.table(cols)

    rtmp = ["__r_" + oc for oc in out_rnames]
    # the union's null slots upcast integer columns to float64 in
    # pandas; restore the source dtypes on the way out
    out_types = {c: ltypes[c] for c in lcols}
    out_types.update({oc: rtypes[c] for c, oc in zip(rcols, out_rnames)})

    def _restore(series: pd.Series, arrow_type) -> pd.Series:
        # cast back to the SOURCE dtype (int32 stays int32 etc.), not a
        # blanket int64/float64 widening
        if pa.types.is_integer(arrow_type) or pa.types.is_floating(arrow_type):
            return series.astype(arrow_type.to_pandas_dtype())
        return series

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        lrows = g[g["__side"] == 0]
        rrows = g[g["__side"] == 1]
        if lrows.empty or rrows.empty:
            return pd.DataFrame({
                **{c: _restore(pd.Series([], dtype=g[c].dtype), out_types[c])
                   for c in lcols},
                **{oc: _restore(pd.Series([], dtype=g["__r_" + oc].dtype),
                                out_types[oc])
                   for oc in out_rnames},
            })
        # deterministic tie-break: sort by (on, *value cols); the last
        # entry <= ts is then the max (on, values) tuple
        rrows = rrows.sort_values([on, *rtmp], kind="mergesort")
        rts = rrows[on].to_numpy()
        idx = np.searchsorted(rts, lrows[on].to_numpy(), side="right") - 1
        keep = idx >= 0
        lrows = lrows[keep]
        matched = rrows.iloc[idx[keep]]
        out = {c: _restore(lrows[c].reset_index(drop=True), out_types[c])
               for c in lcols}
        for oc in out_rnames:
            out[oc] = _restore(matched["__r_" + oc].reset_index(drop=True),
                               out_types[oc])
        return pd.DataFrame(out)

    if bucket_width is None:
        unioned = left.map_batches(left_side, batch_format="pyarrow").union(
            right.map_batches(right_side, batch_format="pyarrow")
        )
        return unioned.groupby(key).map_groups(resolve, batch_format="pandas")

    # -- hot-key mode: co-group on (key, time bucket) + carry rows ----------
    import pyarrow.compute as pc

    width = float(bucket_width)

    def _bucket_of(col):
        c = col
        if pa.types.is_timestamp(c.type):
            # normalize to MICROSECONDS so bucket_width is always us
            # for timestamps, independent of the storage unit
            c = pc.cast(pc.cast(c, pa.timestamp("us")), pa.int64())
        return pc.cast(
            pc.floor(pc.divide(pc.cast(c, pa.float64()), width)),
            pa.int64(),
        )

    def left_side_b(t: pa.Table) -> pa.Table:
        out = left_side(t)
        return out.append_column("__b", _bucket_of(t[on]))

    def right_side_b(t: pa.Table) -> pa.Table:
        out = right_side(t)
        return out.append_column("__b", _bucket_of(t[on]))

    lt = left.map_batches(left_side_b, batch_format="pyarrow")
    # checkpoint: the right side feeds both the main union and the
    # bucket-latest scan; without it the lineage executes twice
    rt = right.map_batches(right_side_b, batch_format="pyarrow").materialize()

    def take_latest(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values([on, *rtmp], kind="mergesort").tail(1)

    rt_schema = rt.schema()
    marker_types = dict(zip(rt_schema.names, rt_schema.types))

    def to_rt_schema(df: pd.DataFrame) -> pa.Table:
        # pandas stages null-upcast ints and emit pandas blocks; pin
        # every column back to the arrow right-side schema so unions
        # with the arrow-block main path are type- and block-compatible
        return pa.table({
            name: pa.array(df[name], type=marker_types[name],
                           from_pandas=True)
            for name in rt_schema.names
        })

    def prune_latest_batch(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch partial: keep only each (key, bucket)'s latest row of
        # THIS batch (same tie-break as take_latest; argmax is
        # associative, so batch-argmax then group-argmax == group-argmax)
        return (df.sort_values([on, *rtmp], kind="mergesort")
                .groupby([key, "__b"], sort=False).tail(1))

    # the full right side crosses only the FINAL co-group exchange; the
    # bucket-latest scan shuffles at most one row per (key, bucket) per
    # input batch thanks to the partial prune above
    latests = (
        rt.map_batches(prune_latest_batch, batch_format="pandas")
        .map_batches(to_rt_schema, batch_format="pandas")
        .groupby([key, "__b"])
        .map_groups(take_latest, batch_format="pandas")
        .map_batches(to_rt_schema, batch_format="pandas")
    )

    from ray.data.aggregate import Count

    def distinct_pairs(t: pa.Table) -> pa.Table:
        # narrow per-batch distinct: only (key, __b) pairs cross the
        # marker aggregate's exchange, never full left rows
        return t.select([key, "__b"]).group_by([key, "__b"]).aggregate([])

    left_buckets = (
        lt.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby([key, "__b"]).aggregate(Count(alias_name="_n"))
    )

    def markers(t: pa.Table) -> pa.Table:
        # left-bucket markers in the right-side layout, __side=2
        n = t.num_rows
        if n == 0:  # aggregate may emit schema-less empty blocks
            return pa.table({name: pa.nulls(0, marker_types[name])
                             for name in rt_schema.names})
        cols = {}
        for name in rt_schema.names:
            if name == "__side":
                cols[name] = pa.array([2] * n, pa.int8())
            elif name in (key, "__b"):
                cols[name] = pc.cast(t[name], marker_types[name])
            else:
                cols[name] = pa.nulls(n, marker_types[name])
        return pa.table(cols)

    mk = left_buckets.map_batches(markers, batch_format="pyarrow")

    def carries(g: pd.DataFrame) -> pd.DataFrame:
        lat = g[g["__side"] == 1].sort_values("__b", kind="mergesort")
        marks = g[g["__side"] == 2]
        if lat.empty or marks.empty:
            return g.iloc[0:0]
        lbuckets = np.unique(marks["__b"].to_numpy())
        latb = lat["__b"].to_numpy()
        # latest right strictly BEFORE bucket b = bucket-latest of the
        # greatest right bucket < b (cross-bucket `on` values never tie)
        idx = np.searchsorted(latb, lbuckets, side="left") - 1
        keep = idx >= 0
        sel = lat.iloc[idx[keep]].copy()
        sel["__b"] = lbuckets[keep]
        return sel

    car = (
        latests.union(mk)
        .groupby(key)
        .map_groups(carries, batch_format="pandas")
        .map_batches(to_rt_schema, batch_format="pandas")
    )

    unioned = lt.union(rt).union(car)
    out = unioned.groupby([key, "__b"]).map_groups(
        resolve, batch_format="pandas")
    return out


def range_join_count(left, right, *, key: str, on: str, right_on: str = None,
                     before=0, after=0, left_cols: list[str] = None,
                     out_col: str = "n_matches"):
    """Keyed interval (range) join, aggregate form: for every left row,
    COUNT the right rows of the same ``key`` whose ``right_on`` falls in
    the inclusive window ``[left.on - before, left.on + after]``.

    Ray Data has no range/interval join; the SQL equivalent is
    ``JOIN ... ON r.key = l.key AND r.on BETWEEN l.on - before AND
    l.on + after`` + ``GROUP BY l``.  Emitting matched PAIRS explodes
    quadratically on dense windows, so the distributed operator returns
    the per-left aggregate — the form pipelines actually consume
    (feature counts, rate limits, co-occurrence features).

    Dataflow: tag both sides, ONE union + ``groupby(key)`` co-partition
    exchange, then a vectorized double ``searchsorted`` per key group
    (sort right once, two binary-search sweeps — O((L+R) log R), never
    the O(L*R) pair expansion).  ``before``/``after`` are in ``on``'s
    units — raw microseconds for timestamp columns, which are
    normalized to us regardless of storage unit.

    Partitioning assumption (same as ``asof_join``'s default): one
    key's rows fit in one worker.  Returns ``left_cols`` + ``out_col``
    (int64).
    """
    import pyarrow.compute as pc

    right_on = right_on or on
    lcols = list(left_cols) if left_cols is not None \
        else [c for c in left.schema().names]
    assert key in lcols and on in lcols
    lschema = left.schema()
    ltypes = dict(zip(lschema.names, lschema.types))

    def _us(col):
        # timestamps: normalize to MICROSECONDS so before/after are
        # always us (parquet gives us, pandas gives ns)
        if pa.types.is_timestamp(col.type):
            return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
        return pc.cast(col, pa.float64())

    def left_side(t: pa.Table) -> pa.Table:
        cols = {"__side": pa.array([0] * t.num_rows, pa.int8()),
                "__t": _us(t[on])}
        for c in lcols:
            cols[c] = t[c]
        return pa.table(cols)

    def right_side(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {"__side": pa.array([1] * n, pa.int8()),
                "__t": _us(t[right_on])}
        for c in lcols:
            cols[c] = t[c] if c == key else pa.nulls(n, ltypes[c])
        return pa.table(cols)

    def _restore(series: pd.Series, arrow_type) -> pd.Series:
        # the union's null slots upcast integer columns to float64 in
        # pandas; cast back to the SOURCE dtype
        if pa.types.is_integer(arrow_type) or pa.types.is_floating(arrow_type):
            return series.astype(arrow_type.to_pandas_dtype())
        return series

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        lrows = g[g["__side"] == 0]
        out = {c: _restore(lrows[c].reset_index(drop=True), ltypes[c])
               for c in lcols}
        if lrows.empty:
            out[out_col] = pd.Series([], dtype="int64")
            return pd.DataFrame(out)
        rts = np.sort(g.loc[g["__side"] == 1, "__t"].to_numpy())
        lts = lrows["__t"].to_numpy()
        lo = np.searchsorted(rts, lts - before, side="left")
        hi = np.searchsorted(rts, lts + after, side="right")
        out[out_col] = pd.Series(hi - lo, dtype="int64")
        return pd.DataFrame(out)

    unioned = left.map_batches(left_side, batch_format="pyarrow").union(
        right.map_batches(right_side, batch_format="pyarrow"))
    return unioned.groupby(key).map_groups(resolve, batch_format="pandas")
