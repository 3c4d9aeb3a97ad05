"""Mergeable cardinality sketch: grouped HyperLogLog distinct count.

Exact grouped ``COUNT(DISTINCT v)`` needs a shuffle of every distinct
``(key, v)`` pair; at corpus scale (distinct url hosts, distinct users
per shard, vocabulary sizes) the sketch path ships a FIXED ``m = 2**p``
registers per key instead, merged by a pure ``Max`` aggregate — the
same partial/merge discipline as :func:`rayxt.windows
.group_quantiles_sketch` (DDSketch) and :func:`rayxt.pipeline
.corpus_stats`.

All constants below are part of the FROZEN operator definition
(SURVEY section 5.3 discipline): the splitmix64 finalizer, the top-``p``
-bits register / low-bits rank split, and the estimator's exact-integer
``sum(2^(R - M_j))`` formulation.  ``tests/oracle/sketches.py``
restates them independently (plain Python ints, dict-of-registers, no
numpy in the hot path) and the committed golden locks engine/oracle
agreement bit-for-bit; the estimator avoids float accumulation order
entirely (the only float ops are a fixed scalar sequence), so the
estimate is identical for ANY batching, partitioning or merge order.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["splitmix64_u64", "hll_partial_table", "hll_estimate",
           "group_distinct_hll", "heavy_hitters"]

_U64 = np.uint64


def splitmix64_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (frozen hash; public-domain
    constants from the splitmix64 PRNG).  uint64 in, uint64 out —
    numpy's wrapping unsigned arithmetic matches the oracle's
    ``& (2**64 - 1)`` restatement exactly."""
    z = x + _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized ``int.bit_length`` for uint64 (exact — no float log2,
    whose rounding misclassifies values near powers of two)."""
    n = np.zeros(x.shape, dtype=np.int64)
    x = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = x >= (_U64(1) << _U64(shift))
        n[big] += shift
        x[big] >>= _U64(shift)
    n[x > 0] += 1
    return n


def hll_partial_table(keys: pa.ChunkedArray | pa.Array, values: np.ndarray,
                      key_name: str, p: int) -> pa.Table:
    """Per-batch sparse HLL partial: one row per observed ``(key,
    register)`` with the max rank.  ``values`` must be a non-negative
    int64/uint64 array (string keys: hash to int64 upstream)."""
    h = splitmix64_u64(values.astype(np.uint64))
    reg = (h >> _U64(64 - p)).astype(np.int64)
    w = h & _U64((1 << (64 - p)) - 1)
    rho = (64 - p) - _bit_length_u64(w) + 1
    df = pd.DataFrame({key_name: keys.to_pandas(), "reg": reg, "rho": rho})
    g = df.groupby([key_name, "reg"], sort=False)["rho"].max().reset_index()
    return pa.Table.from_pandas(g, preserve_index=False)


def hll_estimate(regs: np.ndarray, p: int) -> int:
    """Frozen estimator over the dense ``m = 2**p`` register array.

    ``sum(2^-M_j)`` is computed as the EXACT integer ``S = sum(2^(R -
    M_j))`` (Python bigint; R = 64 - p + 1 bounds every exponent), so
    the only float operations are a fixed scalar sequence — no
    accumulation-order sensitivity, bit-identical across engine,
    oracle, and any partitioning.  Standard small-range correction:
    linear counting when the raw estimate <= 2.5m and empty registers
    remain."""
    m = 1 << p
    assert regs.shape == (m,)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    R = 64 - p + 1
    S = int(np.left_shift(np.int64(1), np.int64(R) - regs.astype(np.int64))
            .astype(object).sum())
    raw = (alpha * m * m * float(2 ** R)) / float(S)
    zeros = int((regs == 0).sum())
    if raw <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    else:
        est = raw
    return int(math.floor(est + 0.5))


def group_distinct_hll(ds, *, key: str, value_col: str, p: int = 10,
                       out_col: str = "n_distinct"):
    """Approximate grouped distinct count: ``key -> HLL(value_col)``.

    Dataflow: per-batch sparse partial (max rank per observed ``(key,
    register)``) -> ``groupby([key, reg]).aggregate(Max)`` — a pure
    streaming-mergeable aggregate, so a hot key never materializes its
    partials in one worker — -> per-key finalize over at most ``m``
    register rows.  The exchange carries at most ``n_keys * m`` rows
    per input block regardless of row count; relative error is the
    standard ``~1.04 / sqrt(m)`` (3.3% at the default ``p = 10``).
    """
    from ray.data.aggregate import Max

    def partial(t: pa.Table) -> pa.Table:
        vals = t[value_col].to_numpy(zero_copy_only=False)
        assert vals.min() >= 0, "value_col must be non-negative integers"
        return hll_partial_table(t[key], vals.astype(np.int64), key, p)

    maxed = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby([key, "reg"]).aggregate(Max("rho", alias_name="rho")))

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        m = 1 << p
        regs = np.zeros(m, dtype=np.int64)
        regs[g["reg"].to_numpy()] = g["rho"].to_numpy()
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            out_col: np.array([hll_estimate(regs, p)], dtype=np.int64),
        })

    return maxed.groupby(key).map_groups(finalize, batch_format="pandas")


def heavy_hitters(ds, *, value_col: str, k: int = 10, m: int = 256,
                  out_count: str = "n"):
    """EXACT top-k most frequent values without a full-vocabulary
    shuffle: a frequent-items candidate pass + exact recount of the
    candidates only.

    Pass 1 emits, per batch, only the values that are LOCALLY heavy
    (``count_b * m > n_b`` — the Misra-Gries guarantee set): any value
    with global count ``T > n/m`` must exceed ``n_b/m`` in at least one
    batch (pigeonhole), so the candidate union provably contains every
    such value.  The exchange carries at most ``m`` rows per batch
    regardless of vocabulary size.  Pass 2 broadcasts the (tiny)
    candidate list once via ``ray.put`` and exactly recounts ONLY
    candidate rows with a per-batch partial, so the result equals the
    exact top-k whenever every true top-k value has ``T > n/m`` —
    pick ``m`` a few times larger than any plausible k-th-place
    frequency share (the default 256 covers top-10 at a 0.4% share).
    Output is deterministic and partition-independent: exact counts,
    ties broken ascending on the value.
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    def locally_heavy(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t[value_col].combine_chunks())
        vals, counts = vc.field("values"), vc.field("counts")
        mask = pc.greater(pc.multiply(counts, pa.scalar(m, pa.int64())),
                          pa.scalar(t.num_rows, pa.int64()))
        return pa.table({value_col: vals.filter(mask),
                         "n_partial": counts.filter(mask)})

    cand = (ds.map_batches(locally_heavy, batch_format="pyarrow")
            .groupby(value_col).aggregate(Sum("n_partial", alias_name="__s"))
            .to_pandas())
    if cand.empty:
        vtype = dict(zip(ds.schema().names,
                         ds.schema().types))[value_col]
        import ray.data as rd
        return rd.from_arrow(pa.table({
            value_col: pa.array([], vtype),
            out_count: pa.array([], pa.int64())}))
    cand_ref = ray.put(pa.array(cand[value_col].to_list()))

    def recount(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_in(t[value_col], value_set=ray.get(cand_ref)))
        vc = pc.value_counts(sub[value_col].combine_chunks())
        return pa.table({value_col: vc.field("values"),
                         "n_partial": pc.cast(vc.field("counts"), pa.int64())})

    counts = (ds.map_batches(recount, batch_format="pyarrow")
              .groupby(value_col).aggregate(Sum("n_partial",
                                                alias_name=out_count)))
    return counts.sort([out_count, value_col],
                       descending=[True, False]).limit(k)
