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

from rayxt.state import key_digests

__all__ = ["splitmix64_u64", "hll_partial_table", "hll_estimate",
           "group_distinct_hll", "heavy_hitters", "bloom_build",
           "bloom_contains", "bloom_filter_ds", "bloom_positions"]

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
    return pa.Table.from_pandas(
        g, preserve_index=False).replace_schema_metadata(None)


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


# -- Bloom filter (approximate membership) ----------------------------------
#
# The classic 100 TB pre-filter: build a fixed-size bit array over one
# table's key column (per-batch partial bitmaps OR-merged by a custom
# AggregateFn — the same mergeable-partial discipline as HLL), ship it
# once via ray.put, and probe any stream against it with vectorized
# double hashing.  No false negatives; false-positive rate ~
# (1 - e^(-k*n/m))^k.  FROZEN spec: positions are h1 + i*h2 mod n_bits
# (double hashing, i in [0, k)) over the two 64-bit channels of
# :func:`rayxt.state.key_digests` (process-stable), bit j of word
# j // 64 at bit j % 64, little-endian uint64 words.  The naive oracle
# restatement (tests/oracle/sketches.oracle_bloom_*) must agree
# bit-for-bit — INCLUDING which non-members false-positive.


def bloom_positions(values, n_bits: int, n_hashes: int) -> np.ndarray:
    """(n, k) int64 bit positions for a key column (frozen spec)."""
    d = key_digests(values)
    h1 = d["a"]
    h2 = d["b"] | _U64(1)  # odd step so all k positions are distinct-ish
    i = np.arange(n_hashes, dtype=np.uint64)[None, :]
    pos = (h1[:, None] + i * h2[:, None]) % _U64(n_bits)
    return pos.astype(np.int64)


def _bloom_set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.ravel()
    np.bitwise_or.at(bits, flat >> 6,
                     np.uint64(1) << (flat.astype(np.uint64) & _U64(63)))


def bloom_build(ds, *, key_col: str, n_bits: int = 1 << 20,
                n_hashes: int = 5) -> np.ndarray:
    """Distributed Bloom build -> uint64 word array of n_bits/64 words.

    Each batch emits ONE row holding its partial bitmap (bytes); a
    custom AggregateFn ORs them — a pure tree-reducible merge, no
    driver loop over batches, no key shuffle.  ``n_bits`` must be a
    multiple of 64.
    """
    from ray.data.aggregate import AggregateFn

    assert n_bits % 64 == 0
    n_words = n_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(n_words, dtype=np.uint64)
        _bloom_set_bits(bits, bloom_positions(t[key_col], n_bits, n_hashes))
        return pa.table({"bitmap": pa.array([bits.tobytes()], pa.binary())})

    def or_merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return (np.frombuffer(a, dtype=np.uint64)
                | np.frombuffer(b, dtype=np.uint64)).tobytes()

    agg = (ds.select_columns([key_col])
           .map_batches(partial, batch_format="pyarrow")
           .aggregate(AggregateFn(
               init=lambda k: None,
               accumulate_row=lambda acc, row: or_merge(acc, row["bitmap"]),
               merge=or_merge,
               name="bloom")))
    packed = agg["bloom"]
    if packed is None:  # empty input: nothing is a member
        return np.zeros(n_words, dtype=np.uint64)
    return np.frombuffer(packed, dtype=np.uint64).copy()


def bloom_contains(bits: np.ndarray, values, n_hashes: int) -> np.ndarray:
    """Vectorized membership probe -> bool per value."""
    n_bits = len(bits) * 64
    pos = bloom_positions(values, n_bits, n_hashes)
    word = bits[pos >> 6]
    hit = (word >> (pos.astype(np.uint64) & _U64(63))) & _U64(1)
    return hit.all(axis=1).astype(bool)


def bloom_filter_ds(ds, bits: np.ndarray, *, key_col: str,
                    n_hashes: int = 5, negate: bool = False):
    """Keep rows whose ``key_col`` the Bloom filter (maybe) contains —
    the shuffle-free approximate semi-join: the bitmap ships ONCE via
    ``ray.put``, each batch probes locally.  ``negate=True`` keeps
    definite non-members (an approximate ANTI join with NO false
    drops: Bloom has no false negatives, so every kept row is truly
    absent from the build side)."""
    import ray

    bits_ref = ray.put(bits)

    def keep(t: pa.Table) -> pa.Table:
        b = ray.get(bits_ref)
        mask = bloom_contains(b, t[key_col], n_hashes)
        if negate:
            mask = ~mask
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
