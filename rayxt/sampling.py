"""Deterministic, partition-independent sampling (SURVEY P8).

Membership must be a pure function of the row key — never of block
layout or a per-worker RNG — so a resumed, repartitioned or re-scaled
run samples the SAME rows.  Two paths:

* ``hash_sample_int`` (here): the corpus-scale path.  A multiplicative
  hash modulo the Mersenne prime 2^31-1 over an integer key; every
  intermediate stays below 2^62, so the identical arithmetic is exact
  in vectorized numpy int64 AND in ANSI-SQL BIGINT — the DuckDB oracle
  runs the same expression, no per-row Python anywhere.
* md5-prefix sampling (``__ray_entry__``'s ``doc_sample``): string-key
  parity path matching SQL ``md5()`` byte-for-byte; per-row hashing is
  inherent to that contract, so it stays the small-query variant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["MERSENNE31", "hash_sample_int", "sample_sql_predicate",
           "stratified_hash_sample", "stratified_sample_sql_predicate",
           "temperature_mix_rates", "temperature_mix_sample"]

MERSENNE31 = (1 << 31) - 1
_DEFAULT_A = 1103515245  # glibc LCG multiplier; any odd a < 2^31 works
_DEFAULT_B = 12345


def hash_sample_int(ds, id_col: str, rate: float, *,
                    a: int = _DEFAULT_A, b: int = _DEFAULT_B):
    """Keep rows whose hash bucket falls below ``rate`` of the hash
    space: ``((id % p) * a + b) % p < floor(rate * p)``, p = 2^31-1.

    ``id_col`` must be non-negative (numpy and SQL ``%`` agree there;
    they differ on negatives).  Fully vectorized — one numpy expression
    per batch, no shuffle, streaming-safe.
    """
    assert 0 < a < MERSENNE31 and 0 <= b < MERSENNE31
    threshold = int(rate * MERSENNE31)

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((ids % MERSENNE31) * a + b) % MERSENNE31  # < 2^62: no wrap
        return t.filter(pa.array(h < threshold))

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_sql_predicate(id_col: str, rate: float, *,
                         a: int = _DEFAULT_A, b: int = _DEFAULT_B) -> str:
    """The ANSI-SQL restatement of :func:`hash_sample_int`'s predicate
    (exact BIGINT arithmetic — the oracle side of the pair)."""
    threshold = int(rate * MERSENNE31)
    return (f"(({id_col} % {MERSENNE31}) * {a} + {b}) % {MERSENNE31}"
            f" < {threshold}")


def stratified_hash_sample(ds, id_col: str, stratum_col: str,
                           rates: dict, *, default_rate: float = 0.0,
                           a: int = _DEFAULT_A, b: int = _DEFAULT_B):
    """Per-stratum deterministic sampling: the same hash as
    :func:`hash_sample_int`, but the keep-threshold depends on the
    row's stratum (e.g. boost rare languages, downsample the head).

    The stratum->threshold table is tiny and ships once with the
    pickled UDF; the per-batch lookup is ``pc.index_in`` + ``take`` —
    vectorized, no shuffle, and membership stays a pure function of
    ``(id, stratum)``, so resumes and repartitions sample identically.
    """
    import pyarrow.compute as pc

    assert 0 < a < MERSENNE31 and 0 <= b < MERSENNE31
    strata = pa.array(sorted(rates), pa.string())
    thresholds = pa.array(
        [int(rates[s] * MERSENNE31) for s in sorted(rates)], pa.int64())
    default_thr = int(default_rate * MERSENNE31)

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((ids % MERSENNE31) * a + b) % MERSENNE31
        idx = pc.index_in(t[stratum_col], value_set=strata)
        thr = pc.fill_null(pc.take(thresholds, idx), default_thr)
        return t.filter(pa.array(h < thr.to_numpy(zero_copy_only=False)))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample_sql_predicate(id_col: str, stratum_col: str,
                                    rates: dict, *,
                                    default_rate: float = 0.0,
                                    a: int = _DEFAULT_A,
                                    b: int = _DEFAULT_B) -> str:
    """ANSI-SQL restatement of :func:`stratified_hash_sample`."""
    cases = " ".join(
        f"WHEN '{s}' THEN {int(rates[s] * MERSENNE31)}"
        for s in sorted(rates))
    return (f"(({id_col} % {MERSENNE31}) * {a} + {b}) % {MERSENNE31}"
            f" < CASE {stratum_col} {cases}"
            f" ELSE {int(default_rate * MERSENNE31)} END")


# ---------------------------------------------------------------------------
# temperature-based domain mixing (training-data curation: flatten the
# head-heavy domain distribution toward uniform before sampling)
# ---------------------------------------------------------------------------

def temperature_mix_rates(counts: dict, *, alpha: float,
                          target_rows: int) -> dict:
    """FROZEN per-domain keep rates for temperature-``alpha`` mixing
    (independently restated in ``tests/oracle/sketches.py``):

    ``p_d = c_d**alpha / sum(c**alpha)`` over domains sorted by name,
    ``rate_d = min(1.0, target_rows * p_d / c_d)``.

    ``alpha=1`` keeps the corpus mix (uniform row sampling), ``alpha=0``
    equalizes domains, values between flatten the head (the usual
    multilingual-training temperature trick).  All arithmetic is plain
    Python floats (libm ``pow``), summation in sorted-domain order —
    both sides compute the identical float sequence, so the derived
    integer thresholds are bit-stable."""
    weights = {d: float(counts[d]) ** alpha for d in sorted(counts)}
    total = 0.0
    for d in sorted(weights):
        total += weights[d]
    return {d: min(1.0, target_rows * (weights[d] / total) / counts[d])
            for d in sorted(weights)}


def temperature_mix_sample(ds, id_col: str, domain_col: str, *,
                           alpha: float = 0.5, target_rows: int,
                           a: int = _DEFAULT_A, b: int = _DEFAULT_B):
    """Deterministic temperature-mixed downsample: one small
    ``groupby(domain).count()`` exchange (partial counts combine per
    block; the materialized table is |domains| rows — a documented
    bounded-aggregate driver materialization), rates derived on the
    driver via :func:`temperature_mix_rates`, then the stateless
    per-row :func:`stratified_hash_sample` filter — membership stays a
    pure function of ``(id, domain)``, so resumes and repartitions
    sample identically."""
    cdf = ds.groupby(domain_col).count().to_pandas()
    if domain_col not in cdf.columns:  # empty aggregate, schema-less
        counts = {}
    else:
        counts = {d: int(n) for d, n in
                  zip(cdf[domain_col], cdf["count()"]) if d is not None}
    rates = temperature_mix_rates(counts, alpha=alpha,
                                  target_rows=target_rows)
    return stratified_hash_sample(ds, id_col, domain_col, rates,
                                  default_rate=0.0, a=a, b=b)
