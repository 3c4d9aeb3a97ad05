"""DSIR-style importance resampling (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling"): score every corpus
document by how much more likely its hashed-n-gram bag is under a small
TARGET exemplar set than under the raw corpus, then draw a
fixed-size sample with the Gumbel-top-k trick so selection is a single
distributed sort instead of sequential sampling.

Scale shape (the 100 TB discipline, same as the rest of the repo):

* the corpus bucket distribution is per-batch ``np.bincount`` partials
  (at most ``buckets`` 16-byte rows per block, independent of block
  size) merged by ONE Sum groupby — the driver sees only the
  ``buckets``-row aggregate (the documented small-aggregate exception);
* the target set is an exemplar FILE — small by definition, read once
  on the driver, like :func:`rayxt.dedup.decontaminate_from_file`;
* the per-bucket log-ratio vector (``buckets`` float64s) ships once via
  ``ray.put``; scoring is a vectorized per-batch lookup-and-sum; text
  never crosses an exchange;
* resampling sorts only ``(keys, score)`` rows — the corpus-wide
  exchange moves a few dozen bytes per document, never the text.

FROZEN spec (restated by ``tests/oracle/sketches.py::oracle_dsir``):
tokens = ``text.lower().split()``; grams = unigrams + space-joined
bigrams, in document order; bucket = ``sha1-int64(gram) % buckets``
(:func:`rayxt.dedup._sha1_int64`); smoothed log-ratio per bucket =
``log((t_b + a) / (T + a*B)) - log((r_b + a) / (R + a*B))`` with
``a = smoothing``; doc score = sum of its grams' log-ratios (with
multiplicity) ROUNDED to ``ndigits`` (absorbs summation-order ulps);
gumbel key = score + Gumbel noise derived from
``splitmix64(id + seed * 0x9E3779B97F4A7C15)`` — u = (z >> 11) / 2^53
clamped to >= 2^-53, g = -log(-log(u)) — rounded to ``ndigits``;
the sample = top ``n`` by (gumbel_key desc, id asc).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._blockutil import ensure_typed
from .dedup import _sha1_int64
from .sketches import splitmix64_u64

__all__ = ["dsir_logweights", "dsir_resample"]

_GOLDEN64 = 0x9E3779B97F4A7C15


def _gram_buckets(text: str, buckets: int) -> np.ndarray:
    """Hashed unigram+bigram bucket ids of one document, in document
    order (unigrams first), with multiplicity."""
    toks = (text or "").lower().split()
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    if not grams:
        return np.empty(0, dtype=np.int64)
    # one sha1 per batch-distinct gram would need cross-row state; per
    # doc, distinct-ify locally (typical docs repeat grams heavily)
    uniq, inv = np.unique(np.asarray(grams, dtype=object),
                          return_inverse=True)
    h = np.fromiter((_sha1_int64(g) % buckets for g in uniq),
                    dtype=np.int64, count=len(uniq))
    return h[inv]


def _bucket_counts_of_texts(texts, buckets: int) -> np.ndarray:
    cnt = np.zeros(buckets, dtype=np.int64)
    for t in texts:
        b = _gram_buckets(t, buckets)
        if len(b):
            cnt += np.bincount(b, minlength=buckets)
    return cnt


def _log_ratio(target_cnt: np.ndarray, raw_cnt: np.ndarray,
               smoothing: float) -> np.ndarray:
    bb = len(target_cnt)
    t_tot = float(target_cnt.sum())
    r_tot = float(raw_cnt.sum())
    lt = np.log((target_cnt + smoothing) / (t_tot + smoothing * bb))
    lr = np.log((raw_cnt + smoothing) / (r_tot + smoothing * bb))
    return lt - lr


def dsir_logweights(ds, target_path: str, key_cols,
                    text_col: str = "text", *, buckets: int = 10_000,
                    smoothing: float = 0.01, ndigits: int = 6,
                    target_text_col: str = "text"):
    """Per-document DSIR log importance weights vs a target exemplar
    file.  Returns one row per input row: keys + ``n_grams`` +
    ``dsir_logw`` (see module docstring for the frozen spec)."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    if isinstance(key_cols, str):
        key_cols = [key_cols]

    target_texts = pq.read_table(
        target_path, columns=[target_text_col])[target_text_col].to_pylist()
    target_cnt = _bucket_counts_of_texts(target_texts, buckets)

    src = ds.select_columns(list(key_cols) + [text_col])

    def partial(t: pa.Table) -> pa.Table:
        cnt = _bucket_counts_of_texts(t[text_col].to_pylist(), buckets)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "cnt": pa.array(cnt[nz], pa.int64())})

    agg = (src.map_batches(partial, batch_format="pyarrow")
           .groupby("bucket").aggregate(Sum("cnt", alias_name="cnt"))
           .map_batches(lambda t: ensure_typed(
               t, {"bucket": pa.int64(), "cnt": pa.int64()}),
               batch_format="pyarrow").to_pandas())
    raw_cnt = np.zeros(buckets, dtype=np.int64)
    if len(agg):
        raw_cnt[agg["bucket"].to_numpy(dtype=np.int64)] = \
            agg["cnt"].to_numpy(dtype=np.int64)

    lr_ref = ray.put(_log_ratio(target_cnt, raw_cnt, smoothing))

    def score(t: pa.Table) -> pa.Table:
        lr = ray.get(lr_ref)
        n_grams, logw = [], []
        for txt in t[text_col].to_pylist():
            b = _gram_buckets(txt, buckets)
            n_grams.append(len(b))
            logw.append(round(float(lr[b].sum()), ndigits)
                        if len(b) else 0.0)
        out = t.select(list(key_cols))
        out = out.append_column("n_grams", pa.array(n_grams, pa.int64()))
        return out.append_column("dsir_logw",
                                 pa.array(logw, pa.float64()))

    return src.map_batches(score, batch_format="pyarrow")


def dsir_resample(ds, target_path: str, key_cols, n: int,
                  text_col: str = "text", *, buckets: int = 10_000,
                  smoothing: float = 0.01, seed: int = 1,
                  ndigits: int = 6, target_text_col: str = "text"):
    """Gumbel-top-k DSIR sample: ``n`` documents drawn without
    replacement proportionally to ``exp(dsir_logw)``, deterministically
    from ``(id, seed)``.  The first key column must be an integer id.
    Returns the selected rows: keys + ``dsir_logw`` + ``gumbel_key``,
    the distributed sample as ONE sort over narrow score rows."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    id_col = key_cols[0]

    w = dsir_logweights(ds, target_path, key_cols, text_col,
                        buckets=buckets, smoothing=smoothing,
                        ndigits=ndigits, target_text_col=target_text_col)

    def gumbel(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        offset = np.uint64((seed * _GOLDEN64) & ((1 << 64) - 1))
        z = splitmix64_u64(ids + offset)
        u = np.maximum((z >> np.uint64(11)).astype(np.float64) * 2.0**-53,
                       2.0**-53)
        g = -np.log(-np.log(u))
        logw = t["dsir_logw"].to_numpy(zero_copy_only=False)
        gkey = np.round(logw + g, ndigits)
        return t.append_column("gumbel_key", pa.array(gkey, pa.float64()))

    return (w.map_batches(gumbel, batch_format="pyarrow")
            .drop_columns(["n_grams"])
            .sort(["gumbel_key", id_col], descending=[True, False])
            .limit(n))
