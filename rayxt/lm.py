"""Bigram language-model training + per-document perplexity scoring —
the CCNet-style LM quality signal for training-data curation (docs
whose perplexity under a clean-corpus LM is extreme are candidates for
dropping or down-weighting).

FROZEN spec (restated by ``tests/oracle/sketches.oracle_lm_*``; the
golden locks engine/oracle agreement):

* tokenizer: lowercase, runs of ``[a-z0-9]`` (ASCII fold of the
  document — this is a quality SIGNAL, not a linguistic model);
* vocabulary: the ``vocab_size`` most frequent tokens, ties broken by
  token ascending; everything else maps to ``<unk>`` (id ``V``);
* probabilities: add-alpha smoothing over the ``V+1``-token vocab,
  ``P(w2 | w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * (V + 1))``
  with ``c(w1)`` the count of w1 as a bigram LEFT context;
* score: ``ppl = round(exp(-mean log P), 6)`` over a document's
  bigrams; documents with fewer than 2 tokens score ``-1.0``.

Scale shape: unigram and bigram counts are per-batch partial counts
merged by pure ``Sum`` groupbys (text never shuffles — only (token,
count) / (id-pair, count) rows do); the finished model is bounded by
``V + observed-bigrams <= V^2`` rows, ships ONCE via ``ray.put``, and
scoring is a stateless vectorized second pass.  EVERY hot path is
vectorized: tokenization is one Arrow ``utf8_lower`` +
``split_pattern_regex`` per batch, unigram counts one
``pc.value_counts``, bigram pairing / per-doc log-prob sums run on
the flattened token array with offset arithmetic (``np.repeat`` /
``np.add.at`` segment ops) — no per-token Python anywhere.
Determinism: counts are exact integers, vocabulary selection is
totally ordered, and each document's float ops run in a fixed
sequence — batching cannot change a score.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["lm_train", "lm_perplexity", "LM_UNK"]

LM_UNK = "<unk>"
_TOK_RE = re.compile(r"[a-z0-9]+")
_SEP_RE = r"[^a-z0-9]+"


def _tokens(text: str) -> list:
    """Reference tokenizer (the oracle's form; engine paths use the
    equivalent vectorized split below)."""
    return _TOK_RE.findall((text or "").lower())


def _split_column(col) -> tuple:
    """Text column -> (flat object ndarray of pieces, doc start/end
    index arrays with leading/trailing empty pieces trimmed) — the
    vectorized equivalent of per-doc ``findall`` (splitting on
    separator runs yields the same tokens plus possible ""-pieces at
    the edges, which the bound trim removes)."""
    lst = pc.split_pattern_regex(
        pc.utf8_lower(pc.cast(col, pa.string())), _SEP_RE)
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    vals = lst.flatten().to_numpy(zero_copy_only=False)
    off = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    s = off[:-1].copy()
    e = off[1:].copy()
    if len(vals):
        empty = np.asarray(vals == "")
        lead = (s < e)
        lead[lead] = empty[s[lead]]
        s = s + lead
        trail = (s < e)
        trail[trail] = empty[e[trail] - 1]
        e = e - trail
    return vals, s, e


def _ids_of(vals: np.ndarray, v_arr: np.ndarray) -> np.ndarray:
    """Vocab ids (unk = V) via one searchsorted over the sorted vocab."""
    V = len(v_arr)
    if len(vals) == 0:
        return np.empty(0, dtype=np.int64)
    if V == 0:
        return np.zeros(len(vals), dtype=np.int64)
    idx = np.clip(np.searchsorted(v_arr, vals), 0, V - 1)
    return np.where(v_arr[idx] == vals, idx, V).astype(np.int64)


def _pair_index(s: np.ndarray, e: np.ndarray):
    """-> (j, doc_of_pair): flat positions whose (j, j+1) bigram stays
    inside one document, and each pair's document index."""
    cnt = np.clip(e - s - 1, 0, None)
    total = int(cnt.sum())
    if total == 0:
        return (np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64), cnt)
    doc = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
    base = np.repeat(s, cnt)
    within = (np.arange(total, dtype=np.int64)
              - np.repeat(np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt))
    return base + within, doc, cnt


def lm_train(ds, *, text_col: str = "text", vocab_size: int = 1000,
             alpha: float = 0.1) -> dict:
    """Train the bigram model -> a picklable dict (see module spec).

    Two streaming passes: (1) unigram counts -> top-``vocab_size``
    vocabulary on the driver (bounded: ``vocab_size`` rows after one
    Sum groupby over distinct tokens); (2) bigram counts over
    vocab-mapped ids (OOV -> unk) -> sparse ``(packed pair, count)``
    rows, bounded by observed bigrams ``<= (V+1)^2``.
    """
    from ray.data.aggregate import Sum

    def uni_partial(t: pa.Table) -> pa.Table:
        lst = pc.split_pattern_regex(
            pc.utf8_lower(pc.cast(t[text_col], pa.string())), _SEP_RE)
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        flat = pc.drop_null(lst.flatten())
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table({
            "tok": vc.field("values"),
            "c": pc.cast(vc.field("counts"), pa.int64()),
        })

    uni = (ds.select_columns([text_col])
           .map_batches(uni_partial, batch_format="pyarrow")
           .groupby("tok").aggregate(Sum("c", alias_name="c"))
           .to_pandas())
    if len(uni) == 0:
        vocab = []
    else:
        uni = uni.sort_values(["c", "tok"], ascending=[False, True],
                              kind="mergesort")
        vocab = sorted(uni["tok"].head(vocab_size).tolist())
    v_arr = np.asarray(vocab, dtype=object)
    V = len(vocab)

    def bi_partial(t: pa.Table) -> pa.Table:
        vals, s, e = _split_column(t[text_col])
        j, _doc, _cnt = _pair_index(s, e)
        if len(j) == 0:
            return pa.table({"pair": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        ids = _ids_of(vals, v_arr)
        keys = ids[j] * (V + 1) + ids[j + 1]
        ukeys, ucounts = np.unique(keys, return_counts=True)
        return pa.table({"pair": pa.array(ukeys, pa.int64()),
                         "c": pa.array(ucounts.astype(np.int64))})

    bi = (ds.select_columns([text_col])
          .map_batches(bi_partial, batch_format="pyarrow")
          .groupby("pair").aggregate(Sum("c", alias_name="c"))
          .to_pandas())
    if len(bi):
        bi = bi.sort_values("pair", kind="mergesort")
        pairs = bi["pair"].to_numpy(np.int64)
        pcounts = bi["c"].to_numpy(np.int64)
    else:
        pairs = np.empty(0, dtype=np.int64)
        pcounts = np.empty(0, dtype=np.int64)
    # left-context counts c(w1) = sum over w2 of c(w1, w2)
    left = np.zeros(V + 1, dtype=np.int64)
    np.add.at(left, pairs // (V + 1), pcounts)
    return {"vocab": vocab, "pairs": pairs, "pair_counts": pcounts,
            "left_counts": left, "alpha": float(alpha)}


def lm_perplexity(ds, model: dict, *, text_col: str = "text",
                  key_cols=("doc_id",), out_col: str = "ppl",
                  ndigits: int = 6):
    """Score every document: keys + ``out_col`` (round-6 perplexity;
    ``-1.0`` for documents with fewer than 2 tokens).  The model ships
    once via ``ray.put``; scoring is one vectorized pass per batch
    (segmented log-prob sums over the flattened token array)."""
    import ray

    key_cols = list(key_cols)
    model_ref = ray.put(model)

    def score(t: pa.Table) -> pa.Table:
        m = ray.get(model_ref)
        v_arr = np.asarray(m["vocab"], dtype=object)
        V = len(v_arr)
        pairs = m["pairs"]
        pcounts = m["pair_counts"]
        left = m["left_counts"]
        alpha = m["alpha"]
        denom_add = alpha * (V + 1)

        vals, s, e = _split_column(t[text_col])
        j, doc, cnt = _pair_index(s, e)
        ppl = np.full(t.num_rows, -1.0)
        if len(j):
            ids = _ids_of(vals, v_arr)
            keys = ids[j] * (V + 1) + ids[j + 1]
            c12 = np.zeros(len(keys), dtype=np.int64)
            if len(pairs):
                pos = np.searchsorted(pairs, keys)
                inb = pos < len(pairs)
                hit = inb.copy()
                hit[inb] = pairs[pos[inb]] == keys[inb]
                c12[hit] = pcounts[pos[hit]]
            c1 = left[ids[j]]
            logp = np.log((c12 + alpha) / (c1 + denom_add))
            sums = np.zeros(t.num_rows, dtype=np.float64)
            np.add.at(sums, doc, logp)
            has = cnt > 0
            ppl[has] = np.round(np.exp(-sums[has] / cnt[has]), ndigits)
        cols = {c: t[c] for c in key_cols}
        cols[out_col] = pa.array(ppl, pa.float64())
        return pa.table(cols)

    return ds.select_columns([*key_cols, text_col]).map_batches(
        score, batch_format="pyarrow")
