"""Bigram language-model training + per-document perplexity scoring —
the CCNet-style LM quality signal for training-data curation (docs
whose perplexity under a clean-corpus LM is extreme are candidates for
dropping or down-weighting).

FROZEN spec (restated by ``tests/oracle/sketches.oracle_lm_*``; the
golden locks engine/oracle agreement):

* tokenizer: lowercase, split on runs of ``[^a-z0-9]`` (ASCII fold of
  the document — this is a quality SIGNAL, not a linguistic model);
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
scoring is a stateless vectorized second pass (token ids via
``searchsorted`` over the sorted vocab, bigram lookups via
``searchsorted`` over sorted packed pair keys).  Determinism: counts
are exact integers, vocabulary selection is totally ordered, and each
document's float ops run in a fixed sequence — batching cannot change
a score.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["lm_train", "lm_perplexity", "LM_UNK"]

LM_UNK = "<unk>"
_TOK_RE = re.compile(r"[a-z0-9]+")


def _tokens(text: str) -> list:
    return _TOK_RE.findall((text or "").lower())


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
        counts: dict = {}
        for txt in t[text_col].to_pylist():
            for w in _tokens(txt):
                counts[w] = counts.get(w, 0) + 1
        return pa.table({
            "tok": pa.array(list(counts.keys()), pa.string()),
            "c": pa.array(list(counts.values()), pa.int64()),
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

    def ids_of(words: list) -> np.ndarray:
        if not words:
            return np.empty(0, dtype=np.int64)
        w = np.asarray(words, dtype=object)
        idx = np.searchsorted(v_arr, w) if V else np.zeros(len(w), np.int64)
        idx = np.clip(idx, 0, max(V - 1, 0))
        ok = (v_arr[idx] == w) if V else np.zeros(len(w), dtype=bool)
        return np.where(ok, idx, V).astype(np.int64)  # V = <unk>

    def bi_partial(t: pa.Table) -> pa.Table:
        counts: dict = {}
        for txt in t[text_col].to_pylist():
            ids = ids_of(_tokens(txt))
            for k in (ids[:-1] * (V + 1) + ids[1:]).tolist():
                counts[k] = counts.get(k, 0) + 1
        return pa.table({
            "pair": pa.array(list(counts.keys()), pa.int64()),
            "c": pa.array(list(counts.values()), pa.int64()),
        })

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
    once via ``ray.put``; scoring is stateless per batch."""
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
        out = []
        for txt in t[text_col].to_pylist():
            words = _tokens(txt)
            if len(words) < 2:
                out.append(-1.0)
                continue
            w = np.asarray(words, dtype=object)
            if V:
                idx = np.clip(np.searchsorted(v_arr, w), 0, V - 1)
                ids = np.where(v_arr[idx] == w, idx, V).astype(np.int64)
            else:
                ids = np.zeros(len(w), dtype=np.int64)
            keys = ids[:-1] * (V + 1) + ids[1:]
            c12 = np.zeros(len(keys), dtype=np.int64)
            if len(pairs):
                pos = np.searchsorted(pairs, keys)
                inb = pos < len(pairs)
                hit = inb.copy()
                hit[inb] = pairs[pos[inb]] == keys[inb]
                c12[hit] = pcounts[pos[hit]]
            c1 = left[ids[:-1]]
            logp = np.log((c12 + alpha) / (c1 + denom_add))
            out.append(round(float(np.exp(-logp.mean())), ndigits))
        cols = {c: t[c] for c in key_cols}
        cols[out_col] = pa.array(out, pa.float64())
        return pa.table(cols)

    return ds.select_columns([*key_cols, text_col]).map_batches(
        score, batch_format="pyarrow")
