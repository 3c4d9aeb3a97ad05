"""BPE tokenizer training + application over a Ray Dataset.

The corpus-scale stage is WORD-FREQUENCY aggregation: per-batch partial
counts (vectorized Arrow split + value_counts) merged by one Sum
groupby — document text crosses an exchange zero times, only (word, n)
partials do.  The merge-learning loop then runs on the driver over the
UNIQUE-word table (documented bounded-vocabulary assumption, the same
one real tokenizer trainers make: unique words << corpus bytes — a
trillion-token web corpus has a few hundred million distinct words,
and a pre-cap like min_count bounds it further).

FROZEN algorithm (the naive oracle in ``tests/oracle/sketches.py``
restates it from the raw texts, no partials):

1. words = whitespace-split tokens, each a tuple of single characters
   (no end-of-word marker);
2. repeat ``n_merges`` times: pair counts = sum of word_freq over
   ADJACENT symbol pairs (overlaps count: 'aaa' has (a,a) twice);
   best pair = highest count, ties by lexicographically smallest
   (left, right); record (rank, left, right, count) and merge the pair
   everywhere; stop early when no pairs remain.

``BpeApply`` is the actor-pool application stage: merge ranks load
once per actor in ``__init__``; each doc's words are encoded by
greedy lowest-rank merging (the standard BPE encode), emitting the
learned-vocabulary token count per doc.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["word_frequencies", "bpe_merges_from_freqs", "bpe_train",
           "BpeApply", "bpe_token_counts", "bpe_encode_word"]


def word_frequencies(ds, text_col: str = "text"):
    """Distributed corpus word counts: (word, n) via per-batch partials
    + one Sum groupby.  Nulls count as no words."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        # whitespace split (NOT single-space): must agree with the
        # python str.split() the apply stage and the oracle use, or
        # tab/newline corpora would train on phantom words
        flat = pc.list_flatten(pc.utf8_split_whitespace(t[text_col]))
        if len(flat) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        s = pd.Series(flat.to_pandas())
        s = s[s != ""]
        cnt = s.value_counts()
        return pa.table({"word": pa.array(cnt.index, pa.string()),
                         "n": pa.array(cnt.to_numpy(), pa.int64())})

    return (ds.select_columns([text_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("word").aggregate(Sum("n", alias_name="n")))


def bpe_merges_from_freqs(word_freqs: dict, n_merges: int):
    """The frozen merge loop over a {word: count} table (driver-side;
    bounded by the unique-word count, not the corpus)."""
    words = {tuple(w): int(c) for w, c in word_freqs.items() if w}
    merges = []
    for rank in range(n_merges):
        pairs: dict = {}
        for sym, c in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (left, right), count = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, left, right, count))
        joined = left + right
        new_words = {}
        for sym, c in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words
    return merges


def bpe_train(ds, text_col: str = "text", *, n_merges: int = 20):
    """Distributed word counting -> driver merge loop.  Returns the
    learned merge table as ``(rank, left, right, count)`` rows."""
    wf = word_frequencies(ds, text_col).to_pandas()
    freqs = dict(zip(wf["word"], wf["n"])) if len(wf) else {}
    merges = bpe_merges_from_freqs(freqs, n_merges)
    return pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "count": pa.array([m[3] for m in merges], pa.int64()),
    })


def bpe_encode_word(word: str, rank_of: dict) -> int:
    """Greedy lowest-rank BPE encode of one word -> number of symbols.
    (Symbols, not ids: the vocabulary is the merge table itself.)"""
    sym = list(word)
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = rank_of.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return len(sym)


class BpeApply:
    """Actor-pool stage: per-doc token count under a learned merge
    table.  The merge ranks build once per actor in ``__init__`` from
    the (tiny) merge rows passed by value; per-word encodes are cached
    across the actor's lifetime (Zipf: few distinct words dominate)."""

    def __init__(self, merges_rows, col: str = "text",
                 out: str = "n_bpe_learned"):
        self.rank_of = {(left, right): rank
                        for rank, left, right in merges_rows}
        self.col, self.out = col, out
        self.cache: dict = {}

    def _count(self, text: str) -> int:
        total = 0
        for w in text.split():
            n = self.cache.get(w)
            if n is None:
                n = bpe_encode_word(w, self.rank_of)
                self.cache[w] = n
            total += n
        return total

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = [self._count(t or "") for t in batch[self.col].to_pylist()]
        # drop schema metadata: parquet-embedded pandas metadata makes
        # pa.Schema unhashable (metadata hashes as a dict) and defeats
        # Ray's block-schema dedup with a per-batch warning
        batch = batch.replace_schema_metadata(None)
        return batch.append_column(self.out, pa.array(counts, pa.int64()))


def bpe_token_counts(ds, merges_table: pa.Table, *, col: str = "text",
                     out: str = "n_bpe_learned", batch_size: int = 256,
                     concurrency=(1, 4)):
    merges_rows = list(zip(merges_table["rank"].to_pylist(),
                           merges_table["left"].to_pylist(),
                           merges_table["right"].to_pylist()))
    # parquet blocks carry embedded pandas metadata that makes their
    # pa.Schema unhashable; the actor pool's batcher then warns on
    # every block-schema dedup.  Strip it in a stage that fuses with
    # the read task (zero-copy: only the schema object changes).
    ds = ds.map_batches(lambda t: t.replace_schema_metadata(None),
                        batch_format="pyarrow")
    return ds.map_batches(
        BpeApply, fn_constructor_kwargs=dict(merges_rows=merges_rows,
                                             col=col, out=out),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )
