"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All operators are Ray-Data-first: vectorized `map_batches` bodies
(pyarrow.compute / pandas) for the cheap columns, an actor-pool class
for the stateful language-ID stage (profiles compiled once per actor).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .state import key_digests

from ._blockutil import crc_bucket

__all__ = [
    "pack_documents",
    "normalize_text",
    "nfc_strip_controls",
    "normalize_sql_expr",
    "NORMALIZE_CTRL_RE",
    "redact_text",
    "redact_sql_expr",
    "PII_PATTERNS",
    "add_json_int_field",
    "add_char_entropy",
    "char_entropy_of",
    "add_url_parts",
    "add_token_count",
    "add_bpe_token_count",
    "add_stopword_ratio",
    "add_quality_columns",
    "LangId",
    "add_fingerprint",
    "token_count_table",
    "fingerprint_of",
    "BPE_TOKEN_PATTERN",
    "STOPWORD_PATTERN",
    "TFIDF_TOKEN_PATTERN",
    "document_frequency",
    "tfidf_top_terms",
    "top_ngrams",
    "repetition_profile",
    "add_repetition_signals",
    "add_word_stats",
    "word_stats_sql_exprs",
    "gopher_filter",
    "compression_ratio_of",
    "add_compression_ratio",
    "keyword_pattern",
    "add_keyword_flag",
    "filter_keywords",
    "split_sentences",
    "sentences_sql",
    "SENT_BOUNDARY_RE",
    "clean_lines",
    "clean_lines_sql_exprs",
    "CLEAN_LINE_MIN_WORDS",
    "inverted_index",
    "canonicalize_url",
    "chunk_documents",
]

# BPE-style pre-tokenizer classes (letters runs / digit runs / single
# punctuation), restricted to constructs RE2 evaluates identically in
# pyarrow.compute and DuckDB — the SQL oracle uses the same pattern
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
STOPWORD_PATTERN = (
    r"\b(the|and|of|to|a|in|is|that|it|for|was|on|are|as|with|his|they"
    r"|at|be|this)\b"
)


# ---------------------------------------------------------------------------
# token counting (vectorized; SQL-parity: array_length(string_split(text,' ')))
# ---------------------------------------------------------------------------


def token_count_table(batch: pa.Table, col: str = "text",
                      out: str = "n_tokens") -> pa.Table:
    toks = pc.list_value_length(pc.split_pattern(batch[col], " "))
    return batch.append_column(out, pc.cast(toks, pa.int64()))


def add_token_count(ds, col: str = "text", out: str = "n_tokens"):
    return ds.map_batches(
        lambda t: token_count_table(t, col, out), batch_format="pyarrow"
    )


def add_bpe_token_count(ds, col: str = "text", out: str = "n_bpe_tokens"):
    """BPE-pre-tokenizer-style token count: non-overlapping matches of
    ``BPE_TOKEN_PATTERN``, fully vectorized (pyarrow's RE2)."""

    def count(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t[col], BPE_TOKEN_PATTERN)
        return t.append_column(out, pc.cast(n, pa.int64()))

    return ds.map_batches(count, batch_format="pyarrow")


def add_stopword_ratio(ds, col: str = "text", out: str = "stopword_ratio",
                       ndigits: int = 6):
    """Stopword share of whitespace tokens (quality signal), rounded
    for cross-engine float parity; both factors vectorized RE2/Arrow."""

    def ratio(t: pa.Table) -> pa.Table:
        stops = pc.cast(
            pc.count_substring_regex(t[col], STOPWORD_PATTERN), pa.float64()
        )
        toks = pc.cast(
            pc.list_value_length(pc.split_pattern(t[col], " ")), pa.float64()
        )
        return t.append_column(out, pc.round(pc.divide(stops, toks),
                                             ndigits=ndigits))

    return ds.map_batches(ratio, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# quality scoring (vectorized arithmetic; every column SQL-expressible)
# ---------------------------------------------------------------------------


def quality_table(batch: pa.Table, col: str = "text") -> pa.Table:
    """Adds n_tokens, avg_word_len (round 6), the_count (substring
    occurrences of 'the' — SQL parity: (len - len(replace))/3)."""
    text = batch[col]
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_tokens = pc.cast(
        pc.list_value_length(pc.split_pattern(text, " ")), pa.int64()
    )
    ntf = pc.cast(n_tokens, pa.float64())
    # tokens are single-space separated: total word chars = n_chars - (n_tokens-1)
    awl = pc.round(
        pc.divide(pc.subtract(n_chars, pc.subtract(ntf, 1.0)), ntf), ndigits=6
    )
    the_count = pc.cast(pc.count_substring(text, "the"), pa.int64())
    out = batch.append_column("n_tokens", n_tokens)
    out = out.append_column("avg_word_len", awl)
    return out.append_column("the_count", the_count)


def add_quality_columns(ds, col: str = "text"):
    return ds.map_batches(lambda t: quality_table(t, col), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# language identification (stateful actor stage; heuristic stopword +
# character-class profiles — rows-only oracle, not SQL-expressible)
# ---------------------------------------------------------------------------

_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "que", "de", "por"},
}


class LangId:
    """Heuristic language-ID: stopword-profile votes + CJK codepoint share.

    Actor-pool stage: regexes and profiles are built once per actor in
    ``__init__`` (the stateful-stage pattern); ``__call__`` is per batch.
    """

    def __init__(self, col: str = "text", out: str = "lang_guess"):
        self.col = col
        self.out = out
        self.word_re = re.compile(r"[a-zA-Z]+")
        self.cjk_re = re.compile(r"[一-鿿぀-ヿ]")
        self.profiles = {k: frozenset(v) for k, v in _PROFILES.items()}

    def _guess(self, text: str) -> str:
        if not text:
            return ""
        if len(self.cjk_re.findall(text)) * 2 > len(text) * 0.05:
            return "zh"
        words = [w.lower() for w in self.word_re.findall(text[:4000])]
        if not words:
            return ""
        best, best_score = "", 0
        for lang, stops in self.profiles.items():
            score = sum(1 for w in words if w in stops)
            if score > best_score:
                best, best_score = lang, score
        return best if best_score > 0 else "en"

    def __call__(self, batch: pa.Table) -> pa.Table:
        guesses = [self._guess(t or "") for t in batch[self.col].to_pylist()]
        return batch.append_column(self.out, pa.array(guesses, pa.string()))


# ---------------------------------------------------------------------------
# document fingerprint (rolling polynomial hash over tokens, 64-bit)
# ---------------------------------------------------------------------------

_FP_BASE = np.uint64(1099511628211)
_FP_OFFSET = np.uint64(14695981039346656037)


def fingerprint_of(text: str) -> int:
    """FNV-1a-style rolling hash over whitespace tokens (deterministic)."""
    h = int(_FP_OFFSET)
    for tok in text.split():
        for b in tok.encode("utf-8"):
            h = ((h ^ b) * int(_FP_BASE)) & 0xFFFFFFFFFFFFFFFF
        h = ((h ^ 0x20) * int(_FP_BASE)) & 0xFFFFFFFFFFFFFFFF
    return h


def add_fingerprint(ds, col: str = "text", out: str = "fingerprint"):
    def batch_fp(t: pa.Table) -> pa.Table:
        fps = [format(fingerprint_of(x or ""), "016x") for x in t[col].to_pylist()]
        return t.append_column(out, pa.array(fps, pa.string()))

    return ds.map_batches(batch_fp, batch_format="pyarrow")


def keyword_pattern(phrases) -> str:
    """FROZEN wordlist-match policy (C4-style blocklist filtering):
    case-insensitive whole-word match of any phrase — one RE2
    alternation ``(?i)\\b(p1|p2|...)\\b`` over the lowercased, deduped,
    sorted, ``re.escape``d phrase list.  The SAME pattern string runs
    in the DuckDB oracle (both engines are RE2), so the gate pins the
    policy without a golden."""
    import re as _re

    toks = sorted({p.strip().lower() for p in phrases if p.strip()})
    if not toks:
        raise ValueError("empty phrase list")
    return r"(?i)\b(" + "|".join(_re.escape(p) for p in toks) + r")\b"


def add_keyword_flag(ds, phrases, col: str = "text",
                     out: str = "keyword_hit"):
    """Append a bool column: does the text contain any listed phrase
    as whole words?  The pattern compiles once per pickled UDF; the
    per-batch work is one vectorized RE2 kernel, zero exchanges."""
    import pyarrow.compute as pc

    pattern = keyword_pattern(phrases)

    def flag(t: pa.Table) -> pa.Table:
        # cast first: an all-null block arrives null-typed
        vals = pc.fill_null(t[col].cast(pa.string()), "")
        return t.append_column(out, pc.match_substring_regex(vals, pattern))

    return ds.map_batches(flag, batch_format="pyarrow")


def filter_keywords(ds, phrases, col: str = "text", *,
                    negate: bool = True):
    """Blocklist filter: with ``negate=True`` (the C4 use) keep rows
    WITHOUT any listed phrase; ``negate=False`` keeps the hits."""
    import pyarrow.compute as pc

    pattern = keyword_pattern(phrases)

    def keep(t: pa.Table) -> pa.Table:
        # cast first: an all-null block arrives null-typed
        vals = pc.fill_null(t[col].cast(pa.string()), "")
        hit = pc.match_substring_regex(vals, pattern)
        return t.filter(pc.invert(hit) if negate else hit)

    return ds.map_batches(keep, batch_format="pyarrow")


def compression_ratio_of(text: str):
    """FROZEN compression-ratio quality signal (Gopher-style: highly
    compressible text is repetitive boilerplate, near-incompressible
    text is noise): ``len(zlib.compress(utf8, level=6)) / len(utf8)``,
    ``round(..., 6)``; empty text -> ``None``.  zlib level-6 DEFLATE
    output is fully determined by the input (both sides run the same
    bundled zlib), so goldens are bit-stable."""
    import zlib

    raw = text.encode("utf-8")
    if not raw:
        return None
    return round(len(zlib.compress(raw, 6)) / len(raw), 6)


def add_compression_ratio(ds, col: str = "text",
                          out: str = "compression_ratio"):
    """Append the float64 compression-ratio column.  DEFLATE is
    inherently per-document (like fingerprinting); the stage is
    stateless, embarrassingly parallel, O(bytes) per document with a
    bounded 256 KiB zlib window."""

    def batch_cr(t: pa.Table) -> pa.Table:
        crs = [compression_ratio_of(x or "") for x in t[col].to_pylist()]
        return t.append_column(out, pa.array(crs, pa.float64()))

    return ds.map_batches(batch_cr, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# repetition quality signals (Gopher-style: repeated words / n-grams
# mark low-quality machine-generated or boilerplate text)
# ---------------------------------------------------------------------------


def repetition_profile(text: str) -> tuple[float, float, float]:
    """FROZEN per-document repetition signals over whitespace tokens
    (independently restated in ``tests/oracle/sketches.py``):

    - ``max_word_frac``: count of the most frequent word / word count
    - ``top_2gram_frac``: count of the most frequent word-bigram /
      bigram count (0.0 with fewer than 2 words)
    - ``dup_3gram_frac``: fraction of word-trigram occurrences whose
      trigram occurs more than once (0.0 with fewer than 3 words)

    Each ratio is ``round(..., 6)`` — both sides compute the identical
    float sequence, so goldens are bit-stable."""
    words = text.split()
    n = len(words)
    if n == 0:
        return 0.0, 0.0, 0.0
    counts: dict = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    max_word = round(max(counts.values()) / n, 6)
    if n < 2:
        return max_word, 0.0, 0.0
    c2: dict = {}
    for i in range(n - 1):
        g = (words[i], words[i + 1])
        c2[g] = c2.get(g, 0) + 1
    top2 = round(max(c2.values()) / (n - 1), 6)
    if n < 3:
        return max_word, top2, 0.0
    c3: dict = {}
    for i in range(n - 2):
        g = (words[i], words[i + 1], words[i + 2])
        c3[g] = c3.get(g, 0) + 1
    dup3 = round(sum(c for c in c3.values() if c > 1) / (n - 2), 6)
    return max_word, top2, dup3


def add_repetition_signals(ds, col: str = "text"):
    """Append ``max_word_frac`` / ``top_2gram_frac`` / ``dup_3gram_frac``
    float64 columns.  Counting n-grams is inherently per-row (like
    LangId / fingerprinting); the stage is stateless and embarrassingly
    parallel, O(words) per document."""

    def batch_rep(t: pa.Table) -> pa.Table:
        profs = [repetition_profile(x or "") for x in t[col].to_pylist()]
        for i, name in enumerate(("max_word_frac", "top_2gram_frac",
                                  "dup_3gram_frac")):
            t = t.append_column(
                name, pa.array([p[i] for p in profs], pa.float64()))
        return t

    return ds.map_batches(batch_rep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# TF-IDF (two-pass: distributed document-frequency aggregate, then a
# broadcast-idf scoring pass; terms are ASCII [A-Za-z0-9]+ runs
# lowercased AFTER extraction so Python re and DuckDB RE2 tokenize
# byte-identically — no Unicode case-fold divergence)
# ---------------------------------------------------------------------------

TFIDF_TOKEN_PATTERN = r"[A-Za-z0-9]+"
_TFIDF_RE = re.compile(TFIDF_TOKEN_PATTERN)


def _term_frame(t: pa.Table, id_col: str, text_col: str) -> pd.DataFrame:
    """Flatten a batch into one row per (doc, occurrence): tokenizing a
    string is inherently per-row; everything downstream is vectorized."""
    ids = t[id_col].to_numpy(zero_copy_only=False)
    toks = [_TFIDF_RE.findall(x or "") for x in t[text_col].to_pylist()]
    counts = np.fromiter((len(x) for x in toks), dtype=np.int64,
                         count=len(toks))
    flat = [tok.lower() for doc in toks for tok in doc]
    return pd.DataFrame({id_col: np.repeat(ids, counts), "term": flat})


def document_frequency(ds, *, id_col: str = "doc_id",
                       text_col: str = "text"):
    """``term -> number of docs containing it``.  Per-batch partial
    (distinct terms per doc, counted per batch) cuts the exchange to
    one row per (batch, term); a Sum aggregate merges partials."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        tf = _term_frame(t, id_col, text_col).drop_duplicates()
        cnt = tf["term"].value_counts()
        return pa.table({
            "term": pa.array(cnt.index, pa.string()),
            "df_partial": pa.array(cnt.to_numpy(), pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("term").aggregate(Sum("df_partial", alias_name="df")))


def tfidf_top_terms(ds, *, n_docs: int, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 1,
                    ndigits: int = 6, join_path: bool = False,
                    join_partitions: int = 8):
    """Per-document top-``k`` terms by tf-idf (``tf * ln(N/df)``), ties
    broken lexicographically — deterministic and partition-independent.

    Scale shape: pass 1 is the :func:`document_frequency` aggregate;
    the resulting ``term -> idf`` table goes through ``ray.put`` ONCE
    (broadcast, not re-shipped per batch — documented assumption: the
    vocabulary fits in worker memory).  Pass 2 scores each doc entirely
    inside its batch — a document never spans rows, so top-k needs NO
    shuffle at all.

    ``join_path=True`` is the open-vocabulary general path: the tf rows
    hash-join the df table on ``term`` (both sides shuffle — no driver
    materialization of the vocabulary), then a per-doc top-k with
    per-batch partial pruning.  Bit-identical output to the broadcast
    path (same float64 op sequence; asserted by tests), at the cost of
    two extra exchanges.
    """
    import ray

    df_tbl = document_frequency(ds, id_col=id_col, text_col=text_col)

    def tf_rows(t: pa.Table) -> pa.Table:
        frame = _term_frame(t, id_col, text_col)
        if frame.empty:
            return pa.table({id_col: pa.array([], t[id_col].type),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        tf = (frame.groupby([id_col, "term"], sort=False)
              .size().reset_index(name="tf"))
        tf["tf"] = tf["tf"].astype(np.int64)
        return pa.Table.from_pandas(
            tf, preserve_index=False).replace_schema_metadata(None)

    if join_path:
        from rayxt.windows import grouped_topk

        def add_idf(t: pa.Table) -> pa.Table:
            idf = np.log(float(n_docs)
                         / t["df"].to_numpy(zero_copy_only=False)
                         .astype(np.float64))
            return pa.table({"term": t["term"],
                             "idf": pa.array(idf, pa.float64())})

        idf_ds = df_tbl.map_batches(add_idf, batch_format="pyarrow")
        joined = ds.map_batches(tf_rows, batch_format="pyarrow").join(
            idf_ds, "inner", num_partitions=join_partitions, on=("term",))

        def score_joined(t: pa.Table) -> pa.Table:
            s = (t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
                 * t["idf"].to_numpy(zero_copy_only=False)).round(ndigits)
            return pa.table({id_col: t[id_col], "term": t["term"],
                             "tfidf": pa.array(s, pa.float64())})

        scored = joined.map_batches(score_joined, batch_format="pyarrow")
        top = grouped_topk(scored, key=id_col, order_col="tfidf", k=k,
                           descending=True, tie_cols=("term",))
        return top.map_batches(
            lambda df: df[[id_col, "term", "tfidf"]],
            batch_format="pandas")

    dfp = df_tbl.to_pandas()
    if dfp.empty:
        # empty-input aggregates come back schema-less (no columns)
        dfp = pd.DataFrame({"term": pd.Series([], dtype=object),
                            "df": pd.Series([], dtype="int64")})
    idf = pd.Series(
        np.log(float(n_docs) / dfp["df"].to_numpy().astype(np.float64)),
        index=dfp["term"])
    idf_ref = ray.put(idf)

    def score(t: pa.Table) -> pa.Table:
        idf_map = ray.get(idf_ref)  # plasma-local after first fetch
        frame = _term_frame(t, id_col, text_col)
        if frame.empty:
            return pa.table({id_col: pa.array([], t[id_col].type),
                             "term": pa.array([], pa.string()),
                             "tfidf": pa.array([], pa.float64())})
        tf = (frame.groupby([id_col, "term"], sort=False)
              .size().reset_index(name="tf"))
        tf["tfidf"] = (tf["tf"].to_numpy().astype(np.float64)
                       * idf_map[tf["term"]].to_numpy()).round(ndigits)
        tf = tf.sort_values([id_col, "tfidf", "term"],
                            ascending=[True, False, True], kind="mergesort")
        top = tf.groupby(id_col, sort=False).head(k)
        return pa.Table.from_pandas(
            top[[id_col, "term", "tfidf"]],
            preserve_index=False).replace_schema_metadata(None)

    return ds.map_batches(score, batch_format="pyarrow")


def top_ngrams(ds, *, text_col: str = "text", n: int = 2, k: int = 20,
               out_cols: tuple = ("ngram", "n")):
    """Corpus-wide top-``k`` word ``n``-grams by occurrence count
    (ties -> lexicographically smallest ngram — a total order, so the
    cut is deterministic).

    Scale shape: per-batch partial counts (numpy char-join over the
    flat token array, cross-document pairs masked out) -> Sum-merge
    ``groupby(ngram)`` -> per-block partial top-k (a block-local
    non-top-k ngram can never be global top-k) -> tiny driver-side
    final sort over <= k rows per block.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks = [_TFIDF_RE.findall(x or "") for x in t[text_col].to_pylist()]
        flat = np.array([w.lower() for doc in toks for w in doc],
                        dtype=object)
        if len(flat) < n:
            return pa.table({"ngram": pa.array([], pa.string()),
                             "n_partial": pa.array([], pa.int64())})
        lens = np.fromiter((len(x) for x in toks), dtype=np.int64,
                           count=len(toks))
        # doc index per token: an n-gram is valid only if its first and
        # last token belong to the same document
        doc_of = np.repeat(np.arange(len(toks)), lens)
        grams = flat[: len(flat) - n + 1].copy()
        for j in range(1, n):
            grams = grams + " "
            grams = grams + flat[j: len(flat) - n + 1 + j]
        valid = doc_of[: len(flat) - n + 1] == doc_of[n - 1:]
        cnt = pd.Series(grams[valid]).value_counts()
        return pa.table({
            "ngram": pa.array(cnt.index, pa.string()),
            "n_partial": pa.array(cnt.to_numpy(), pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("ngram").aggregate(Sum("n_partial", alias_name="__n")))

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            # empty-input aggregate blocks come back schema-less
            return pd.DataFrame({"ngram": pd.Series([], dtype=object),
                                 "__n": pd.Series([], dtype="int64")})
        return df.sort_values(["__n", "ngram"], ascending=[False, True],
                              kind="mergesort").head(k)

    cand = block_topk(
        agg.map_batches(block_topk, batch_format="pandas").to_pandas())
    top = (cand.sort_values(["__n", "ngram"], ascending=[False, True],
                            kind="mergesort").head(k)
           .reset_index(drop=True))
    return pd.DataFrame({out_cols[0]: top["ngram"],
                         out_cols[1]: top["__n"].astype("int64")})


def add_json_int_field(ds, *, col: str, field: str, out: str):
    """Extract an integer field from a FLAT-JSON string column,
    vectorized: one RE2 kernel per batch (``pc.extract_regex``), no
    per-row json.loads.  The RE2-on-both-sides trick (see
    ``add_bpe_token_count``) makes it exactly oracle-checkable, and
    for flat non-escaped JSON the regex IS the grammar.  Documents
    with no such field yield null (filter or aggregate before any
    integer-null-sensitive sink).  Nested/escaped JSON needs a real
    parser — that variant would be a per-row actor stage like LangId.
    """
    import pyarrow.compute as pc

    pattern = '"' + field + '"\\s*:\\s*(?P<v>-?\\d+)'

    def ex(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t[col], pattern=pattern)
        return t.append_column(
            out, pc.cast(pc.struct_field(m, "v"), pa.int64()))

    return ds.map_batches(ex, batch_format="pyarrow")


def char_entropy_of(text: str) -> float:
    """Shannon entropy (log2) of the character distribution — a cheap
    quality signal (near-zero for degenerate/repeated text, high for
    natural prose).  Per-row numpy bincount over codepoints; O(len)
    like :func:`fingerprint_of`."""
    if not text:
        return 0.0
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    _, counts = np.unique(codes, return_counts=True)
    p = counts / counts.sum()
    return float(-(p * np.log2(p)).sum())


def add_char_entropy(ds, col: str = "text", out: str = "char_entropy",
                     ndigits: int = 6):
    def batch_ent(t: pa.Table) -> pa.Table:
        ents = [round(char_entropy_of(x or ""), ndigits)
                for x in t[col].to_pylist()]
        return t.append_column(out, pa.array(ents, pa.float64()))

    return ds.map_batches(batch_ent, batch_format="pyarrow")


_URL_PATTERN = (
    r"^(?P<scheme>[a-z][a-z0-9+.-]*)://(?P<host>[^/?#]*)"
    r"(?P<path>[^?#]*)"
)


def add_url_parts(ds, col: str = "url"):
    """Split scheme / host / path out of a URL column with ONE
    vectorized RE2 kernel per batch — the standard first step of any
    web-corpus pipeline (host-level grouping, path filters).  The same
    pattern evaluates identically in DuckDB's regexp_extract (RE2 on
    both sides), so derived columns stay oracle-checkable."""

    def parts(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t[col], pattern=_URL_PATTERN)
        out = t.append_column("scheme", pc.struct_field(m, "scheme"))
        out = out.append_column("host", pc.struct_field(m, "host"))
        return out.append_column("path", pc.struct_field(m, "path"))

    return ds.map_batches(parts, batch_format="pyarrow")


def normalize_text(ds, col: str = "text", out: str = "text_norm"):
    """Unicode + whitespace normalization:

    1. collapse every whitespace run to one space
       (``replace_substring_regex(r"\s+", " ")`` — RE2, same dialect
       as DuckDB's ``regexp_replace(..., 'g')``);
    2. trim leading/trailing SPACES (every run is now a single space,
       so trimming ' ' matches SQL ``trim()`` exactly);
    3. Unicode NFC, matching DuckDB ``nfc_normalize``.

    Steps 1-2 are Arrow kernels.  Step 3 CANNOT use
    ``pc.utf8_normalize(form='NFC')``: in this Arrow build it fails to
    recompose combining sequences (``e`` + U+0301 stays decomposed —
    diverges from DuckDB and ``unicodedata``), so NFC runs through
    ``unicodedata.normalize`` behind a vectorized ``string_is_ascii``
    fast path — pure-ASCII batches (the common web-text case) never
    touch Python strings.

    The standard text-cleaning first pass (dedup keys, tokenizers and
    fingerprints all want NFC + canonical whitespace).
    """
    import unicodedata

    def norm(t: pa.Table) -> pa.Table:
        x = pc.replace_substring_regex(t[col], pattern=r"\s+",
                                       replacement=" ")
        x = pc.utf8_trim(x, characters=" ")
        if not pc.all(pc.string_is_ascii(x)).as_py():
            x = pa.array(
                [v if v is None or v.isascii()
                 else unicodedata.normalize("NFC", v)
                 for v in x.to_pylist()], pa.string())
        return t.append_column(out, x)

    return ds.map_batches(norm, batch_format="pyarrow")


def inverted_index(ds, *, id_col: str = "doc_id", text_col: str = "text",
                   buckets: int = 64):
    """Distributed inverted-index build: ``term -> (df, tf, postings)``
    with postings = comma-joined doc ids in ascending order (string for
    SQL parity; a production sink would store the int list directly).

    Scale shape: tokenization + per-(term, doc) term frequencies are
    complete INSIDE each batch (a document never spans rows), so the
    only exchange moves (term, doc_id, tf) partial rows.  Postings
    assembly groups by a HASH BUCKET of the term (<= ``buckets`` Ray
    groups, one vectorized pandas groupby inside each) — never one Ray
    group per term, which at vocabulary scale would pay Ray's ~5ms
    per-group overhead millions of times.  Hot terms ("the") make a
    bucket large but never split it; cap posting length upstream (stop
    word removal) if a term's postings must fit one worker.
    """
    def partial(t: pa.Table) -> pa.Table:
        tf = _term_frame(t, id_col, text_col)
        cnt = (tf.groupby(["term", id_col], sort=False).size()
               .reset_index(name="tf"))
        bucket = crc_bucket(cnt["term"], buckets)
        return pa.table({
            "term": pa.array(cnt["term"], pa.string()),
            id_col: pa.array(cnt[id_col].to_numpy(), pa.int64()),
            "tf": pa.array(cnt["tf"].to_numpy(), pa.int64()),
            "_tb": pa.array(bucket, pa.int64()),
        })

    out_schema = pa.schema([("term", pa.string()), ("df", pa.int64()),
                            ("tf", pa.int64()), ("postings", pa.string())])

    def assemble(g: pd.DataFrame) -> pa.Table:
        # returns a TYPED Arrow table even for empty partitions — a
        # schema-less empty pandas block would trip the streaming
        # executor's "RefBundle with a different schema" warning
        if g.empty:
            return out_schema.empty_table()
        g = g.sort_values(["term", id_col], kind="mergesort")
        gb = g.groupby("term", sort=False)
        out = gb.agg(
            df=(id_col, "size"),
            tf=("tf", "sum"),
            postings=(id_col, lambda s: ",".join(map(str, s))),
        ).reset_index()
        return pa.Table.from_pandas(
            out, schema=out_schema,
            preserve_index=False).replace_schema_metadata(None)

    return (ds.select_columns([id_col, text_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("_tb").map_groups(assemble, batch_format="pandas"))


_CANON_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
    r"(?P<host>[^/?#:@\[\]]*)(?::(?P<port>[0-9]+))?"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)
# the decomposition above would silently mis-split authorities carrying
# userinfo ('user:pass@host'), IPv6 brackets or a non-numeric port, so
# a row must ALSO pass this whole-authority shape check or it passes
# through verbatim (out of policy scope, like non-URLs)
_CANON_AUTHORITY_OK_RE = (
    r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:@\[\]]+(:[0-9]+)?([/?#]|$)"
)
_TRACKING_KEYS = frozenset({"fbclid", "gclid", "msclkid"})


def _is_tracking_param(p: str) -> bool:
    key = p.split("=", 1)[0]
    return key.startswith("utm_") or key in _TRACKING_KEYS


def canonicalize_url(ds, col: str = "url", out: str = "url_canon"):
    """Web-corpus URL canonicalization.  FROZEN policy (the independent
    oracle in ``tests/oracle/url_oracle.py`` restates it with
    ``urllib.parse.urlsplit`` — different mechanism, same policy):

    1. scheme and host lowercased (path/query stay verbatim);
    2. fragment stripped;
    3. default port dropped (http:80 / https:443; others kept);
    4. tracking params removed (``utm_*``, fbclid, gclid, msclkid);
       surviving params keep their original order and encoding, the
       ``?`` goes when none survive;
    5. empty path becomes ``/``.

    Decomposition and case folding are ONE vectorized RE2 + Arrow
    kernels; only rows that actually carry a query string pay a
    per-row param filter.  Non-URL rows pass through unchanged, and so
    do authorities outside the policy scope — userinfo (``user@host``),
    IPv6 bracket hosts, empty hosts and non-numeric ports (default
    ports are dropped on their canonical TEXT spelling only: ``:080``
    is preserved verbatim).
    """

    def canon(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t[col], pattern=_CANON_URL_RE)
        valid = pc.and_(
            pc.is_valid(m),
            pc.fill_null(pc.match_substring_regex(
                t[col], _CANON_AUTHORITY_OK_RE), False),
        )
        scheme = pc.utf8_lower(pc.struct_field(m, "scheme"))
        host = pc.utf8_lower(pc.struct_field(m, "host"))
        port = pc.struct_field(m, "port")
        path = pc.struct_field(m, "path")
        query = pc.struct_field(m, "query")

        default = pc.or_(
            pc.and_(pc.equal(scheme, "http"), pc.equal(port, "80")),
            pc.and_(pc.equal(scheme, "https"), pc.equal(port, "443")),
        )
        # a non-participating optional group extracts as "" — absent
        present = pc.and_(pc.is_valid(port),
                          pc.invert(pc.equal(pc.fill_null(port, ""), "")))
        keep_port = pc.and_(present,
                            pc.invert(pc.fill_null(default, False)))
        port_part = pc.if_else(
            keep_port, pc.binary_join_element_wise(":", port, ""), "")
        path_part = pc.if_else(pc.equal(path, ""), "/", path)

        # per-row param filter, only where a query string exists
        qlist = query.to_pylist()
        fq = [
            "" if q is None else
            "&".join(p for p in q.split("&") if p and not _is_tracking_param(p))
            for q in qlist
        ]
        fq_arr = pa.array(fq, pa.string())
        q_part = pc.if_else(pc.equal(fq_arr, ""), "",
                            pc.binary_join_element_wise("?", fq_arr, ""))

        rebuilt = pc.binary_join_element_wise(
            scheme, "://", host, port_part, path_part, q_part, "")
        result = pc.if_else(valid, rebuilt, t[col])
        return t.append_column(out, result)

    return ds.map_batches(canon, batch_format="pyarrow")


def chunk_documents(ds, *, id_col: str = "doc_id", text_col: str = "text",
                    max_tokens: int = 32, overlap: int = 8):
    """Split documents into training-ready overlapping token chunks —
    the standard context-window packing step.

    FROZEN spec (SQL parity: single-space-tokenized corpora — DuckDB's
    ``string_split(text, ' ')`` and Python ``split()`` agree there):
    tokens = whitespace split; chunk starts at 0, stride, 2*stride ...
    while start < n_tokens, with stride = max_tokens - overlap;
    ``chunk_idx`` = start // stride; chunk text rejoins the token slice
    with single spaces; ``n_tokens`` is the slice length (the last
    chunk is short).  Zero-token docs emit no chunks.

    One row per chunk crosses downstream; the explode is per-doc slices
    over the split token array (chunking is inherently per-doc, like
    shingling)."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    stride = max_tokens - overlap

    def explode(t: pa.Table) -> pa.Table:
        ids_out, idx_out, text_out, n_out = [], [], [], []
        ids = t[id_col].to_pylist()
        for i, txt in zip(ids, t[text_col].to_pylist()):
            toks = (txt or "").split()
            for s in range(0, max(len(toks), 1), stride):
                if s >= len(toks):
                    break
                piece = toks[s:s + max_tokens]
                ids_out.append(i)
                idx_out.append(s // stride)
                text_out.append(" ".join(piece))
                n_out.append(len(piece))
        return pa.table({
            id_col: pa.array(ids_out, t.schema.field(id_col).type),
            "chunk_idx": pa.array(idx_out, pa.int64()),
            "chunk_text": pa.array(text_out, pa.string()),
            "n_tokens": pa.array(n_out, pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow")


def pack_documents(ds, *, id_col: str = "doc_id", text_col: str = "text",
                   max_tokens: int = 512, n_buckets: int = 64):
    """Pack documents into fixed token-budget groups — the
    training-batch construction step (sequence packing).

    FROZEN spec: tokens = single-space split (the :func:`chunk_documents`
    convention); docs hash to ``bucket = digest_a(id) % n_buckets``
    (channel *a* of :func:`rayxt.state.key_digests` — vectorized,
    process-stable) and pack WITHIN their bucket in ascending ``id``
    order by NEXT-FIT — a pack closes when the next doc would push it past
    ``max_tokens``; a doc alone bigger than the budget gets its own
    pack (flagged ``oversize``).  ``pack_id = bucket * 2^40 + seq``.
    Deterministic and partition-independent: the assignment is a pure
    function of the (id, n_tokens) pairs.

    Scale shape: token counts are vectorized per batch; the ONLY
    exchange is the ``n_buckets``-way groupby (each group holds ~1/64
    of the corpus' (id, n_tokens) pairs — counts, never text); the
    packing loop runs vectorized-ish per bucket over those small rows.
    Returns one row per doc: (id, n_tokens, pack_id, pack_pos,
    oversize).
    """
    def counts(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.list_value_length(
            pc.split_pattern(t[text_col], " ")), pa.int64())
        bucket = (key_digests(t[id_col])["a"]
                  % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({
            id_col: t[id_col], "n_tokens": n,
            "__b": pa.array(bucket, pa.int64()),
        })

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        b = int(g["__b"].iloc[0])
        n = g["n_tokens"].to_numpy(np.int64)
        pack_seq = np.zeros(len(g), dtype=np.int64)
        pack_pos = np.zeros(len(g), dtype=np.int64)
        seq = 0
        acc = 0
        pos = 0
        for i in range(len(g)):
            if pos > 0 and acc + n[i] > max_tokens:
                seq += 1
                acc = 0
                pos = 0
            pack_seq[i] = seq
            pack_pos[i] = pos
            acc += n[i]
            pos += 1
            if acc >= max_tokens:  # full (or oversize doc): close it
                seq += 1
                acc = 0
                pos = 0
        return pd.DataFrame({
            id_col: g[id_col],
            "n_tokens": g["n_tokens"],
            "pack_id": pack_seq + (np.int64(b) << np.int64(40)),
            "pack_pos": pack_pos,
            "oversize": n > max_tokens,
        })

    return (ds.select_columns([id_col, text_col])
            .map_batches(counts, batch_format="pyarrow")
            .groupby("__b").map_groups(pack, batch_format="pandas"))


# PII redaction: category -> (RE2 pattern, replacement token).  The
# SAME pattern strings run in DuckDB's regexp_replace(..., 'g') for the
# oracle — both engines are RE2, so parity is by construction.  Applied
# SEQUENTIALLY in this order, counting each category's matches on the
# text as already redacted by the previous categories (so digits inside
# an address that became <EMAIL> are not double-counted).
PII_PATTERNS: tuple = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "<IP>"),
    ("longnum", r"\b[0-9]{13,19}\b", "<NUM>"),
)


def redact_text(ds, key_cols, text_col: str = "text", *,
                patterns=PII_PATTERNS, out: str = "text_redacted"):
    """PII redaction (the ROOTS/RedPajama-style scrub): replace every
    email address, dotted-quad IP and 13-19-digit number run with a
    category token, counting matches per category.

    Fully vectorized RE2 (``pc.count_substring_regex`` +
    ``pc.replace_substring_regex``) — no exchange, no Python loop; the
    ANSI-SQL restatement is nested ``regexp_replace(..., 'g')`` over
    the identical pattern strings, so this operator is oracle-checked
    by REAL SQL, not a golden.

    Returns one row per input row: keys + ``n_<category>`` counts +
    ``out`` (the redacted text; null text counts as "").
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]

    def redact(t: pa.Table) -> pa.Table:
        cur = pc.fill_null(pc.cast(t[text_col], pa.string()), "")
        res = t.select(list(key_cols))
        for name, pat, repl in patterns:
            res = res.append_column(
                f"n_{name}",
                pc.cast(pc.count_substring_regex(cur, pat), pa.int64()))
            cur = pc.replace_substring_regex(cur, pat, repl)
        return res.append_column(out, cur)

    return ds.select_columns(list(key_cols) + [text_col]).map_batches(
        redact, batch_format="pyarrow")


def redact_sql_expr(text_expr: str = "coalesce(text, '')",
                    patterns=PII_PATTERNS) -> dict:
    """ANSI-SQL restatement of :func:`redact_text`: returns a dict of
    output column name -> SQL expression over ``text_expr``, applying
    the same patterns in the same order."""
    cur = text_expr
    cols = {}
    for name, pat, repl in patterns:
        esc = pat.replace("'", "''")
        cols[f"n_{name}"] = (
            f"CAST(len(regexp_extract_all({cur}, '{esc}')) AS BIGINT)")
        cur = f"regexp_replace({cur}, '{esc}', '{repl}', 'g')"
    cols["text_redacted"] = cur
    return cols


# C4-style line-level cleaning (Raffel et al. 2020 §2.2, frozen subset).
# A document's text splits on "\n"; a line is KEPT iff it has at least
# CLEAN_LINE_MIN_WORDS whitespace-delimited words, ends in terminal
# punctuation (ignoring trailing blanks), and does not mention
# "javascript" as a word.  The pattern strings below run VERBATIM in
# both Arrow and DuckDB — both are RE2, so the oracle is REAL SQL.
# Policy details that matter for parity:
#   - null text -> null n_lines / n_kept / text_clean
#   - zero kept lines -> text_clean is NULL (DuckDB's array_to_string
#     over an empty list yields NULL, not '')
#   - kept lines re-join with "\n" keeping their original bytes
#     (trailing blanks on a kept line survive)
CLEAN_LINE_MIN_WORDS = 3
CLEAN_LINE_WORD_RE = r"[^ \t\r]+"
CLEAN_LINE_END_RE = r'[.!?"][ \t\r]*$'
CLEAN_LINE_DROP_RE = r"(?i)\bjavascript\b"


def _clean_lines_table(t: pa.Table, key_cols, text_col: str,
                       min_words: int, out: str) -> pa.Table:
    col = t[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    lines = pc.split_pattern(col, "\n")
    flat = pc.list_flatten(lines)
    parents = pc.list_parent_indices(lines)
    words = pc.count_substring_regex(flat, CLEAN_LINE_WORD_RE)
    keep = pc.and_kleene(
        pc.greater_equal(words, min_words),
        pc.match_substring_regex(flat, CLEAN_LINE_END_RE))
    keep = pc.and_kleene(
        keep, pc.invert(pc.match_substring_regex(flat, CLEAN_LINE_DROP_RE)))
    kept_parent = parents.filter(keep).to_numpy(zero_copy_only=False)
    kept_vals = flat.filter(keep)
    counts = np.bincount(kept_parent, minlength=n) if n else \
        np.zeros(0, dtype=np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    joined = pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()),
                                      pc.cast(kept_vals, pa.large_string())),
        pa.scalar("\n", pa.large_string()))
    valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
    null_s = pa.nulls(n, pa.large_string())
    text_clean = pc.cast(
        pc.if_else(pa.array((counts > 0) & valid), joined, null_s),
        pa.string())
    null_i = pa.nulls(n, pa.int64())
    vmask = pa.array(valid)
    n_lines = pc.if_else(vmask, pc.cast(pc.list_value_length(lines),
                                        pa.int64()), null_i)
    n_kept = pc.if_else(vmask, pa.array(counts, pa.int64()), null_i)
    res = t.select(list(key_cols))
    return (res.append_column("n_lines", n_lines)
               .append_column("n_kept", n_kept)
               .append_column(out, text_clean))


def clean_lines(ds, key_cols, text_col: str = "text", *,
                min_words: int = CLEAN_LINE_MIN_WORDS,
                out: str = "text_clean"):
    """C4-style line cleaning: drop lines that are too short, lack
    terminal punctuation, or mention "javascript"; re-join survivors.

    Fully vectorized — split/flatten/regex/re-join are Arrow kernels
    over the flattened line array, zero exchanges, no Python loop.
    Returns one row per input row: keys + ``n_lines`` + ``n_kept`` +
    ``out`` (null when no line survives, mirroring DuckDB's
    ``array_to_string`` on an empty list).  Oracle-checked by REAL SQL
    via :func:`clean_lines_sql_exprs` (shared RE2 pattern strings).
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]

    def clean(t: pa.Table) -> pa.Table:
        return _clean_lines_table(t, key_cols, text_col, min_words, out)

    return ds.select_columns(list(key_cols) + [text_col]).map_batches(
        clean, batch_format="pyarrow")


def clean_lines_sql_exprs(text_expr: str = "text",
                          min_words: int = CLEAN_LINE_MIN_WORDS) -> dict:
    """ANSI-SQL (DuckDB) restatement of :func:`clean_lines` over the
    IDENTICAL RE2 pattern strings: output column -> SQL expression."""
    def esc(p):
        return p.replace("'", "''")

    keep = (f"len(regexp_extract_all(l, '{esc(CLEAN_LINE_WORD_RE)}')) "
            f">= {min_words} "
            f"AND regexp_matches(l, '{esc(CLEAN_LINE_END_RE)}') "
            f"AND NOT regexp_matches(l, '{esc(CLEAN_LINE_DROP_RE)}')")
    split = f"string_split({text_expr}, chr(10))"
    filt = f"list_filter({split}, l -> {keep})"
    return {
        "n_lines": f"CAST(len({split}) AS BIGINT)",
        "n_kept": f"CAST(len({filt}) AS BIGINT)",
        "text_clean": f"array_to_string({filt}, chr(10))",
    }


# ---------------------------------------------------------------------------
# Unicode normalization (NFC + control strip)
# ---------------------------------------------------------------------------

#: C0/C1 controls except tab/LF/CR — RE2 class shared verbatim with the
#: SQL restatement (:func:`normalize_sql_expr`)
NORMALIZE_CTRL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]"


def nfc_strip_controls(ds, *, col: str = "text", out: str = "text_nfc"):
    """Unicode NFC normalization with control stripping — the first
    cleanup a multilingual corpus runs (mixed NFC/NFD sources make
    dedup hashes and n-gram matches silently miss).

    FROZEN policy (SQL parity via :func:`normalize_sql_expr`:
    ``nfc_normalize(regexp_replace(col, CTRL, '', 'g'))``): C0/C1
    control characters except tab/LF/CR are removed FIRST (one RE2
    kernel), then the result normalizes to NFC; null -> null.

    Scale shape: the control strip is vectorized; NFC runs once per
    batch-DISTINCT string (``dictionary_encode`` — corpora repeat
    boilerplate) with an ``isascii`` fast path (ASCII is NFC-fixed),
    broadcast back through the dictionary indices.  Zero exchanges.
    """
    import unicodedata

    def norm(t: pa.Table) -> pa.Table:
        s = pc.replace_substring_regex(
            t[col], pattern=NORMALIZE_CTRL_RE, replacement="")
        d = s.combine_chunks().dictionary_encode()
        uniq = [
            u if u is None or u.isascii()
            else unicodedata.normalize("NFC", u)
            for u in d.dictionary.to_pylist()
        ]
        vals = pc.take(pa.array(uniq, pa.string()), d.indices)
        return t.append_column(out, vals)

    return ds.map_batches(norm, batch_format="pyarrow")


def normalize_sql_expr(text_expr: str = "text") -> str:
    """ANSI-SQL (DuckDB) restatement of :func:`nfc_strip_controls`
    over the IDENTICAL RE2 control-class string."""
    return (f"nfc_normalize(regexp_replace({text_expr}, "
            f"'{NORMALIZE_CTRL_RE}', '', 'g'))")


# ---------------------------------------------------------------------------
# sentence splitting (naive regex policy, SQL-restatable)
# ---------------------------------------------------------------------------

#: boundary = terminal punctuation run + optional closing quotes/brackets,
#: followed by ASCII whitespace.  Shared VERBATIM with the SQL
#: restatement (:func:`sentences_sql`).  Deliberately abbreviation-naive
#: ("e.g. x" splits) — the corpus-pipeline convention (Gopher-style
#: sentence counts), frozen so both sides agree exactly.
SENT_BOUNDARY_RE = "([.!?]+[\"')\\]]*)[ \t\n\r\f\v]+"
_SENT_SEP = "\x00"
_SENT_WORD_RE = "[^ \t\n\r\f\v]+"


def split_sentences(ds, *, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Documents -> one row per sentence ``(id_col, sent_idx,
    sentence, n_words)`` under the frozen naive policy:

    1. every :data:`SENT_BOUNDARY_RE` match gets a NUL appended after
       its punctuation group (one RE2 replace; a literal NUL already
       in the text therefore also acts as a boundary — documented);
    2. split on NUL; each piece is ASCII-ws-trimmed; empty pieces are
       dropped; ``sent_idx`` is the 0-based index AFTER the drop;
    3. ``n_words`` = count of ASCII-ws-separated tokens (the
       :mod:`rayxt.tokshard` convention).  Null text yields no rows.

    Scale shape: two RE2 kernels + one Arrow explode per batch, zero
    exchanges; per-doc rows leave the stage, the document text does
    not."""

    def explode(t: pa.Table) -> pa.Table:
        marked = pc.replace_substring_regex(
            pc.fill_null(t[text_col], ""), pattern=SENT_BOUNDARY_RE,
            replacement="\\1" + _SENT_SEP)
        pieces = pc.split_pattern(marked, _SENT_SEP)
        flat = pc.utf8_trim(pc.list_flatten(pieces), " \t\n\r\f\v")
        lens = pc.list_value_length(pieces).to_numpy(
            zero_copy_only=False)
        row_of = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        row_of = row_of[keep]
        # 0-based index within each doc after the empty drop
        starts = np.zeros(len(row_of), dtype=np.int64)
        if len(row_of):
            new_doc = np.empty(len(row_of), dtype=bool)
            new_doc[0] = True
            new_doc[1:] = row_of[1:] != row_of[:-1]
            idx = np.arange(len(row_of), dtype=np.int64)
            starts = idx - np.maximum.accumulate(
                np.where(new_doc, idx, 0))
        counts = pc.list_value_length(
            pc.split_pattern_regex(flat, "[ \t\n\r\f\v]+"))
        # split_pattern_regex never yields empty leading runs here:
        # pieces are trimmed, so token count == list length
        return pa.table({
            id_col: pc.take(t[id_col].combine_chunks(),
                            pa.array(row_of, pa.int64())),
            "sent_idx": pa.array(starts, pa.int64()),
            "sentence": flat,
            "n_words": pc.cast(counts, pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow")


def sentences_sql(id_expr: str = "doc_id", text_expr: str = "text",
                  table: str = "documents") -> str:
    """ANSI-SQL (DuckDB) restatement of :func:`split_sentences` over
    the IDENTICAL RE2 pattern strings."""
    ws = " \t\n\r\f\v"
    pat = SENT_BOUNDARY_RE.replace("'", "''")
    pieces = (f"list_transform(string_split(regexp_replace("
              f"{text_expr}, '{pat}', '\\1' || chr(0), 'g'), chr(0)), "
              f"p -> trim(p, e'{ws_sql(ws)}'))")
    kept = f"list_filter({pieces}, p -> p != '')"
    return (
        f"SELECT {id_expr} AS doc_id, "
        f"unnest(range(0, len(s.l))) AS sent_idx, "
        f"unnest(s.l) AS sentence, "
        f"unnest(list_transform(s.l, p -> CAST(len(regexp_extract_all("
        f"p, '[^{ws_sql(ws)}]+')) AS BIGINT))) AS n_words "
        f"FROM (SELECT {id_expr}, {kept} AS l FROM {table}) s "
        f"WHERE len(s.l) > 0"
    )


def ws_sql(ws: str) -> str:
    """ASCII-ws class body as a DuckDB e-string fragment."""
    return ws.replace("\t", "\\t").replace("\n", "\\n") \
             .replace("\r", "\\r").replace("\f", "\\f") \
             .replace("\v", "\\x0b")


# ---------------------------------------------------------------------------
# Gopher word-level quality signals (vectorized; REAL-SQL restatable)
# ---------------------------------------------------------------------------

WORD_SPLIT_RE = r"[ \t\r\n\f\v]+"
ALPHA_WORD_RE = r"[A-Za-z]"
BULLET_LINE_RE = r"^[ \t]*[-*•]"
ELLIPSIS_LINE_RE = r"(\.\.\.|…)[ \t]*$"


def _word_stats_table(t: pa.Table, col: str) -> pa.Table:
    c = t[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    n = len(c)
    valid = pc.is_valid(c).to_numpy(zero_copy_only=False)

    words = pc.split_pattern_regex(c, WORD_SPLIT_RE)
    flat = pc.list_flatten(words)
    par = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    wlen = pc.cast(pc.utf8_length(flat), pa.int64()).to_numpy(
        zero_copy_only=False)
    wp = par[nonempty]
    n_words = np.bincount(wp, minlength=n).astype(np.float64)
    len_sum = (np.bincount(wp, weights=wlen[nonempty], minlength=n)
               if n else np.zeros(0))
    alpha = pc.match_substring_regex(flat, ALPHA_WORD_RE).to_numpy(
        zero_copy_only=False) & nonempty
    n_alpha = np.bincount(par[alpha], minlength=n).astype(np.float64)

    def _cnt(pat):
        a = pc.count_substring(c, pat).to_numpy(zero_copy_only=False)
        return np.where(valid, a, 0).astype(np.float64)

    symbols = _cnt("#") + _cnt("...") + _cnt("…")

    lines = pc.split_pattern(c, "\n")
    lflat = pc.list_flatten(lines)
    lpar = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    n_lines = np.where(
        valid,
        pc.list_value_length(lines).cast(pa.int64()).to_numpy(
            zero_copy_only=False),
        0).astype(np.float64)
    bul = pc.match_substring_regex(lflat, BULLET_LINE_RE).to_numpy(
        zero_copy_only=False)
    ell = pc.match_substring_regex(lflat, ELLIPSIS_LINE_RE).to_numpy(
        zero_copy_only=False)
    n_bul = np.bincount(lpar[bul], minlength=n).astype(np.float64)
    n_ell = np.bincount(lpar[ell], minlength=n).astype(np.float64)

    def _ratio(num, den, ok):
        vals = np.divide(num, den, out=np.zeros_like(num),
                         where=den > 0)
        arr = pc.round(pa.array(vals, pa.float64()), ndigits=6)
        return pc.if_else(pa.array(ok & (den > 0)), arr,
                          pa.nulls(n, pa.float64()))

    out = t.append_column(
        "n_words", pc.if_else(pa.array(valid),
                              pa.array(n_words.astype(np.int64),
                                       pa.int64()),
                              pa.nulls(n, pa.int64())))
    out = out.append_column("mean_word_len",
                            _ratio(len_sum, n_words, valid))
    out = out.append_column("alpha_word_ratio",
                            _ratio(n_alpha, n_words, valid))
    out = out.append_column("symbol_word_ratio",
                            _ratio(symbols, n_words, valid))
    out = out.append_column("bullet_line_frac",
                            _ratio(n_bul, n_lines, valid))
    out = out.append_column("ellipsis_line_frac",
                            _ratio(n_ell, n_lines, valid))
    return out


def add_word_stats(ds, col: str = "text"):
    """Gopher word-level quality signals, all Arrow/numpy kernels over
    the flattened word/line arrays (zero Python loops, zero
    exchanges): ``n_words`` (non-empty whitespace-split words),
    ``mean_word_len`` (chars, round 6), ``alpha_word_ratio`` (words
    containing an ASCII letter), ``symbol_word_ratio`` ('#', '...'
    and U+2026 occurrences per word — the Gopher symbol rule),
    ``bullet_line_frac`` / ``ellipsis_line_frac`` (lines opening with
    a bullet / ending in an ellipsis).  Null text -> all null; zero
    words -> null word ratios.  Every column restates as REAL SQL
    over the IDENTICAL RE2 patterns (:func:`word_stats_sql_exprs`)."""

    def stats(t: pa.Table) -> pa.Table:
        return _word_stats_table(t, col)

    return ds.map_batches(stats, batch_format="pyarrow")


def word_stats_sql_exprs(text_expr: str = "text") -> dict:
    """ANSI-SQL (DuckDB) restatement of :func:`add_word_stats` over
    the IDENTICAL pattern strings: output column -> SQL expression.
    (DuckDB single-quoted strings pass backslashes through verbatim —
    the patterns embed unchanged.)"""
    def esc(p):
        return p.replace("'", "''")

    words = (f"list_filter(regexp_split_to_array({text_expr}, "
             f"'{WORD_SPLIT_RE}'), w -> w <> '')")
    nw = f"len({words})"
    nl = f"len(string_split({text_expr}, chr(10)))"
    sym = (f"(length({text_expr}) - length(replace({text_expr}, '#', '')))"
           f" + (length({text_expr}) "
           f"- length(replace({text_expr}, '...', ''))) / 3"
           f" + (length({text_expr}) "
           f"- length(replace({text_expr}, '…', '')))")
    return {
        "n_words": f"CASE WHEN {text_expr} IS NULL THEN NULL "
                   f"ELSE {nw} END",
        "mean_word_len":
            f"CASE WHEN {nw} > 0 THEN round(list_avg(list_transform("
            f"{words}, w -> length(w))), 6) END",
        "alpha_word_ratio":
            f"CASE WHEN {nw} > 0 THEN round(len(list_filter({words}, "
            f"w -> regexp_matches(w, '{ALPHA_WORD_RE}'))) "
            f"/ CAST({nw} AS DOUBLE), 6) END",
        "symbol_word_ratio":
            f"CASE WHEN {nw} > 0 THEN round(({sym}) "
            f"/ CAST({nw} AS DOUBLE), 6) END",
        "bullet_line_frac":
            f"CASE WHEN {text_expr} IS NULL THEN NULL ELSE "
            f"round(len(list_filter(string_split({text_expr}, chr(10)),"
            f" l -> regexp_matches(l, '{esc(BULLET_LINE_RE)}'))) "
            f"/ CAST({nl} AS DOUBLE), 6) END",
        "ellipsis_line_frac":
            f"CASE WHEN {text_expr} IS NULL THEN NULL ELSE "
            f"round(len(list_filter(string_split({text_expr}, chr(10)),"
            f" l -> regexp_matches(l, '{esc(ELLIPSIS_LINE_RE)}'))) "
            f"/ CAST({nl} AS DOUBLE), 6) END",
    }


def gopher_filter(ds, col: str = "text", *, min_words: int = 50,
                  max_words: int = 100_000, min_mwl: float = 3.0,
                  max_mwl: float = 10.0, min_alpha: float = 0.8,
                  max_symbol: float = 0.1, max_bullet: float = 0.9,
                  max_ellipsis: float = 0.3):
    """Composite Gopher keep-filter over the :func:`add_word_stats`
    signals — a row survives only when EVERY gate holds; null text
    (or a null signal, i.e. zero words) drops.  One stateless batch
    map computing the six signals and the mask together; original
    columns pass through unchanged; zero exchanges."""

    def keep(t: pa.Table) -> pa.Table:
        s = _word_stats_table(t, col)
        mask = pc.and_kleene(
            pc.and_kleene(
                pc.greater_equal(s["n_words"], min_words),
                pc.less_equal(s["n_words"], max_words)),
            pc.and_kleene(
                pc.greater_equal(s["mean_word_len"], min_mwl),
                pc.less_equal(s["mean_word_len"], max_mwl)))
        mask = pc.and_kleene(mask, pc.greater_equal(
            s["alpha_word_ratio"], min_alpha))
        mask = pc.and_kleene(mask, pc.less_equal(
            s["symbol_word_ratio"], max_symbol))
        mask = pc.and_kleene(mask, pc.less_equal(
            s["bullet_line_frac"], max_bullet))
        mask = pc.and_kleene(mask, pc.less_equal(
            s["ellipsis_line_frac"], max_ellipsis))
        mask = pc.fill_null(mask, False)
        return t.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")
