"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (SURVEY P7/P7b + training-data additions).

Scale shape (the part that matters at 100 TB):

* signatures/sketches are computed INSIDE ``map_batches`` (vectorized
  numpy over the batch) — the only all-to-all exchanges are groupbys on
  small key columns (content hash, LSH band buckets), never on text;
* MinHash signatures are checkpointed ONCE as a narrow packed-binary
  table; only 24-byte ``(id, band, bucket)`` rows cross the bucket
  shuffle, and candidate pairs (deduped while id-only) are verified by
  joining the signature table back — no per-band signature replication;
* candidate generation is bucket-local (``groupby(band).map_groups``):
  pairs are emitted per bucket, so no driver-side O(n^2) state; hot
  buckets are capped (``max_bucket``);
* exact dedup keeps ``min(id)`` per content hash — a pure
  hash-partitioned groupby;
* cluster resolution converges on a distributed scalar (monotone
  ``Sum(cluster_id)``) — O(1) driver memory at any corpus size.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ._blockutil import crc_bucket, ensure_typed, sorted_membership

__all__ = [
    "content_hash_table",
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_of",
    "simhash_pairs",
    "hamming_pairs",
    "bucket_candidate_pairs",
    "ngram_jaccard",
    "ngram_jaccard_pairs",
    "embedding_neardup_pairs",
    "explode_paragraphs",
    "paragraph_dedup",
    "dup_ngram_stats",
    "remove_dup_substrings",
    "decontaminate",
    "decontaminate_from_file",
]


def _sha1_int64(s: str) -> int:
    return int.from_bytes(hashlib.sha1(s.encode("utf-8")).digest()[:8], "big") >> 1


def content_hash_table(batch: pa.Table, col: str = "text",
                       out: str = "content_hash") -> pa.Table:
    hashes = [_sha1_int64(x or "") for x in batch[col].to_pylist()]
    return batch.append_column(out, pa.array(hashes, pa.int64()))


def dedup_keep_first(ds, id_col: str, text_col: str = "text", *,
                     join_partitions: int = 8):
    """Materialize the SURVIVING rows of exact dedup (min-id row per
    content hash): groupby(hash) -> Min(id) reps, then an inner join
    back on (hash, id).  The reps side is two 8-byte columns; the full
    rows cross the exchange exactly once (they are the output).

    The reps side is checkpointed (tiny: 16 bytes per distinct hash) so
    we can (a) short-circuit an empty input — Ray's hash join cannot
    survive a fully-empty side, the partitioner emits no shards and
    acero rejects the schema-less table — and (b) scale the join's
    partition count to the reps row count so no partition statistically
    receives zero shards from the small side (the documented n//32
    rule, see connected_components)."""
    from ray.data.aggregate import Min

    hashed = ds.map_batches(
        lambda t: content_hash_table(t, text_col), batch_format="pyarrow"
    )
    reps = hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name=id_col)
    ).materialize()
    n_reps = reps.count()
    if n_reps == 0:
        return ds  # reps empty <=> input empty; schema already correct
    parts = max(1, min(join_partitions, n_reps // 32))
    joined = hashed.join(reps, "inner", num_partitions=parts,
                         on=("content_hash", id_col))
    return joined.drop_columns(["content_hash"])


def exact_dedup(ds, id_col: str, text_col: str = "text"):
    """Keep the min-id representative per exact content hash.

    Returns (rep id, n_dups) — SQL parity:
    ``SELECT min(id) AS rep, count(*) AS n_dups ... GROUP BY text``."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(
        lambda t: content_hash_table(t, text_col), batch_format="pyarrow"
    )
    agg = hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name="rep_" + id_col),
        Count(alias_name="n_dups"),
    )
    return agg.drop_columns(["content_hash"])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)  # fixed seed: deterministic permutations
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Per-row reference path (kept as the semantic spec and as the
    fallback for rows the vectorized splitter can't reproduce)."""
    toks = text.split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else [""]
    else:
        shingles = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    uniq = set(shingles)
    return np.fromiter(
        (_sha1_int64(s) for s in uniq), dtype=np.int64, count=len(uniq)
    )


# Python str.split() treats \x1c-\x1f (FS/GS/RS/US) as whitespace but
# Unicode White_Space=No, so Arrow's utf8_split_whitespace keeps them;
# rows containing any take the per-row reference path to stay
# byte-identical with the spec above.
_PY_ONLY_WS = "[\\x1c-\\x1f]"


def _batch_shingle_hashes(texts, k: int):
    """Vectorized batch shingling -> (h_all, bounds).

    ``h_all``: every (non-deduped) shingle's sha1-int64 hash, grouped by
    document in batch order; ``bounds``: each document's start offset in
    ``h_all`` (every doc contributes >= 1 shingle, matching
    :func:`_shingle_hashes`'s empty-string shingle for empty docs).

    The whole path is C kernels: Arrow whitespace split -> flattened
    offsets -> k-gram strings via ``take`` + ``binary_join_element_wise``
    -> ONE sha1 per batch-distinct shingle (``dictionary_encode``), so
    duplicate-heavy corpora hash each repeated shingle once.
    """
    texts = pc.cast(texts, pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = texts.fill_null("")
    n = len(texts)
    if n == 0:
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64))
    lst = pc.utf8_split_whitespace(texts)
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    flat = lst.flatten()
    offs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    doc = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    # Arrow keeps empty tokens for leading/trailing whitespace runs;
    # str.split() drops them
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not keep.all():
        flat = flat.filter(pa.array(keep))
        doc = doc[keep]
    cnt = np.bincount(doc, minlength=n)
    starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    sc = np.clip(cnt - k + 1, 0, None)  # shingles per doc with >= k tokens
    total = int(sc.sum())
    j0 = (np.repeat(starts, sc)
          + (np.arange(total, dtype=np.int64)
             - np.repeat(np.concatenate([[0], np.cumsum(sc)[:-1]]), sc)))
    sh_doc = np.repeat(np.arange(n, dtype=np.int64), sc)
    if total:
        parts = [flat.take(pa.array(j0 + t)) for t in range(k)]
        strs = pc.binary_join_element_wise(*parts, " ")
        if isinstance(strs, pa.ChunkedArray):
            strs = strs.combine_chunks()
    else:
        strs = pa.array([], pa.string())
    short = cnt < k  # 0..k-1 tokens -> the single " ".join(toks) shingle
    if short.any():
        sidx = np.flatnonzero(short)
        sstr = pa.array(
            [" ".join(flat.slice(starts[i], cnt[i]).to_pylist())
             for i in sidx], pa.string())
        strs = pa.concat_arrays([strs, sstr])
        sh_doc = np.concatenate([sh_doc, sidx])
        order = np.argsort(sh_doc, kind="stable")
        strs = strs.take(pa.array(order))
        sh_doc = sh_doc[order]
    de = strs.dictionary_encode()
    if isinstance(de, pa.ChunkedArray):
        de = de.combine_chunks()
    inv = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = de.dictionary.to_pylist()
    h = np.fromiter((_sha1_int64(s) for s in uniq), dtype=np.int64,
                    count=len(uniq)).astype(np.uint64)
    h_all = h[inv]
    if len(sh_doc) == 0:  # empty batch
        return h_all, np.empty(0, dtype=np.int64)
    bounds = np.flatnonzero(
        np.concatenate([[True], sh_doc[1:] != sh_doc[:-1]]))
    return h_all, bounds


class minhash_signatures:
    """Actor-pool stage: per-row MinHash signature, ONE row per doc
    ``(id, sig)``; the permutation table is built once per actor in
    ``__init__``.  Band/bucket expansion happens downstream on the
    (small) signature table so the full signature is never replicated
    onto the 16 band rows that cross the bucket shuffle.
    """

    def __init__(self, id_col: str, text_col: str = "text", *, k: int = 3,
                 num_perm: int = 64, bands: int = 16):
        assert num_perm % bands == 0
        self.id_col, self.text_col = id_col, text_col
        self.k, self.num_perm, self.bands = k, num_perm, bands
        self.rows_per_band = num_perm // bands
        self.a, self.b = _perm_params(num_perm)

    def signature(self, text: str) -> np.ndarray:
        """Per-row reference path (the vectorized batch path below is
        parity-tested byte-identical against this)."""
        sh = _shingle_hashes(text, self.k).astype(np.uint64)
        # one vectorized (shingles x perms) pass; uint64 wrap-around
        # multiplication is a deterministic hash family (not strictly
        # universal, but exact-dup sigs still match exactly and overlap
        # estimates behave like MinHash)
        a = self.a.astype(np.uint64)
        b = self.b.astype(np.uint64)
        vals = sh[:, None] * a[None, :] + b[None, :]
        return (vals.min(axis=0) >> np.uint64(1)).astype(np.int64)

    def _batch_signatures(self, texts) -> np.ndarray:
        """All signatures of one batch, (n x num_perm) '<i8'.  One
        perm at a time over the flattened shingle-hash array: an 8
        MiB/1M-shingle working set instead of a (shingles x perms)
        matrix, so the min-reduction stays cache-resident."""
        h_all, bounds = _batch_shingle_hashes(texts, self.k)
        n = len(bounds)
        if n == 0:
            return np.empty((0, self.num_perm), dtype="<i8")
        a = self.a.astype(np.uint64)
        b = self.b.astype(np.uint64)
        out = np.empty((n, self.num_perm), dtype=np.uint64)
        buf = np.empty(len(h_all), dtype=np.uint64)
        for p in range(self.num_perm):
            np.multiply(h_all, a[p], out=buf)
            buf += b[p]
            out[:, p] = np.minimum.reduceat(buf, bounds)
        return (out >> np.uint64(1)).astype("<i8")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col]
        sigs = self._batch_signatures(texts)
        legacy = pc.match_substring_regex(
            pc.cast(texts, pa.string()).fill_null(""), _PY_ONLY_WS)
        for i in np.flatnonzero(legacy.to_numpy(zero_copy_only=False)):
            sigs[i] = self.signature(texts[i].as_py() or "").astype("<i8")
        # packed little-endian int64 bytes: joins support binary payload
        # columns (Arrow's hash join rejects list<> non-key fields)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "sig": pa.array([sigs[i].tobytes()
                                 for i in range(len(sigs))], pa.binary()),
            }
        )


def _band_bucket_rows(batch: pa.Table, *, id_col: str, bands: int,
                      rows_per_band: int) -> pa.Table:
    """(id, sig) -> one (id, band, bucket) row per band: 24 bytes/row
    through the bucket shuffle instead of the full signature."""
    ids_out, bands_out, buckets_out = [], [], []
    for i, packed in zip(batch[id_col].to_pylist(), batch["sig"].to_pylist()):
        sig = np.frombuffer(packed, dtype="<i8").tolist()
        for band in range(bands):
            seg = sig[band * rows_per_band:(band + 1) * rows_per_band]
            ids_out.append(i)
            bands_out.append(band)
            buckets_out.append(_sha1_int64(f"{band}:" + ",".join(map(str, seg))))
    return pa.table(
        {
            id_col: pa.array(ids_out),
            "band": pa.array(bands_out, pa.int32()),
            "bucket": pa.array(buckets_out, pa.int64()),
        }
    )


def _lsh_candidate_pairs(sigs, *, id_col: str, bands: int,
                         rows_per_band: int, max_bucket: int):
    """Band-bucket expansion + bucket-local pair emission + pure-aggregate
    pair dedup over a materialized ``(id, sig)`` table.  Shared by the
    estimated-Jaccard (``minhash_lsh_pairs``) and exact-Jaccard
    (``ngram_jaccard_pairs``) verify paths."""
    # checkpointed: 24-byte rows (~5x smaller than the sig table that is
    # already materialized), and feeding the bucket groupby from a live
    # stream pays a measurable fixed shuffle-map penalty on this VM
    buckets = sigs.map_batches(
        _band_bucket_rows,
        fn_kwargs=dict(id_col=id_col, bands=bands,
                       rows_per_band=rows_per_band),
        batch_format="pyarrow",
    ).materialize()
    return bucket_candidate_pairs(buckets, id_col=id_col,
                                  max_bucket=max_bucket)


def bucket_candidate_pairs(buckets, *, id_col: str, max_bucket: int,
                           broadcast_threshold: int = 4_000_000):
    """Generic LSH candidate generation: a ``(id, band, bucket)`` dataset
    -> unique ``(id_a, id_b)`` candidate pairs (``id_a < id_b``).

    The banding scheme is the caller's (minhash band hashes, simhash
    segments, pHash bytes, ...); this is the shared bucket groupby +
    bucket-local pair emission + pure-aggregate pair dedup.

    Scale shape: in a mostly-unique corpus the overwhelming majority of
    band buckets are SINGLETONS, and a per-group UDF over them would
    dominate wall time (measured 14s of a 15s LSH phase on a 5.7k-doc
    pass with zero duplicates).  So candidate emission is preceded by a
    vectorized ``Count`` aggregate that keeps only buckets with >= 2
    members; the per-group pair UDF then runs exclusively over REAL
    candidate groups.  The hot-bucket set (one mixed 64-bit key per
    duplicate-bucket) is broadcast via ``ray.put`` while it fits
    ``broadcast_threshold`` keys (~32 MB), else applied as an inner
    join — the paragraph-dedup dup-set pattern."""
    import ray
    from ray.data.aggregate import Count

    def ids_of_bucket(g: pd.DataFrame) -> pa.Table:
        ids = g[id_col].sort_values().head(max_bucket).tolist()
        out_a = [ids[x] for x in range(len(ids)) for _ in range(x + 1, len(ids))]
        out_b = [ids[y] for x in range(len(ids)) for y in range(x + 1, len(ids))]
        # typed columns even when empty (Ray Data needs a schema from
        # every block), and ARROW blocks: the downstream pair aggregate
        # is vectorized on arrow blocks but pays ~5ms per distinct pair
        # on pandas blocks (Ray sort-aggregate slow path)
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64())})

    def pairs_only(t: pa.Table) -> pa.Table:
        # empty hash-aggregate partitions emit SCHEMA-LESS blocks; the
        # downstream signature join needs every block typed (id_a, id_b)
        t = ensure_typed(t, {"id_a": pa.int64(), "id_b": pa.int64()})
        return t.select(["id_a", "id_b"])

    def _mixed_key(band, bucket) -> np.ndarray:
        # one collision-resistant 64-bit key per (band, bucket): bucket
        # is already a 63-bit hash, band is tiny — rotate band in
        b = np.asarray(band, dtype=np.int64).astype(np.uint64)
        k = np.asarray(bucket, dtype=np.int64).astype(np.uint64)
        return (k ^ (b * np.uint64(0x9E3779B97F4A7C15))).astype(np.int64)

    def dup_only(t: pa.Table) -> pa.Table:
        t = ensure_typed(t, {"band": pa.int32(), "bucket": pa.int64(),
                             "_n": pa.int64()})
        return t.filter(pc.greater_equal(t["_n"], 2)).select(
            ["band", "bucket"])

    hot = (
        buckets.groupby(["band", "bucket"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(dup_only, batch_format="pyarrow")
        .materialize()
    )
    n_hot = hot.count()
    if n_hot == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"id_a": pa.array([], pa.int64()),
                                       "id_b": pa.array([], pa.int64())}))
    if n_hot <= broadcast_threshold:
        hp = hot.to_pandas()
        hot_keys = np.sort(_mixed_key(hp["band"].to_numpy(),
                                      hp["bucket"].to_numpy()))
        hot_ref = ray.put(hot_keys)

        def keep_hot(t: pa.Table) -> pa.Table:
            # NOTE: sorted_membership is the module-level import — a
            # runtime relative import here would break workers whose
            # driver ran outside the repo (UDFs travel by value)
            keys = _mixed_key(t["band"].to_numpy(zero_copy_only=False),
                              t["bucket"].to_numpy(zero_copy_only=False))
            return t.filter(
                pa.array(sorted_membership(ray.get(hot_ref), keys)))

        hot_rows = buckets.map_batches(keep_hot, batch_format="pyarrow")
    else:  # dup-bucket set outgrew the broadcast budget: hash join
        parts = max(1, n_hot // 262144)
        hot_rows = buckets.join(hot, "inner", num_partitions=parts,
                                on=("band", "bucket"))

    # pair dedup via a pure aggregate (hash-partitioned, vectorized) —
    # NOT map_groups: candidate pairs form millions of 1-2 row groups
    # and a per-group pandas UDF would dominate wall time at scale.
    return (
        hot_rows.groupby(["band", "bucket"])
        .map_groups(ids_of_bucket, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(pairs_only, batch_format="pyarrow")
    )


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa = set(" ".join(t) for t in _tok_shingles(a, k))
    sb = set(" ".join(t) for t in _tok_shingles(b, k))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if (sa or sb) else 0.0


def _tok_shingles(text: str, k: int):
    toks = text.split()
    if len(toks) < k:
        return [tuple(toks)] if toks else []
    return [tuple(toks[i:i + k]) for i in range(len(toks) - k + 1)]


def minhash_lsh_pairs(ds, id_col: str, text_col: str = "text", *, k: int = 3,
                      num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.7, max_bucket: int = 64,
                      concurrency=(1, 4), join_partitions: int = 8):
    """shingle -> minhash -> band bucket groupby -> estimated-Jaccard pairs.

    Returns unique pairs ``(id_a, id_b, jaccard)`` with ``id_a < id_b``
    and MinHash-estimated Jaccard (share of agreeing signature slots)
    >= threshold.  Exchange accounting (the 100 TB shape): signatures
    are computed once and CHECKPOINTED as a one-row-per-doc table
    (~8*num_perm bytes/doc, no shuffle); only 24-byte ``(id, band,
    bucket)`` rows cross the bucket shuffle (vs replicating the full
    signature onto all ``bands`` rows — a ``bands``-fold amplification);
    candidate pairs are deduped while still id-only and verified by
    joining the signature table back per side.  Buckets larger than
    ``max_bucket`` (degenerate content) contribute only their first
    ``max_bucket`` members.
    """
    sigs = ds.select_columns([id_col, text_col]).map_batches(
        minhash_signatures,
        fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, k=k, num_perm=num_perm, bands=bands
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    ).materialize()  # checkpoint: band expansion + verify both read it

    # checkpoint the candidate side (tiny: 16 bytes/pair) so we can
    # short-circuit zero candidates and scale the join partition count
    # to the pair count — a partition that statistically receives zero
    # shards from one side crashes Ray's hash join (the n//32 rule,
    # see dedup_keep_first / connected_components)
    cand = _lsh_candidate_pairs(sigs, id_col=id_col, bands=bands,
                                rows_per_band=num_perm // bands,
                                max_bucket=max_bucket).materialize()
    n_cand = cand.count()
    if n_cand == 0:
        import ray
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))
    parts = max(1, min(join_partitions, n_cand // 32))

    sig_a = sigs.map_batches(
        lambda t: pa.table({"id_a": t[id_col], "sig_a": t["sig"]}),
        batch_format="pyarrow",
    )
    sig_b = sigs.map_batches(
        lambda t: pa.table({"id_b": t[id_col], "sig_b": t["sig"]}),
        batch_format="pyarrow",
    )
    joined = cand.join(
        sig_a, "inner", num_partitions=parts, on=("id_a",)
    ).join(sig_b, "inner", num_partitions=parts, on=("id_b",))

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        sa = np.stack([np.frombuffer(x, dtype="<i8")
                       for x in t["sig_a"].to_pylist()])
        sb = np.stack([np.frombuffer(x, dtype="<i8")
                       for x in t["sig_b"].to_pylist()])
        # est is a multiple of 1/num_perm; for num_perm=64 every value
        # has exactly 6 decimal digits, so round-to-6 is lossless
        est = np.round((sa == sb).mean(axis=1), 6)
        keep = est >= threshold
        ia = np.asarray(t["id_a"].to_pylist(), dtype=np.int64)
        ib = np.asarray(t["id_b"].to_pylist(), dtype=np.int64)
        return pa.table({
            "id_a": pa.array(ia[keep], pa.int64()),
            "id_b": pa.array(ib[keep], pa.int64()),
            "jaccard": pa.array(est[keep], pa.float64()),
        })

    return joined.map_batches(verify, batch_format="pyarrow")


def _shingle_set_rows(batch: pa.Table, *, id_col: str, text_col: str,
                      k: int) -> pa.Table:
    """(id, text) -> (id, sh): the doc's unique k-token shingle hashes as
    packed SORTED little-endian int64 bytes.  8 bytes per shingle cross
    the verify joins instead of the text; sortedness lets the per-pair
    verify intersect two arrays with one linear merge."""
    texts = batch[text_col]
    h_all, bounds = _batch_shingle_hashes(texts, k)
    n = len(bounds)
    if n == 0:
        return pa.table({id_col: batch[id_col],
                         "sh": pa.array([], pa.binary())})
    # sort within each doc segment, then drop within-doc duplicates —
    # one batch-wide lexsort instead of a per-row sort/set
    seg_len = np.diff(np.concatenate([bounds, [len(h_all)]]))
    doc_ids = np.repeat(np.arange(n, dtype=np.int64), seg_len)
    h_i64 = h_all.astype(np.int64)  # hashes are < 2^63 (sha1 >> 1)
    order = np.lexsort((h_i64, doc_ids))
    hs, ds_ = h_i64[order], doc_ids[order]
    first = np.concatenate(
        [[True], (ds_[1:] != ds_[:-1]) | (hs[1:] != hs[:-1])])
    hs, ds_ = hs[first], ds_[first]
    le = hs.astype("<i8")
    starts = np.searchsorted(ds_, np.arange(n))
    ends = np.concatenate([starts[1:], [len(le)]])
    packed = [le[s:e].tobytes() for s, e in zip(starts, ends)]
    legacy = pc.match_substring_regex(
        pc.cast(texts, pa.string()).fill_null(""), _PY_ONLY_WS)
    for i in np.flatnonzero(legacy.to_numpy(zero_copy_only=False)):
        packed[i] = np.sort(_shingle_hashes(
            texts[i].as_py() or "", k)).astype("<i8").tobytes()
    return pa.table({id_col: batch[id_col],
                     "sh": pa.array(packed, pa.binary())})


def ngram_jaccard_pairs(ds, id_col: str, text_col: str = "text", *, k: int = 3,
                        num_perm: int = 64, bands: int = 16,
                        threshold: float = 0.7, max_bucket: int = 64,
                        concurrency=(1, 4), join_partitions: int = 8):
    """Exact n-gram Jaccard near-dup: LSH candidate generation (same
    band/bucket stage as :func:`minhash_lsh_pairs`) followed by EXACT
    Jaccard verification over each doc's hashed k-token shingle set.

    Returns unique pairs ``(id_a, id_b, jaccard)`` with ``id_a < id_b``
    and exact Jaccard (|A∩B| / |A∪B| over 64-bit shingle hashes, rounded
    to 6 digits) >= threshold.  Exchange accounting: candidates come
    from 24-byte band rows; the verify joins move one sorted shingle-hash
    array (8 bytes/shingle) per candidate side — the text itself never
    crosses an exchange.
    """
    narrow = ds.select_columns([id_col, text_col])
    sigs = narrow.map_batches(
        minhash_signatures,
        fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, k=k, num_perm=num_perm, bands=bands
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    ).materialize()  # checkpoint: feeds the band expansion

    shingles = narrow.map_batches(
        _shingle_set_rows,
        fn_kwargs=dict(id_col=id_col, text_col=text_col, k=k),
        batch_format="pyarrow",
    ).materialize()  # checkpoint: both verify joins read it

    # same checkpoint + n//32 partition rule as minhash_lsh_pairs: a
    # join partition with zero shards from one side crashes Ray's join
    cand = _lsh_candidate_pairs(sigs, id_col=id_col, bands=bands,
                                rows_per_band=num_perm // bands,
                                max_bucket=max_bucket).materialize()
    n_cand = cand.count()
    if n_cand == 0:
        import ray
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))
    parts = max(1, min(join_partitions, n_cand // 32))

    sh_a = shingles.map_batches(
        lambda t: pa.table({"id_a": t[id_col], "sh_a": t["sh"]}),
        batch_format="pyarrow",
    )
    sh_b = shingles.map_batches(
        lambda t: pa.table({"id_b": t[id_col], "sh_b": t["sh"]}),
        batch_format="pyarrow",
    )
    joined = cand.join(
        sh_a, "inner", num_partitions=parts, on=("id_a",)
    ).join(sh_b, "inner", num_partitions=parts, on=("id_b",))

    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        jac = np.empty(t.num_rows, dtype=np.float64)
        for i, (pa_bytes, pb_bytes) in enumerate(
                zip(t["sh_a"].to_pylist(), t["sh_b"].to_pylist())):
            a = np.frombuffer(pa_bytes, dtype="<i8")
            b = np.frombuffer(pb_bytes, dtype="<i8")
            # both sides pre-sorted & unique: one linear merge per pair
            inter = len(np.intersect1d(a, b, assume_unique=True))
            union = len(a) + len(b) - inter
            jac[i] = inter / union if union else 1.0
        jac = np.round(jac, 6)
        keep = jac >= threshold
        if not keep.any():
            return empty
        ia = np.asarray(t["id_a"].to_pylist(), dtype=np.int64)
        ib = np.asarray(t["id_b"].to_pylist(), dtype=np.int64)
        return pa.table({
            "id_a": pa.array(ia[keep], pa.int64()),
            "id_b": pa.array(ib[keep], pa.int64()),
            "jaccard": pa.array(jac[keep], pa.float64()),
        })

    return joined.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_of(text: str, bits: int = 64) -> int:
    toks = set(text.split())
    if not toks:
        return 0
    hs = np.fromiter((_sha1_int64(t) for t in toks), dtype=np.uint64,
                     count=len(toks))
    shifts = np.arange(bits, dtype=np.uint64)
    bitmat = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    acc = (bitmat * 2 - 1).sum(axis=0)
    out = 0
    for bit in np.nonzero(acc > 0)[0]:
        out |= 1 << int(bit)
    return out


def simhash_pairs(ds, id_col: str, text_col: str = "text", *,
                  max_hamming: int = 3, max_bucket: int = 64):
    """SimHash near-dup: 4x16-bit band bucketing (any pair within
    hamming distance <= 16 shares at least one exact band by pigeonhole
    when distance <= 3 over 4 bands), then exact hamming verify."""

    def sig_batch(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        hs = [simhash_of(x or "") for x in t[text_col].to_pylist()]
        rows_id, rows_band, rows_bucket, rows_h = [], [], [], []
        for i, h in zip(ids, hs):
            for band in range(4):
                rows_id.append(i)
                rows_band.append(band)
                rows_bucket.append((h >> (band * 16)) & 0xFFFF)
                rows_h.append(h - (1 << 63))  # store as signed int64
        return pa.table(
            {id_col: pa.array(rows_id), "band": pa.array(rows_band, pa.int32()),
             "bucket": pa.array(rows_bucket, pa.int64()),
             "simhash": pa.array(rows_h, pa.int64())}
        )

    # checkpointed (32-byte rows): see the minhash bucket note — a
    # groupby fed from a live stream pays a fixed shuffle-map penalty
    sig = ds.select_columns([id_col, text_col]).map_batches(
        sig_batch, batch_format="pyarrow"
    ).materialize()

    def pairs(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(id_col).head(max_bucket)
        ids = g[id_col].tolist()
        hs = [h + (1 << 63) for h in g["simhash"].tolist()]
        out_a, out_b, out_d = [], [], []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                d = bin(hs[x] ^ hs[y]).count("1")
                if d <= max_hamming:
                    out_a.append(ids[x])
                    out_b.append(ids[y])
                    out_d.append(d)
        # arrow blocks: the pair aggregate below is vectorized on arrow
        # but ~5ms per distinct pair on pandas blocks
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64()),
                         "hamming": pa.array(out_d, pa.int64())})

    cand = sig.groupby(["band", "bucket"]).map_groups(pairs, batch_format="pandas")

    # duplicate candidates of one pair all carry the same exact hamming
    # distance, so Min() is value-preserving — a pure aggregate replaces
    # the former per-pair map_groups(head(1)) (millions of tiny pandas
    # groups at corpus scale).
    from ray.data.aggregate import Min

    return cand.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


def hamming_pairs(ds, id_col: str, hash_col: str, *, bands: int = 8,
                  max_hamming: int = 7, max_bucket: int = 64):
    """Near-dup pairs over ANY precomputed 64-bit hash column (signed
    int64 — simhash, pHash, ...): band bucketing + exact in-bucket
    hamming verify + pure-aggregate pair dedup.

    EXACT (equals brute force over all pairs) whenever ``max_hamming <
    bands``: a pair within that distance leaves at least one of the
    ``bands`` equal-width bit segments untouched (pigeonhole), so it
    meets in that band's bucket.  Exchange accounting: each doc ships
    ``bands`` rows of (id, band, bucket, hash) ≈ 32 bytes — the payload
    the hash was computed from never crosses an exchange.  Returns
    ``(id_a, id_b, hamming)`` with ``id_a < id_b``.
    """
    if 64 % bands:
        raise ValueError("bands must divide 64")
    width = 64 // bands
    mask = (1 << width) - 1

    def band_rows(t: pa.Table) -> pa.Table:
        # NULL hashes are dropped — a null coerced to a constant would
        # pair every such row with every other at hamming 0.  Non-null
        # SENTINELS (e.g. PhashImages' phash=0 on failed decodes) are
        # the caller's to filter, as image_neardup_pairs does on
        # phash_status before calling in.
        t = t.filter(pc.is_valid(t[hash_col]))
        ids = t[id_col].to_pylist()
        hs = t[hash_col].to_pylist()
        rows_id, rows_band, rows_bucket, rows_h = [], [], [], []
        for i, signed in zip(ids, hs):
            h = signed & 0xFFFFFFFFFFFFFFFF
            for band in range(bands):
                rows_id.append(i)
                rows_band.append(band)
                rows_bucket.append((h >> (band * width)) & mask)
                rows_h.append(signed)
        return pa.table(
            {id_col: pa.array(rows_id, pa.int64()),
             "band": pa.array(rows_band, pa.int32()),
             "bucket": pa.array(rows_bucket, pa.int64()),
             "_h": pa.array(rows_h, pa.int64())}
        )

    sig = ds.select_columns([id_col, hash_col]).map_batches(
        band_rows, batch_format="pyarrow"
    ).materialize()  # same checkpoint rationale as simhash_pairs

    def pairs(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(id_col).head(max_bucket)
        ids = g[id_col].tolist()
        hs = [h & 0xFFFFFFFFFFFFFFFF for h in g["_h"].tolist()]
        out_a, out_b, out_d = [], [], []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                d = bin(hs[x] ^ hs[y]).count("1")
                if d <= max_hamming:
                    out_a.append(ids[x])
                    out_b.append(ids[y])
                    out_d.append(d)
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64()),
                         "hamming": pa.array(out_d, pa.int64())})

    cand = sig.groupby(["band", "bucket"]).map_groups(pairs, batch_format="pandas")

    from ray.data.aggregate import Min

    return cand.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


# ---------------------------------------------------------------------------
# connected components over near-dup pairs (cluster resolution)
# ---------------------------------------------------------------------------


def connected_components(pairs_ds, *, max_rounds: int = 10,
                         join_partitions: int = 8):
    """Resolve near-dup pairs (id_a, id_b) into clusters (id, cluster_id).

    Distributed min-label propagation: each round every node adopts the
    minimum cluster id among itself and its neighbours; converges in
    O(diameter) rounds — near-dup clusters are tiny, so a handful.  No
    driver-side union-find state, so the edge set can be arbitrarily
    large.

    One round is fully vectorized dataflow — adjacency ⋈ labels (hash
    join on ``id``, attaching every node's current label to its
    outgoing edges), projected to ``(neigh, label)``, unioned with the
    current labels, then ``groupby(id).aggregate(Min)`` — no per-group
    Python UDF anywhere (the former per-NODE pandas ``map_groups``
    propagate was the one perf-weak component of round 2: at 1e9 nodes
    its per-group overhead dominates by orders of magnitude).

    Convergence is detected with a DISTRIBUTED scalar, not by pulling
    the label set to the driver: min-propagation is monotone (every
    node's label can only decrease), so the label-sum strictly
    decreases until the fixed point and the driver compares one number
    per round — O(1) driver memory at any corpus size.  Labels are
    63-bit ids, so their plain int64 Sum OVERFLOWS (Ray then falls
    back to pickled-object blocks); the checksum instead sums the high
    and low 32-bit halves separately (each int64-safe to ~2^31 rows —
    documented envelope) and recombines exactly in driver Python.

    Returns a Dataset (id, cluster_id) where cluster_id is the min
    member id of the component.  Singleton documents (no pairs) are not
    listed — callers treat absence as "own cluster".
    """
    edges = pairs_ds.select_columns(["id_a", "id_b"])

    def adjacency(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # schema-less empty blocks (aggregate output)
            return pa.table({"id": pa.array([], pa.int64()),
                             "neigh": pa.array([], pa.int64())})
        ids = pa.concat_arrays(
            [t["id_a"].combine_chunks(), t["id_b"].combine_chunks()]
        )
        neighs = pa.concat_arrays(
            [t["id_b"].combine_chunks(), t["id_a"].combine_chunks()]
        )
        return pa.table({"id": ids, "neigh": neighs})

    adj = edges.map_batches(adjacency, batch_format="pyarrow").materialize()

    def seed_labels(t: pa.Table) -> pa.Table:
        lab = pc.min_element_wise(t["id"], t["neigh"])
        return pa.table({"id": t["id"], "cluster_id": lab})

    from ray.data.aggregate import Min

    def _typed_labels(t: pa.Table) -> pa.Table:
        # hash-shuffle aggregates emit SCHEMA-LESS empty blocks for empty
        # partitions; Dataset.join (acero) rejects those ("no match for
        # FieldRef") — pin every empty block to the (id, cluster_id) schema
        if t.num_rows == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "cluster_id": pa.array([], pa.int64())})
        return t

    labels = (
        adj.map_batches(seed_labels, batch_format="pyarrow")
        .groupby("id")
        .aggregate(Min("cluster_id", alias_name="cluster_id"))
        .map_batches(_typed_labels, batch_format="pyarrow")
        .materialize()
    )
    def _checksum(lbls):
        """Exact sum of all labels as a driver-side Python int: per-row
        hi/lo 32-bit halves summed as int64 (no overflow to ~2^31
        rows), recombined with arbitrary-precision driver arithmetic."""
        def halves(t: pa.Table) -> pa.Table:
            cid = t["cluster_id"]
            return pa.table({
                "hi": pc.shift_right(cid, 32),
                "lo": pc.bit_wise_and(cid, 0xFFFFFFFF),
            })

        s = lbls.map_batches(halves, batch_format="pyarrow") \
            .sum(["hi", "lo"])
        # empty label set: Ray returns None for a single aggregate but
        # a None-valued dict for multi-column sums — treat both as None
        if s is None or s.get("sum(hi)") is None:
            return None
        return int(s["sum(hi)"]) * (1 << 32) + int(s["sum(lo)"])

    prev_sum = _checksum(labels)  # None on an empty edge set
    if prev_sum is None:
        return labels  # no edges: nothing to propagate
    # Ray's hash join builds a SCHEMA-LESS table for any partition that
    # received zero shards from one side and acero then rejects the join,
    # so a tiny label set over many partitions is a guaranteed crash.
    # Scale partition count so every partition statistically sees rows
    # (>=32 labels/partition keeps P(empty) ~ 8*(7/8)^256 ~ 0; node count
    # is constant across rounds, so compute once).
    n_nodes = labels.count()
    parts = max(1, min(join_partitions, n_nodes // 32))
    for _ in range(max_rounds):
        # labels ⋈ adjacency: each edge (u, v) picks up u's current
        # label; project to (v, label) candidates for the neighbour.
        neighbour_labels = adj.join(
            labels, "inner", num_partitions=parts, on=("id",)
        ).map_batches(
            lambda t: pa.table({"id": t["neigh"], "cluster_id": t["cluster_id"]}),
            batch_format="pyarrow",
        )
        labels = (
            neighbour_labels.union(labels)
            .groupby("id")
            .aggregate(Min("cluster_id", alias_name="cluster_id"))
            .map_batches(_typed_labels, batch_format="pyarrow")
            .materialize()
        )
        new_sum = _checksum(labels)
        if new_sum == prev_sum:  # monotone fixed point reached
            break
        prev_sum = new_sum
    return labels


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (bucketed by a coarse key to avoid O(n^2))
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(ds, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            bucket_col: str = "label",
                            threshold: float = 0.95):
    """Pairs with cosine similarity >= threshold within each bucket.

    The bucket column (e.g. a cluster/label id, or an LSH bucket from
    :mod:`rayxt.ann`) bounds the pairwise work per group; similarity is
    one numpy matmul per group.  Returns (id_a, id_b, cos) with
    id_a < id_b, cos rounded to 6 digits (float64 math, SQL parity).
    """

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        m = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        sims = mn @ mn.T
        iu = np.triu_indices(len(ids), k=1)
        # round BEFORE thresholding so the boundary case matches the SQL
        # oracle exactly (it filters on ROUND(cos, 6) >= T)
        sims_r = np.round(sims[iu], 6)
        mask = sims_r >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[iu[0][mask]],
                "id_b": ids[iu[1][mask]],
                "cos": sims_r[mask],
            }
        )

    return ds.groupby(bucket_col).map_groups(pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# paragraph-level dedup (CCNet-style line dedup across the corpus)
# ---------------------------------------------------------------------------


def explode_paragraphs(batch: pa.Table, *, key_cols, text_col: str,
                       sep: str = "\n") -> pa.Table:
    """(keys, text) -> one row per paragraph: keys + ``para_idx`` (0-based
    document order) + ``para`` + ``para_hash``.

    The split and row expansion are Arrow kernels (``split_pattern`` +
    ``list_flatten``/``list_parent_indices``); only the 8-byte hash pays
    a per-paragraph Python call (same budget as ``content_hash_table``).
    """
    parts = pc.split_pattern(batch[text_col], pattern=sep)
    la = parts.combine_chunks()
    flat = pc.list_flatten(la)
    parent = pc.list_parent_indices(la)
    offsets = np.asarray(la.offsets)
    counts = np.diff(offsets)
    idx = np.arange(len(flat), dtype=np.int64) - np.repeat(
        offsets[:-1].astype(np.int64), counts)
    cols = {k: pc.take(batch[k], parent) for k in key_cols}
    cols["para_idx"] = pa.array(idx, pa.int64())
    cols["para"] = flat
    cols["para_hash"] = pa.array(
        [_sha1_int64(p or "") for p in flat.to_pylist()], pa.int64())
    return pa.table(cols)


def paragraph_dedup(ds, key_cols, text_col: str = "text", *,
                    sep: str = "\n", min_count: int = 2,
                    join_partitions: int = 8, out_col: str = "text_dedup",
                    broadcast_threshold: int = 5_000_000):
    """Corpus-wide paragraph (line) dedup, the CCNet-style cleaning
    step: every paragraph whose text occurs >= ``min_count`` times
    ACROSS THE CORPUS is removed from every document; documents are
    reassembled in original paragraph order.  Documents with no
    surviving paragraph drop out (SQL ``GROUP BY`` over zero rows).

    Dataflow (the 100 TB shape): explode -> paragraph rows checkpointed
    once; duplicate detection is a pure ``groupby(para_hash).Count``
    (8-byte keys); survivors come from ONE left-anti hash join against
    the (tiny) duplicate-hash table — paragraph text crosses an
    exchange exactly twice (the checkpoint and the reassembly), never
    per-candidate.  Hot-key note: reassembly groups by the document
    key, so the one-doc-fits-one-worker assumption of
    ``ordered_string_agg`` applies.

    SQL parity::

        WITH paras AS (...unnest...), dups AS (
          SELECT para FROM paras GROUP BY para HAVING COUNT(*) >= n)
        SELECT keys, string_agg(para, sep ORDER BY idx), COUNT(*)
        FROM paras WHERE para NOT IN (SELECT para FROM dups)
        GROUP BY keys
    """
    from ray.data.aggregate import Sum

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    paras = ds.select_columns(list(key_cols) + [text_col]).map_batches(
        explode_paragraphs,
        fn_kwargs=dict(key_cols=list(key_cols), text_col=text_col, sep=sep),
        batch_format="pyarrow",
    ).materialize()  # read twice: dup counts + survivor filter/join

    def partial_counts(t: pa.Table) -> pa.Table:
        # pre-aggregate inside the batch: duplicated paragraphs collapse
        # BEFORE the exchange, so the groupby moves (hash, n) partials
        h, n = np.unique(t["para_hash"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"para_hash": pa.array(h, pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    def dup_only(t: pa.Table) -> pa.Table:
        # typed blocks even when the aggregate emits schema-less empties
        t = ensure_typed(t, {"para_hash": pa.int64(), "n": pa.int64()})
        return t.filter(
            pc.greater_equal(t["n"], min_count)).select(["para_hash"])

    dups = (paras.map_batches(partial_counts, batch_format="pyarrow")
            .groupby("para_hash").aggregate(Sum("n", alias_name="n"))
            .map_batches(dup_only, batch_format="pyarrow")).materialize()
    n_dups = dups.count()
    if n_dups == 0:
        survivors = paras
    elif n_dups <= broadcast_threshold:
        # 8 bytes x n_dups <= 40 MB: ship the dup-hash set ONCE via
        # ray.put and anti-filter per batch — no join exchange at all
        # (the broadcast_semi_filter shape).  Beyond the threshold fall
        # back to the hash join, which scales to any dup count.
        import ray as _ray

        dup_ref = _ray.put(np.sort(
            dups.to_pandas()["para_hash"].to_numpy(dtype=np.int64)))

        def anti(t: pa.Table) -> pa.Table:
            d = _ray.get(dup_ref)
            h = t["para_hash"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(~sorted_membership(d, h)))

        survivors = paras.map_batches(anti, batch_format="pyarrow")
    else:
        parts_n = max(1, min(join_partitions, n_dups // 32))
        survivors = paras.join(dups, "left_anti", num_partitions=parts_n,
                               on=("para_hash",))

    # Reassembly groups by a HASH BUCKET of the document key, not the
    # key itself: one Ray group per bucket (<= reassembly_buckets)
    # instead of one per document — Ray's per-group map_groups overhead
    # is ~5ms, so millions of per-doc groups would dominate wall time.
    # Inside a bucket, a single pandas sort + groupby-agg reassembles
    # every document of that bucket at once.
    first_key = key_cols[0]
    reassembly_buckets = 64

    def tag_bucket(t: pa.Table) -> pa.Table:
        b = crc_bucket(t[first_key].to_pylist(), reassembly_buckets)
        return t.append_column("_rb", pa.array(b, pa.int64()))

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(key_cols) + ["para_idx"], kind="mergesort")
        gb = g.groupby(list(key_cols), sort=False)
        out = gb["para"].agg(sep.join).reset_index()
        out = out.rename(columns={"para": out_col})
        out["n_paras"] = gb.size().reset_index(drop=True).astype("int64")
        return out

    return (survivors.map_batches(tag_bucket, batch_format="pyarrow")
            .groupby("_rb").map_groups(reassemble, batch_format="pandas"))


# ---------------------------------------------------------------------------
# duplicated n-gram span statistics ("dedup training data" signal)
# ---------------------------------------------------------------------------

_NGRAM_B = np.uint64(1099511628211)  # FNV prime as the rolling base


def _window_hashes(text: str, n: int) -> np.ndarray:
    """All n-token window hashes of a doc, in document order.

    FROZEN spec (the naive oracle restates it with Python ints): token
    hash = ``_sha1_int64``; window hash = Horner-form polynomial over
    the window's token hashes in uint64 wrap-around arithmetic with
    base ``_NGRAM_B``, then ``>> 1`` into signed int64.  Docs shorter
    than ``n`` tokens contribute ONE window (the whole doc); zero-token
    docs contribute none.  The Horner loop is ``min(n, len)`` vectorized
    passes over all windows at once — O(n) numpy ops per doc, not
    O(windows * n) Python."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.int64)
    th = np.fromiter((_sha1_int64(t) for t in toks), dtype=np.uint64,
                     count=len(toks))
    m = min(n, len(toks))
    length = len(toks) - m + 1
    acc = np.zeros(length, dtype=np.uint64)
    for k in range(m):
        acc = acc * _NGRAM_B + th[k:k + length]
    return (acc >> np.uint64(1)).astype(np.int64)


def dup_ngram_stats(ds, key_cols, text_col: str = "text", *, n: int = 20,
                    join_partitions: int = 8,
                    broadcast_threshold: int = 5_000_000):
    """Per-document duplicated-span statistics: how much of each doc is
    covered by n-token windows that occur >= 2 times ACROSS THE CORPUS
    (within-doc repeats count) — the standard contamination /
    memorization signal from the train-data-dedup literature.

    Returns one row per doc with >= 1 window: keys + ``n_windows`` +
    ``n_dup_windows`` + ``dup_fraction`` (round 6).

    Dataflow: window hashes explode once (8-byte rows, checkpointed);
    duplicate detection is per-batch partial counts -> one Sum groupby;
    the dup-hash set broadcasts via ``ray.put`` when small (sorted
    searchsorted membership per batch), else a hash join marks dup rows
    and two pure Count aggregates meet in a left join.  Text crosses an
    exchange zero times.
    """
    from ray.data.aggregate import Count, Sum

    if isinstance(key_cols, str):
        key_cols = [key_cols]

    def explode(t: pa.Table) -> pa.Table:
        cols = {k: [] for k in key_cols}
        hashes = []
        keys = [t[k].to_pylist() for k in key_cols]
        for row, txt in enumerate(t[text_col].to_pylist()):
            wh = _window_hashes(txt or "", n)
            if not len(wh):
                continue
            for k, kv in zip(key_cols, keys):
                cols[k].extend([kv[row]] * len(wh))
            hashes.append(wh)
        # key columns typed from the INPUT schema: a batch whose docs
        # all have zero windows must still emit a typed empty block
        out = {k: pa.array(v, type=t.schema.field(k).type)
               for k, v in cols.items()}
        out["whash"] = pa.array(
            np.concatenate(hashes) if hashes else
            np.empty(0, dtype=np.int64), pa.int64())
        return pa.table(out)

    w = ds.select_columns(list(key_cols) + [text_col]).map_batches(
        explode, batch_format="pyarrow").materialize()

    def partial_counts(t: pa.Table) -> pa.Table:
        h, cnt = np.unique(t["whash"].to_numpy(zero_copy_only=False),
                           return_counts=True)
        return pa.table({"whash": pa.array(h, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    def dup_only(t: pa.Table) -> pa.Table:
        t = ensure_typed(t, {"whash": pa.int64(), "cnt": pa.int64()})
        return t.filter(pc.greater_equal(t["cnt"], 2)).select(["whash"])

    dups = (w.map_batches(partial_counts, batch_format="pyarrow")
            .groupby("whash").aggregate(Sum("cnt", alias_name="cnt"))
            .map_batches(dup_only, batch_format="pyarrow")).materialize()
    n_dups = dups.count()

    if n_dups <= broadcast_threshold:
        import ray as _ray

        dup_ref = _ray.put(np.sort(
            dups.to_pandas()["whash"].to_numpy(dtype=np.int64))
            if n_dups else np.empty(0, dtype=np.int64))

        def flag(t: pa.Table) -> pa.Table:
            d = _ray.get(dup_ref)
            h = t["whash"].to_numpy(zero_copy_only=False)
            is_dup = sorted_membership(d, h).astype(np.int64)
            return t.drop_columns(["whash"]).append_column(
                "is_dup", pa.array(is_dup, pa.int64()))

        per_doc = (w.map_batches(flag, batch_format="pyarrow")
                   .groupby(list(key_cols))
                   .aggregate(Count(alias_name="n_windows"),
                              Sum("is_dup", alias_name="n_dup_windows")))
    else:
        key_types = {f.name: f.type for f in w.schema().base_schema
                     if f.name in key_cols}

        def typed_guard(count_alias):
            schema = dict(key_types)
            schema[count_alias] = pa.int64()

            def fix(t: pa.Table) -> pa.Table:
                # hash-aggregate empty partitions emit SCHEMA-LESS
                # blocks that crash the downstream acero join
                return ensure_typed(t, schema)
            return fix

        parts_n = max(1, min(join_partitions, n_dups // 32))
        totals = w.groupby(list(key_cols)).aggregate(
            Count(alias_name="n_windows")).map_batches(
            typed_guard("n_windows"), batch_format="pyarrow")
        dup_rows = w.join(dups, "inner", num_partitions=parts_n,
                          on=("whash",))
        dup_counts = dup_rows.groupby(list(key_cols)).aggregate(
            Count(alias_name="n_dup_windows")).map_batches(
            typed_guard("n_dup_windows"), batch_format="pyarrow")
        totals = totals.materialize()
        n_docs = totals.count()
        per_doc = totals.join(dup_counts, "left_outer",
                              num_partitions=max(
                                  1, min(join_partitions, n_docs // 32)),
                              on=tuple(key_cols))

    def finalize(t: pa.Table) -> pa.Table:
        nw = pc.cast(t["n_windows"], pa.float64())
        nd = pc.cast(pc.coalesce(t["n_dup_windows"], 0), pa.float64())
        frac = pc.round(pc.divide(nd, nw), ndigits=6)
        out = t.set_column(t.column_names.index("n_dup_windows"),
                           "n_dup_windows",
                           pc.cast(pc.coalesce(t["n_dup_windows"], 0),
                                   pa.int64()))
        return out.append_column("dup_fraction", frac)

    return per_doc.map_batches(finalize, batch_format="pyarrow")


def decontaminate_from_file(ds, eval_path: str, key_cols,
                            text_col: str = "text", *, n: int = 13,
                            eval_text_col: str = "text"):
    """Production shape of :func:`decontaminate`: the evaluation set
    lives in its OWN small file (an artifact of the benchmark, never
    derived from the corpus mid-job).  The driver reads that file
    directly — a bounded read of a by-definition-small table — and
    broadcasts its window-hash set once.  Deriving the eval split from
    the streaming corpus with a driver materialization is the
    anti-pattern this entry point exists to avoid (ADVICE r3)."""
    import pyarrow.parquet as pq

    texts = pq.read_table(
        eval_path, columns=[eval_text_col])[eval_text_col].to_pylist()
    return decontaminate(ds, texts, key_cols, text_col, n=n)


def decontaminate(ds, eval_texts, key_cols, text_col: str = "text", *,
                  n: int = 13):
    """Benchmark decontamination: flag every corpus document sharing at
    least one n-token window with an EVALUATION set (the GPT-3-style
    train/test overlap check).

    ``eval_texts`` is the benchmark's text list — small by definition
    (benchmarks are thousands of items, corpora are billions), so its
    window-hash set builds on the driver and ships ONCE via ``ray.put``;
    each corpus batch counts membership with a vectorized searchsorted.
    Corpus text never crosses an exchange; there is no exchange at all.

    Window hashes are the same frozen Horner/uint64 spec as
    :func:`dup_ngram_stats` (``_window_hashes``).  Returns one row per
    INPUT row: keys + ``n_overlap_windows`` + ``contaminated``.
    """
    import ray as _ray

    from ._blockutil import sorted_membership

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    eval_set = np.unique(np.concatenate(
        [_window_hashes(t or "", n) for t in eval_texts]
        or [np.empty(0, dtype=np.int64)]))
    eval_ref = _ray.put(eval_set)

    def flag(t: pa.Table) -> pa.Table:
        ev = _ray.get(eval_ref)
        hits = []
        for txt in t[text_col].to_pylist():
            wh = _window_hashes(txt or "", n)
            hits.append(int(sorted_membership(ev, wh).sum()) if len(wh)
                        else 0)
        out = t.select(list(key_cols))
        out = out.append_column("n_overlap_windows",
                                pa.array(hits, pa.int64()))
        return out.append_column(
            "contaminated",
            pa.array([h > 0 for h in hits], pa.bool_()))

    return ds.select_columns(list(key_cols) + [text_col]).map_batches(
        flag, batch_format="pyarrow")


def remove_dup_substrings(ds, key_cols, text_col: str = "text", *,
                          n: int = 20, min_count: int = 2,
                          join_partitions: int = 8,
                          broadcast_threshold: int = 5_000_000):
    """ExactSubstr-style span removal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): delete every token
    covered by an n-token window that occurs >= ``min_count`` times
    ACROSS THE CORPUS (within-doc repeats count), then re-join the
    surviving tokens with single spaces.

    FROZEN spec (restated by ``tests/oracle/sketches.py::
    oracle_remove_dup_substrings``): tokens = ``str.split()``; window
    hashes = the same Horner/uint64 spec as :func:`dup_ngram_stats`
    (docs shorter than ``n`` tokens contribute ONE whole-doc window, so
    short exact-dup docs empty out entirely — all copies are removed,
    the paper's policy); a duplicated window at token position ``i``
    covers ``[i, i + min(n, len))``; ``text_dedup`` is ALWAYS the
    space-join of the kept tokens (whitespace-normalized — this is a
    tokenizer-level operator).  Zero-token docs pass through with
    ``text_dedup = ""``.

    Dataflow (the 100 TB shape, same as :func:`dup_ngram_stats`): window
    hashes explode once as 8-byte rows; per-batch partial counts meet in
    ONE Sum groupby; the dup-hash set broadcasts via ``ray.put`` when
    small (vectorized searchsorted membership + a cumsum coverage mask
    per doc), else per-doc dup-hash subsets come back through a hash
    join packed as binary blobs — text itself crosses an exchange zero
    times in the broadcast path and exactly once (hash-partitioned by
    key) in the join path.

    Returns one row per input row: keys + ``n_tokens`` + ``n_removed``
    + ``text_dedup``.
    """
    import ray as _ray
    from ray.data.aggregate import Sum

    if isinstance(key_cols, str):
        key_cols = [key_cols]

    src = ds.select_columns(list(key_cols) + [text_col])

    def explode(t: pa.Table) -> pa.Table:
        hashes = []
        for txt in t[text_col].to_pylist():
            hashes.append(_window_hashes(txt or "", n))
        lens = np.array([len(h) for h in hashes], dtype=np.int64)
        rep = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        out = {k: t[k].take(pa.array(rep, pa.int64())) for k in key_cols}
        out["whash"] = pa.array(
            np.concatenate(hashes) if hashes else
            np.empty(0, dtype=np.int64), pa.int64())
        return pa.table(out)

    def partial_counts(t: pa.Table) -> pa.Table:
        h, cnt = np.unique(t["whash"].to_numpy(zero_copy_only=False),
                           return_counts=True)
        return pa.table({"whash": pa.array(h, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    def dup_only(t: pa.Table) -> pa.Table:
        t = ensure_typed(t, {"whash": pa.int64(), "cnt": pa.int64()})
        return t.filter(
            pc.greater_equal(t["cnt"], min_count)).select(["whash"])

    w = src.map_batches(explode, batch_format="pyarrow")
    dups = (w.map_batches(partial_counts, batch_format="pyarrow")
            .groupby("whash").aggregate(Sum("cnt", alias_name="cnt"))
            .map_batches(dup_only, batch_format="pyarrow")).materialize()
    n_dups = dups.count()

    def _rewrite_row(txt, dup_sorted):
        toks = (txt or "").split()
        wh = _window_hashes(txt or "", n)
        if not len(wh):
            return "", 0, 0
        is_dup = sorted_membership(dup_sorted, wh)
        if not is_dup.any():
            return " ".join(toks), len(toks), 0
        m = min(n, len(toks))
        diff = np.zeros(len(toks) + 1, dtype=np.int64)
        idx = np.nonzero(is_dup)[0]
        np.add.at(diff, idx, 1)
        np.add.at(diff, idx + m, -1)
        covered = np.cumsum(diff[:-1]) > 0
        kept = " ".join(tk for tk, c in zip(toks, covered) if not c)
        return kept, len(toks), int(covered.sum())

    def _out_table(t: pa.Table, rows) -> pa.Table:
        out = t.select(list(key_cols))
        out = out.append_column(
            "n_tokens", pa.array([r[1] for r in rows], pa.int64()))
        out = out.append_column(
            "n_removed", pa.array([r[2] for r in rows], pa.int64()))
        return out.append_column(
            "text_dedup", pa.array([r[0] for r in rows], pa.string()))

    if n_dups <= broadcast_threshold:
        dup_ref = _ray.put(np.sort(
            dups.to_pandas()["whash"].to_numpy(dtype=np.int64))
            if n_dups else np.empty(0, dtype=np.int64))

        def rewrite(t: pa.Table) -> pa.Table:
            d = _ray.get(dup_ref)
            rows = [_rewrite_row(txt, d)
                    for txt in t[text_col].to_pylist()]
            return _out_table(t, rows)

        return src.map_batches(rewrite, batch_format="pyarrow")

    # join path: per-doc dup-hash subsets packed as binary blobs —
    # total packed size == number of duplicated window OCCURRENCES,
    # shuffled as 8-byte rows, never the full corpus hash stream
    key_types = {f.name: f.type
                 for f in src.schema().base_schema if f.name in key_cols}
    parts_n = max(1, min(join_partitions, n_dups // 32))
    dup_rows = w.join(dups, "inner", num_partitions=parts_n,
                      on=("whash",))

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        out = g.iloc[:1][list(key_cols)].copy()
        out["__rxt_dupw"] = [np.unique(
            g["whash"].to_numpy(dtype=np.int64)).tobytes()]
        return out

    packed_schema = dict(key_types)
    packed_schema["__rxt_dupw"] = pa.binary()
    packed = dup_rows.groupby(list(key_cols)).map_groups(
        pack, batch_format="pandas").map_batches(
        lambda t: ensure_typed(t, packed_schema), batch_format="pyarrow")
    joined = src.join(packed, "left_outer",
                      num_partitions=join_partitions,
                      on=tuple(key_cols))

    def rewrite_joined(t: pa.Table) -> pa.Table:
        empty = np.empty(0, dtype=np.int64)
        rows = []
        blobs = t["__rxt_dupw"].to_pylist()
        for txt, blob in zip(t[text_col].to_pylist(), blobs):
            d = (np.frombuffer(blob, dtype=np.int64)
                 if blob is not None else empty)
            rows.append(_rewrite_row(txt, d))
        return _out_table(t, rows)

    return joined.map_batches(rewrite_joined, batch_format="pyarrow")
