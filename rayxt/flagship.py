"""Composed WARC-to-training-batches pipeline — the north-rule product.

This module chains the engine's individually-verified stages into the
ONE lifecycle a training-data run executes (SURVEY §3.4;
``BASELINE.json:north_rule``): Common-Crawl container read →
main-content extraction → language ID → quality filtering → exact
re-fetch dedup → near-dup removal → sequence packing → partitioned
resumable sink.

Pass structure — the 100 TB shape.  Near-dup removal is inherently a
second look at the corpus (signatures must all exist before any doc
knows whether it survives), so the pipeline is three passes; the
corpus crosses a pass boundary exactly once, as a DURABLE url-hash-
partitioned parquet checkpoint (the CCNet/Dolma layout) — never as a
driver materialization:

* **PASS 1 (clean)** — one streaming plan, read to sink: ``read_warc``
  → part_id tag + resume filter (BEFORE any html is parsed, P13) →
  extraction actor pool → ``status=='ok'`` + column prune (html and
  the extraction sidecars die in-stage) → LangId actor pool →
  vectorized quality filter (token count, char entropy, language) →
  exact re-fetch dedup (``dedup_latest_by_url`` argmax: the pass's one
  all-to-all exchange, carrying FILTERED extracted text — orders of
  magnitude lighter than the raw html) → 64-bit doc_id → streaming
  partitioned checkpoint.
* **PASS 2 (near-dup)** — MinHash LSH pairs + connected components
  over the checkpoint.  Only signatures (8·num_perm B/doc) and
  24-byte band rows shuffle; the result is the tiny NON-representative
  drop set (near-dup losers only — empty for a clean corpus).
* **PASS 3 (pack)** — one streaming plan: pruned checkpoint read →
  broadcast anti-filter on the drop set → sequence-pack assignment
  (only ``(id, n_tokens)`` rows cross the 64-way bucket exchange) →
  optionally hash-join the skinny assignment back onto the text rows
  and write the pack-bucket-partitioned training sink.

Documented envelopes (enforced or flagged, not silent):

* ``doc_id`` is the 63-bit sha1 of the url (the engine's standard id
  hash, oracle-restatable).  Birthday-safe to ~10^9 docs; at the
  10^12-doc target widen to the 128-bit digest pair
  (:func:`rayxt.state.key_digests`) — the dedup stages are agnostic to
  the id column's width.
* The near-dup drop set broadcasts via ``ray.put`` (8 B per LOSER, not
  per doc).  Where losers outgrow the object store, swap the
  anti-filter for the ``left_anti`` hash join (``dedup_keep_first``'s
  shape) — see :func:`pack_pass`'s ``drop_ids`` contract.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._blockutil import sorted_membership
from .dedup import _sha1_int64, connected_components, minhash_lsh_pairs
from .manifest import scan_done
from .pipeline import (
    add_part_id,
    dedup_latest_by_url,
    extract_pages,
    write_partitioned_streaming,
)
from .text import LangId, char_entropy_of, pack_documents
from .warc import read_warc


def _read_checkpoint(clean_dir: str, columns):
    """Read the clean checkpoint's hive partition dirs (skipping the
    sibling ``manifest/`` and ``lineage/`` bookkeeping dirs)."""
    import glob

    import ray.data as rd

    shards = sorted(
        glob.glob(os.path.join(clean_dir, "part_id=*", "*.parquet")))
    return rd.read_parquet(shards, columns=list(columns))


def _checkpoint_rows(clean_dir: str) -> int:
    """Total checkpoint row count from parquet footers (no Ray job)."""
    import glob

    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(clean_dir, "part_id=*", "*.parquet"))
    )

__all__ = [
    "clean_pass",
    "neardup_drop_ids",
    "pack_pass",
    "training_assignments",
    "warc_to_training",
]

#: frozen stage parameters (FIXTURES.md flagship section); the gate
#: golden is generated with exactly these — change them together.
DEFAULTS = dict(
    program="main_content",
    lang_keep=("en", "fr"),
    min_tokens=30,
    max_tokens=5000,
    min_entropy=3.0,
    threshold=0.8,
    pack_budget=512,
)


def _quality_mask(t: pa.Table, lang_set: pa.Array, min_tokens: int,
                  max_tokens: int, min_entropy: float) -> pa.Table:
    """Append ``n_tokens`` (the frozen single-space-split convention the
    packer also uses) and filter to the quality envelope.  Token count
    and language test are Arrow kernels; entropy is the per-row numpy
    bincount of :func:`rayxt.text.char_entropy_of` (rounded to 6 digits
    BEFORE the threshold, matching ``add_char_entropy``)."""
    n = pc.cast(pc.list_value_length(pc.split_pattern(t["text"], " ")),
                pa.int64())
    t = t.append_column("n_tokens", n)
    ents = pa.array(
        [round(char_entropy_of(x or ""), 6) for x in t["text"].to_pylist()],
        pa.float64(),
    )
    mask = pc.and_(
        pc.and_(
            pc.is_in(t["lang_guess"], value_set=lang_set),
            pc.and_(pc.greater_equal(t["n_tokens"], min_tokens),
                    pc.less_equal(t["n_tokens"], max_tokens)),
        ),
        pc.greater_equal(ents, min_entropy),
    )
    return t.filter(mask)


def clean_pass(
    warc_paths,
    clean_dir: str,
    *,
    program: str = DEFAULTS["program"],
    lang_keep=DEFAULTS["lang_keep"],
    min_tokens: int = DEFAULTS["min_tokens"],
    max_tokens: int = DEFAULTS["max_tokens"],
    min_entropy: float = DEFAULTS["min_entropy"],
    num_partitions: int = 64,
    concurrency=(2, 8),
    langid_concurrency=(1, 4),
    batch_size: int = 64,
    resume: bool = True,
):
    """PASS 1: WARC → extract → langid → quality filter → url-dedup →
    partitioned clean checkpoint.  Returns the sink summary
    ``(part_id, rows)``.

    Checkpoint schema: ``(url, warc_ts, text, part_id, lang_guess,
    n_tokens, doc_id)``.  Resume is partition-granular and filters
    BEFORE the parse stage (the part key is a pure function of the
    url), so a resumed run re-reads but never re-extracts finished
    partitions.
    """
    ds = read_warc(warc_paths)
    ds = add_part_id(ds, num_partitions)
    done = scan_done(clean_dir) if resume else set()
    if done:
        done_set = pa.array(sorted(done), pa.int64())
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t.column("part_id"), value_set=done_set))
            ),
            batch_format="pyarrow",
        )
    ex = extract_pages(ds, program=program, batch_size=batch_size,
                       concurrency=concurrency)

    def ok_skinny(t: pa.Table) -> pa.Table:
        # html never reached this stage (extract consumed it); drop the
        # extraction sidecars too so only the skinny text rows flow on
        t = t.filter(pc.equal(t["status"], "ok"))
        return t.select(["url", "warc_ts", "text", "part_id"])

    ex = ex.map_batches(ok_skinny, batch_format="pyarrow")
    ex = ex.map_batches(
        LangId,
        batch_format="pyarrow",
        concurrency=langid_concurrency,
        num_cpus=1,
    )
    lang_set = pa.array(list(lang_keep), pa.string())
    ex = ex.map_batches(
        lambda t: _quality_mask(t, lang_set, min_tokens, max_tokens,
                                min_entropy),
        batch_format="pyarrow",
    )
    # exact re-fetch dedup: one row per url, the latest warc_ts among
    # the QUALIFYING versions wins (filter-then-dedup, the cheaper
    # order — losers never cross the exchange)
    latest = dedup_latest_by_url(ex)

    def with_doc_id(t: pa.Table) -> pa.Table:
        ids = pa.array([_sha1_int64(u) for u in t["url"].to_pylist()],
                       pa.int64())
        return t.append_column("doc_id", ids)

    latest = latest.map_batches(with_doc_id, batch_format="pyarrow")
    # declare the schema: letting the sink discover it via ds.columns()
    # would execute the whole plan (incl. the aggregate barrier) TWICE
    summary = write_partitioned_streaming(
        latest, clean_dir, num_partitions, program_name=program,
        resume=resume,
        columns=["url", "warc_ts", "text", "part_id", "lang_guess",
                 "n_tokens", "doc_id"],
    )
    clean_pass.last_stats = getattr(write_partitioned_streaming,
                                    "last_stats", "")
    return summary


def neardup_drop_ids(clean_dir: str, *,
                     threshold: float = DEFAULTS["threshold"],
                     concurrency=(1, 4)) -> np.ndarray:
    """PASS 2: MinHash LSH pairs → connected components → sorted array
    of NON-representative doc_ids (the near-dup losers; empty when the
    corpus has no near-dups).  The driver holds only this loser set —
    one int64 per dropped doc, never the corpus."""
    ds = _read_checkpoint(clean_dir, ["doc_id", "text"])
    pairs = minhash_lsh_pairs(ds, "doc_id", threshold=threshold,
                              concurrency=concurrency)
    clusters = connected_components(pairs).to_pandas()
    if not len(clusters):
        return np.empty(0, dtype=np.int64)
    losers = clusters.loc[clusters["id"] != clusters["cluster_id"], "id"]
    return np.sort(losers.to_numpy(np.int64))


def pack_pass(
    clean_dir: str,
    drop_ids: np.ndarray,
    *,
    pack_budget: int = DEFAULTS["pack_budget"],
    n_buckets: int = 64,
    out_dir: str | None = None,
    resume: bool = True,
):
    """PASS 3: checkpoint read → anti-filter → pack assignment; with
    ``out_dir`` also join the skinny assignment back onto the text rows
    and write the pack-bucket-partitioned training sink.

    Without ``out_dir`` returns the assignment Dataset ``(url,
    n_tokens, pack_id, pack_pos, oversize)`` — the gate surface.  With
    ``out_dir`` returns the sink summary.
    """
    import ray

    drop_ref = ray.put(np.ascontiguousarray(drop_ids, dtype=np.int64))

    def anti(t: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(~sorted_membership(d, ids)))

    kept_skinny = _read_checkpoint(
        clean_dir, ["url", "doc_id", "text"]
    ).map_batches(anti, batch_format="pyarrow")
    assign = pack_documents(kept_skinny, id_col="url", text_col="text",
                            max_tokens=pack_budget, n_buckets=n_buckets)
    if out_dir is None:
        return assign

    # training sink: re-read the checkpoint with the carry-through
    # columns, anti-filter again (a cheap second scan of the DURABLE
    # checkpoint — not a recomputation of extraction), join the
    # 40-B/doc assignment rows back on url, partition by pack bucket
    kept_full = _read_checkpoint(
        clean_dir, ["url", "warc_ts", "lang_guess", "doc_id", "text"],
    ).map_batches(anti, batch_format="pyarrow")
    # size the join from parquet METADATA (free) rather than
    # assign.count(), which would execute the pack plan an extra time
    n_kept = max(1, _checkpoint_rows(clean_dir) - len(drop_ids))
    # ~64k joined rows per partition: a small corpus needs a handful of
    # join tasks, not a fixed 64-way exchange of near-empty shards
    parts = max(1, min(n_buckets, n_kept // 65536 + 1))
    joined = kept_full.join(
        assign, "inner", num_partitions=parts, on=("url",),
    )

    def tag_bucket(t: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.shift_right(t["pack_id"], 40), pa.int64())
        return t.append_column("part_id", part)

    joined = joined.map_batches(tag_bucket, batch_format="pyarrow")
    summary = write_partitioned_streaming(
        joined, out_dir, n_buckets, program_name="flagship_pack",
        resume=resume,
        columns=["url", "warc_ts", "lang_guess", "doc_id", "text",
                 "n_tokens", "pack_id", "pack_pos", "oversize", "part_id"],
    )
    pack_pass.last_stats = getattr(write_partitioned_streaming,
                                   "last_stats", "")
    return summary


def training_assignments(warc_paths, work_dir: str, **params):
    """Gate surface: run all three passes and return the pack
    assignment Dataset ``(url, n_tokens, pack_id, pack_pos,
    oversize)`` — one row per surviving document."""
    p = dict(DEFAULTS, **params)
    clean_dir = os.path.join(work_dir, "clean")
    clean_pass(
        warc_paths, clean_dir, program=p["program"],
        lang_keep=p["lang_keep"], min_tokens=p["min_tokens"],
        max_tokens=p["max_tokens"], min_entropy=p["min_entropy"],
        num_partitions=p.get("num_partitions", 64),
        concurrency=p.get("concurrency", (2, 8)),
        langid_concurrency=p.get("langid_concurrency", (1, 4)),
        batch_size=p.get("batch_size", 64),
        resume=p.get("resume", True),
    )
    drop = neardup_drop_ids(clean_dir, threshold=p["threshold"],
                            concurrency=p.get("dedup_concurrency", (1, 4)))
    return pack_pass(clean_dir, drop, pack_budget=p["pack_budget"])


def warc_to_training(warc_paths, work_dir: str, **params) -> dict:
    """The full job: all three passes INCLUDING the final packed-text
    sink under ``work_dir/packs``.  Returns a summary dict with row
    counts per stage and the executed sink plans' ``ds.stats()``
    captures (the no-materialization evidence)."""
    p = dict(DEFAULTS, **params)
    clean_dir = os.path.join(work_dir, "clean")
    packs_dir = os.path.join(work_dir, "packs")
    clean_summary = clean_pass(
        warc_paths, clean_dir, program=p["program"],
        lang_keep=p["lang_keep"], min_tokens=p["min_tokens"],
        max_tokens=p["max_tokens"], min_entropy=p["min_entropy"],
        num_partitions=p.get("num_partitions", 64),
        concurrency=p.get("concurrency", (2, 8)),
        langid_concurrency=p.get("langid_concurrency", (1, 4)),
        batch_size=p.get("batch_size", 64),
        resume=p.get("resume", True),
    )
    drop = neardup_drop_ids(clean_dir, threshold=p["threshold"],
                            concurrency=p.get("dedup_concurrency", (1, 4)))
    pack_summary = pack_pass(
        clean_dir, drop, pack_budget=p["pack_budget"],
        out_dir=packs_dir, resume=p.get("resume", True),
    )
    return {
        "clean_rows": int(clean_summary["rows"].sum()) if len(clean_summary) else 0,
        "neardup_dropped": int(len(drop)),
        "packed_rows": int(pack_summary["rows"].sum()) if len(pack_summary) else 0,
        "clean_dir": clean_dir,
        "packs_dir": packs_dir,
        "clean_stats": getattr(clean_pass, "last_stats", ""),
        "pack_stats": getattr(pack_pass, "last_stats", ""),
    }


#: PASS-4 shard parameters — frozen, shared with the golden maker
SHARD_SEQ_LEN = 256
SHARD_VOCAB = 8192
SHARD_PARTITIONS = 8


def training_shards(warc_paths, work_dir: str, **params):
    """PASS 4: the binary token-shard sink over the surviving corpus —
    the chain's final artifact (WARC container in, mmap-able training
    bytes out).  Runs passes 1–3's clean/near-dup stages, anti-filters
    the checkpoint, writes ``work_dir/shards/part-NNNN.bin`` via
    :func:`rayxt.tokshard.write_token_shards` (resumable), and returns
    the read-back sequence Dataset — the gate surface."""
    import glob

    import ray

    from .tokshard import read_token_shards, write_token_shards

    p = dict(DEFAULTS, **params)
    clean_dir = os.path.join(work_dir, "clean")
    clean_pass(
        warc_paths, clean_dir, program=p["program"],
        lang_keep=p["lang_keep"], min_tokens=p["min_tokens"],
        max_tokens=p["max_tokens"], min_entropy=p["min_entropy"],
        num_partitions=p.get("num_partitions", 64),
        concurrency=p.get("concurrency", (2, 8)),
        langid_concurrency=p.get("langid_concurrency", (1, 4)),
        batch_size=p.get("batch_size", 64),
        resume=p.get("resume", True),
    )
    drop = neardup_drop_ids(clean_dir, threshold=p["threshold"],
                            concurrency=p.get("dedup_concurrency", (1, 4)))
    drop_ref = ray.put(np.ascontiguousarray(drop, dtype=np.int64))

    def anti(t: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(~sorted_membership(d, ids)))

    kept = _read_checkpoint(
        clean_dir, ["url", "doc_id", "text"]
    ).map_batches(anti, batch_format="pyarrow")
    out_dir = os.path.join(work_dir, "shards")
    write_token_shards(
        kept, out_dir, seq_len=SHARD_SEQ_LEN, vocab_size=SHARD_VOCAB,
        num_partitions=SHARD_PARTITIONS, id_col="url",
        text_col="text")
    return read_token_shards(
        sorted(glob.glob(os.path.join(out_dir, "part-*.bin"))))
