"""Token-shard sink: corpus text -> fixed-length binary training
shards (the ``.bin``/``.idx`` artifact an LLM data loader mmaps).

The last step of a training-data pipeline: after extraction, quality
filtering, dedup and mixing, the surviving text becomes packed token-id
sequences in flat binary shards.  This module freezes a deterministic,
partition-independent layout so shards are reproducible, resumable and
oracle-checkable.

FROZEN policy (restated independently by
``tests/oracle/tokshard_oracle.py`` — its own CRC-32 table walk and
pure-python packing, never this module's kernels):

1. tokens: text splits on runs of ASCII whitespace ``[ \\t\\n\\r\\f\\v]``,
   empty tokens dropped (other codepoints — NBSP, U+2028, ``\\x1c`` —
   are token bytes; a crisper contract than Unicode-ws across
   libraries).  Null text = zero tokens.
2. token id = ``2 + (crc32(utf8(token)) % (vocab_size - 2))`` — a
   hashed vocabulary; id 0 is PAD, id 1 is EOD.
3. routing: a document goes to partition ``crc32(utf8(id_col)) %
   num_partitions`` (the :func:`rayxt.pipeline.add_part_id` url-hash
   convention).
4. within a partition, documents order by ascending ``id_col``; the
   partition's stream is each doc's token ids followed by ONE EOD,
   concatenated, sliced into consecutive ``seq_len``-id sequences;
   the final partial sequence pads with PAD.  Empty partitions write
   no shard.
5. shard ``part-NNNN.bin`` = the int32 little-endian sequence data,
   written atomically (tmp+rename; an existing shard is SKIPPED, so a
   re-run resumes); sidecar ``part-NNNN.idx.json`` = ``{part_id,
   n_seqs, seq_len, n_tokens, n_docs, vocab_size}`` + engine version,
   written AFTER the ``.bin`` lands (P12 lineage).

Scale shape: tokenization + hashing are vectorized per batch (ONE
Arrow split kernel; crc32 once per batch-DISTINCT token via
``dictionary_encode`` — the minhash trick); the only exchange is the
``num_partitions``-way groupby carrying (id, part_id, token-id array)
rows — int32 ids, the text itself never shuffles past the tokenize
stage.  One partition's ids must fit a worker's heap: size
``num_partitions`` ≥ corpus_tokens × 4 bytes / target_partition_bytes.
"""

from __future__ import annotations

import io
import json
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# NOTE: module-level imports only — worker-side UDFs must not perform
# runtime relative imports (the ExtractDocs rule)
from . import __version__

__all__ = ["TOK_PAD", "TOK_EOD", "hash_token_ids", "tokenize_ids",
           "write_token_shards", "read_token_shards"]

TOK_PAD = 0
TOK_EOD = 1

_WS_RE = "[ \t\n\r\f\v]+"


def hash_token_ids(tokens, vocab_size: int) -> np.ndarray:
    """Vectorized hashed-vocabulary ids for a flat token array: crc32
    once per DISTINCT token, broadcast back through the dictionary
    indices."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    d = tokens.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    lut = np.fromiter(
        (2 + zlib.crc32(t.encode("utf-8")) % (vocab_size - 2)
         for t in uniq), dtype=np.int32, count=len(uniq))
    idx = d.indices.to_numpy(zero_copy_only=False)
    return lut[idx]


def tokenize_ids(batch: pa.Table, *, text_col: str, id_col: str,
                 vocab_size: int, num_partitions: int) -> pa.Table:
    """One batch of documents -> (id, part_id, ids list<int32>)."""
    toks = pc.split_pattern_regex(
        pc.fill_null(batch[text_col], ""), _WS_RE)
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "")  # leading-run split artifacts
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    keep_np = keep.to_numpy(zero_copy_only=False)
    if len(flat):
        ids_flat = hash_token_ids(flat, vocab_size)[keep_np]
    else:
        ids_flat = np.empty(0, np.int32)
    # per-row token counts after the empty-token drop
    row_of = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    n_per_row = np.bincount(row_of[keep_np], minlength=len(batch))
    offsets = np.zeros(len(batch) + 1, dtype=np.int32)
    np.cumsum(n_per_row, out=offsets[1:])
    ids_col = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(ids_flat, pa.int32()))
    doc_ids = batch[id_col].to_pylist()
    pid = np.fromiter(
        (zlib.crc32(str(u).encode("utf-8")) % num_partitions
         for u in doc_ids), dtype=np.int64, count=len(doc_ids))
    return pa.table({
        "id": pc.cast(batch[id_col], pa.string()),
        "part_id": pa.array(pid, pa.int64()),
        "ids": ids_col,
    })


def write_token_shards(ds, out_dir: str, *, seq_len: int = 2048,
                       vocab_size: int = 32768,
                       num_partitions: int = 64,
                       id_col: str = "url", text_col: str = "text"):
    """Tokenize + pack + write the shard set; returns the
    per-partition summary ``(part_id, n_seqs, n_tokens, n_docs)``."""
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def tok(batch: pa.Table) -> pa.Table:
        return tokenize_ids(batch, text_col=text_col, id_col=id_col,
                            vocab_size=vocab_size,
                            num_partitions=num_partitions)

    def write_group(group: pd.DataFrame) -> pd.DataFrame:
        pid = int(group["part_id"].iloc[0])
        path = os.path.join(out_dir, f"part-{pid:04d}.bin")
        n_docs = len(group)
        if not os.path.exists(path):
            group = group.sort_values("id", kind="mergesort")
            parts = []
            eod = np.array([TOK_EOD], np.int32)
            for arr in group["ids"]:
                parts.append(np.asarray(arr, np.int32))
                parts.append(eod)
            stream = (np.concatenate(parts) if parts
                      else np.empty(0, np.int32))
            n_tokens = len(stream)
            n_seqs = -(-n_tokens // seq_len) if n_tokens else 0
            pad = n_seqs * seq_len - n_tokens
            if pad:
                stream = np.concatenate(
                    [stream, np.full(pad, TOK_PAD, np.int32)])
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(stream.astype("<i4", copy=False).tobytes())
            idx = {"part_id": pid, "n_seqs": int(n_seqs),
                   "seq_len": int(seq_len), "n_tokens": int(n_tokens),
                   "n_docs": int(n_docs),
                   "vocab_size": int(vocab_size),
                   "engine_version": __version__}
            itmp = path + f".idx.json.tmp{os.getpid()}"
            with open(itmp, "w") as fh:
                json.dump(idx, fh)
            # sidecar lands FIRST; the .bin rename is the commit point
            # (resume keys on the .bin, so a crash between the two
            # renames can never leave a committed shard without the
            # sidecar its reader and resume path need — an orphan
            # sidecar is simply overwritten by the re-run)
            os.rename(itmp, path.replace(".bin", ".idx.json"))
            os.rename(tmp, path)
        else:
            with open(path.replace(".bin", ".idx.json")) as fh:
                idx = json.load(fh)
        return pd.DataFrame({
            "part_id": [pid], "n_seqs": [idx["n_seqs"]],
            "n_tokens": [idx["n_tokens"]], "n_docs": [n_docs]})

    return (ds.map_batches(tok, batch_format="pyarrow")
              .groupby("part_id").map_groups(write_group).to_pandas())


def read_token_shards(paths, *, batch_seqs: int = 1024,
                      shuffle_seed: int | None = None, **kwargs):
    """``part-NNNN.bin`` shards -> Dataset(part_id, seq_idx, tokens
    list<int32>); ``seq_len`` comes from each shard's sidecar.

    ``shuffle_seed`` turns on the training loader's DETERMINISTIC
    within-shard shuffle: each shard's sequences emit in the order of
    the FROZEN key ``crc32(b"<seed>:<part_id>:<seq_idx>")`` (ties by
    seq_idx ascending), with the position in that order appended as
    ``shuffle_pos`` — the same permutation for any batch size, any
    run, any reader count, so a resumed training job sees the same
    stream.  The shuffled path reads rows by random access
    (``np.memmap`` over the fixed-length layout — the reason the
    format is mmap-able), ``batch_seqs`` rows at a time; memory stays
    bounded by the batch, never the shard.  Cross-shard interleaving
    is the executor's (file-level parallelism), as with any source.
    Shards must be on a worker-reachable filesystem (the shared-store
    assumption every container source documents)."""
    import ray.data as rd
    from ray.data.datasource import FileBasedDatasource

    from .warc import _NativeWrapper

    class TokShardDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["bin"]

        def _read_stream(self, f, path: str):
            import os
            import re as _re
            import zlib as _zlib

            with open(path.replace(".bin", ".idx.json")) as fh:
                idx = json.load(fh)
            seq_len = int(idx["seq_len"])
            m = _re.search(r"part-(\d+)\.bin$", os.path.basename(path))
            pid = int(m.group(1)) if m else int(idx["part_id"])
            row_bytes = seq_len * 4
            if shuffle_seed is not None:
                size = os.path.getsize(path)
                if size % row_bytes:
                    raise ValueError(f"ragged shard {path}")
                n = size // row_bytes
                keys = np.fromiter(
                    (_zlib.crc32(b"%d:%d:%d" % (shuffle_seed, pid, i))
                     for i in range(n)),
                    dtype=np.int64, count=n)
                perm = np.lexsort((np.arange(n), keys))
                mm = np.memmap(path, "<i4", mode="r",
                               shape=(n, seq_len))
                for start in range(0, n, batch_seqs):
                    take = perm[start:start + batch_seqs]
                    mat = np.ascontiguousarray(mm[take])
                    k = mat.shape[0]
                    offs = np.arange(k + 1, dtype=np.int32) * seq_len
                    yield pa.table({
                        "part_id": pa.array([pid] * k, pa.int64()),
                        "seq_idx": pa.array(take.astype(np.int64),
                                            pa.int64()),
                        "shuffle_pos": pa.array(
                            np.arange(start, start + k), pa.int64()),
                        "tokens": pa.ListArray.from_arrays(
                            pa.array(offs, pa.int32()),
                            pa.array(mat.reshape(-1), pa.int32())),
                    })
                return
            stream = io.BufferedReader(_NativeWrapper(f))
            seq_idx = 0
            while True:
                blob = stream.read(row_bytes * batch_seqs)
                if not blob:
                    return
                if len(blob) % row_bytes:
                    raise ValueError(f"ragged shard {path}")
                mat = np.frombuffer(blob, "<i4").reshape(-1, seq_len)
                n = mat.shape[0]
                offs = np.arange(n + 1, dtype=np.int32) * seq_len
                yield pa.table({
                    "part_id": pa.array([pid] * n, pa.int64()),
                    "seq_idx": pa.array(
                        np.arange(seq_idx, seq_idx + n), pa.int64()),
                    "tokens": pa.ListArray.from_arrays(
                        pa.array(offs, pa.int32()),
                        pa.array(mat.reshape(-1), pa.int32())),
                })
                seq_idx += n

    return rd.read_datasource(TokShardDatasource(paths, **kwargs))
