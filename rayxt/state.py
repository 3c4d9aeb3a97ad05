"""Shared mutable state as sharded Ray actors — the one operator
category the Dataset API genuinely cannot express (a first-seen index
consulted WHILE the stream is running; a groupby-based dedup needs the
whole keyspace exchanged before any row can be emitted).

``StreamingDeduper`` is a hash-sharded membership index: N plain
``@ray.remote`` actors each own one shard of the seen-set, and a
stateless ``map_batches`` stage routes each batch's keys to their
shards (one actor call per (batch, shard), never per row), keeps only
first-seen rows, and streams them on.  Scale design (this is the
"shared mutable index" operator, so its state layout IS the product):

* **digest keys, never raw keys** — each key is reduced to a 16-byte
  (two-word) digest on the *map* side via two vectorized 64-bit hash
  channels (:func:`key_digests`); actors only ever see fixed-width
  digests, so a shard's memory is independent of key width (the driver
  query keys on full document ``text``: raw-key storage would be
  gigabytes per shard, digests are 16 B/key).  Collision odds for the
  128-bit digest at 10^12 keys are ~2^-55 (birthday bound) — a
  collision drops one non-duplicate row, the same failure class as any
  fingerprint dedup.
* **bounded, spillable shard memory** — each shard keeps an insert
  buffer (``hot_cap`` digests, a Python set of 16-byte values); when
  full it is frozen into a *sorted run* persisted to disk with
  ``np.save`` and re-opened memory-mapped, so the OS page cache — not
  the actor heap — owns cold state.  Runs are merged two-smallest-first
  (LSM tiering) so membership probes touch at most ``max_runs``
  ``searchsorted`` passes; probe cost is vectorized
  ``O(batch · max_runs · log(run))``.
* **vectorized routing** — shard choice is ``digest_word % n_shards``
  over a numpy array; batches are stably pre-deduped on digest
  (``np.unique(..., return_index=True)`` keeps each key's FIRST row)
  and grouped per shard with one ``argsort``, one actor call per
  (batch, shard).
* **shard count scales with the cluster** — ``n_shards=None`` derives
  from ``ray.cluster_resources()`` (one shard per 2 CPUs, min 8), so a
  256-node cluster gets a proportionally wider index instead of eight
  hot actors.
* **output keys are deterministic** — the distinct key set does not
  depend on execution order; WHICH duplicate row survives does (the
  first one the executor happens to process), so downstream contracts
  must key on the deduped column, not the carried row (the driver
  query projects the key set; the "pick a deterministic
  representative" job is :func:`rayxt.dedup.dedup_keep_first`);
* **checkpoint / restore** — ``StreamingDeduper.checkpoint(dir)``
  freezes every shard and writes one sorted digest array per shard
  (atomic tmp+rename, the :mod:`rayxt.incremental` pattern) plus a
  ``manifest.json`` recording the shard count;
  ``StreamingDeduper(..., restore_dir=dir)`` re-opens each shard's
  array memory-mapped as its initial frozen run, so a resumed job
  re-sees nothing the checkpoint covered.  The checkpoint dir must be
  shared storage on a multi-node cluster (each shard writes/reads its
  own file, so a URI-per-shard layout maps directly onto an object
  store).  Restore requires the same shard count (validated against
  the manifest; ``n_shards=None`` adopts the manifest's).  Hot-buffer
  rows seen AFTER the last checkpoint are still re-seen on resume —
  the same at-least-once envelope as the extraction manifest (P13).
* **lifecycle** — ``close()`` (also ``__del__``, best-effort) kills
  the shard actors after each removes its node-local spill directory,
  and removes the driver-side temp dir, so long-lived clusters do not
  accumulate ``/tmp`` spill files (spills otherwise live for the
  actor's lifetime only).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa

__all__ = ["StreamingDeduper", "streaming_dedup", "key_digests"]

#: 128-bit digest = two little-endian 64-bit words; sorts/searchsorts
#: lexicographically by (a, b).  (numpy 'S16' is NOT usable here — its
#: comparisons strip trailing NUL bytes.)
DIGEST_DT = np.dtype([("a", "<u8"), ("b", "<u8")])

_HASH_KEY_A = "0123456789123456"  # pandas siphash keys (16 chars each)
_HASH_KEY_B = "rayxt.state.hk-b"
_MIX = np.uint64(0x9E3779B97F4A7C15)


def key_digests(values) -> np.ndarray:
    """Vectorized 16-byte digests of a key column (pa.Array /
    pa.ChunkedArray / numpy), dtype :data:`DIGEST_DT`.

    Strings/bytes get two independent siphash64 channels
    (``pd.util.hash_array`` with two fixed hash keys — fixed because
    every map worker must agree across processes).  Numeric ≤64-bit
    values get pandas' invertible bit-mix (injective on the raw 64-bit
    pattern, so word *a* alone is already collision-free) plus a
    remixed second word.
    """
    import pandas as pd

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        arr = values.to_numpy(zero_copy_only=False)
    else:
        arr = np.asarray(values)
    if arr.dtype == object or arr.dtype.kind in "USm":
        arr = np.asarray(arr, dtype=object)
        h1 = pd.util.hash_array(arr, hash_key=_HASH_KEY_A,
                                categorize=False)
        h2 = pd.util.hash_array(arr, hash_key=_HASH_KEY_B,
                                categorize=False)
    else:
        h1 = pd.util.hash_array(arr)
        h2 = pd.util.hash_array(h1 ^ _MIX)
    out = np.empty(len(h1), DIGEST_DT)
    out["a"] = h1
    out["b"] = h2
    return out


def _shard_actor():
    """Define the actor class lazily so importing this module does not
    require an initialized Ray runtime."""
    import ray

    @ray.remote(num_cpus=0)
    class _SeenShard:
        """One shard of the distributed seen-set: a bounded hot set of
        16-byte digests + sorted frozen runs spilled to mmap'd files."""

        def __init__(self, shard_id: int, hot_cap: int, spill_dir: str,
                     max_runs: int = 8, restore_path: str | None = None):
            self._id = shard_id
            self._hot_cap = max(int(hot_cap), 1024)
            self._max_runs = max_runs
            self._hot: set = set()          # of 16-byte bytes
            self._runs: list = []           # sorted DIGEST_DT arrays (mmap)
            self._run_paths: list = []
            self._n_frozen = 0              # distinct digests in runs
            self._n_spills = 0
            # actor-local spill dir (each node has its own /tmp)
            self._dir = os.path.join(spill_dir, f"shard-{shard_id}")
            os.makedirs(self._dir, exist_ok=True)
            if restore_path is not None and os.path.exists(restore_path):
                # checkpointed digests become the initial frozen run,
                # memory-mapped in place (never copied into the heap)
                run = np.load(restore_path, mmap_mode="r")
                if len(run):
                    self._runs.append(run)
                    self._run_paths.append(None)  # not ours to delete
                    self._n_frozen = len(run)

        def filter_new(self, dig_bytes: bytes) -> np.ndarray:
            """-> bool per digest: True the FIRST time it is offered to
            this shard (and it is recorded), False afterwards.  Input
            digests are unique within a call (map side pre-dedups)."""
            d = np.frombuffer(dig_bytes, DIGEST_DT)
            new = np.ones(len(d), dtype=bool)
            for run in self._runs:              # vectorized cold probes
                idx = np.searchsorted(run, d)
                inb = idx < len(run)
                hit = np.zeros(len(d), dtype=bool)
                hit[inb] = run[idx[inb]] == d[inb]
                new &= ~hit
            hot = self._hot
            raw = d.tobytes()
            for i in np.nonzero(new)[0]:        # insert path only
                b = raw[i * 16:(i + 1) * 16]
                if b in hot:
                    new[i] = False
                else:
                    hot.add(b)
            if len(hot) >= self._hot_cap:
                self._freeze()
            return new

        def _freeze(self):
            """Sort the hot buffer into a run, spill it to disk, re-open
            memory-mapped, and LSM-merge smallest runs to bound probe
            count.  Peak transient RAM = the two merged runs."""
            arr = np.frombuffer(b"".join(self._hot), DIGEST_DT).copy()
            arr.sort()
            self._n_frozen += len(arr)
            self._hot.clear()
            self._append_run(arr)
            while len(self._runs) > self._max_runs:
                order = sorted(range(len(self._runs)),
                               key=lambda i: len(self._runs[i]))
                i, j = sorted(order[:2], reverse=True)
                merged = np.concatenate(
                    [np.asarray(self._runs[i]), np.asarray(self._runs[j])])
                merged.sort()
                for k in (i, j):
                    del self._runs[k]
                    if self._run_paths[k] is not None:  # restore runs
                        os.unlink(self._run_paths[k])   # aren't ours
                    del self._run_paths[k]
                self._append_run(merged)

        def _append_run(self, arr: np.ndarray):
            self._n_spills += 1
            path = os.path.join(self._dir, f"run-{self._n_spills}.npy")
            np.save(path, arr)
            self._runs.append(np.load(path, mmap_mode="r"))
            self._run_paths.append(path)

        def size(self) -> int:
            return self._n_frozen + len(self._hot)

        def memory_bytes(self) -> int:
            """Approximate actor-heap bytes held by the index (frozen
            runs are memory-mapped and excluded: the page cache owns
            them)."""
            import sys

            set_slots = sys.getsizeof(self._hot)
            return set_slots + len(self._hot) * 49  # 16-byte bytes objs

        def stats(self) -> dict:
            return {"hot": len(self._hot), "frozen": self._n_frozen,
                    "runs": len(self._runs), "spills": self._n_spills,
                    "heap_bytes": self.memory_bytes()}

        def checkpoint(self, path: str) -> int:
            """Persist the shard's full seen-set (hot + every run) as
            ONE sorted array at ``path``, atomically (tmp + rename).
            Non-destructive: the live index keeps serving.  Runs are
            pairwise disjoint by construction (``filter_new`` inserts
            only unseen digests), so concat+sort needs no dedup."""
            parts = [np.asarray(r) for r in self._runs]
            if self._hot:
                parts.append(np.frombuffer(b"".join(self._hot),
                                           DIGEST_DT))
            merged = (np.concatenate(parts) if parts
                      else np.empty(0, DIGEST_DT))
            merged.sort()
            tmp = path + ".tmp"
            with open(tmp, "wb") as fh:  # file handle: no .npy suffixing
                np.save(fh, merged)
            os.replace(tmp, path)
            return len(merged)

        def close(self):
            """Drop mmaps and remove this shard's node-local spill dir
            (restore files are the caller's and are left alone)."""
            import shutil

            self._runs.clear()
            self._run_paths.clear()
            self._hot.clear()
            shutil.rmtree(self._dir, ignore_errors=True)

    return _SeenShard


def _default_shards() -> int:
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 16) or 16)
    return max(8, cpus // 2)


class StreamingDeduper:
    """Sharded first-seen index + the batch filter that consults it."""

    def __init__(self, key_col: str, n_shards: int | None = None, *,
                 hot_cap: int = 1 << 20, spill_dir: str | None = None,
                 restore_dir: str | None = None):
        import json

        import ray

        shard_cls = _shard_actor()
        self.key_col = key_col
        restore_paths: list = []
        if restore_dir is not None:
            with open(os.path.join(restore_dir, "manifest.json")) as fh:
                man = json.load(fh)
            if n_shards is not None and int(n_shards) != man["n_shards"]:
                raise ValueError(
                    f"checkpoint has {man['n_shards']} shards, "
                    f"restore requested {n_shards}: digest routing is "
                    f"shard-count-dependent, counts must match")
            n_shards = man["n_shards"]
            restore_paths = [os.path.join(restore_dir, f"shard-{i}.npy")
                             for i in range(n_shards)]
        self.n_shards = int(n_shards) if n_shards else _default_shards()
        if not restore_paths:
            restore_paths = [None] * self.n_shards
        if spill_dir is None:
            spill_dir = tempfile.mkdtemp(prefix="rayxt-sdedup-")
            self._own_spill_dir = True
        else:
            self._own_spill_dir = False
        self.spill_dir = spill_dir
        self.shards = [shard_cls.remote(i, hot_cap, spill_dir,
                                        restore_path=restore_paths[i])
                       for i in range(self.n_shards)]
        self._ray = ray
        self._closed = False
        # the deduper is COPIED into every map worker via the filter
        # closure; only the originating process may tear the shared
        # actors down (__init__ does not re-run on unpickle, so the
        # owner pid travels with the copy and fails the guard there)
        self._owner_pid = os.getpid()

    def filter_batch(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        dig = key_digests(t[self.key_col])
        # stable in-batch pre-dedup: keep each digest's first row
        _, first = np.unique(dig, return_index=True)
        if len(first) < len(dig):
            first.sort()
            t = t.take(pa.array(first))
            dig = dig[first]
        shard_of = (dig["a"] % np.uint64(self.n_shards)).astype(np.int64)
        order = np.argsort(shard_of, kind="stable")
        bounds = np.searchsorted(shard_of[order],
                                 np.arange(self.n_shards + 1))
        pos_groups, futures = [], []
        for s in range(self.n_shards):
            lo, hi = bounds[s], bounds[s + 1]
            if lo == hi:
                continue
            pos = order[lo:hi]
            pos_groups.append(pos)
            futures.append(
                self.shards[s].filter_new.remote(dig[pos].tobytes()))
        mask = np.zeros(len(dig), dtype=bool)
        for pos, is_new in zip(pos_groups, self._ray.get(futures)):
            mask[pos] = is_new
        return t.filter(pa.array(mask))

    def total_seen(self) -> int:
        return sum(self._ray.get([s.size.remote() for s in self.shards]))

    def shard_stats(self) -> list:
        return self._ray.get([s.stats.remote() for s in self.shards])

    def checkpoint(self, state_dir: str) -> int:
        """Persist the whole index to ``state_dir`` (one sorted digest
        file per shard + ``manifest.json``), atomically per file; the
        manifest is written LAST so a torn checkpoint never restores.
        Returns total digests persisted.  The index keeps serving."""
        import json

        os.makedirs(state_dir, exist_ok=True)
        counts = self._ray.get([
            s.checkpoint.remote(os.path.join(state_dir, f"shard-{i}.npy"))
            for i, s in enumerate(self.shards)])
        man = {"n_shards": self.n_shards, "total": int(sum(counts)),
               "format": "rayxt-sdedup-v1"}
        tmp = os.path.join(state_dir, "manifest.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(man, fh)
        os.replace(tmp, os.path.join(state_dir, "manifest.json"))
        return man["total"]

    def close(self):
        """Remove every shard's spill files, kill the actors, and (when
        this deduper created it) the driver-side temp dir.  Idempotent;
        the deduper is unusable afterwards.  A no-op on worker-side
        COPIES (see ``_owner_pid``): a worker process dropping its copy
        must never tear down the shared index."""
        if self._closed or os.getpid() != self._owner_pid:
            return
        self._closed = True
        try:
            self._ray.get([s.close.remote() for s in self.shards])
        except Exception:  # actors may already be dead
            pass
        for s in self.shards:
            try:
                self._ray.kill(s)
            except Exception:
                pass
        self.shards = []
        if self._own_spill_dir:
            import shutil

            shutil.rmtree(self.spill_dir, ignore_errors=True)

    def __del__(self):  # best-effort: don't leak /tmp spills
        try:
            self.close()
        except Exception:
            pass


def streaming_dedup(ds, *, key_col: str, n_shards: int | None = None,
                    batch_size: int = 4096, hot_cap: int = 1 << 20,
                    spill_dir: str | None = None,
                    restore_dir: str | None = None):
    """First-seen streaming dedup of ``ds`` on ``key_col`` via a
    sharded actor index (module docstring for semantics/caveats).
    Returns ``(deduped_dataset, deduper)`` — the deduper exposes
    ``total_seen()`` / ``shard_stats()`` / ``checkpoint(dir)`` /
    ``close()`` after consumption; ``restore_dir`` resumes from a
    prior :meth:`StreamingDeduper.checkpoint`."""
    dd = StreamingDeduper(key_col, n_shards, hot_cap=hot_cap,
                          spill_dir=spill_dir, restore_dir=restore_dir)

    def keep_new(t: pa.Table) -> pa.Table:
        return dd.filter_batch(t)

    return ds.map_batches(keep_new, batch_format="pyarrow",
                          batch_size=batch_size), dd
