"""Shared mutable state as sharded Ray actors — the one operator
category the Dataset API genuinely cannot express (a first-seen index
consulted WHILE the stream is running; a groupby-based dedup needs the
whole keyspace exchanged before any row can be emitted).

``StreamingDeduper`` is a hash-sharded membership index: N plain
``@ray.remote`` actors each own one shard of the seen-set, and a
stateless ``map_batches`` stage routes each batch's keys to their
shards (one actor call per (batch, shard), never per row), keeps only
first-seen rows, and streams them on.  Properties:

* **output keys are deterministic** — the distinct key set does not
  depend on execution order; WHICH duplicate row survives does (the
  first one the executor happens to process), so downstream contracts
  must key on the deduped column, not the carried row (the driver
  query projects the key set; the "pick a deterministic
  representative" job is :func:`rayxt.dedup.dedup_keep_first`);
* **scale shape** — per-shard memory is |distinct keys|/N; shard count
  scales with the keyspace, actor calls batch ~batch_size/N keys each;
  the big rows never shuffle (contrast: exact dedup's one exchange);
* **fault caveat** — actor state is lost on actor death; a production
  ingest would checkpoint shards (the manifest pattern in
  :mod:`rayxt.manifest`) — documented, not implemented here.

The in-batch pre-dedup keeps a batch's FIRST occurrence of a key
(stable), so a single-partition stream yields the same rows as a
sequential scan.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

__all__ = ["StreamingDeduper", "streaming_dedup"]


def _stable_shard(key, n: int) -> int:
    """Process-independent shard routing (Python ``hash`` of strings is
    randomized per interpreter — every map worker must agree)."""
    return zlib.crc32(repr(key).encode()) % n


def _shard_actor():
    """Define the actor class lazily so importing this module does not
    require an initialized Ray runtime."""
    import ray

    @ray.remote(num_cpus=0)
    class _SeenShard:
        """One shard of the distributed seen-set."""

        def __init__(self):
            self._seen: set = set()

        def filter_new(self, keys: list) -> list:
            """-> bool per key: True the FIRST time a key is offered
            to this shard (and it is recorded), False afterwards."""
            seen = self._seen
            out = []
            for k in keys:
                if k in seen:
                    out.append(False)
                else:
                    seen.add(k)
                    out.append(True)
            return out

        def size(self) -> int:
            return len(self._seen)

    return _SeenShard


class StreamingDeduper:
    """Sharded first-seen index + the batch filter that consults it."""

    def __init__(self, key_col: str, n_shards: int = 8):
        import ray

        shard_cls = _shard_actor()
        self.key_col = key_col
        self.n_shards = n_shards
        self.shards = [shard_cls.remote() for _ in range(n_shards)]
        self._ray = ray

    def filter_batch(self, t: pa.Table) -> pa.Table:
        import pandas as pd

        key_col = self.key_col
        # stable in-batch pre-dedup: keep each key's first row
        keep_first = ~pd.Index(t[key_col].to_pandas()).duplicated(
            keep="first")
        t = t.filter(pa.array(keep_first))
        if t.num_rows == 0:
            return t
        uniq = t[key_col].to_pylist()
        shard_of = [_stable_shard(k, self.n_shards) for k in uniq]
        per_shard: dict[int, list[int]] = {}
        for pos, s in enumerate(shard_of):
            per_shard.setdefault(s, []).append(pos)
        mask = np.zeros(len(uniq), dtype=bool)
        futures = {
            s: self.shards[s].filter_new.remote([uniq[p] for p in poss])
            for s, poss in per_shard.items()
        }
        for s, fut in futures.items():
            for p, is_new in zip(per_shard[s], self._ray.get(fut)):
                mask[p] = is_new
        return t.filter(pa.array(mask))

    def total_seen(self) -> int:
        return sum(self._ray.get([s.size.remote() for s in self.shards]))


def streaming_dedup(ds, *, key_col: str, n_shards: int = 8,
                    batch_size: int = 4096):
    """First-seen streaming dedup of ``ds`` on ``key_col`` via a
    sharded actor index (module docstring for semantics/caveats).
    Returns ``(deduped_dataset, deduper)`` — the deduper exposes
    ``total_seen()`` after consumption."""
    dd = StreamingDeduper(key_col, n_shards)

    def keep_new(t: pa.Table) -> pa.Table:
        return dd.filter_batch(t)

    return ds.map_batches(keep_new, batch_format="pyarrow",
                          batch_size=batch_size), dd
