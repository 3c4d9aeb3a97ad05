"""Shared block-level building blocks for distributed operators.

Each of these exists because multiple operators independently needed
the same fragile workaround; fixing a Ray/Arrow behavior change must
happen HERE, once.

* :func:`ensure_typed` — Ray's hash aggregate emits SCHEMA-LESS blocks
  for empty partitions; any downstream acero join/filter needs every
  block typed or it raises "No match ... FieldRef.Name(...)".
* :func:`sorted_membership` — membership mask of values against a
  broadcast SORTED array (the ``ray.put`` + per-batch ``searchsorted``
  anti/semi-filter shape), with the end-of-array clamp done correctly.
* :func:`crc_bucket` — deterministic string -> bucket assignment
  (crc32 % n), the hash-bucketed reassembly / partition-key pattern.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

__all__ = ["ensure_typed", "typed_empty", "sorted_membership", "crc_bucket"]


def typed_empty(schema_map: dict) -> pa.Table:
    """A zero-row table with explicit column types."""
    return pa.table({k: pa.array([], t) for k, t in schema_map.items()})


def ensure_typed(t: pa.Table, schema_map: dict) -> pa.Table:
    """Re-type a schema-less empty aggregate block; non-empty (or
    already-typed empty) blocks pass through untouched."""
    if t.num_rows == 0 and next(iter(schema_map)) not in t.column_names:
        return typed_empty(schema_map)
    return t


def sorted_membership(sorted_arr: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Boolean mask: which ``values`` are present in ``sorted_arr``
    (ascending, duplicate-free).  Safe on empty arrays and on values
    beyond the last element (searchsorted's n index is clamped)."""
    if len(sorted_arr) == 0:
        return np.zeros(len(values), dtype=bool)
    pos = np.searchsorted(sorted_arr, values)
    pos[pos >= len(sorted_arr)] = 0
    return sorted_arr[pos] == values


def crc_bucket(strings, n: int) -> np.ndarray:
    """Deterministic crc32(str) % n bucket ids as int64."""
    it = (zlib.crc32(str(s).encode("utf-8")) % n for s in strings)
    return np.fromiter(it, dtype=np.int64)
