"""Deterministic synthetic media table (multimodal fixtures).

Schema = rayxt.multimodal.MEDIA_SCHEMA; payloads use the RAYX container
(magic | w | h | frames | uint8 samples) derived from the row index —
no randomness, regenerates byte-identically anywhere.
"""

from __future__ import annotations

import hashlib
import os
import struct
import sys

import numpy as np
import pyarrow as pa

try:
    from ray import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

_MAGIC = b"RAYX"


def _h(i: int, salt: str) -> int:
    return int.from_bytes(hashlib.sha256(f"{salt}:{i}".encode()).digest()[:8], "big")


def media_row(i: int) -> dict:
    kind = ("image", "audio", "video")[i % 3]
    if kind == "image":
        w, h, frames = 16 + _h(i, "w") % 48, 16 + _h(i, "h") % 48, 1
    elif kind == "audio":
        w, h, frames = 8000 + _h(i, "sr") % 8000, 1, 1  # samples x 1
    else:
        w, h, frames = 16 + _h(i, "w") % 16, 16 + _h(i, "h") % 16, 4 + _h(i, "f") % 12
    n = w * h * frames
    seed = _h(i, "px")
    body = ((np.arange(n, dtype=np.uint64) * np.uint64(2654435761)
             + np.uint64(seed)) >> np.uint64(24)).astype(np.uint8)
    payload = _MAGIC + struct.pack("<iii", w, h, frames) + body.tobytes()
    return {
        "media_id": i,
        "kind": kind,
        "payload": payload,
        "declared_w": w,
        "declared_h": h,
        "declared_frames": frames,
    }


def generate_media_table(n_rows: int) -> pa.Table:
    from rayxt.multimodal import MEDIA_SCHEMA

    rows = [media_row(i) for i in range(n_rows)]
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def ensure_media_parquet(path: str, n_rows: int) -> str:
    if os.path.exists(path):
        return path
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(generate_media_table(n_rows), tmp)
    os.rename(tmp, path)
    return path
