"""Deterministic synthetic media table (multimodal fixtures).

Schema = rayxt.multimodal.MEDIA_SCHEMA.  Payload formats per kind:

* image -> real PNG (8-bit grey/RGB/RGBA, rows cycling through all
  five scanline filters so the decoder's filter paths are exercised);
* audio -> real RIFF/WAVE PCM16 (1-2 channels);
* video -> the RAYX raw-frame container (no stdlib-expressible real
  video codec; frame sampling operates on raw frames).

Everything derives from the row index — no randomness, regenerates
byte-identically anywhere.  ``media_ground_truth(i)`` returns the
expected decode stats computed from the SOURCE arrays before encoding,
so golden generation never runs any decoder: the engine must invert
the encoding to match (an encode/decode round-trip oracle).
"""

from __future__ import annotations

import hashlib
import os
import struct
import sys
import zlib

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_COLOURS = (0, 2, 6)  # grey, RGB, RGBA
_PNG_CH = {0: 1, 2: 3, 6: 4}


def _body(i: int, n: int) -> np.ndarray:
    seed = _h(i, "px")
    return ((np.arange(n, dtype=np.uint64) * np.uint64(2654435761)
             + np.uint64(seed)) >> np.uint64(24)).astype(np.uint8)


def _png_encode(arr: np.ndarray, colour: int) -> bytes:
    """Minimal spec-true PNG writer; row y uses filter y % 5."""
    h, stride = arr.shape
    ch = _PNG_CH[colour]
    flat = arr.astype(np.int64)
    zeros = np.zeros(ch, dtype=np.int64)
    lines = []
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int64)
        a = np.concatenate([zeros, cur[:-ch]]) if stride > ch else \
            np.zeros(stride, dtype=np.int64)
        c = np.concatenate([zeros, prev[:-ch]]) if stride > ch else \
            np.zeros(stride, dtype=np.int64)
        f = y % 5
        if f == 0:
            out = cur
        elif f == 1:
            out = cur - a
        elif f == 2:
            out = cur - prev
        elif f == 3:
            out = cur - (a + prev) // 2
        else:  # Paeth
            p = a + prev - c
            pa_, pb, pc_ = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), a,
                            np.where(pb <= pc_, prev, c))
            out = cur - pred
        lines.append(bytes([f]) + (out & 0xFF).astype(np.uint8).tobytes())
    comp = zlib.compress(b"".join(lines))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    w = stride // ch
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colour, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp)
            + chunk(b"IEND", b""))


def _wav_encode(samples: np.ndarray, channels: int, sr: int = 8000) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, sr, sr * channels * 2,
                      channels * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _image_spec(i: int):
    w = 8 + _h(i, "w") % 40
    h = 8 + _h(i, "h") % 40
    colour = _PNG_COLOURS[(i // 3) % 3]
    return w, h, colour


def _audio_spec(i: int):
    n = 1000 + _h(i, "n") % 4000  # samples per channel
    channels = 1 + (i // 3) % 2
    return n, channels


def _audio_samples(i: int, n: int, channels: int) -> np.ndarray:
    return (_body(i, n * channels).astype(np.int64) * 257 - 32768) \
        .clip(-32768, 32767).astype(np.int16)


def media_row(i: int) -> dict:
    kind = ("image", "audio", "video")[i % 3]
    if kind == "image":
        w, h, colour = _image_spec(i)
        arr = _body(i, h * w * _PNG_CH[colour]).reshape(h, w * _PNG_CH[colour])
        payload = _png_encode(arr, colour)
        frames = 1
    elif kind == "audio":
        n, channels = _audio_spec(i)
        payload = _wav_encode(_audio_samples(i, n, channels), channels)
        w, h, frames = n, channels, 1
    else:
        w, h, frames = 16 + _h(i, "w") % 16, 16 + _h(i, "h") % 16, 4 + _h(i, "f") % 12
        body = _body(i, w * h * frames)
        payload = _MAGIC + struct.pack("<iii", w, h, frames) + body.tobytes()
    return {
        "media_id": i,
        "kind": kind,
        "payload": payload,
        "declared_w": w,
        "declared_h": h,
        "declared_frames": frames,
    }


def media_ground_truth(i: int) -> dict:
    """Expected decode output, computed from the SOURCE arrays (never
    by decoding) — the independent side of the round-trip oracle."""
    kind = ("image", "audio", "video")[i % 3]
    if kind == "image":
        w, h, colour = _image_spec(i)
        arr = _body(i, h * w * _PNG_CH[colour])
        return {"width": w, "height": h, "n_frames": 1,
                "mean_value": round(float(arr.mean()), 6),
                "decode_status": "ok"}
    if kind == "audio":
        n, channels = _audio_spec(i)
        samples = _audio_samples(i, n, channels)
        return {"width": n, "height": channels, "n_frames": 1,
                "mean_value": round(float(samples.mean()), 6),
                "decode_status": "ok"}
    w, h, frames = 16 + _h(i, "w") % 16, 16 + _h(i, "h") % 16, 4 + _h(i, "f") % 12
    body = _body(i, w * h * frames)
    return {"width": w, "height": h, "n_frames": frames,
            "mean_value": round(float(body.mean()), 6),
            "decode_status": "ok"}


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
