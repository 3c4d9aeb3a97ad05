"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
(``kind``, declared dims); decode / feature-extract / resize /
frame-sample run as actor-pool ``map_batches`` stages with small batch
sizes (payloads are large — batch bytes, not batch rows, bound memory).

The image/audio codec libraries are NOT available in this environment,
so the decode step is STUBBED: ``_decode_payload`` raises
``NotImplementedError`` for real formats and handles only the
deterministic synthetic ``RAYX`` container (fixtures/gen_media.py).
The Ray-side plumbing — schema, actor signature, batch sizing, output
layout — is real and tested; swapping in PIL/ffmpeg is a one-function
change per stage.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

__all__ = ["MEDIA_SCHEMA", "DecodeMedia", "ResizeImages", "SampleFrames",
            "decode_media", "resize_images", "sample_frames"]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),
        ("declared_w", pa.int32()),
        ("declared_h", pa.int32()),
        ("declared_frames", pa.int32()),
    ]
)

_MAGIC = b"RAYX"


def _decode_payload(payload: bytes):
    """Decode one payload -> (w, h, frames, mean_value).

    Real formats (PNG/JPEG/WAV/MP4) require codec libraries absent from
    this environment -> NotImplementedError (STUB, by design).  The
    synthetic container is ``RAYX | w:i32 | h:i32 | frames:i32 | raw
    uint8 samples``.
    """
    if payload is None or len(payload) < 16:
        raise ValueError("short payload")
    if not payload.startswith(_MAGIC):
        raise NotImplementedError(
            "real media codecs unavailable in this environment (stub)"
        )
    w, h, frames = struct.unpack("<iii", payload[4:16])
    body = np.frombuffer(payload, dtype=np.uint8, offset=16)
    return w, h, frames, float(body.mean()) if body.size else 0.0


class DecodeMedia:
    """Actor-pool stage: payload -> (dims, frames, mean, status).

    ``__init__`` is where a real implementation loads codecs/models once
    per actor; the stub only fixes the output schema.
    """

    def __init__(self):
        self.decoder = _decode_payload  # codec handle lives per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        w_out, h_out, f_out, mean_out, status = [], [], [], [], []
        for payload in batch["payload"].to_pylist():
            try:
                w, h, frames, mean = self.decoder(payload)
                w_out.append(w)
                h_out.append(h)
                f_out.append(frames)
                mean_out.append(round(mean, 6))
                status.append("ok")
            except NotImplementedError:
                w_out.append(0); h_out.append(0); f_out.append(0)
                mean_out.append(0.0); status.append("unsupported_codec")
            except Exception:
                w_out.append(0); h_out.append(0); f_out.append(0)
                mean_out.append(0.0); status.append("error")
        out = batch.drop_columns(["payload"])  # heavy bytes end here
        out = out.append_column("width", pa.array(w_out, pa.int32()))
        out = out.append_column("height", pa.array(h_out, pa.int32()))
        out = out.append_column("n_frames", pa.array(f_out, pa.int32()))
        out = out.append_column("mean_value", pa.array(mean_out, pa.float64()))
        return out.append_column("decode_status", pa.array(status, pa.string()))


class ResizeImages:
    """Actor-pool stage: nearest-neighbor resize of synthetic frames.

    Demonstrates a payload->payload stage (bytes in, bytes out) with the
    same RAYX container; real image resize would swap the kernel."""

    def __init__(self, target_w: int = 32, target_h: int = 32):
        self.tw, self.th = target_w, target_h

    def _resize(self, payload: bytes) -> bytes:
        w, h, frames, _ = _decode_payload(payload)
        body = np.frombuffer(payload, dtype=np.uint8, offset=16)
        frame_px = w * h
        out_frames = []
        for f in range(frames):
            frame = body[f * frame_px:(f + 1) * frame_px].reshape(h, w)
            yi = (np.arange(self.th) * h // self.th)
            xi = (np.arange(self.tw) * w // self.tw)
            out_frames.append(frame[np.ix_(yi, xi)].ravel())
        header = _MAGIC + struct.pack("<iii", self.tw, self.th, frames)
        return header + np.concatenate(out_frames).tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = []
        for payload in batch["payload"].to_pylist():
            try:
                payloads.append(self._resize(payload))
            except (NotImplementedError, ValueError):
                payloads.append(payload)
        return batch.set_column(
            batch.column_names.index("payload"), "payload",
            pa.array(payloads, pa.binary()),
        )


class SampleFrames:
    """Actor-pool stage: keep every ``stride``-th frame of video payloads."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = []
        for payload, kind in zip(batch["payload"].to_pylist(),
                                 batch["kind"].to_pylist()):
            if kind != "video":
                payloads.append(payload)
                continue
            try:
                w, h, frames, _ = _decode_payload(payload)
                body = np.frombuffer(payload, dtype=np.uint8, offset=16)
                frame_px = w * h
                kept = [
                    body[f * frame_px:(f + 1) * frame_px]
                    for f in range(0, frames, self.stride)
                ]
                header = _MAGIC + struct.pack("<iii", w, h, len(kept))
                payloads.append(header + np.concatenate(kept).tobytes())
            except (NotImplementedError, ValueError):
                payloads.append(payload)
        return batch.set_column(
            batch.column_names.index("payload"), "payload",
            pa.array(payloads, pa.binary()),
        )


def decode_media(ds, *, batch_size: int = 16, concurrency=(1, 4)):
    """Small batch_size: payload bytes, not rows, bound actor memory."""
    return ds.map_batches(
        DecodeMedia, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


def resize_images(ds, target_w=32, target_h=32, *, batch_size: int = 16,
                  concurrency=(1, 4)):
    return ds.map_batches(
        ResizeImages, fn_constructor_kwargs=dict(target_w=target_w, target_h=target_h),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


def sample_frames(ds, stride=2, *, batch_size: int = 16, concurrency=(1, 4)):
    return ds.map_batches(
        SampleFrames, fn_constructor_kwargs=dict(stride=stride),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )
