"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
(``kind``, declared dims); decode / feature-extract / resize /
frame-sample run as actor-pool ``map_batches`` stages with small batch
sizes (payloads are large — batch bytes, not batch rows, bound memory).

Codecs (no PIL/ffmpeg in this environment — these are real, from
format specs, stdlib+numpy only):

* **PNG** (`_decode_png`): 8-bit greyscale / RGB / RGBA,
  non-interlaced — signature, chunk walk, concatenated-IDAT zlib
  inflate, scanline unfiltering (None/Sub/Up/Average/Paeth);
* **WAV** (`_decode_wav`): RIFF PCM16, any channel count;
* **RAYX**: the deterministic synthetic container used for video
  fixtures (raw frames), kept as the frame-sampling substrate.

Anything else (JPEG, MP4, …) needs codec libraries absent from this
image and raises ``NotImplementedError`` -> ``decode_status
unsupported_codec``.  Heavy formats would slot into the same
actor-pool stage (decoders are per-actor state).
"""

from __future__ import annotations

import struct
import zlib

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
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # greyscale, RGB, RGBA


def _decode_png_array(payload: bytes):
    """PNG -> (pixels as (h, w*ch) uint8, w, h, ch, colour type).

    Supports the web-common subset: bit depth 8, colour types 0/2/6,
    interlace 0.  Scanline filters implemented per the spec; Sub /
    Paeth are sequential along the row, vectorized across rows where
    the spec allows (Up is a pure row-to-row add).
    """
    pos = len(_PNG_SIG)
    w = h = None
    channels = 0
    idat = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, colour, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or colour not in _PNG_CHANNELS or interlace != 0:
                raise NotImplementedError(
                    f"PNG subset: depth={depth} colour={colour} "
                    f"interlace={interlace}"
                )
            channels = _PNG_CHANNELS[colour]
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * channels
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int64)
    recon = np.zeros((h, stride), dtype=np.int64)
    for y in range(h):
        f = filters[y]
        cur = rows[y]
        prev = recon[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if f == 0:
            recon[y] = cur
        elif f == 2:  # Up
            recon[y] = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            line = recon[y]
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                b = prev[x]
                if f == 1:
                    v = cur[x] + a
                elif f == 3:
                    v = cur[x] + (a + b) // 2
                else:
                    c = prev[x - channels] if x >= channels else 0
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else \
                        (b if pb <= pc_ else c)
                    v = cur[x] + pred
                line[x] = v & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
    return recon.astype(np.uint8), int(w), int(h), channels, colour


def _encode_png(arr: np.ndarray, colour: int) -> bytes:
    """Minimal filter-0 PNG writer (arr: (h, w*ch) uint8)."""
    h, stride = arr.shape
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    comp = zlib.compress(raw)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    w = stride // _PNG_CHANNELS[colour]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colour, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp)
            + chunk(b"IEND", b""))


def _decode_png(payload: bytes):
    """PNG -> (w, h, 1, mean of decoded channel bytes)."""
    recon, w, h, _ch, _colour = _decode_png_array(payload)
    return w, h, 1, float(recon.mean()) if recon.size else 0.0


def _decode_wav(payload: bytes):
    """RIFF/WAVE PCM16 -> (samples_per_channel, channels, 1, sample mean)."""
    if payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE file")
    pos = 12
    channels = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 8][:4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)
        if cid == b"fmt ":
            fmt, channels = struct.unpack("<HH", body[:4])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or bits != 16:
                raise NotImplementedError(f"WAV subset: fmt={fmt} bits={bits}")
        elif cid == b"data":
            data = body
    if channels is None or data is None:
        raise ValueError("WAV missing fmt/data")
    samples = np.frombuffer(data, dtype="<i2")
    return (len(samples) // channels, int(channels), 1,
            float(samples.mean()) if samples.size else 0.0)


def _decode_payload(payload: bytes):
    """Decode one payload -> (w, h, frames, mean_value).

    Dispatches on magic bytes: PNG and WAV are real decoders (module
    docstring); RAYX is the synthetic raw-frame container; any other
    format needs codec libraries absent from this image.
    """
    if payload is None or len(payload) < 16:
        raise ValueError("short payload")
    if payload.startswith(_PNG_SIG):
        return _decode_png(payload)
    if payload.startswith(b"RIFF"):
        return _decode_wav(payload)
    if not payload.startswith(_MAGIC):
        raise NotImplementedError(
            "codec libraries for this format are unavailable in this "
            "environment (PNG/WAV/RAYX supported)"
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
    """Actor-pool stage: nearest-neighbor resize, payload -> payload.

    Real PNGs are decoded, resized per channel and re-encoded as PNG;
    RAYX raw-frame payloads are resized frame by frame.  Audio (and any
    unsupported format) passes through unchanged."""

    def __init__(self, target_w: int = 32, target_h: int = 32):
        self.tw, self.th = target_w, target_h

    def _resize(self, payload: bytes) -> bytes:
        if payload.startswith(_PNG_SIG):
            arr, w, h, ch, colour = _decode_png_array(payload)
            img = arr.reshape(h, w, ch)
            yi = np.arange(self.th) * h // self.th
            xi = np.arange(self.tw) * w // self.tw
            out = img[np.ix_(yi, xi)].reshape(self.th, self.tw * ch)
            return _encode_png(out, colour)
        if not payload.startswith(_MAGIC):
            raise NotImplementedError("resize supports PNG and RAYX payloads")
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
