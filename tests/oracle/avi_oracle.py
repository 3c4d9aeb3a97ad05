"""Independent MJPEG-AVI demux oracle (conformance).

A deliberately different architecture from ``rayxt.multimodal``'s
hierarchical RIFF walker: this one never parses the hdrl headers at
all.  It finds the ``movi`` form tag by byte search and then does a
FLAT sequential (fourcc, size) scan from there, collecting every
``..dc``/``..db`` chunk as a frame; image dimensions come from the
first frame's OWN JPEG SOF header (via the independent JPEG oracle)
instead of the container's BITMAPINFOHEADER.  Frames are decoded with
``tests.oracle.jpeg_oracle.oracle_decode_jpeg`` — also independent of
the engine's decoder.
"""

from __future__ import annotations

import struct

import numpy as np

from tests.oracle.jpeg_oracle import oracle_decode_jpeg


def oracle_avi_frames(payload: bytes) -> list:
    """Flat scan from the movi marker -> list of raw JPEG frame bytes."""
    start = payload.find(b"movi")
    if start < 0:
        raise ValueError("no movi list")
    pos = start + 4
    frames = []
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + length]
        if cid[2:4] in (b"dc", b"db"):
            frames.append(body)
        pos += 8 + length + (length & 1)
    return frames


def oracle_avi_decode(payload: bytes):
    """-> (w, h, n_frames, mean over all decoded frame bytes).

    Dims from the first decoded frame's shape (JPEG SOF), never from
    the AVI header the engine reads.
    """
    frames = oracle_avi_frames(payload)
    if not frames:
        raise ValueError("AVI has no frames")
    arrs = [oracle_decode_jpeg(f) for f in frames]
    h, w = arrs[0].shape[0], arrs[0].shape[1]
    flat = np.concatenate([a.ravel().astype(np.float64) for a in arrs])
    return w, h, len(arrs), float(flat.mean())
