"""Independent MJPEG-MP4 demux oracle (conformance).

A deliberately different architecture from ``rayxt.multimodal``'s
ISO-BMFF box walker: this one never parses moov at all.  It finds the
``mdat`` box by byte search and splits the concatenated JPEG streams
by scanning for SOI/EOI marker pairs (valid for these fixtures: the
entropy coder byte-stuffs FF, and the q85 tables contain no FF bytes,
so FFD9 appears only as the end-of-image marker).  Image dimensions
come from the first frame's OWN JPEG SOF header via the independent
JPEG oracle, never from the container's tkhd/stsd.
"""

from __future__ import annotations

import struct

import numpy as np

from tests.oracle.jpeg_oracle import oracle_decode_jpeg


def oracle_mp4_frames(payload: bytes) -> list:
    """Flat scan: mdat body -> list of raw JPEG frame bytes."""
    at = payload.find(b"mdat")
    if at < 4:
        raise ValueError("no mdat box")
    (size,) = struct.unpack(">I", payload[at - 4:at])
    body = payload[at + 4:at - 4 + size]
    frames = []
    p = 0
    while p + 4 <= len(body):
        if body[p:p + 2] != b"\xff\xd8":
            raise ValueError("oracle: mdat not at a JPEG SOI")
        end = body.find(b"\xff\xd9", p)
        if end < 0:
            raise ValueError("oracle: unterminated JPEG frame")
        frames.append(body[p:end + 2])
        p = end + 2
    return frames


def oracle_mp4_decode(payload: bytes):
    """-> (w, h, n_frames, mean over all decoded frame bytes)."""
    frames = oracle_mp4_frames(payload)
    if not frames:
        raise ValueError("MP4 has no frames")
    arrs = [oracle_decode_jpeg(f) for f in frames]
    h, w = arrs[0].shape[0], arrs[0].shape[1]
    flat = np.concatenate([a.ravel().astype(np.float64) for a in arrs])
    return w, h, len(arrs), float(flat.mean())
