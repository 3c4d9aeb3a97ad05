"""Independent GIF decoder (conformance oracle).

A from-scratch restatement of the GIF89a specification with its OWN
architecture — independent of ``rayxt.multimodal._decode_gif``:

* the LZW bit stream is exploded ONCE into a flat bit array
  (``np.unpackbits`` with ``bitorder='little'``) and codes are read by
  slicing + dot-product against powers of two, instead of the engine's
  incremental byte accumulator;
* the code table stores (prefix_code, tail_byte) pairs and entries are
  materialized by walking the prefix chain backwards, instead of the
  engine's table of concrete byte strings;
* container parsing uses a cursor class with explicit ``take``/``u16``
  reads, instead of struct unpacking at computed offsets.

Only the published spec is shared: code widths grow when the decoder's
table reaches ``2^width - 1`` entries (it lags the encoder's additions
by one), CLEAR resets, EOI stops, the first code after CLEAR must be a
literal, and the KwKwK case appends ``prev + prev[0]``.
"""

from __future__ import annotations

import numpy as np


class _Cur:
    def __init__(self, data: bytes):
        self.d = data
        self.p = 0

    def take(self, n: int) -> bytes:
        b = self.d[self.p:self.p + n]
        if len(b) != n:
            raise ValueError("GIF truncated")
        self.p += n
        return b

    def u8(self) -> int:
        return self.take(1)[0]

    def u16(self) -> int:
        b = self.take(2)
        return b[0] | (b[1] << 8)

    def subblocks(self) -> bytes:
        parts = []
        while True:
            n = self.u8()
            if n == 0:
                return b"".join(parts)
            parts.append(self.take(n))


def _lzw(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(data, np.uint8),
                         bitorder="little")
    clear = 1 << min_code
    eoi = clear + 1
    out = np.empty(n_pixels, np.uint8)
    filled = 0
    bp = 0

    def materialize(code: int, prefix, tail) -> bytes:
        rev = []
        while code >= clear + 2:
            rev.append(tail[code])
            code = prefix[code]
        rev.append(code)
        return bytes(rev[::-1])

    prefix: dict = {}
    tail: dict = {}
    nxt = clear + 2
    width = min_code + 1
    prev_code = None
    while filled < n_pixels:
        if bp + width > len(bits):
            raise ValueError("LZW bits exhausted")
        code = int(bits[bp:bp + width] @ (1 << np.arange(width,
                                                         dtype=np.int64)))
        bp += width
        if code == clear:
            prefix.clear()
            tail.clear()
            nxt = clear + 2
            width = min_code + 1
            prev_code = None
            continue
        if code == eoi:
            break
        if prev_code is None:
            if code >= clear:
                raise ValueError("first code not a literal")
            seq = bytes([code])
        elif code < nxt:
            seq = materialize(code, prefix, tail)
            if nxt < 4096:
                prefix[nxt] = prev_code
                tail[nxt] = seq[0]
                nxt += 1
        elif code == nxt:
            pseq = materialize(prev_code, prefix, tail)
            seq = pseq + pseq[:1]
            prefix[nxt] = prev_code
            tail[nxt] = pseq[0]
            nxt += 1
        else:
            raise ValueError("LZW code out of range")
        if prev_code is not None and width < 12 and \
                nxt == (1 << width) - 1:
            width += 1
        take = min(len(seq), n_pixels - filled)
        out[filled:filled + take] = np.frombuffer(seq[:take], np.uint8)
        filled += take
        prev_code = code
    if filled != n_pixels:
        raise ValueError("LZW pixel shortfall")
    return out


_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def oracle_decode_gif(payload: bytes):
    """-> (w, h, [frame (fh, fw, 3) uint8 RGB arrays])."""
    c = _Cur(payload)
    if c.take(6) not in (b"GIF87a", b"GIF89a"):
        raise ValueError("bad signature")
    w = c.u16()
    h = c.u16()
    packed = c.u8()
    c.take(2)  # background index + aspect
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(c.take(3 * n), np.uint8).reshape(n, 3)
    frames = []
    while True:
        blk = c.u8()
        if blk == 0x3B:
            break
        if blk == 0x21:
            c.u8()
            c.subblocks()
            continue
        if blk != 0x2C:
            raise ValueError(f"unexpected block 0x{blk:02x}")
        c.take(4)  # left, top
        fw = c.u16()
        fh = c.u16()
        ipk = c.u8()
        pal = gct
        if ipk & 0x80:
            n = 2 << (ipk & 7)
            pal = np.frombuffer(c.take(3 * n), np.uint8).reshape(n, 3)
        min_code = c.u8()
        idx = _lzw(c.subblocks(), min_code, fw * fh).reshape(fh, fw)
        if ipk & 0x40:
            dest = np.empty_like(idx)
            r = 0
            for start, step in _PASSES:
                for y in range(start, fh, step):
                    dest[y] = idx[r]
                    r += 1
            idx = dest
        frames.append(pal[idx])
    return w, h, frames


def oracle_gif_sample(payload: bytes, stride: int) -> bytes:
    """Container-level frame-sampling restatement (the engine policy in
    ``rayxt/multimodal.py::_gif_sample``, restated from the spec text
    with a different mechanism): first pass records every block's
    (kind, start, end) span via the cursor, a second pass groups each
    image with the extension run before it and keeps every
    ``stride``-th group plus the header prefix, trailing extensions and
    the trailer, concatenating the original byte spans verbatim."""
    c = _Cur(payload)
    if c.take(6) not in (b"GIF87a", b"GIF89a"):
        raise ValueError("bad signature")
    c.take(4)
    packed = c.u8()
    c.take(2)
    if packed & 0x80:
        c.take(3 * (2 << (packed & 7)))
    prefix_end = c.p
    spans = []  # (kind, start, end): kind in {"ext", "img", "trailer"}
    while True:
        start = c.p
        blk = c.u8()
        if blk == 0x3B:
            spans.append(("trailer", start, c.p))
            break
        if blk == 0x21:
            c.u8()
            c.subblocks()
            spans.append(("ext", start, c.p))
        elif blk == 0x2C:
            c.take(8)
            ipk = c.u8()
            if ipk & 0x80:
                c.take(3 * (2 << (ipk & 7)))
            c.u8()
            c.subblocks()
            spans.append(("img", start, c.p))
        else:
            raise ValueError(f"unexpected block 0x{blk:02x}")
    groups = []  # each: (has_image, [spans])
    run = []
    for s in spans:
        if s[0] == "ext":
            run.append(s)
        elif s[0] == "img":
            groups.append((True, run + [s]))
            run = []
        else:
            groups.append((False, run + [s]))  # trailing exts + trailer
    out = [payload[:prefix_end]]
    k = 0
    for has_image, members in groups:
        if has_image:
            if k % stride == 0:
                out.extend(payload[a:b] for _, a, b in members)
            k += 1
        else:
            out.extend(payload[a:b] for _, a, b in members)
    return b"".join(out)
