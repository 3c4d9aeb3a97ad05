"""Independent baseline-JPEG decoder (conformance oracle).

A from-scratch restatement of ITU-T T.81 baseline sequential decoding
with its OWN parsing (pre-destuffed bit list, string-free canonical
huffman walk) — independent of ``rayxt.multimodal``'s decoder.  The
IDCT basis matrix, nearest upsampling and the JFIF inverse color
constants are SHARED SPEC (same float64 expressions in the same order)
so a correct engine decoder matches bit-for-bit; everything else is
re-derived here.

Supports exactly what ``fixtures/gen_media._jpeg_encode`` emits:
baseline SOF0, 8-bit, up to 4 components, optional DRI/RSTn restart
intervals (the scan splits into independent restart segments, each with
fresh byte alignment and DC predictors).
"""

from __future__ import annotations

import struct

import numpy as np

_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]


def _idct_matrix() -> np.ndarray:
    # SHARED SPEC with rayxt.multimodal._jpeg_idct_matrix
    u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    m[0, :] = m[0, :] / np.sqrt(2.0)
    return m


def _build_huff(bits16, vals):
    """Canonical codes -> nested {length: {code: symbol}}."""
    out: dict[int, dict[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        out[length] = {}
        for _ in range(bits16[length - 1]):
            out[length][code] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _Bits:
    def __init__(self, scan_bytes: bytes):
        self.bits = []
        for b in scan_bytes:
            for j in range(7, -1, -1):
                self.bits.append((b >> j) & 1)
        self.i = 0

    def take(self) -> int:
        if self.i >= len(self.bits):
            return 0
        v = self.bits[self.i]
        self.i += 1
        return v

    def take_n(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.take()
        return v


def _read_huff(bits: _Bits, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.take()
        sym = table[length].get(code)
        if sym is not None:
            return sym
    raise ValueError("oracle: bad huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def oracle_decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode to (h, w, ncomp) uint8."""
    assert payload[:2] == b"\xff\xd8", "not a JPEG"
    i = 2
    qts: dict[int, list[int]] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[tuple[int, int, int, int]] = []
    width = height = None
    scan = None
    scan_comps = None
    restart_interval = 0
    while i + 4 <= len(payload):
        assert payload[i] == 0xFF
        marker = payload[i + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", payload[i + 2:i + 4])
        seg = payload[i + 4:i + 2 + ln]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                assert seg[p] >> 4 == 0, "oracle: 8-bit quant only"
                tid = seg[p] & 0xF
                zz = list(seg[p + 1:p + 65])
                tbl = [0] * 64
                for k in range(64):
                    tbl[_ZZ[k]] = zz[k]
                qts[tid] = tbl
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits16 = list(seg[p + 1:p + 17])
                n = sum(bits16)
                vals = list(seg[p + 17:p + 17 + n])
                (dc_tabs if cls == 0 else ac_tabs)[tid] = \
                    _build_huff(bits16, vals)
                p += 17 + n
        elif marker == 0xC0:
            prec, height, width, nc = struct.unpack(">BHHB", seg[:6])
            assert prec == 8
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            ns = seg[0]
            scan_comps = [(seg[1 + 2 * c], seg[2 + 2 * c] >> 4,
                           seg[2 + 2 * c] & 0xF) for c in range(ns)]
            # entropy data: from after the SOS header to the next real
            # marker, split into restart segments at RSTn (each segment
            # restarts byte-aligned with fresh DC predictors)
            j = i + 2 + ln
            segments = [bytearray()]
            while j < len(payload):
                b = payload[j]
                if b == 0xFF:
                    nxt = payload[j + 1] if j + 1 < len(payload) else 0xD9
                    if nxt == 0x00:
                        segments[-1].append(0xFF)
                        j += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        segments.append(bytearray())
                        j += 2
                        continue
                    break
                segments[-1].append(b)
                j += 1
            scan = [bytes(s) for s in segments]
            break
        i += 2 + ln
    assert width is not None and scan is not None

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcx = (width + 8 * hmax - 1) // (8 * hmax)
    mcy = (height + 8 * vmax - 1) // (8 * vmax)
    m = _idct_matrix()
    by_id = {c[0]: c for c in comps}
    planes = {cid: np.zeros((mcy * vs * 8, mcx * hs * 8), dtype=np.float64)
              for cid, hs, vs, _ in comps}

    seg_idx = 0
    bits = _Bits(scan[seg_idx])
    pred = {cid: 0 for cid, _, _ in scan_comps}
    mcu_count = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                seg_idx += 1
                bits = _Bits(scan[seg_idx])
                pred = {cid: 0 for cid, _, _ in scan_comps}
            mcu_count += 1
            for cid, dct, act in scan_comps:
                _, hs, vs, tq = by_id[cid]
                for by in range(vs):
                    for bx in range(hs):
                        zz = [0] * 64
                        s = _read_huff(bits, dc_tabs[dct])
                        pred[cid] += _extend(bits.take_n(s), s)
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _read_huff(bits, ac_tabs[act])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break
                            k += r
                            zz[k] = _extend(bits.take_n(s), s)
                            k += 1
                        deq = np.zeros(64, dtype=np.int64)
                        for k2 in range(64):
                            deq[_ZZ[k2]] = zz[k2] * qts[tq][_ZZ[k2]]
                        block = deq.reshape(8, 8).astype(np.float64)
                        pix = m.T @ block @ m + 128.0
                        planes[cid][(my * vs + by) * 8:(my * vs + by) * 8 + 8,
                                    (mx * hs + bx) * 8:(mx * hs + bx) * 8 + 8] \
                            = pix

    out = np.zeros((height, width, len(comps)), dtype=np.float64)
    for idx, (cid, hs, vs, _tq) in enumerate(comps):
        up = planes[cid].repeat(vmax // vs, axis=0).repeat(hmax // hs, axis=1)
        out[:, :, idx] = up[:height, :width]
    if len(comps) == 3:
        y_, cb, cr = out[:, :, 0], out[:, :, 1], out[:, :, 2]
        rgb = np.empty_like(out)
        rgb[:, :, 0] = y_ + 1.402 * (cr - 128.0)
        rgb[:, :, 1] = (y_ - 0.344136286 * (cb - 128.0)
                        - 0.714136286 * (cr - 128.0))
        rgb[:, :, 2] = y_ + 1.772 * (cb - 128.0)
        out = rgb
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
