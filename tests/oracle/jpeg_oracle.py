"""Independent JPEG decoder (conformance oracle).

A from-scratch restatement of ITU-T T.81 decoding with its OWN parsing
(pre-destuffed bit list, string-free canonical huffman walk, plain
Python list coefficient storage) — independent of
``rayxt.multimodal``'s decoder.  The IDCT basis matrix, nearest
upsampling and the JFIF inverse color constants are SHARED SPEC (same
float64 expressions in the same order) so a correct engine decoder
matches bit-for-bit; everything else is re-derived here.

Supports what ``fixtures/gen_media`` emits: baseline SOF0 (8-bit, up
to 4 components, optional DRI/RSTn restart intervals — the scan splits
into independent restart segments, each with fresh byte alignment and
DC predictors) and progressive SOF2 (Annex G: interleaved or
single-component DC scans with successive approximation, EOB-run AC
scans, DC/AC refinement passes).
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
    progressive = False
    prog_scans = []
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
        elif marker in (0xC0, 0xC2):
            progressive = marker == 0xC2
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
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
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
            if progressive:
                prog_scans.append((scan_comps, ss, se, ahal >> 4,
                                   ahal & 0xF, scan, dict(dc_tabs),
                                   dict(ac_tabs), restart_interval))
                i = j
                continue
            break
        i += 2 + ln
    assert width is not None and (scan is not None or prog_scans)
    if progressive:
        return _oracle_progressive(prog_scans, comps, qts, width, height)

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


def _oracle_progressive(prog_scans, comps, qts, width, height):
    """Progressive (SOF2) decode, oracle-style: plain Python list
    coefficient storage in zigzag order, pre-destuffed segment lists,
    nested-dict huffman walk.  Algorithms restate T.81 Annex G
    directly; only IDCT/upsample/color are shared spec."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcx = (width + 8 * hmax - 1) // (8 * hmax)
    mcy = (height + 8 * vmax - 1) // (8 * vmax)
    by_id = {c[0]: c for c in comps}
    coefs = {}
    nblk = {}
    for cid, hs, vs, _tq in comps:
        rows, cols = mcy * vs, mcx * hs
        coefs[cid] = [[[0] * 64 for _ in range(cols)] for _ in range(rows)]
        cw = (width * hs + hmax - 1) // hmax
        ch = (height * vs + vmax - 1) // vmax
        nblk[cid] = ((cw + 7) // 8, (ch + 7) // 8)

    for (scomps, ss, se, ah, al, segments, dc_tabs, ac_tabs,
         ri) in prog_scans:
        seg_idx = 0
        bits = _Bits(segments[seg_idx])
        if ss == 0 and len(scomps) > 1:  # interleaved DC scan
            pred = {cid: 0 for cid, _, _ in scomps}
            count = 0
            for my in range(mcy):
                for mx in range(mcx):
                    if ri and count and count % ri == 0:
                        seg_idx += 1
                        bits = _Bits(segments[seg_idx])
                        pred = {cid: 0 for cid in pred}
                    count += 1
                    for cid, dct, _act in scomps:
                        _, hs, vs, _tq = by_id[cid]
                        for by in range(vs):
                            for bx in range(hs):
                                blk = coefs[cid][my * vs + by][mx * hs + bx]
                                _o_dc_unit(bits, blk, dc_tabs.get(dct),
                                           pred, cid, ah, al)
        elif ss == 0:  # single-component DC scan
            cid, dct, _act = scomps[0]
            pred = {cid: 0}
            bw, bh = nblk[cid]
            count = 0
            for iy in range(bh):
                for ix in range(bw):
                    if ri and count and count % ri == 0:
                        seg_idx += 1
                        bits = _Bits(segments[seg_idx])
                        pred = {cid: 0}
                    count += 1
                    _o_dc_unit(bits, coefs[cid][iy][ix],
                               dc_tabs.get(dct), pred, cid, ah, al)
        else:  # AC scan (single component per T.81)
            cid, _dct, act = scomps[0]
            tab = ac_tabs[act]
            bw, bh = nblk[cid]
            state = {"eob": 0}
            count = 0
            for iy in range(bh):
                for ix in range(bw):
                    if ri and count and count % ri == 0:
                        seg_idx += 1
                        bits = _Bits(segments[seg_idx])
                        state["eob"] = 0
                    count += 1
                    blk = coefs[cid][iy][ix]
                    if ah == 0:
                        _o_ac_first(bits, blk, tab, ss, se, al, state)
                    else:
                        _o_ac_refine(bits, blk, tab, ss, se, al, state)

    m = _idct_matrix()
    planes = {}
    for cid, hs, vs, tq in comps:
        rows = len(coefs[cid])
        cols = len(coefs[cid][0])
        plane = np.zeros((rows * 8, cols * 8), dtype=np.float64)
        for iy in range(rows):
            for ix in range(cols):
                zz = coefs[cid][iy][ix]
                deq = np.zeros(64, dtype=np.int64)
                for k in range(64):
                    deq[_ZZ[k]] = zz[k] * qts[tq][_ZZ[k]]
                block = deq.reshape(8, 8).astype(np.float64)
                plane[iy * 8:iy * 8 + 8, ix * 8:ix * 8 + 8] = \
                    m.T @ block @ m + 128.0
        planes[cid] = plane

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


def _o_dc_unit(bits, blk, dc_tab, pred, cid, ah, al):
    if ah == 0:
        s = _read_huff(bits, dc_tab)
        pred[cid] += _extend(bits.take_n(s), s)
        blk[0] = pred[cid] * (1 << al) if pred[cid] >= 0 else \
            -((-pred[cid]) * (1 << al))
    else:
        if bits.take():
            blk[0] |= 1 << al


def _o_ac_first(bits, blk, tab, ss, se, al, state):
    if state["eob"] > 0:
        state["eob"] -= 1
        return
    k = ss
    while k <= se:
        rs = _read_huff(bits, tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:
                state["eob"] = (1 << r) - 1
                if r:
                    state["eob"] += bits.take_n(r)
                return
            k += 16
        else:
            k += r
            assert k <= se, "oracle: AC run overflow"
            blk[k] = _extend(bits.take_n(s), s) * (1 << al)
            k += 1


def _o_ac_refine(bits, blk, tab, ss, se, al, state):
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if state["eob"] == 0:
        while k <= se:
            rs = _read_huff(bits, tab)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s:
                assert s == 1, "oracle: bad refinement size"
                val = p1 if bits.take() else m1
            elif r != 15:
                state["eob"] = 1 << r
                if r:
                    state["eob"] += bits.take_n(r)
                break
            while k <= se:
                if blk[k] != 0:
                    if bits.take() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if state["eob"] > 0:
        while k <= se:
            if blk[k] != 0:
                if bits.take() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        state["eob"] -= 1
