"""Baseline JPEG (JFIF) decoder from the public spec (ITU-T T.81).

Decode-only, deliberately: a training-data pipeline needs to READ the
JPEGs in a crawled corpus (featurize, thumbnail, dedup) — emitting them is
a job for a real encoder library. Scope: baseline sequential DCT (SOF0/1)
AND progressive DCT (SOF2 — spectral selection + successive approximation
per T.81 Annex G, incl. EOB runs and AC refinement), 8-bit samples, 1 or 3
components, any JFIF sampling factors (4:4:4, 4:2:2, 4:2:0, ...), restart
intervals. Arithmetic coding, hierarchical and 12-bit modes raise cleanly.

Verification (tests/test_media_codecs.py): javax.imageio-encoded JPEGs —
an encoder we don't control, using libjpeg-style quantization, Huffman
optimization off, 4:2:0 subsampling — must decode to within IDCT-rounding
tolerance of the original pixels. T.81 Annex A allows small per-sample
differences between conforming IDCTs; we use an exact float64 basis-matrix
IDCT, so disagreement with imageio's fixed-point path stays within a few
code values.

Scale note: Python-serial per block; lives behind the same PixelCodec seam
as the PNG decoder — feature-extraction scale, not bulk transcoding.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["jpeg_decode"]

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# exact float IDCT basis: B[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_BASIS = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class _Huff:
    """Canonical Huffman table (T.81 Annex C): decode via per-length
    (mincode, maxcode, value-pointer) arrays."""

    def __init__(self, bits: list[int], vals: bytes):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1


class _BitReader:
    """Entropy-coded segment reader: FF00 byte-stuffing removed on the fly;
    an FF followed by a marker ends the segment (restart markers are
    consumed by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart — caller handles; pad with 1s
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
            else:  # end of scan; pad
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Skip to just past the next RSTn marker and reset bit state."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        self.pos = p + 2


def _decode_sym(br: _BitReader, tbl: _Huff) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        if tbl.maxcode[ln] >= 0 and code <= tbl.maxcode[ln] and code >= tbl.mincode[ln]:
            return tbl.vals[tbl.valptr[ln] + code - tbl.mincode[ln]]
    raise ValueError("JPEG corrupt: invalid Huffman code")


def _receive_extend(br: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = br.bits(s)
    if v < (1 << (s - 1)):  # negative branch (T.81 F.2.2.1 EXTEND)
        v -= (1 << s) - 1
    return v


def jpeg_decode(data: bytes) -> np.ndarray:
    """JPEG bytes → uint8 array (H, W, 3) RGB, or (H, W, 1) for grayscale."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("JPEG corrupt: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    restart_interval = 0
    frame = None
    prog_state = None
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG corrupt: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq:
                    raise ValueError("JPEG: 16-bit quant tables not supported")
                qt[tq] = np.frombuffer(body, np.uint8, 64, p).astype(np.int32)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                p += 1
                bits = list(body[p : p + 16])
                p += 16
                nv = sum(bits)
                tbl = _Huff(bits, body[p : p + nv])
                p += nv
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise ValueError("JPEG: only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("JPEG: only sequential/progressive DCT supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG corrupt: SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tables = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tables >> 4, tables & 0xF))
            if not frame["progressive"]:
                pos += seglen
                return _decode_scan(
                    data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah_al = body[3 + 2 * ns]
            if prog_state is None:
                prog_state = _prog_init(frame)
            pos = _prog_scan(
                data, pos + seglen, frame, scan, huff_dc, huff_ac,
                restart_interval, prog_state, ss, se, ah_al >> 4, ah_al & 0xF,
            )
            continue
        pos += seglen
    if frame is not None and frame.get("progressive") and prog_state is not None:
        return _prog_finish(frame, prog_state, qt)
    raise ValueError("JPEG corrupt: no scan data")


# ---------------------------------------------------------------------------
# Progressive mode (SOF2, T.81 Annex G): coefficients accumulate across
# scans — DC/AC first passes plus successive-approximation refinements —
# and the IDCT runs once at the end.
# ---------------------------------------------------------------------------


def _geometry(frame):
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    return h, w, comps, hmax, vmax, mcux, mcuy


def _prog_init(frame):
    _h, _w, comps, hmax, vmax, mcux, mcuy = _geometry(frame)
    return {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    }


def _prog_scan(
    data, pos, frame, scan, huff_dc, huff_ac, restart_interval,
    state, ss, se, ah, al,
):
    """Decode one progressive scan into ``state``; returns the position
    of the next marker after the entropy-coded segment."""
    h, w, comps, hmax, vmax, mcux, mcuy = _geometry(frame)
    br = _BitReader(data, pos)
    eob = [0]  # EOB-run carries across blocks within a scan

    if ss == 0:
        # DC scan (interleaved over the scan's components)
        if se != 0:
            raise ValueError("JPEG corrupt: DC scan with Se != 0")
        pred = {comp["id"]: 0 for comp, _, _ in scan}
        interleaved = len(scan) > 1
        if interleaved:
            units = mcux * mcuy
        else:
            comp = scan[0][0]
            bw = -(-(w * comp["h"]) // (8 * hmax))
            bh = -(-(h * comp["v"]) // (8 * vmax))
            units = bw * bh
        count = 0
        for uy in range(mcuy if interleaved else bh):
            for ux in range(mcux if interleaved else bw):
                if restart_interval and count and count % restart_interval == 0:
                    br.align_restart()
                    pred = {comp["id"]: 0 for comp, _, _ in scan}
                count += 1
                for comp, tdc, _tac in scan:
                    blocks = (
                        [
                            (uy * comp["v"] + by, ux * comp["h"] + bx)
                            for by in range(comp["v"])
                            for bx in range(comp["h"])
                        ]
                        if interleaved
                        else [(uy, ux)]
                    )
                    arr = state[comp["id"]]
                    for by, bx in blocks:
                        if ah == 0:
                            s = _decode_sym(br, huff_dc[tdc])
                            pred[comp["id"]] += _receive_extend(br, s)
                            arr[by, bx, 0] = pred[comp["id"]] << al
                        else:
                            if br.bit():
                                arr[by, bx, 0] |= 1 << al
    else:
        # AC scans are always single-component, non-interleaved
        if len(scan) != 1:
            raise ValueError("JPEG corrupt: interleaved AC scan")
        comp, _tdc, tac = scan[0]
        arr = state[comp["id"]]
        bw = -(-(w * comp["h"]) // (8 * hmax))
        bh = -(-(h * comp["v"]) // (8 * vmax))
        count = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and count and count % restart_interval == 0:
                    br.align_restart()
                    eob[0] = 0
                count += 1
                block = arr[by, bx]
                if ah == 0:
                    _ac_first(br, huff_ac[tac], block, ss, se, al, eob)
                else:
                    _ac_refine(br, huff_ac[tac], block, ss, se, al, eob)

    # skip to the next true marker (not a stuffed 00, not a restart)
    p = br.pos
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00 and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            return p
        p += 1
    return n


def _ac_first(br, tbl, block, ss, se, al, eob):
    if eob[0] > 0:
        eob[0] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_sym(br, tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eob[0] = (1 << r) - 1
            if r:
                eob[0] += br.bits(r)
            return
        k += r
        if k > se:
            raise ValueError("JPEG corrupt: AC index overflow")
        block[k] = _receive_extend(br, s) << al
        k += 1


def _ac_refine(br, tbl, block, ss, se, al, eob):
    """Successive-approximation AC refinement (T.81 G.1.2.3 / the
    standard decode_mcu_AC_refine structure): new coefficients appear
    with magnitude 1<<al; every nonzero coefficient passed on the way
    receives a correction bit; EOB runs correct the rest of the band."""
    plus = 1 << al
    k = ss
    if eob[0] == 0:
        while k <= se:
            rs = _decode_sym(br, tbl)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    eob[0] = 1 << r
                    if r:
                        eob[0] += br.bits(r)
                    break
                newval = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("JPEG corrupt: bad refinement size")
                newval = plus if br.bit() else -plus
            while k <= se:
                if block[k] != 0:
                    if br.bit():
                        if block[k] > 0:
                            block[k] += plus
                        else:
                            block[k] -= plus
                else:
                    if r == 0:
                        if newval:
                            block[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if eob[0] > 0:
        while k <= se:
            if block[k] != 0:
                if br.bit():
                    if block[k] > 0:
                        block[k] += plus
                    else:
                        block[k] -= plus
            k += 1
        eob[0] -= 1


def _prog_finish(frame, state, qt):
    h, w, comps, hmax, vmax, mcux, mcuy = _geometry(frame)
    full = []
    for c in comps:
        arr = state[c["id"]]
        q = qt[c["tq"]]
        bh, bw = arr.shape[:2]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        for by in range(bh):
            for bx in range(bw):
                block = np.zeros(64, dtype=np.float64)
                block[_ZIGZAG] = arr[by, bx] * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _BASIS.T @ block.reshape(8, 8) @ _BASIS + 128.0
                )
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for c in comps:
        cw, chh = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes[c["id"]] = np.zeros((chh, cw), dtype=np.float64)
    br = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_restart()
                pred = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for comp, tdc, tac in scan:
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coeffs = np.zeros(64, dtype=np.int32)
                        s = _decode_sym(br, huff_dc[tdc])
                        diff = _receive_extend(br, s)
                        pred[comp["id"]] += diff
                        coeffs[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_sym(br, huff_ac[tac])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG corrupt: AC index overflow")
                            coeffs[k] = _receive_extend(br, s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coeffs * q
                        px = _BASIS.T @ block.reshape(8, 8) @ _BASIS
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = px + 128.0
    # upsample each component to full MCU-padded geometry, crop, convert
    full = []
    for c in comps:
        p = planes[c["id"]]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return g[:, :, None]
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
