"""Pure-Python baseline JPEG decode (public spec: ITU-T T.81 / ISO 10918-1).

Dependency-free except numpy (IDCT in matrix form) — the same honest
pattern as pdf.py's FlateDecode and modality.py's PNG filter
reconstruction. Coverage is the baseline sequential DCT process:

* SOF0/SOF1 frames, 8-bit precision, 1-3 components;
* huffman entropy coding with arbitrary (canonical) DHT tables,
  multi-table, byte stuffing, DRI restart intervals;
* chroma subsampling up to 2x2 (4:4:4, 4:2:2, 4:2:0, 4:4:0).

Out of scope, refused with ``ValueError`` (decode_image degrades per its
contract): progressive (SOF2), arithmetic coding (SOF9+), hierarchical,
12-bit precision, >4 components. The decoder returns the LUMA plane —
JPEG's Y channel IS the BT.601 luma the other image decoders compute as
(299r+587g+114b)/1000 — so the 4x4 grid feature needs no chroma
upsampling; chroma blocks are still entropy-decoded (the bitstream is
sequential) but skip dequant/IDCT.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_jpeg_luma"]

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# orthonormal 8-point DCT-II basis: IDCT(F) = M.T @ F @ M
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = _c / 2 * np.cos((2 * _x + 1) * _u * np.pi / 16)


def build_canonical_codes(bits: list[int], vals: bytes) -> dict:
    """(length, code) -> symbol map from a DHT's BITS/HUFFVAL arrays
    (canonical assignment per T.81 Annex C)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte unstuffing; stops (raises _Marker) at any real marker."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.i = pos
        self.acc = 0
        self.n = 0

    class _Marker(Exception):
        def __init__(self, code: int, at: int):
            self.code = code
            self.at = at

    def _fill(self):
        b = self.d[self.i]
        if b == 0xFF:
            nxt = self.d[self.i + 1] if self.i + 1 < len(self.d) else 0xD9
            if nxt == 0x00:
                self.i += 2
            else:
                raise _BitReader._Marker(nxt, self.i)
        else:
            self.i += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_after_marker(self):
        """Consume the pending RST marker and restart bit-aligned."""
        self.acc = 0
        self.n = 0
        # self.i points at the 0xFF of the marker (set by _Marker.at
        # semantics: the caller re-syncs i); skip FF + code
        while self.d[self.i] != 0xFF:
            self.i += 1
        self.i += 2


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _receive_extend(br: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = br.bits(s)
    if v < (1 << (s - 1)):
        v -= (1 << s) - 1
    return v


def _decode_block(br, dc_tbl, ac_tbl, pred, qt, want_pixels: bool):
    t = _huff_decode(br, dc_tbl)
    pred = pred + _receive_extend(br, t)
    coef = np.zeros(64) if want_pixels else None
    if want_pixels:
        coef[0] = pred * qt[0]
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC coefficient index out of range")
        v = _receive_extend(br, s)
        if want_pixels:
            coef[ZIGZAG[k]] = v * qt[k]
        k += 1
    if not want_pixels:
        return pred, None
    # coef is already in natural order (filled via ZIGZAG[k])
    block = _M.T @ coef.reshape(8, 8) @ _M
    return pred, np.clip(np.rint(block + 128), 0, 255).astype(np.uint8)


def decode_jpeg_luma(payload: bytes):
    """Decode baseline JPEG → (width, height, luma_plane[np.uint8 h×w])."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}   # (class, id) -> code table
    restart_interval = 0
    frame = None
    i = 2
    n = len(payload)
    scan = None
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[i + 1]
        i += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            continue
        length = int.from_bytes(payload[i:i + 2], "big")
        seg = payload[i + 2:i + length]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    quant[tq] = list(seg[p:p + 64])
                    p += 64
                else:
                    quant[tq] = [int.from_bytes(seg[p + 2 * j:p + 2 * j + 2],
                                                "big") for j in range(64)]
                    p += 128
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"unsupported precision {precision}")
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if not (1 <= ncomp <= 3):
                raise ValueError(f"unsupported component count {ncomp}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = (width, height, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF marker 0x{marker:02X}) — "
                "baseline sequential only")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = seg[p + 17:p + 17 + nv]
                huff[(tc, th)] = build_canonical_codes(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c:3 + 2 * c]
                scan.append({"id": cid, "dc": tt >> 4, "ac": tt & 0x0F})
            i += length
            break
        i += length
    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS")

    width, height, comps = frame
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        c = by_id.get(s["id"])
        if c is None:
            raise ValueError("scan references unknown component")
        c["dc_t"] = huff.get((0, s["dc"]))
        c["ac_t"] = huff.get((1, s["ac"]))
        if c["dc_t"] is None or c["ac_t"] is None:
            raise ValueError("missing huffman table")
        c["qt"] = quant.get(c["tq"])
        if c["qt"] is None:
            raise ValueError("missing quant table")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise ValueError("unsupported sampling factors (1-2 only)")
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    luma = comps[0]  # Y is always the first frame component
    yw, yh = mcux * 8 * luma["h"], mcuy * 8 * luma["v"]
    yplane = np.zeros((yh, yw), dtype=np.uint8)

    br = _BitReader(payload, i)
    preds = {c["id"]: 0 for c in comps}
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                # expect an RSTn marker between intervals: re-align
                try:
                    while True:
                        br.bit()  # drain until the marker raises
                except _BitReader._Marker as m:
                    if not (0xD0 <= m.code <= 0xD7):
                        raise ValueError("expected restart marker")
                    br.i = m.at
                    br.align_after_marker()
                    preds = {c["id"]: 0 for c in comps}
            for c in comps:
                want = c is luma
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        try:
                            preds[c["id"]], px = _decode_block(
                                br, c["dc_t"], c["ac_t"], preds[c["id"]],
                                c["qt"], want)
                        except _BitReader._Marker as m:  # truncated stream
                            raise ValueError(
                                f"unexpected marker 0x{m.code:02X} in scan")
                        if want and px is not None:
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            yplane[y0:y0 + 8, x0:x0 + 8] = px
            mcu_n += 1

    # crop the luma plane to image coordinates; if Y itself is subsampled
    # relative to hmax/vmax (rare), upsample by nearest
    if luma["h"] != hmax or luma["v"] != vmax:
        ys = np.arange(height) * luma["v"] // vmax
        xs = np.arange(width) * luma["h"] // hmax
        plane = yplane[np.ix_(ys, xs)]
    else:
        plane = yplane[:height, :width]
    return width, height, plane
