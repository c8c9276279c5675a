"""Pure-Python JPEG decode (public spec: ITU-T T.81 / ISO 10918-1).

Dependency-free except numpy (IDCT in matrix form) — the same honest
pattern as pdf.py's FlateDecode and modality.py's PNG filter
reconstruction. Coverage:

* BASELINE sequential DCT: SOF0/SOF1 frames, 8-bit precision, 1-3
  components, huffman entropy coding with arbitrary (canonical) DHT
  tables, multi-table, byte stuffing, DRI restart intervals, chroma
  subsampling up to 2x2 (4:4:4, 4:2:2, 4:2:0, 4:4:0);
* PROGRESSIVE DCT (SOF2): spectral selection + successive approximation
  per T.81 Annex G — interleaved/non-interleaved DC first+refine scans,
  per-component AC first scans with EOB runs, AC refinement scans with
  correction bits; coefficients accumulate across scans and IDCT runs
  once at the end. Non-luma AC scans are skipped WHOLESALE (each
  progressive scan is its own entropy segment, so the decoder jumps to
  the next marker) — a real win for the luma-only feature path.

Out of scope, refused with ``ValueError`` (decode_image degrades per its
contract): arithmetic coding (SOF9+), hierarchical, lossless, 12-bit
precision, >4 components. The decoder returns the LUMA plane — JPEG's Y
channel IS the BT.601 luma the other image decoders compute as
(299r+587g+114b)/1000 — so the 4x4 grid feature needs no chroma
upsampling; in baseline scans chroma blocks are still entropy-decoded
(the bitstream is sequential) but skip dequant/IDCT.
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
        """Drop pending bits, require an RSTn marker at/after the cursor,
        and step past it — the shared restart-boundary handler for the
        baseline and progressive paths."""
        self.acc = 0
        self.n = 0
        while self.i < len(self.d) and self.d[self.i] != 0xFF:
            self.i += 1
        if self.i + 1 >= len(self.d) or not (0xD0 <= self.d[self.i + 1] <= 0xD7):
            raise ValueError("expected restart marker")
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


def _next_marker_pos(payload: bytes, pos: int) -> int:
    """First position at/after ``pos`` of a REAL marker (0xFF followed by
    neither 0x00 stuffing nor an RST code) — the end of a scan's entropy
    segment."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] == 0xFF:
            nxt = payload[pos + 1]
            if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                return pos
            pos += 2
        else:
            pos += 1
    return n


def decode_jpeg_luma(payload: bytes):
    """Decode a baseline or progressive JPEG →
    (width, height, luma_plane[np.uint8 h×w])."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}   # (class, id) -> code table
    restart_interval = 0
    frame = None
    progressive = False
    scans = []  # progressive: (scan_comps, ss, se, ah, al, data_pos, dri)
    i = 2
    n = len(payload)
    scan = None
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 baseline, SOF2 prog
            progressive = marker == 0xC2
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
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF marker 0x{marker:02X}) — "
                "baseline sequential + progressive only")
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
            if not progressive:
                i += length
                break
            ss, se, a = seg[1 + 2 * ns:4 + 2 * ns]
            data_pos = i + length
            # tables are mutable between scans: bind copies now
            bound = [{**s, "dc_t": huff.get((0, s["dc"])),
                      "ac_t": huff.get((1, s["ac"]))} for s in scan]
            scans.append((bound, ss, se, a >> 4, a & 0x0F, data_pos,
                          restart_interval))
            i = _next_marker_pos(payload, data_pos)
            continue
        i += length
    if frame is None or (scan is None and not scans):
        raise ValueError("missing SOF/SOS")
    if progressive:
        return _decode_progressive(payload, frame, quant, scans)

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
    # a spec-legal baseline may carry several non-interleaved scans
    # (ns < ncomp); this decoder stops at the first SOS, so anything short
    # of full coverage is an unsupported *feature*, not a corrupt payload
    if {s["id"] for s in scan} != set(by_id):
        raise ValueError("non-interleaved baseline (partial scan) "
                         "unsupported")
    # MCU data interleaves components in SOS scan order, which T.81 does
    # not require to match SOF order
    scan_order = [by_id[s["id"]] for s in scan]
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
            for c in scan_order:
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


def _comp_geometry(frame):
    width, height, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        cw = (width * c["h"] + hmax - 1) // hmax    # sampled pixel dims
        ch = (height * c["v"] + vmax - 1) // vmax
        c["bw"] = (cw + 7) // 8                     # real block dims
        c["bh"] = (ch + 7) // 8
        c["bw_full"] = mcux * c["h"]                # MCU-padded block dims
        c["bh_full"] = mcuy * c["v"]
    return hmax, vmax, mcux, mcuy


def _restart(br, payload):
    """Byte-align at an RSTn marker and step past it (delegates to the
    shared validated handler)."""
    br.align_after_marker()


def _decode_progressive(payload, frame, quant, scans):
    """T.81 Annex G progressive decode: accumulate luma coefficients over
    the scan sequence, IDCT once at the end. Scans that touch only chroma
    are skipped wholesale (their entropy segments were never entered)."""
    width, height, comps = frame
    _, _, mcux, mcuy = _comp_geometry(frame)
    by_id = {c["id"]: c for c in comps}
    luma = comps[0]
    # natural-order coefficient store, MCU-padded so interleaved DC scans
    # can write the dummy edge blocks
    coefs = np.zeros((luma["bh_full"], luma["bw_full"], 64), dtype=np.int64)

    for scan_comps, ss, se, ah, al, pos, dri in scans:
        ids = [s["id"] for s in scan_comps]
        if luma["id"] not in ids:
            continue  # luma-only path: chroma scan segment never decoded
        for s in scan_comps:
            s.update(by_id[s["id"]])
        br = _BitReader(payload, pos)
        if len(scan_comps) > 1 or ss == 0:
            _scan_dc(br, payload, scan_comps, ah, al, coefs, luma,
                     mcux, mcuy, dri, interleaved=len(scan_comps) > 1)
        else:
            _scan_ac(br, payload, scan_comps[0], ss, se, ah, al, coefs,
                     dri)

    qt = quant.get(luma["tq"])
    if qt is None:
        raise ValueError("missing quant table")
    qt_nat = np.zeros(64)
    for k in range(64):
        qt_nat[ZIGZAG[k]] = qt[k]

    yw, yh = luma["bw_full"] * 8, luma["bh_full"] * 8
    plane = np.zeros((yh, yw), dtype=np.uint8)
    for by in range(luma["bh_full"]):
        for bx in range(luma["bw_full"]):
            block = _M.T @ (coefs[by, bx] * qt_nat).reshape(8, 8) @ _M
            plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                np.clip(np.rint(block + 128), 0, 255).astype(np.uint8)

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if luma["h"] != hmax or luma["v"] != vmax:
        ys = np.arange(height) * luma["v"] // vmax
        xs = np.arange(width) * luma["h"] // hmax
        return width, height, plane[np.ix_(ys, xs)]
    return width, height, plane[:height, :width]


def _scan_dc(br, payload, scan_comps, ah, al, coefs, luma, mcux, mcuy,
             dri, interleaved):
    """DC scan (first or refinement), interleaved or single-component.
    Chroma blocks are entropy-decoded to advance the stream; only luma
    coefficients are stored."""
    preds = {s["id"]: 0 for s in scan_comps}
    unit = 0
    if interleaved:
        mcus = [(mx, my) for my in range(mcuy) for mx in range(mcux)]
    else:
        c = scan_comps[0]
        mcus = [(bx, by) for by in range(c["bh"]) for bx in range(c["bw"])]
    for ux, uy in mcus:
        if dri and unit and unit % dri == 0:
            _restart(br, payload)
            preds = {s["id"]: 0 for s in scan_comps}
        for s in scan_comps:
            blocks = ([(0, 0)] if not interleaved else
                      [(bx, by) for by in range(s["v"])
                       for bx in range(s["h"])])
            for bx, by in blocks:
                if interleaved:
                    gx, gy = ux * s["h"] + bx, uy * s["v"] + by
                else:
                    gx, gy = ux, uy
                if ah == 0:
                    t = _huff_decode(br, s["dc_t"])
                    preds[s["id"]] += _receive_extend(br, t)
                    if s["id"] == luma["id"]:
                        coefs[gy, gx, 0] = preds[s["id"]] << al
                else:
                    bit = br.bit()
                    if bit and s["id"] == luma["id"]:
                        coefs[gy, gx, 0] |= 1 << al
        unit += 1


def _scan_ac(br, payload, comp, ss, se, ah, al, coefs, dri):
    """AC scan over one component's real blocks, row-major. ``ah == 0``:
    first scan for this band (EOB runs, values at scale 2^al). ``ah > 0``:
    refinement — one correction bit per already-nonzero coefficient, new
    coefficients appear as ±2^al."""
    eobrun = 0
    unit = 0
    for by in range(comp["bh"]):
        for bx in range(comp["bw"]):
            if dri and unit and unit % dri == 0:
                _restart(br, payload)
                eobrun = 0
            unit += 1
            coef = coefs[by, bx]
            if ah == 0:
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _huff_decode(br, comp["ac_t"])
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1 + (br.bits(r) if r else 0)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC index out of band")
                    coef[ZIGZAG[k]] = _receive_extend(br, s) << al
                    k += 1
            else:
                p1, m1 = 1 << al, -1 << al
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _huff_decode(br, comp["ac_t"])
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r < 15:
                                eobrun = (1 << r) + (br.bits(r) if r else 0)
                                break
                            val = 0  # ZRL: pass 16 zero-history coefs
                        elif s == 1:
                            val = p1 if br.bit() else m1
                        else:
                            raise ValueError("refinement size must be 1")
                        while k <= se:
                            z = ZIGZAG[k]
                            if coef[z] != 0:
                                if br.bit() and (coef[z] & p1) == 0:
                                    coef[z] += p1 if coef[z] > 0 else m1
                            else:
                                if r == 0:
                                    if val:
                                        coef[z] = val
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                if eobrun > 0:
                    while k <= se:
                        z = ZIGZAG[k]
                        if coef[z] != 0:
                            if br.bit() and (coef[z] & p1) == 0:
                                coef[z] += p1 if coef[z] > 0 else m1
                        k += 1
                    eobrun -= 1
