"""Pure-Python lossy VP8 (WebP ``VP8 `` chunk) keyframe decoder.

Implements RFC 6386 ("VP8 Data Format and Decoding Guide") for the only
frame type a still WebP can carry — an intra-only keyframe:

* the boolean arithmetic decoder (RFC section 7) over the first
  partition and the 1-8 DCT token partitions;
* the uncompressed chunk + keyframe headers (sections 9.1-9.11):
  dimensions, segmentation (per-segment quantizer / loop-filter
  overrides + the coded segment map), loop-filter selection and
  per-mode/ref deltas, quantizer indices, and the per-frame coefficient
  probability updates;
* keyframe intra-mode parsing (section 11.2): the 16x16 Y modes, the
  per-subblock 4x4 B modes with their (above, left)-conditioned
  probability contexts, and the chroma modes;
* DCT coefficient token decoding (section 13): the 12-token tree with
  per-(plane, band, context) probabilities, the extra-bit categories,
  the EOB-after-zero exclusion rule, and dequantization (section 14.1);
* the inverse transforms (section 14.3-14.5): the 4x4 DCT with the
  20091/35468 multiplier pair and the Walsh-Hadamard transform for the
  Y2 DC block;
* all intra predictors (section 12): DC/V/H/TM at 16x16 and 8x8, the
  ten 4x4 B modes with the above-right sourcing rule (row -1 of the
  macroblock, replicated downward, 127/129 frame borders);
* both loop filters (section 15): the normal 8-tap macroblock-edge /
  subblock-edge filters with high-edge-variance handling and the
  simple filter, applied in macroblock raster order after the full
  frame is reconstructed.

The constant tables (default coefficient probabilities, keyframe mode
probabilities, dequantization lookups) live in vp8_tables.py — they are
the tables printed in the RFC text, extracted byte-exact by
tools/extract_vp8_tables.py. tests/test_vp8.py validates the decoder
bit-exactly (identical Y/U/V planes) against libwebp across encoder
quality levels, sizes, and content classes via ctypes — the system
libwebp is a test-only dependency; this module needs none.

Per-pixel Python — fine for thumbnail-scale crawl images inside the
Arrow-batched ``modality`` kernels (same trade as vp8l.py / jpeg.py),
which are the consumers: this decoder puts lossy WebP — the dominant
modern-crawl image flavor next to JPEG — onto the dHash near-duplicate
surface.
"""

from __future__ import annotations

from .vp8_tables import (AC_QLOOKUP, COEFFS_PROBA0, COEFFS_UPDATE_PROBA,
                         DC_QLOOKUP, KF_BMODE_PROB)

__all__ = ["decode_vp8", "decode_vp8_frame", "decode_vp8_luma"]


# --- boolean arithmetic decoder (RFC 6386 section 7) ---------------------

class _BoolDecoder:
    __slots__ = ("data", "pos", "end", "value", "range", "bit_count")

    def __init__(self, data: bytes, start: int, end: int):
        self.data = data
        self.pos = start
        self.end = end
        self.value = 0
        for _ in range(2):
            self.value = (self.value << 8) | self._next_byte()
        self.range = 255
        self.bit_count = 0

    def _next_byte(self) -> int:
        # reads past the partition end decode as zero bytes (the RFC's
        # recommended EOF convention: the bitstream is zero-extended)
        p = self.pos
        if p >= self.end:
            return 0
        self.pos = p + 1
        return self.data[p]

    def bit(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                self.value |= self._next_byte()
        return ret

    def flag(self) -> int:
        return self.bit(128)

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bit(128) else v

    def tree(self, tree: tuple, probs) -> int:
        i = 0
        while True:
            i = tree[i + self.bit(probs[i >> 1])]
            if i <= 0:
                return -i


# --- trees and enums (RFC 6386 sections 8.2, 11.2, 13.2) -----------------

DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4

_KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
_KF_YMODE_PROB = (145, 156, 163, 128)
_UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
_KF_UV_MODE_PROB = (142, 114, 183)

(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)

_BMODE_TREE = (
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU,
)
# subblock-context equivalent of a whole-MB 16x16 mode
_MB_TO_BMODE = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# DCT token tree: leaves 0-4 are literal values, 5-10 the extra-bit
# categories, 11 end-of-block
_EOB = 11
_TOKEN_TREE = (
    -_EOB, 2,
    -0, 4,
    -1, 6,
    8, 12,
    -2, 10,
    -3, -4,
    14, 16,
    -5, -6,
    18, 20,
    -7, -8,
    -9, -10,
)
_CAT_BASE = (5, 7, 11, 19, 35, 67)
_CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)

_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)


def _clamp_q(q: int) -> int:
    return 0 if q < 0 else (127 if q > 127 else q)


def _clamp255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


# --- inverse transforms (RFC 6386 section 14.3-14.5) ---------------------

def _iwht4x4(coeffs):
    """Inverse Walsh-Hadamard: Y2 block -> the 16 Y-block DC values."""
    tmp = [0] * 16
    for i in range(4):
        a1 = coeffs[i] + coeffs[12 + i]
        b1 = coeffs[4 + i] + coeffs[8 + i]
        c1 = coeffs[4 + i] - coeffs[8 + i]
        d1 = coeffs[i] - coeffs[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


_C1 = 20091  # cos(pi/8)*sqrt(2) - 1, Q16
_C2 = 35468  # sin(pi/8)*sqrt(2), Q16


def _idct4x4(coeffs):
    """Exact integer inverse DCT; Python's floor-shift matches the
    arithmetic right shift the RFC's reference code relies on."""
    tmp = [0] * 16
    for i in range(4):
        i4, i8, i12 = coeffs[4 + i], coeffs[8 + i], coeffs[12 + i]
        a1 = coeffs[i] + i8
        b1 = coeffs[i] - i8
        c1 = ((i4 * _C2) >> 16) - (i12 + ((i12 * _C1) >> 16))
        d1 = (i4 + ((i4 * _C1) >> 16)) + ((i12 * _C2) >> 16)
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        t1, t2, t3 = tmp[r + 1], tmp[r + 2], tmp[r + 3]
        a1 = tmp[r] + t2
        b1 = tmp[r] - t2
        c1 = ((t1 * _C2) >> 16) - (t3 + ((t3 * _C1) >> 16))
        d1 = (t1 + ((t1 * _C1) >> 16)) + ((t3 * _C2) >> 16)
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


# --- frame-level container ----------------------------------------------

class _Plane:
    """Flat byte plane with a 127-initialized row above, a 129 column
    left, and a 4-px right extension for the above-right rule."""

    __slots__ = ("buf", "stride", "w", "h")

    def __init__(self, w: int, h: int):
        self.w = w
        self.h = h
        self.stride = w + 5  # 1 left border + w + 4 right extension
        self.buf = bytearray([127] * self.stride
                             + [0] * (self.stride * h))
        for y in range(h):
            self.buf[(y + 1) * self.stride] = 129

    def off(self, y: int, x: int) -> int:
        return (y + 1) * self.stride + (x + 1)

    def rows(self):
        s = self.stride
        for y in range(self.h):
            base = (y + 1) * s + 1
            yield self.buf[base:base + self.w]


class _MBInfo:
    __slots__ = ("ymode", "uvmode", "bmodes", "segment", "skip",
                 "has_coeffs", "coeffs")

    def __init__(self):
        self.ymode = DC_PRED
        self.uvmode = DC_PRED
        self.bmodes = [B_DC] * 16
        self.segment = 0
        self.skip = False
        self.has_coeffs = False
        self.coeffs = None  # 24 x 16 dequantized (Y raster, U, V)


def _parse_webp_vp8_chunk(raw: bytes) -> bytes:
    """The ``VP8 `` chunk payload from a RIFF WebP container (walking
    past VP8X/ICCP/EXIF/ALPH), or ``raw`` itself when it already starts
    with a VP8 frame tag + start code."""
    if raw[:4] == b"RIFF" and raw[8:12] == b"WEBP":
        pos = 12
        while pos + 8 <= len(raw):
            fourcc = raw[pos:pos + 4]
            size = int.from_bytes(raw[pos + 4:pos + 8], "little")
            if fourcc == b"VP8 ":
                return raw[pos + 8:pos + 8 + size]
            pos += 8 + size + (size & 1)
        raise ValueError("no VP8 chunk in WebP container")
    return raw


def decode_vp8(raw: bytes):
    """Decode a lossy WebP (or bare VP8 keyframe stream) to
    ``(width, height, y, u, v)`` — Y cropped to width x height, U/V to
    the ceil-half chroma dimensions, each a ``bytes`` plane."""
    return decode_vp8_frame(_parse_webp_vp8_chunk(raw))


def decode_vp8_luma(raw: bytes):
    """(width, height, numpy uint8 luma array) — the jpeg.py-shaped
    entry point the modality kernels consume."""
    import numpy as np
    w, h, y, _, _ = decode_vp8(raw)
    return w, h, np.frombuffer(y, dtype=np.uint8).reshape(h, w)


def decode_vp8_frame(data: bytes):  # noqa: C901 - one spec, one walk
    if len(data) < 10:
        raise ValueError("truncated VP8 stream")
    tag = int.from_bytes(data[0:3], "little")
    if tag & 1:
        raise ValueError("VP8 interframe: stills are keyframes only")
    first_part_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    wbits = int.from_bytes(data[6:8], "little")
    hbits = int.from_bytes(data[8:10], "little")
    w, h = wbits & 0x3FFF, hbits & 0x3FFF
    if not w or not h:
        raise ValueError("zero VP8 dimensions")
    if first_part_size == 0 or 10 + first_part_size > len(data):
        # libwebp rejects these too (NOT_ENOUGH_DATA): a header-only
        # or cut-off stream must degrade, not "decode" zero-fill
        raise ValueError("truncated VP8 first partition")
    mb_w, mb_h = (w + 15) >> 4, (h + 15) >> 4

    bd = _BoolDecoder(data, 10, 10 + first_part_size)

    # --- frame header (RFC 9.2-9.11) ---
    bd.bit(128)  # color space
    bd.bit(128)  # clamping type

    seg_enabled = bd.flag()
    update_map = 0
    seg_abs = 0
    seg_quant = [0, 0, 0, 0]
    seg_lf = [0, 0, 0, 0]
    seg_tree_probs = [255, 255, 255]
    if seg_enabled:
        update_map = bd.flag()
        update_data = bd.flag()
        if update_data:
            seg_abs = bd.flag()
            for i in range(4):
                if bd.flag():
                    seg_quant[i] = bd.signed_literal(7)
            for i in range(4):
                if bd.flag():
                    seg_lf[i] = bd.signed_literal(6)
        if update_map:
            for i in range(3):
                if bd.flag():
                    seg_tree_probs[i] = bd.literal(8)

    filter_type = bd.bit(128)  # 1 = simple
    filter_level = bd.literal(6)
    sharpness = bd.literal(3)
    lf_delta_enabled = bd.flag()
    ref_lf_deltas = [0, 0, 0, 0]
    mode_lf_deltas = [0, 0, 0, 0]
    if lf_delta_enabled and bd.flag():
        for i in range(4):
            if bd.flag():
                ref_lf_deltas[i] = bd.signed_literal(6)
        for i in range(4):
            if bd.flag():
                mode_lf_deltas[i] = bd.signed_literal(6)

    n_parts = 1 << bd.literal(2)
    part_base = 10 + first_part_size
    sizes_end = part_base + 3 * (n_parts - 1)
    if sizes_end > len(data):
        raise ValueError("truncated partition size table")
    partitions = []
    pos = sizes_end
    for i in range(n_parts - 1):
        psz = int.from_bytes(data[part_base + 3 * i:part_base + 3 * i + 3],
                             "little")
        partitions.append((pos, min(pos + psz, len(data))))
        pos += psz
    partitions.append((min(pos, len(data)), len(data)))
    token_bds = [_BoolDecoder(data, s, e) for s, e in partitions]

    y_ac_qi = bd.literal(7)
    y_dc_d = bd.signed_literal(4) if bd.flag() else 0
    y2_dc_d = bd.signed_literal(4) if bd.flag() else 0
    y2_ac_d = bd.signed_literal(4) if bd.flag() else 0
    uv_dc_d = bd.signed_literal(4) if bd.flag() else 0
    uv_ac_d = bd.signed_literal(4) if bd.flag() else 0

    bd.flag()  # refresh_entropy_probs: single-frame decode, ignored

    # coefficient probabilities: [plane][band][ctx][node]
    probs = [[[list(COEFFS_PROBA0[((p * 8 + b) * 3 + c) * 11:
                                  ((p * 8 + b) * 3 + c) * 11 + 11])
               for c in range(3)] for b in range(8)] for p in range(4)]
    for p in range(4):
        for b in range(8):
            for c in range(3):
                base = ((p * 8 + b) * 3 + c) * 11
                row = probs[p][b][c]
                for n in range(11):
                    if bd.bit(COEFFS_UPDATE_PROBA[base + n]):
                        row[n] = bd.literal(8)

    mb_no_skip = bd.flag()
    prob_skip_false = bd.literal(8) if mb_no_skip else 0

    # per-segment dequant factors
    def _factors(seg: int):
        if seg_enabled:
            q = seg_quant[seg] if seg_abs else y_ac_qi + seg_quant[seg]
            q = _clamp_q(q)
        else:
            q = y_ac_qi
        y1dc = DC_QLOOKUP[_clamp_q(q + y_dc_d)]
        y1ac = AC_QLOOKUP[q]
        y2dc = DC_QLOOKUP[_clamp_q(q + y2_dc_d)] * 2
        y2ac = AC_QLOOKUP[_clamp_q(q + y2_ac_d)] * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = DC_QLOOKUP[_clamp_q(q + uv_dc_d)]
        if uvdc > 132:
            uvdc = 132
        uvac = AC_QLOOKUP[_clamp_q(q + uv_ac_d)]
        return (y1dc, y1ac, y2dc, y2ac, uvdc, uvac)

    dequant = [_factors(s) for s in range(4)]

    # --- macroblock parsing + reconstruction ---
    yp = _Plane(mb_w * 16, mb_h * 16)
    up = _Plane(mb_w * 8, mb_h * 8)
    vp = _Plane(mb_w * 8, mb_h * 8)

    # entropy contexts: above per MB column, left per row
    above_nz = [[0] * 9 for _ in range(mb_w)]  # 4 Y, 2 U, 2 V, 1 Y2
    above_bmodes = [[B_DC] * 4 for _ in range(mb_w)]
    mb_rows = []

    for mb_y in range(mb_h):
        left_nz = [0] * 9
        left_bmodes = [B_DC] * 4
        tbd = token_bds[mb_y % n_parts]
        row_info = []
        for mb_x in range(mb_w):
            mb = _MBInfo()
            if update_map:
                mb.segment = bd.tree(_SEGMENT_TREE, seg_tree_probs)
            if mb_no_skip:
                mb.skip = bool(bd.bit(prob_skip_false))
            mb.ymode = bd.tree(_KF_YMODE_TREE, _KF_YMODE_PROB)
            if mb.ymode == B_PRED:
                bm = mb.bmodes
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    above = (bm[sb - 4] if r else above_bmodes[mb_x][c])
                    left = (bm[sb - 1] if c else left_bmodes[r])
                    ctx = KF_BMODE_PROB[(above * 10 + left) * 9:
                                        (above * 10 + left) * 9 + 9]
                    bm[sb] = bd.tree(_BMODE_TREE, ctx)
            else:
                mb.bmodes = [_MB_TO_BMODE[mb.ymode]] * 16
            mb.uvmode = bd.tree(_UV_MODE_TREE, _KF_UV_MODE_PROB)
            above_bmodes[mb_x] = mb.bmodes[12:16]
            left_bmodes = [mb.bmodes[3], mb.bmodes[7],
                           mb.bmodes[11], mb.bmodes[15]]

            has_y2 = mb.ymode != B_PRED
            anz, lnz = above_nz[mb_x], left_nz
            if mb.skip:
                for i in range(8):
                    anz[i] = lnz[i] = 0
                if has_y2:
                    anz[8] = lnz[8] = 0
                mb.has_coeffs = False
            else:
                mb.coeffs, eobtotal = _decode_mb_coeffs(
                    tbd, probs, has_y2, dequant[mb.segment], anz, lnz)
                mb.has_coeffs = eobtotal > 0
                if eobtotal == 0:
                    mb.skip = True  # loop filter treats as skipped
            row_info.append(mb)
            _reconstruct_mb(yp, up, vp, mb, mb_x, mb_y, mb_w, mb_h)
        mb_rows.append(row_info)

    # --- loop filter (RFC section 15) ---
    if filter_level:
        _loop_filter(yp, up, vp, mb_rows, mb_w, mb_h, filter_type,
                     filter_level, sharpness, seg_enabled, seg_abs,
                     seg_lf, lf_delta_enabled, ref_lf_deltas,
                     mode_lf_deltas)

    # crop
    yb = bytearray()
    for i, row in enumerate(yp.rows()):
        if i >= h:
            break
        yb += row[:w]
    cw, ch = (w + 1) >> 1, (h + 1) >> 1
    ub = bytearray()
    vb = bytearray()
    for i, row in enumerate(up.rows()):
        if i >= ch:
            break
        ub += row[:cw]
    for i, row in enumerate(vp.rows()):
        if i >= ch:
            break
        vb += row[:cw]
    return w, h, bytes(yb), bytes(ub), bytes(vb)


# --- coefficient decoding (RFC 6386 section 13) --------------------------

def _decode_block(bd, probs_plane, ctx, first, dqdc, dqac, out) -> int:
    """Token-decode one 4x4 block; returns the stop position (the
    RFC's per-block eob index). Dequantized values land in ``out`` in
    natural (un-zigzagged) order."""
    i = first
    bit = bd.bit
    start = 0
    while i < 16:
        p = probs_plane[_BANDS[i]][ctx]
        node = _TOKEN_TREE[start + bit(p[start >> 1])]
        while node > 0:
            node = _TOKEN_TREE[node + bit(p[node >> 1])]
        token = -node
        if token == _EOB:
            break
        if token == 0:
            start = 2  # EOB cannot follow a zero token
            ctx = 0
            i += 1
            continue
        start = 0
        if token <= 4:
            v = token
        else:
            cat = token - 5
            v = _CAT_BASE[cat]
            extra = 0
            for cp in _CAT_PROBS[cat]:
                extra = (extra << 1) | bit(cp)
            v += extra
        ctx = 1 if v == 1 else 2
        if bit(128):
            v = -v
        out[_ZIGZAG[i]] = v * (dqdc if i == 0 else dqac)
        i += 1
    return i


def _decode_mb_coeffs(bd, probs, has_y2, dq, anz, lnz):
    """All 24/25 blocks of one macroblock. ``anz``/``lnz`` are the
    9-slot above/left nonzero-context arrays (4 Y, 2 U, 2 V, 1 Y2),
    updated in place. Returns (coeffs[24][16], eobtotal)."""
    y1dc, y1ac, y2dc, y2ac, uvdc, uvac = dq
    coeffs = [[0] * 16 for _ in range(24)]
    eobtotal = 0
    first = 0
    if has_y2:
        y2 = [0] * 16
        ctx = anz[8] + lnz[8]
        c = _decode_block(bd, probs[1], ctx, 0, y2dc, y2ac, y2)
        anz[8] = lnz[8] = 1 if c > 0 else 0
        eobtotal += c
        dcs = _iwht4x4(y2)
        first = 1
    plane_y = probs[0] if has_y2 else probs[3]
    # in-place context trick: anz[c] holds the nonzero flag of the
    # block directly above (above MB for subblock row 0, else the
    # in-MB neighbor), lnz[r] of the block to the left — overwriting
    # after each block keeps both invariants and leaves the arrays as
    # the next MB's contexts
    for b in range(16):
        r, col = b >> 2, b & 3
        ctx = anz[col] + lnz[r]
        c = _decode_block(bd, plane_y, ctx, first, y1dc, y1ac, coeffs[b])
        anz[col] = lnz[r] = 1 if c > first else 0
        eobtotal += c - first
        if has_y2:
            coeffs[b][0] = dcs[b]
    for base, aoff in ((16, 4), (20, 6)):
        for b in range(4):
            r, col = b >> 1, b & 1
            ctx = anz[aoff + col] + lnz[aoff + r]
            c = _decode_block(bd, probs[2], ctx, 0, uvdc, uvac,
                              coeffs[base + b])
            anz[aoff + col] = lnz[aoff + r] = 1 if c > 0 else 0
            eobtotal += c
    return coeffs, eobtotal


# --- intra prediction + reconstruction (RFC 6386 section 12) -------------

def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _predict_block(plane, px, py, size, mode, have_above, have_left):
    """Whole-block DC/V/H/TM prediction written into the plane."""
    buf, stride = plane.buf, plane.stride
    base = plane.off(py, px)
    above = buf[base - stride:base - stride + size]
    left = [buf[base - 1 + stride * i] for i in range(size)]
    if mode == DC_PRED:
        if have_above and have_left:
            dc = (sum(above) + sum(left) + size) >> \
                (size.bit_length() + 0)
        elif have_above:
            dc = (sum(above) + (size >> 1)) >> (size.bit_length() - 1)
        elif have_left:
            dc = (sum(left) + (size >> 1)) >> (size.bit_length() - 1)
        else:
            dc = 128
        row = bytes([dc] * size)
        for i in range(size):
            buf[base + stride * i:base + stride * i + size] = row
    elif mode == V_PRED:
        row = bytes(above)
        for i in range(size):
            buf[base + stride * i:base + stride * i + size] = row
    elif mode == H_PRED:
        for i in range(size):
            buf[base + stride * i:base + stride * i + size] = \
                bytes([left[i]] * size)
    else:  # TM_PRED
        al = buf[base - stride - 1]
        for i in range(size):
            li = left[i] - al
            buf[base + stride * i:base + stride * i + size] = bytes(
                _clamp255(li + a) for a in above)


def _predict_b4(plane, px, py, mode):
    """One 4x4 B-mode prediction into the plane at (px, py)."""
    buf, stride = plane.buf, plane.stride
    base = plane.off(py, px)
    a = buf[base - stride:base - stride + 4]
    ar = buf[base - stride + 4:base - stride + 8]
    le = [buf[base - 1 + stride * i] for i in range(4)]
    x = buf[base - stride - 1]
    p = [[0] * 4 for _ in range(4)]
    if mode == B_DC:
        dc = (sum(a) + sum(le) + 4) >> 3
        for r in range(4):
            for c in range(4):
                p[r][c] = dc
    elif mode == B_TM:
        for r in range(4):
            for c in range(4):
                p[r][c] = _clamp255(le[r] + a[c] - x)
    elif mode == B_VE:
        row = (_avg3(x, a[0], a[1]), _avg3(a[0], a[1], a[2]),
               _avg3(a[1], a[2], a[3]), _avg3(a[2], a[3], ar[0]))
        for r in range(4):
            p[r][:] = row
    elif mode == B_HE:
        col = (_avg3(x, le[0], le[1]), _avg3(le[0], le[1], le[2]),
               _avg3(le[1], le[2], le[3]), _avg3(le[2], le[3], le[3]))
        for r in range(4):
            p[r][:] = [col[r]] * 4
    elif mode == B_LD:
        e = list(a) + list(ar)
        for r in range(4):
            for c in range(4):
                d = r + c
                p[r][c] = _avg3(e[d], e[d + 1], e[d + 2]) if d < 6 \
                    else _avg3(e[6], e[7], e[7])
    elif mode == B_RD:
        e = [le[3], le[2], le[1], le[0], x, a[0], a[1], a[2], a[3]]
        for r in range(4):
            for c in range(4):
                p[r][c] = _avg3(e[3 + c - r], e[4 + c - r], e[5 + c - r])
    elif mode == B_VR:
        p[0][:] = [_avg2(x, a[0]), _avg2(a[0], a[1]),
                   _avg2(a[1], a[2]), _avg2(a[2], a[3])]
        p[1][:] = [_avg3(le[0], x, a[0]), _avg3(x, a[0], a[1]),
                   _avg3(a[0], a[1], a[2]), _avg3(a[1], a[2], a[3])]
        p[2][:] = [_avg3(le[1], le[0], x)] + p[0][:3]
        p[3][:] = [_avg3(le[2], le[1], le[0])] + p[1][:3]
    elif mode == B_VL:
        p[0][:] = [_avg2(a[0], a[1]), _avg2(a[1], a[2]),
                   _avg2(a[2], a[3]), _avg2(a[3], ar[0])]
        p[1][:] = [_avg3(a[0], a[1], a[2]), _avg3(a[1], a[2], a[3]),
                   _avg3(a[2], a[3], ar[0]), _avg3(a[3], ar[0], ar[1])]
        p[2][:] = p[0][1:] + [_avg3(ar[0], ar[1], ar[2])]
        p[3][:] = p[1][1:] + [_avg3(ar[1], ar[2], ar[3])]
    elif mode == B_HD:
        p[0][:] = [_avg2(le[0], x), _avg3(le[0], x, a[0]),
                   _avg3(x, a[0], a[1]), _avg3(a[0], a[1], a[2])]
        p[1][:] = [_avg2(le[1], le[0]), _avg3(le[1], le[0], x),
                   p[0][0], p[0][1]]
        p[2][:] = [_avg2(le[2], le[1]), _avg3(le[2], le[1], le[0]),
                   p[1][0], p[1][1]]
        p[3][:] = [_avg2(le[3], le[2]), _avg3(le[3], le[2], le[1]),
                   p[2][0], p[2][1]]
    else:  # B_HU
        p[0][:] = [_avg2(le[0], le[1]), _avg3(le[0], le[1], le[2]),
                   _avg2(le[1], le[2]), _avg3(le[1], le[2], le[3])]
        p[1][:] = [p[0][2], p[0][3], _avg2(le[2], le[3]),
                   _avg3(le[2], le[3], le[3])]
        p[2][:] = [p[1][2], p[1][3], le[3], le[3]]
        p[3][:] = [le[3]] * 4
    for r in range(4):
        o = base + stride * r
        buf[o:o + 4] = bytes(p[r])


def _add_residual(plane, px, py, res):
    buf, stride = plane.buf, plane.stride
    base = plane.off(py, px)
    for r in range(4):
        o = base + stride * r
        q = 4 * r
        for c in range(4):
            v = buf[o + c] + res[q + c]
            buf[o + c] = 0 if v < 0 else (255 if v > 255 else v)


def _reconstruct_mb(yp, up, vp, mb, mb_x, mb_y, mb_w, mb_h):
    px, py = mb_x * 16, mb_y * 16
    coeffs = mb.coeffs
    # above-right extension: replicate row -1's x+16..19 for the three
    # lower subblock rows happens implicitly (reads go to row -1 only
    # when col == 3 via the rule below); maintain the right-edge pad
    if mb.ymode == B_PRED:
        # rightmost MB: the 4 pixels above-right of the MB replicate
        # the above row's last real pixel (127 border on row 0)
        if mb_x == mb_w - 1:
            o = yp.off(py - 1, px + 16)
            last = yp.buf[yp.off(py - 1, px + 15)]
            yp.buf[o:o + 4] = bytes([last] * 4)
        for sb in range(16):
            r, c = sb >> 2, sb & 3
            sx, sy = px + 4 * c, py + 4 * r
            if c == 3 and r > 0:
                # above-right comes from row -1 of the MB (RFC 12.3):
                # copy those 4 pixels into this subblock's above-right
                # position so the predictor reads them naturally
                src = yp.off(py - 1, px + 16)
                dst = yp.off(sy - 1, sx + 4)
                yp.buf[dst:dst + 4] = yp.buf[src:src + 4]
            _predict_b4(yp, sx, sy, mb.bmodes[sb])
            if coeffs is not None:
                _add_residual(yp, sx, sy, _idct4x4(coeffs[sb]))
    else:
        _predict_block(yp, px, py, 16, mb.ymode, mb_y > 0, mb_x > 0)
        if coeffs is not None:
            for sb in range(16):
                blk = coeffs[sb]
                if any(blk):
                    _add_residual(yp, px + 4 * (sb & 3),
                                  py + 4 * (sb >> 2), _idct4x4(blk))
    cx, cy = mb_x * 8, mb_y * 8
    for plane, base in ((up, 16), (vp, 20)):
        _predict_block(plane, cx, cy, 8, mb.uvmode, mb_y > 0, mb_x > 0)
        if coeffs is not None:
            for b in range(4):
                blk = coeffs[base + b]
                if any(blk):
                    _add_residual(plane, cx + 4 * (b & 1),
                                  cy + 4 * (b >> 1), _idct4x4(blk))
    # maintain the right-edge extension for the NEXT MB row's
    # above-right reads (rightmost MB only)
    if mb_x == mb_w - 1:
        for yy in range(py, py + 16):
            o = yp.off(yy, yp.w)
            yp.buf[o:o + 4] = bytes([yp.buf[o - 1]] * 4)


# --- loop filter (RFC 6386 section 15) -----------------------------------

def _u2s(v):
    return v - 128


def _c(v):
    return -128 if v < -128 else (127 if v > 127 else v)


def _s2u(v):
    v = _c(v)
    return v + 128


def _common_adjust(buf, p1i, p0i, q0i, q1i, use_outer):
    p1 = _u2s(buf[p1i])
    p0 = _u2s(buf[p0i])
    q0 = _u2s(buf[q0i])
    q1 = _u2s(buf[q1i])
    a = _c((_c(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f = _c(a + 4) >> 3
    buf[q0i] = _s2u(q0 - f)
    buf[p0i] = _s2u(p0 + (_c(a + 3) >> 3))
    return f


def _normal_mask(buf, idx, step, interior, edge):
    p3, p2, p1, p0 = (buf[idx - 4 * step], buf[idx - 3 * step],
                      buf[idx - 2 * step], buf[idx - step])
    q0, q1, q2, q3 = (buf[idx], buf[idx + step],
                      buf[idx + 2 * step], buf[idx + 3 * step])
    return (abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge
            and abs(p3 - p2) <= interior and abs(p2 - p1) <= interior
            and abs(p1 - p0) <= interior and abs(q1 - q0) <= interior
            and abs(q2 - q1) <= interior and abs(q3 - q2) <= interior)


def _hev(buf, idx, step, thresh):
    return (abs(buf[idx - 2 * step] - buf[idx - step]) > thresh
            or abs(buf[idx + step] - buf[idx]) > thresh)


def _subblock_filter(buf, idx, step, hev_t, interior, edge):
    if _normal_mask(buf, idx, step, interior, edge):
        hv = _hev(buf, idx, step, hev_t)
        f = _common_adjust(buf, idx - 2 * step, idx - step, idx,
                           idx + step, hv)
        if not hv:
            a = _c(f + 1) >> 1
            buf[idx + step] = _s2u(_u2s(buf[idx + step]) - a)
            buf[idx - 2 * step] = _s2u(_u2s(buf[idx - 2 * step]) + a)


def _mbedge_filter(buf, idx, step, hev_t, interior, edge):
    if not _normal_mask(buf, idx, step, interior, edge):
        return
    if _hev(buf, idx, step, hev_t):
        _common_adjust(buf, idx - 2 * step, idx - step, idx,
                       idx + step, 1)
        return
    p2 = _u2s(buf[idx - 3 * step])
    p1 = _u2s(buf[idx - 2 * step])
    p0 = _u2s(buf[idx - step])
    q0 = _u2s(buf[idx])
    q1 = _u2s(buf[idx + step])
    q2 = _u2s(buf[idx + 2 * step])
    w = _c(_c(p1 - q1) + 3 * (q0 - p0))
    a = _c((27 * w + 63) >> 7)
    buf[idx] = _s2u(q0 - a)
    buf[idx - step] = _s2u(p0 + a)
    a = _c((18 * w + 63) >> 7)
    buf[idx + step] = _s2u(q1 - a)
    buf[idx - 2 * step] = _s2u(p1 + a)
    a = _c((9 * w + 63) >> 7)
    buf[idx + 2 * step] = _s2u(q2 - a)
    buf[idx - 3 * step] = _s2u(p2 + a)


def _simple_filter(buf, idx, step, edge):
    p1 = buf[idx - 2 * step]
    p0 = buf[idx - step]
    q0 = buf[idx]
    q1 = buf[idx + step]
    if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge:
        _common_adjust(buf, idx - 2 * step, idx - step, idx,
                       idx + step, 1)


def _loop_filter(yp, up, vp, mb_rows, mb_w, mb_h, filter_type,
                 base_level, sharpness, seg_enabled, seg_abs, seg_lf,
                 lf_delta_enabled, ref_lf_deltas, mode_lf_deltas):
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            mb = mb_rows[mb_y][mb_x]
            level = base_level
            if seg_enabled:
                level = seg_lf[mb.segment] if seg_abs \
                    else level + seg_lf[mb.segment]
            if lf_delta_enabled:
                level += ref_lf_deltas[0]  # keyframes are INTRA_FRAME
                if mb.ymode == B_PRED:
                    level += mode_lf_deltas[0]
            level = 0 if level < 0 else (63 if level > 63 else level)
            if level == 0:
                continue
            interior = level
            if sharpness:
                interior >>= 2 if sharpness > 4 else 1
                if interior > 9 - sharpness:
                    interior = 9 - sharpness
            if interior < 1:
                interior = 1
            mb_edge = ((level + 2) * 2) + interior
            sb_edge = (level * 2) + interior
            hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
            skip_inner = mb.skip and mb.ymode != B_PRED

            if filter_type:  # simple: Y plane only
                buf, stride = yp.buf, yp.stride
                px, py = mb_x * 16, mb_y * 16
                if mb_x > 0:
                    for r in range(16):
                        _simple_filter(buf, yp.off(py + r, px), 1,
                                       mb_edge)
                if not skip_inner:
                    for sx in (4, 8, 12):
                        for r in range(16):
                            _simple_filter(buf, yp.off(py + r, px + sx),
                                           1, sb_edge)
                if mb_y > 0:
                    for cidx in range(16):
                        _simple_filter(buf, yp.off(py, px + cidx),
                                       stride, mb_edge)
                if not skip_inner:
                    for sy in (4, 8, 12):
                        for cidx in range(16):
                            _simple_filter(buf,
                                           yp.off(py + sy, px + cidx),
                                           stride, sb_edge)
                continue

            for plane, size, inner in ((yp, 16, (4, 8, 12)),
                                       (up, 8, (4,)), (vp, 8, (4,))):
                buf, stride = plane.buf, plane.stride
                px, py = mb_x * size, mb_y * size
                if mb_x > 0:
                    for r in range(size):
                        _mbedge_filter(buf, plane.off(py + r, px), 1,
                                       hev_t, interior, mb_edge)
                if not skip_inner:
                    for sx in inner:
                        for r in range(size):
                            _subblock_filter(buf,
                                             plane.off(py + r, px + sx),
                                             1, hev_t, interior, sb_edge)
                if mb_y > 0:
                    for cidx in range(size):
                        _mbedge_filter(buf, plane.off(py, px + cidx),
                                       stride, hev_t, interior, mb_edge)
                if not skip_inner:
                    for sy in inner:
                        for cidx in range(size):
                            _subblock_filter(buf,
                                             plane.off(py + sy,
                                                       px + cidx),
                                             stride, hev_t, interior,
                                             sb_edge)
