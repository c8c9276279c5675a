"""Minimal MPEG-1 Layer III encoder — independent, spec-written
(ISO/IEC 11172-3), used ONLY to validate fortissimo_spark.mp3's
decoder by round-trip: long blocks, no bit reservoir, zero
scalefactors, global_gain-only quantization, Huffman tables from the
decoder-validated set (ids <= 9, quantized magnitudes <= 5).

The analysis filterbank + forward MDCT are built as the numerically
exact inverses of the decoder's synthesis structures (matrices solved
at import, not copied), so a round-trip error isolates real decoder
bugs instead of window mismatch.
"""
from __future__ import annotations

import math

import numpy as np

from fortissimo_spark.mp3 import (HUFF_PATTERNS, QUAD_A, QUAD_B,
                                  SFB_LONG, _cum)


class _BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, value: int, n: int):
        for k in range(n - 1, -1, -1):
            self.bits.append((value >> k) & 1)

    def tell(self):
        return len(self.bits)

    def bytes(self, pad_to: int | None = None) -> bytes:
        bits = list(self.bits)
        if pad_to is not None:
            bits += [0] * (pad_to * 8 - len(bits))
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def encode_big_values(bw: _BitWriter, values, tid: int):
    """Huffman-encode an even-length value sequence (|v| within the
    table's range) as big-value pairs with table ``tid``."""
    _, _, hlen, hcod = HUFF_PATTERNS[tid]
    for i in range(0, len(values), 2):
        x, y = values[i], values[i + 1]
        bw.put(hcod[abs(x)][abs(y)], hlen[abs(x)][abs(y)])
        if x:
            bw.put(1 if x < 0 else 0, 1)
        if y:
            bw.put(1 if y < 0 else 0, 1)


def encode_count1(bw: _BitWriter, quads, table_b: bool):
    tab = QUAD_B if table_b else QUAD_A
    for q in quads:
        idx = 0
        for v in q:
            idx = (idx << 1) | (1 if v else 0)
        hl, hc = tab[idx]
        bw.put(hc, hl)
        for v in q:
            if v:
                bw.put(1 if v < 0 else 0, 1)


# ---------------------------------------------------------------------
# Filterbank analysis = numeric inverse of the decoder's synthesis
# ---------------------------------------------------------------------

def _get_analysis_ops():
    # the SPEC-SIDE analysis structure defined in the decoder module
    # (the encoder must produce subband samples in the same domain a
    # real encoder would, which is exactly what _analysis_ops models)
    from fortissimo_spark.mp3 import _analysis_ops
    return _analysis_ops()


_A_MAT, _C_WIN = _get_analysis_ops()


def analyze(pcm: np.ndarray) -> np.ndarray:
    """PCM (n,) -> subband samples (n//32, 32)."""
    n = len(pcm) // 32 * 32
    fifo = np.zeros(512)
    out = np.empty((n // 32, 32))
    for t in range(n // 32):
        fifo[32:] = fifo[:-32]
        fifo[:32] = pcm[t * 32:(t + 1) * 32][::-1]
        z = fifo * _C_WIN
        y = z.reshape(8, 64).sum(axis=0)
        out[t] = _A_MAT @ y
    return out


def mdct_bands(sub: np.ndarray, prev: np.ndarray):
    """Subband samples (18, 32) + previous granule (18, 32) ->
    spectral xr (576,) in decoder order, applying the encoder-side
    frequency inversion and inverse alias butterflies. Forward MDCT
    X = ((z * w) @ C) / 9 is the EXACT TDAC inverse of the decoder's
    IMDCT + sine-window overlap-add (machine-precision, pinned in
    tests)."""
    from fortissimo_spark import mp3 as m
    imdct = np.array(m._IMDCT36)
    win = np.array(m._WIN_NORMAL)
    cur = sub.copy()
    prev = prev.copy()
    for sb in range(1, 32, 2):
        cur[1::2, sb] = -cur[1::2, sb]
        prev[1::2, sb] = -prev[1::2, sb]
    xr = np.empty(576)
    for sb in range(32):
        z = np.concatenate([prev[:, sb], cur[:, sb]])
        xr[sb * 18:(sb + 1) * 18] = ((z * win) @ imdct) / 9.0
    # inverse alias butterflies (the decoder applies the forward ones)
    cs, ca = np.array(m._CS), np.array(m._CA)
    for sb in range(1, 32):
        for i in range(8):
            u, d = 18 * sb - 1 - i, 18 * sb + i
            a, b = xr[u], xr[d]
            xr[u] = a * cs[i] + b * ca[i]
            xr[d] = b * cs[i] - a * ca[i]
    return xr


def quantize(xr: np.ndarray, max_q: int = 5):
    """Pick global_gain so the largest |xr| quantizes to max_q; return
    (global_gain, int spectrum). Zero spectra get gain 210."""
    peak = float(np.abs(xr).max())
    if peak == 0.0:
        return 210, np.zeros(576, dtype=int)
    # |q| = round((|xr| / 2^((gg-210)/4)) ^ (3/4)) <= max_q
    gg = 210 + int(math.ceil(4.0 * math.log2(peak / (max_q ** (4.0 / 3.0)))))
    gg = max(0, min(255, gg))
    step = 2.0 ** (0.25 * (gg - 210))
    # deadzone quantizer (the classic -0.0946 nint offset): without it
    # every tiny sidelobe rounds up to +-1 and the granule's noise
    # floor swamps quiet passages
    q = np.floor(np.abs(xr / step) ** 0.75 + 0.5 - 0.0946) * np.sign(xr)
    q = np.clip(q, -max_q, max_q)
    return gg, q.astype(int)


def _granule_bits(q: np.ndarray, gg: int, tid: int):
    """Side-info dict + main-data bits for one mono granule."""
    nz = np.nonzero(q)[0]
    big = 0 if len(nz) == 0 else int(nz[-1]) + 1
    big += big & 1
    bw = _BitWriter()
    encode_big_values(bw, list(q[:big]), tid) if big else None
    g = {"part2_3_length": bw.tell(), "big_values": big // 2,
         "global_gain": gg, "scalefac_compress": 0,
         "window_switching": 0, "table_select": [tid, tid, tid],
         "region0_count": 15, "region1_count": 5,
         "preflag": 0, "scalefac_scale": 0, "count1table_select": 0}
    return g, bw


def encode_mp3(pcm: np.ndarray, sample_rate: int = 44100,
               bitrate: int = 320, table: int = 9,
               max_q: int = 5) -> bytes:
    """Encode mono float PCM to an MPEG-1 Layer III stream (long
    blocks, no reservoir)."""
    sr_idx = {44100: 0, 48000: 1, 32000: 2}[sample_rate]
    br_idx = {32: 1, 40: 2, 48: 3, 56: 4, 64: 5, 80: 6, 96: 7, 112: 8,
              128: 9, 160: 10, 192: 11, 224: 12, 256: 13, 320: 14}[bitrate]
    sub = analyze(pcm)
    n_gr = len(sub) // 18
    prev = np.zeros((18, 32))
    frames = []
    gr_queue = []
    for gi in range(n_gr):
        cur = sub[gi * 18:(gi + 1) * 18]
        xr = mdct_bands(cur, prev)
        prev = cur
        gg, q = quantize(xr, max_q)
        gr_queue.append(_granule_bits(q, gg, table))
    # pad to an even granule count (frames carry 2)
    if len(gr_queue) % 2:
        gr_queue.append(_granule_bits(np.zeros(576, dtype=int), 210,
                                      table))
    frame_len = 1152 // 8 * bitrate * 1000 // sample_rate
    for fi in range(len(gr_queue) // 2):
        header = bytes([0xFF,
                        0xE0 | (3 << 3) | (1 << 1) | 1,  # MPEG1 L3 nocrc
                        (br_idx << 4) | (sr_idx << 2),
                        (3 << 6)])                        # mono
        side = _BitWriter()
        side.put(0, 9)      # main_data_begin
        side.put(0, 5)      # private (mono)
        side.put(0, 4)      # scfsi
        main = _BitWriter()
        for g, gbits in gr_queue[fi * 2:fi * 2 + 2]:
            side.put(g["part2_3_length"], 12)
            side.put(g["big_values"], 9)
            side.put(g["global_gain"], 8)
            side.put(g["scalefac_compress"], 4)
            side.put(0, 1)  # window_switching
            for t in g["table_select"]:
                side.put(t, 5)
            side.put(g["region0_count"], 4)
            side.put(g["region1_count"], 3)
            side.put(g["preflag"], 1)
            side.put(g["scalefac_scale"], 1)
            side.put(g["count1table_select"], 1)
            for b in gbits.bits:
                main.bits.append(b)
        main_bytes = main.bytes()
        body = side.bytes(pad_to=17) + main_bytes
        if len(body) + 4 > frame_len:
            raise ValueError("granule too large for frame: raise bitrate")
        frames.append(header + body + b"\x00" * (frame_len - 4 - len(body)))
    return b"".join(frames)
