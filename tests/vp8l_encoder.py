"""Minimal VP8L (lossless WebP) ENCODER — test fixture only.

Written independently from the same public WebP Lossless Bitstream
Specification the decoder implements, so a pixel-accurate round-trip
through both is a real cross-check of the bitstream details (canonical
prefix codes + the code-length machinery, LZ77 length/distance extra
bits and the close-distance plane mapping, color cache hashing, the
forward side of all four transforms), not a tautology.

Deliberately simple where the spec allows: one prefix-code group unless
a meta map is given, literal 0-15 code-length symbols only (no 16/17/18
repeats — the decoder still must handle the full 19-symbol code-length
code), no trailing-zero budget.
"""

from __future__ import annotations

import heapq

from fortissimo_spark.vp8l import DIST_MAP


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def bit(self, b: int) -> None:
        self.bits.append(b & 1)

    def write(self, v: int, n: int) -> None:
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


def code_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Huffman code lengths from symbol frequencies (heap Huffman; small
    test alphabets never hit the depth limit, asserted)."""
    syms = [s for s, f in freqs.items() if f > 0]
    if not syms:
        raise ValueError("no symbols")
    if len(syms) == 1:
        return {syms[0]: 1}
    heap = [(freqs[s], [s]) for s in syms]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    while len(heap) > 1:
        fa, sa = heapq.heappop(heap)
        fb, sb = heapq.heappop(heap)
        for s in sa + sb:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, sa + sb))
    assert max(depth.values()) <= max_len
    return depth


def canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, canonical code), ascending (length, symbol)."""
    items = sorted((ln, s) for s, ln in lengths.items() if ln > 0)
    out = {}
    code = 0
    prev = items[0][0]
    for ln, s in items:
        code <<= (ln - prev)
        prev = ln
        out[s] = (ln, code)
        code += 1
    return out


def write_symbol(bw: BitWriter, codes, sym: int) -> None:
    ln, code = codes[sym]
    for i in range(ln - 1, -1, -1):  # MSB of the code first
        bw.bit((code >> i) & 1)


_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def write_prefix_code(bw: BitWriter, lengths: dict[int, int],
                      alphabet_size: int, *, force_normal: bool = False):
    """Emit one prefix code; returns the symbol->(len,code) map."""
    used = sorted(s for s, ln in lengths.items() if ln > 0)
    if not force_normal and len(used) <= 2 and all(
            lengths[s] == 1 for s in used) and used[-1] < 256:
        bw.bit(1)  # simple
        bw.bit(len(used) - 1)
        if used[0] > 1:
            bw.bit(1)
            bw.write(used[0], 8)
        else:
            bw.bit(0)
            bw.write(used[0], 1)
        if len(used) == 2:
            bw.write(used[1], 8)
        return canonical_codes({s: 1 for s in used}) if len(used) > 1 \
            else {used[0]: (0, 0)}
    bw.bit(0)  # normal code
    seq = [lengths.get(s, 0) for s in range(alphabet_size)]
    # trim trailing zeros via the max-symbol budget? keep simple: code all
    cl_freq: dict[int, int] = {}
    for v in seq:
        cl_freq[v] = cl_freq.get(v, 0) + 1
    cl_lens = code_lengths(cl_freq, max_len=7)
    if len([s for s in cl_freq if cl_freq[s] > 0]) == 1:
        # single distinct value: give it length 1 anyway (decoder treats a
        # single-symbol tree as zero-bit reads, so the lengths are never
        # read from the stream; still emit a consistent table)
        cl_lens = {next(iter(cl_freq)): 1}
    # emit all 19 code-length-code lengths (num_code_lengths = 19)
    bw.write(19 - 4, 4)
    for s in _CL_ORDER:
        bw.write(cl_lens.get(s, 0), 3)
    cl_codes = canonical_codes(cl_lens) if len(cl_lens) > 1 else \
        {next(iter(cl_lens)): (0, 0)}
    bw.bit(0)  # no explicit max-symbol budget
    for v in seq:
        write_symbol(bw, cl_codes, v)
    single = [s for s in used]
    if len(single) == 1:
        return {single[0]: (0, 0)}
    return canonical_codes({s: ln for s, ln in lengths.items() if ln > 0})


def prefix_encode(v: int) -> tuple[int, int, int]:
    """1-based value -> (code, extra_bits_value, extra_bits_count)."""
    x = v - 1
    if x < 4:
        return x, 0, 0
    hb = x.bit_length() - 1
    second = (x >> (hb - 1)) & 1
    code = 2 * hb + second
    extra = hb - 1
    return code, x - ((2 + second) << extra), extra


def cache_hash(px: int, bits: int) -> int:
    return (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - bits)


GREEN, RED, BLUE, ALPHA, DIST = range(5)


def write_entropy_image(bw: BitWriter, tokens_by_group: list[list],
                        order: list[int], *, cache_bits: int = 0,
                        meta: tuple[int, list[int]] | None = None,
                        level0: bool = False):
    """Write one entropy-coded image.

    ``tokens_by_group[g]`` is the token list for prefix group ``g``:
    ('lit', argb) | ('copy', length, dist_1based) | ('cache', idx).
    ``order`` gives, per emitted token, its group index (scan order).
    ``meta`` = (block_bits, group_ids) writes the meta-prefix image
    first. The meta bit exists only at level 0 (the decoder does not
    read it for sub-images)."""
    if level0:
        if meta is not None:
            bw.bit(1)
            bits, group_ids = meta
            bw.write(bits - 2, 3)
            write_entropy_image(
                bw, [[("lit", 0xFF000000 | (g << 8)) for g in group_ids]],
                [0] * len(group_ids))
        else:
            bw.bit(0)
    if cache_bits:
        bw.bit(1)
        bw.write(cache_bits, 4)
    else:
        bw.bit(0)

    n_groups = len(tokens_by_group)
    # histogram per group
    group_codes = []
    plans = []
    for toks in tokens_by_group:
        freq = [dict() for _ in range(5)]

        def bump(ch, s):
            freq[ch][s] = freq[ch].get(s, 0) + 1

        for t in toks:
            if t[0] == "lit":
                a, r, g, b = (t[1] >> 24) & 255, (t[1] >> 16) & 255, \
                    (t[1] >> 8) & 255, t[1] & 255
                bump(GREEN, g)
                bump(RED, r)
                bump(BLUE, b)
                bump(ALPHA, a)
            elif t[0] == "copy":
                lc, _, _ = prefix_encode(t[1])
                dc, _, _ = prefix_encode(t[2])
                bump(GREEN, 256 + lc)
                bump(DIST, dc)
            else:
                bump(GREEN, 256 + 24 + t[1])
        plans.append(freq)
    for gi, freq in enumerate(plans):
        codes = []
        for ch in range(5):
            alpha_size = (256 + 24 + (1 << cache_bits if cache_bits else 0)
                          ) if ch == GREEN else (40 if ch == DIST else 256)
            f = freq[ch] or {0: 1}  # unused channel: 1-symbol code
            lens = code_lengths(f)
            codes.append(write_prefix_code(bw, lens, alpha_size))
        group_codes.append(codes)

    iters = [iter(toks) for toks in tokens_by_group]
    for g in order:
        t = next(iters[g])
        codes = group_codes[g]
        if t[0] == "lit":
            px = t[1]
            write_symbol(bw, codes[GREEN], (px >> 8) & 255)
            write_symbol(bw, codes[RED], (px >> 16) & 255)
            write_symbol(bw, codes[BLUE], px & 255)
            write_symbol(bw, codes[ALPHA], (px >> 24) & 255)
        elif t[0] == "copy":
            lc, lv, ln = prefix_encode(t[1])
            write_symbol(bw, codes[GREEN], 256 + lc)
            bw.write(lv, ln)
            dc, dv, dn = prefix_encode(t[2])
            write_symbol(bw, codes[DIST], dc)
            bw.write(dv, dn)
        else:
            write_symbol(bw, codes[GREEN], 256 + 24 + t[1])


def tokenize(pixels: list[int], *, cache_bits: int = 0,
             copies: list[tuple[int, int, int]] = ()) -> list:
    """Scan-order tokens for ``pixels``: literals, the requested
    ('copy' at_pos, length, scan_distance) spans, and cache hits when
    ``cache_bits`` (emitted whenever the exact pixel sits in the
    simulated cache)."""
    copy_at = {pos: (ln, d) for pos, ln, d in copies}
    cache = [None] * (1 << cache_bits) if cache_bits else None
    toks = []
    pos = 0
    while pos < len(pixels):
        if pos in copy_at:
            ln, d = copy_at[pos]
            toks.append(("copy", ln, d))
            for i in range(ln):
                assert pixels[pos + i] == pixels[pos + i - d]
                if cache is not None:
                    cache[cache_hash(pixels[pos + i], cache_bits)] = \
                        pixels[pos + i]
            pos += ln
            continue
        px = pixels[pos]
        if cache is not None and cache[cache_hash(px, cache_bits)] == px:
            toks.append(("cache", cache_hash(px, cache_bits)))
        else:
            toks.append(("lit", px))
        if cache is not None:
            cache[cache_hash(px, cache_bits)] = px
        pos += 1
    return toks


def encode_vp8l(width: int, height: int, tokens, *, cache_bits: int = 0,
                transforms: list = (), meta=None,
                order: list[int] | None = None) -> bytes:
    """Build a whole .webp file (RIFF/WEBP/VP8L) from pre-built tokens.
    ``transforms`` are (type_id, writer_fn) pairs emitted in order —
    writer_fn(bw) writes the transform payload."""
    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.bit(0)  # alpha hint
    bw.write(0, 3)  # version
    for type_id, writer in transforms:
        bw.bit(1)
        bw.write(type_id, 2)
        writer(bw)
    bw.bit(0)  # no more transforms
    groups = tokens if isinstance(tokens[0], list) else [tokens]
    if order is None:
        order = [0] * sum(len(g) for g in groups)
    write_entropy_image(bw, groups, order, cache_bits=cache_bits,
                        meta=meta, level0=True)
    payload = bw.bytes()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def subimage_writer(width: int, pixels: list[int], block_bits: int):
    """Transform-payload writer for predictor/color transforms: 3-bit
    size, then the sub-image as a literal-only entropy image."""
    def write(bw: BitWriter) -> None:
        bw.write(block_bits - 2, 3)
        write_entropy_image(bw, [[("lit", p) for p in pixels]],
                            [0] * len(pixels))
    return write


def palette_writer(palette: list[int]):
    def write(bw: BitWriter) -> None:
        bw.write(len(palette) - 1, 8)
        deltas = []
        prev = 0
        for p in palette:
            d = 0
            for sh in (24, 16, 8, 0):
                d |= ((((p >> sh) & 0xFF) - ((prev >> sh) & 0xFF))
                      & 0xFF) << sh
            deltas.append(d)
            prev = p
        write_entropy_image(bw, [[("lit", d) for d in deltas]],
                            [0] * len(deltas))
    return write
