"""Pure-Python VP8L (lossless WebP) decoder.

Implements the public WebP Lossless Bitstream Specification (the format
shipped in ``.webp`` files as the ``VP8L`` RIFF chunk; reference
implementation is libwebp, but this is written from the spec — same
honest dependency-free pattern as the repo's PNG/JPEG/PDF decoders):

* LSB-first bitstream, 14-bit dimensions header;
* canonical prefix (Huffman) codes — the DEFLATE bit-packing convention
  (most-significant code bit first), both the 2-phase code-length
  machinery (19-symbol code-length code in the fixed reorder, repeat
  opcodes 16/17/18, optional max-symbol budget) and the 1/2-symbol
  "simple" codes;
* per-pixel decoding with five prefix codes per group (green+length+
  cache, red, blue, alpha, distance), optional meta-prefix image
  selecting the group per macro-block;
* LZ77 backward references (length/distance prefix coding with extra
  bits, the 120-entry close-neighborhood distance mapping) and the
  hash-addressed color cache;
* all four transforms, inverted in reverse order: PREDICTOR (14 spatial
  predictor modes per macro-block), COLOR (per-block cross-color
  deltas), SUBTRACT_GREEN, and COLOR_INDEXING (palette with delta-coded
  entries and sub-byte pixel bundling for palettes <= 16).

Per-pixel Python — fine for thumbnail-scale crawl images inside the
Arrow-batched ``modality.image_features`` kernel, which is the consumer.
"""

from __future__ import annotations

__all__ = ["decode_vp8l", "decode_vp8l_chunk", "DIST_MAP"]


# --- bitstream -----------------------------------------------------------

class _BitReader:
    """LSB-first bit reader over bytes (the VP8L packing)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        p = self.pos
        if (p >> 3) >= len(self.data):
            raise ValueError("VP8L bitstream truncated")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v


# --- canonical prefix codes ---------------------------------------------

class _Huffman:
    """Canonical prefix decoder. Codes are packed most-significant code
    bit first (the DEFLATE/RFC1951 convention the VP8L spec shares), so
    decode accumulates ``code = (code << 1) | next_bit``."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]):
        nonzero = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nonzero:
            raise ValueError("empty prefix code")
        if len(nonzero) == 1:
            # a single used symbol is coded in ZERO bits
            self.single = nonzero[0][1]
            self.table = None
            return
        self.single = None
        # canonical assignment: ascending (length, symbol)
        nonzero.sort()
        table: dict[tuple[int, int], int] = {}
        code = 0
        prev_len = nonzero[0][0]
        for ln, sym in nonzero:
            code <<= (ln - prev_len)
            prev_len = ln
            table[(ln, code)] = sym
            code += 1
        if code != (1 << prev_len):
            raise ValueError("over/under-subscribed prefix code")
        self.table = table

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("bad prefix code in stream")


_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_code_lengths(br: _BitReader, alphabet_size: int) -> list[int]:
    """One prefix code's symbol lengths via the code-length machinery."""
    if br.bit():  # simple code: 1 or 2 symbols
        num_symbols = br.bit() + 1
        first_8bit = br.bit()
        sym0 = br.bits(8 if first_8bit else 1)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("simple-code symbol out of range")
        lengths[sym0] = 1
        if num_symbols == 2:
            sym1 = br.bits(8)
            if sym1 >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            lengths[sym1] = 1
        return lengths
    num_cl = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl_tree = _Huffman(cl_lengths)
    if br.bit():  # explicit budget of coded symbols
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_tree.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        else:
            if cl == 16:
                rep, val = 3 + br.bits(2), prev_len
            elif cl == 17:
                rep, val = 3 + br.bits(3), 0
            else:
                rep, val = 11 + br.bits(7), 0
            if symbol + rep > alphabet_size:
                raise ValueError("code-length repeat overflows alphabet")
            for _ in range(rep):
                lengths[symbol] = val
                symbol += 1
    return lengths


# --- LZ77 helpers --------------------------------------------------------

def _dist_map() -> list[tuple[int, int]]:
    """The 120 closest (dx, dy) offsets for distance codes 1..120, in
    spec order: sorted by squared distance, then |dx| ascending, positive
    dx before negative (verified against the spec table's packed plane
    codes: 0x18 0x07 0x17 0x19 0x28 0x06 ... = (0,1) (1,0) (1,1) (-1,1)
    (0,2) (2,0) ...)."""
    cand = [(dx, dy) for dy in range(16) for dx in range(-7, 9)
            if dy > 0 or dx > 0]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    return cand[:120]


DIST_MAP = _dist_map()


def _prefix_value(code: int, br: _BitReader) -> int:
    """Length/distance prefix decoding: 1-based value with extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _plane_to_dist(code: int, xsize: int) -> int:
    """Map a 1-based distance prefix value to a scan-order distance."""
    if code > 120:
        return code - 120
    dx, dy = DIST_MAP[code - 1]
    # libwebp PlaneCodeToDistance: dist = yoffset * xsize + xoffset with
    # xoffset = 8 - (packed & 0xF); our dx already carries that sign, so
    # the distance is dy*xsize + dx (clamped to >= 1), NOT - dx.
    return max(1, dy * xsize + dx)


# --- entropy-coded image -------------------------------------------------

_GREEN, _RED, _BLUE, _ALPHA, _DIST = range(5)
_ALPHABETS = (256 + 24, 256, 256, 256, 40)


def _read_group(br: _BitReader, cache_bits: int) -> list[_Huffman]:
    group = []
    for i, size in enumerate(_ALPHABETS):
        alpha = size + ((1 << cache_bits) if i == _GREEN and cache_bits
                       else 0)
        group.append(_Huffman(_read_code_lengths(br, alpha)))
    return group


def _decode_entropy_image(br: _BitReader, w: int, h: int,
                          level0: bool) -> list[int]:
    """Decode an entropy-coded image to a list of w*h ARGB uint32.
    ``level0`` enables the meta-prefix image (spatially-coded main image
    only); color cache is allowed at every level."""
    meta = None
    meta_w = meta_bits = 0
    n_groups = 1
    if level0 and br.bit():
        meta_bits = br.bits(3) + 2
        meta_w = (w + (1 << meta_bits) - 1) >> meta_bits
        meta_h = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_image_stream(br, meta_w, meta_h, level0=False)
        meta = [(p >> 8) & 0xFFFF for p in meta_img]
        n_groups = max(meta) + 1
    cache_bits = br.bits(4) if br.bit() else 0
    if cache_bits > 11:
        raise ValueError("color cache too large")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    groups = [_read_group(br, cache_bits) for _ in range(n_groups)]

    out = [0] * (w * h)
    pos = 0
    total = w * h

    def cache_insert(px: int) -> None:
        cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px

    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            g = groups[meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]]
        else:
            g = groups[0]
        s = g[_GREEN].read(br)
        if s < 256:
            red = g[_RED].read(br)
            blue = g[_BLUE].read(br)
            alpha = g[_ALPHA].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache is not None:
                cache_insert(px)
        elif s < 256 + 24:
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(g[_DIST].read(br), br)
            dist = _plane_to_dist(dist_code, w)
            if dist > pos or pos + length > total:
                raise ValueError("backward reference out of range")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache_insert(px)
        else:
            if cache is None:
                raise ValueError("cache symbol without color cache")
            idx = s - 256 - 24
            out[pos] = cache[idx]
            pos += 1
    return out


# --- transforms ----------------------------------------------------------

def _avg2(a: int, b: int) -> int:
    return ((((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)) & 0xFFFFFFFF


def _add_px(a: int, b: int) -> int:
    """Per-channel modular byte addition of two ARGB words."""
    return (((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00) | \
           (((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF)


def _sub3(a: int, b: int, c: int) -> int:
    return abs(b - c) - abs(a - c)


def _select(a: int, b: int, c: int) -> int:
    d = (_sub3(a >> 24, b >> 24, c >> 24)
         + _sub3((a >> 16) & 0xFF, (b >> 16) & 0xFF, (c >> 16) & 0xFF)
         + _sub3((a >> 8) & 0xFF, (b >> 8) & 0xFF, (c >> 8) & 0xFF)
         + _sub3(a & 0xFF, b & 0xFF, c & 0xFF))
    return a if d <= 0 else b


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clamp(((a >> sh) & 0xFF) + ((b >> sh) & 0xFF)
                      - ((c >> sh) & 0xFF)) << sh
    return out


def _clamp_add_sub_half(ave: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        av = (ave >> sh) & 0xFF
        # libwebp uses C integer division (truncation toward zero), not
        # an arithmetic shift (floor): for av < c with an odd delta the
        # two differ by one.
        d = av - ((c >> sh) & 0xFF)
        half = -((-d) // 2) if d < 0 else d // 2
        out |= _clamp(av + half) << sh
    return out


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), top)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(tl, top)
    if mode == 9:
        return _avg2(top, tr)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(top, tr))
    if mode == 11:
        return _select(top, left, tl)
    if mode == 12:
        return _clamp_add_sub_full(left, top, tl)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(left, top), tl)
    raise ValueError(f"bad predictor mode {mode}")


def _inv_predictor(px: list[int], w: int, h: int, bits: int,
                   modes: list[int], mw: int) -> None:
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[i - 1]
            elif x == 0:
                pred = px[i - w]
            else:
                mode = (modes[(y >> bits) * mw + (x >> bits)] >> 8) & 0xFF
                pred = _predict(mode, px[i - 1], px[i - w], px[i - w - 1],
                                px[i - w + 1])
            px[i] = _add_px(px[i], pred)


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    return (_s8(t) * _s8(c)) >> 5


def _inv_color_transform(px: list[int], w: int, h: int, bits: int,
                         elems: list[int], mw: int) -> None:
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            e = elems[(y >> bits) * mw + (x >> bits)]
            g2r, g2b, r2b = e & 0xFF, (e >> 8) & 0xFF, (e >> 16) & 0xFF
            p = px[i]
            green = (p >> 8) & 0xFF
            red = ((p >> 16) & 0xFF) + _ct_delta(g2r, green)
            red &= 0xFF
            blue = (p & 0xFF) + _ct_delta(g2b, green) + _ct_delta(r2b, red)
            px[i] = (p & 0xFF00FF00) | (red << 16) | (blue & 0xFF)


def _inv_subtract_green(px: list[int]) -> None:
    for i, p in enumerate(px):
        g = (p >> 8) & 0xFF
        red = (((p >> 16) & 0xFF) + g) & 0xFF
        blue = ((p & 0xFF) + g) & 0xFF
        px[i] = (p & 0xFF00FF00) | (red << 16) | blue


def _palette_width_bits(size: int) -> int:
    if size <= 2:
        return 3
    if size <= 4:
        return 2
    if size <= 16:
        return 1
    return 0


def _inv_color_indexing(px: list[int], w: int, h: int,
                        palette: list[int]) -> list[int]:
    wb = _palette_width_bits(len(palette))
    if wb == 0:
        return [palette[(p >> 8) & 0xFF] if ((p >> 8) & 0xFF) < len(palette)
                else 0 for p in px]
    packed_w = (w + (1 << wb) - 1) >> wb
    per = 1 << wb
    bits_per = 8 >> wb
    mask = (1 << bits_per) - 1
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            packed = (px[y * packed_w + (x >> wb)] >> 8) & 0xFF
            idx = (packed >> ((x % per) * bits_per)) & mask
            out[y * w + x] = palette[idx] if idx < len(palette) else 0
    return out


# --- image stream --------------------------------------------------------

_PREDICTOR_T, _COLOR_T, _SUBTRACT_GREEN_T, _COLOR_INDEX_T = range(4)


def _decode_image_stream(br: _BitReader, w: int, h: int, *,
                         level0: bool) -> list[int]:
    transforms = []  # (type, payload) in read order
    xsize = w
    if level0:
        seen = set()
        while br.bit():
            t = br.bits(2)
            if t in seen:
                raise ValueError("transform repeated")
            seen.add(t)
            if t == _PREDICTOR_T or t == _COLOR_T:
                bits = br.bits(3) + 2
                mw = (xsize + (1 << bits) - 1) >> bits
                mh = (h + (1 << bits) - 1) >> bits
                sub = _decode_image_stream(br, mw, mh, level0=False)
                transforms.append((t, (bits, sub, mw)))
            elif t == _SUBTRACT_GREEN_T:
                transforms.append((t, None))
            else:  # color indexing
                n_colors = br.bits(8) + 1
                deltas = _decode_image_stream(br, n_colors, 1, level0=False)
                palette = []
                prev = 0
                for d in deltas:
                    prev = _add_px(prev, d)
                    palette.append(prev)
                transforms.append((t, palette))
                wb = _palette_width_bits(n_colors)
                xsize = (xsize + (1 << wb) - 1) >> wb
    px = _decode_entropy_image(br, xsize, h, level0)
    for t, payload in reversed(transforms):
        if t == _COLOR_INDEX_T:
            px = _inv_color_indexing(px, w, h, payload)
            xsize = w
        elif t == _SUBTRACT_GREEN_T:
            _inv_subtract_green(px)
        elif t == _PREDICTOR_T:
            bits, sub, mw = payload
            _inv_predictor(px, xsize, h, bits, sub, mw)
        else:
            bits, sub, mw = payload
            _inv_color_transform(px, xsize, h, bits, sub, mw)
    return px


def decode_vp8l_chunk(data: bytes) -> tuple[int, int, list[int]]:
    """Decode raw VP8L chunk bytes -> (width, height, ARGB uint32 list,
    scan order)."""
    if not data or data[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReader(data)
    br.pos = 8
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha-is-used hint
    if br.bits(3) != 0:
        raise ValueError("unsupported VP8L version")
    return w, h, _decode_image_stream(br, w, h, level0=True)


def decode_vp8l(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a whole-file lossless WebP (RIFF/WEBP/VP8L) -> (width,
    height, ARGB pixels). Raises ValueError for non-VP8L WebP flavors
    (lossy VP8 needs a video codec; VP8X-wrapped lossless is unwrapped
    when its image chunk is VP8L)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    i = 12
    while i + 8 <= len(payload):
        fourcc = payload[i:i + 4]
        size = int.from_bytes(payload[i + 4:i + 8], "little")
        body = payload[i + 8:i + 8 + size]
        if fourcc == b"VP8L":
            return decode_vp8l_chunk(body)
        i += 8 + size + (size & 1)  # chunks are 2-byte aligned
    raise ValueError("no VP8L chunk (lossy WebP needs a video codec)")
