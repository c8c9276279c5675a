"""VP8L decoder vs the independent test-side encoder (vp8l_encoder.py).

Both sides are written from the public WebP Lossless Bitstream
Specification with no shared bitstream code, so pixel-exact round-trips
cross-check the format details; predictor/color-transform arithmetic is
additionally pinned by hand-computed vectors (a round-trip alone cannot
catch a matching error in shared per-mode math).
"""

import pytest

from fortissimo_spark.vp8l import (
    DIST_MAP, _ct_delta, _predict, decode_vp8l,
)
from tests.vp8l_encoder import encode_vp8l, tokenize


def lcg_pixels(n, seed=3, alpha=0xFF, spread=256):
    s = seed
    out = []
    for _ in range(n):
        s = (s * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
        r, g, b = (s >> 13) % spread, (s >> 23) % spread, (s >> 33) % spread
        out.append((alpha << 24) | (r << 16) | (g << 8) | b)
    return out


def stream_dist(d, w):
    """Scan distance -> 1-based stream distance code (plane-mapped when
    the neighborhood table has it, else direct)."""
    for i, (dx, dy) in enumerate(DIST_MAP):
        if max(1, dy * w + dx) == d:
            return i + 1
    return d + 120


def test_roundtrip_literals():
    w, h = 11, 7
    px = lcg_pixels(w * h)
    data = encode_vp8l(w, h, tokenize(px))
    assert decode_vp8l(data) == (w, h, px)


def test_roundtrip_two_color_simple_codes():
    # exactly two symbols per channel -> the "simple" prefix-code path
    w, h = 8, 4
    a, b = 0xFF102030, 0xFF405060
    px = [a if (x + y) % 2 else b for y in range(h) for x in range(w)]
    data = encode_vp8l(w, h, tokenize(px))
    assert decode_vp8l(data) == (w, h, px)


def test_roundtrip_single_color():
    w, h = 5, 3
    px = [0x80ABCDEF] * (w * h)
    data = encode_vp8l(w, h, tokenize(px))
    assert decode_vp8l(data) == (w, h, px)


def test_roundtrip_lz77_backrefs():
    w, h = 16, 12
    row = lcg_pixels(w, seed=9)
    px = row * h  # every row repeats the first
    # rows via plane-mapped copies (scan distance w = plane (0,1)), plus
    # one copy from 10 rows back — beyond the 120-entry neighborhood
    # table (max dy there is 8), so it must take a DIRECT >120 code
    toks = tokenize(px, copies=[(w, w, w),            # row 1 <- row 0
                                (2 * w, 2 * w, w),    # rows 2-3 <- 1-2
                                (11 * w, w, 10 * w)])  # row 11 <- row 1
    assert stream_dist(10 * w, w) > 120
    toks = [("copy", t[1], stream_dist(t[2], w)) if t[0] == "copy" else t
            for t in toks]
    data = encode_vp8l(w, h, toks)
    assert decode_vp8l(data) == (w, h, px)


def test_roundtrip_plane_codes_nonzero_dx():
    """Plane codes whose dx != 0 pin the sign in the code->distance
    mapping (dist = dy*xsize + dx, libwebp PlaneCodeToDistance); a wrong
    sign there is invisible to roundtrips that only use (0, dy) codes.
    Exercises code 6 = (2, 0): same-row distance 2, and code 4 =
    (-1, 1): anti-diagonal distance w-1."""
    # code 6: period-2 pixels, one long scan-order copy at distance 2
    w, h = 12, 3
    a, b = 0xFF112233, 0xFF445566
    px = ([a, b] * (w * h // 2 + 1))[:w * h]
    assert stream_dist(2, w) == 6
    toks = tokenize(px, copies=[(2, w * h - 2, 2)])
    toks = [("copy", t[1], stream_dist(t[2], w)) if t[0] == "copy" else t
            for t in toks]
    data = encode_vp8l(w, h, toks)
    assert decode_vp8l(data) == (w, h, px)

    # code 4: pixels constant along anti-diagonals (period 4 | w-1),
    # copied at scan distance w-1 = plane (-1, 1)
    w, h = 9, 5
    pal = lcg_pixels(4, seed=61)
    px = [pal[(x + y) % 4] for y in range(h) for x in range(w)]
    assert stream_dist(w - 1, w) == 4
    toks = tokenize(px, copies=[(w - 1, w * h - (w - 1), w - 1)])
    toks = [("copy", t[1], stream_dist(t[2], w)) if t[0] == "copy" else t
            for t in toks]
    data = encode_vp8l(w, h, toks)
    assert decode_vp8l(data) == (w, h, px)


def test_roundtrip_color_cache():
    w, h = 10, 10
    palette = lcg_pixels(4, seed=17)
    px = [palette[(x * 7 + y * 3) % 4] for y in range(h) for x in range(w)]
    toks = tokenize(px, cache_bits=4)
    assert any(t[0] == "cache" for t in toks)  # cache hits really fire
    data = encode_vp8l(w, h, toks, cache_bits=4)
    assert decode_vp8l(data) == (w, h, px)


def test_roundtrip_subtract_green():
    w, h = 9, 5
    px = lcg_pixels(w * h, seed=5)
    stored = []
    for p in px:
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) - g) & 0xFF
        b = ((p & 0xFF) - g) & 0xFF
        stored.append((p & 0xFF00FF00) | (r << 16) | b)
    data = encode_vp8l(w, h, tokenize(stored),
                       transforms=[(2, lambda bw: None)])
    assert decode_vp8l(data) == (w, h, px)


def _forward_predict(px, w, h, bits, modes, mw):
    """Forward predictor residuals (test-side). Uses the decoder's
    per-mode _predict, so the mode ARITHMETIC is pinned separately by
    test_predict_modes_hand_vectors — this exercises mode selection,
    edge rules, and the transform bitstream."""
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[i - 1]
            elif x == 0:
                pred = px[i - w]
            else:
                mode = modes[(y >> bits) * mw + (x >> bits)]
                pred = _predict(mode, px[i - 1], px[i - w], px[i - w - 1],
                                px[i - w + 1])
            d = 0
            for sh in (24, 16, 8, 0):
                d |= ((((px[i] >> sh) & 0xFF) - ((pred >> sh) & 0xFF))
                      & 0xFF) << sh
            out[i] = d
    return out


def test_predict_modes_hand_vectors():
    """Every predictor mode against hand-computed values (the one piece
    of math the predictor round-trip shares with the decoder)."""
    L, T, TL, TR = 0xFF645028, 0xFF40A060, 0xFF207030, 0xFF80FF10
    assert _predict(0, L, T, TL, TR) == 0xFF000000
    assert _predict(1, L, T, TL, TR) == L
    assert _predict(2, L, T, TL, TR) == T
    assert _predict(3, L, T, TL, TR) == TR
    assert _predict(4, L, T, TL, TR) == TL
    # avg2 floors per channel: avg(L,T) = (0x64+0x40)/2, (0x50+0xa0)/2...
    assert _predict(7, L, T, TL, TR) == 0xFF527844
    assert _predict(6, L, T, TL, TR) == 0xFF42602C  # avg(L,TL)
    assert _predict(8, L, T, TL, TR) == 0xFF308848  # avg(TL,T)
    assert _predict(9, L, T, TL, TR) == 0xFF60CF38  # avg(T,TR)
    # 5: avg(avg(L,TR),T) -> avg(L,TR)=0xFF72A71C; avg(...,T)=0xFF59A33E
    assert _predict(5, L, T, TL, TR) == 0xFF59A33E
    # 10: avg(avg(L,TL), avg(T,TR)) = avg(0xFF42602C, 0xFF60CF38)
    assert _predict(10, L, T, TL, TR) == 0xFF519732
    # 11 Select: sum |L-TL| - |T-TL| per ch = (68+32+8)-(32+48+48) -> T
    assert _predict(11, L, T, TL, TR) == T
    # 12: clamp(L+T-TL) per channel: 64+40-20=84, 50+a0-70=80, 28+60-30=58
    assert _predict(12, L, T, TL, TR) == 0xFF848058
    # 13: ave=avg(L,T)=0xFF527844; ch + (ch-TL_ch)>>1:
    #   52+(52-20)/2=6b? 0x52-0x20=0x32>>1=0x19 -> 0x6B
    #   78+(78-70)/2=0x7C; 44+(44-30)/2=0x4E
    assert _predict(13, L, T, TL, TR) == 0xFF6B7C4E


def test_predict_mode13_truncates_toward_zero():
    """ClampAddSubtractHalf uses C integer division (truncation toward
    zero), not a floor shift: for ave < TL with an odd delta the two
    differ by one.  ave=avg(L,T)=0xFF203040 vs TL=0xFF215263:
    R: d=-1 -> half 0 (floor would give -1), G: d=-34 -> -17,
    B: d=-35 -> -17 (floor: -18)."""
    L, T, TL = 0xFF102030, 0xFF304050, 0xFF215263
    assert _predict(13, L, T, TL, 0) == 0xFF201F2F


def test_roundtrip_predictor_transform():
    w, h = 16, 16
    bits, mw, mh = 2, 4, 4  # 4x4 blocks
    px = lcg_pixels(w * h, seed=21)
    modes = [(3 * bx + by) % 14 for by in range(mh) for bx in range(mw)]
    residuals = _forward_predict(px, w, h, bits, modes, mw)
    from tests.vp8l_encoder import subimage_writer
    mode_px = [0xFF000000 | (m << 8) for m in modes]
    data = encode_vp8l(w, h, tokenize(residuals),
                       transforms=[(0, subimage_writer(mw, mode_px, bits))])
    assert decode_vp8l(data) == (w, h, px)


def test_ct_delta_hand_vectors():
    # (int8(t) * int8(c)) >> 5, arithmetic shift
    assert _ct_delta(0x10, 0x40) == (16 * 64) >> 5  # 32
    assert _ct_delta(0xF0, 0x40) == (-16 * 64) >> 5  # -32
    assert _ct_delta(0x80, 0x7F) == (-128 * 127) >> 5  # -508
    assert _ct_delta(0x05, 0x90) == (5 * -112) >> 5  # -18 (floor)


def test_roundtrip_color_transform():
    w, h = 8, 8
    bits, mw = 2, 2  # 4x4 blocks, 2x2 block grid
    px = lcg_pixels(w * h, seed=33)
    # per-block elements: blue channel g2r, green g2b, red r2b
    elems = [0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
             for g2r, g2b, r2b in
             [(0x10, 0x20, 0x08), (0xF0, 0x05, 0x00),
              (0x00, 0xE8, 0x15), (0x3C, 0x3C, 0x3C)]]
    stored = []
    for i, p in enumerate(px):
        y, x = divmod(i, w)
        e = elems[(y >> bits) * mw + (x >> bits)]
        g2r, g2b, r2b = e & 0xFF, (e >> 8) & 0xFF, (e >> 16) & 0xFF
        g = (p >> 8) & 0xFF
        r = (p >> 16) & 0xFF
        b = p & 0xFF
        sr = (r - _ct_delta(g2r, g)) & 0xFF
        sb = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
        stored.append((p & 0xFF00FF00) | (sr << 16) | sb)
    from tests.vp8l_encoder import subimage_writer
    data = encode_vp8l(w, h, tokenize(stored),
                       transforms=[(1, subimage_writer(mw, elems, bits))])
    assert decode_vp8l(data) == (w, h, px)


@pytest.mark.parametrize("n_colors,width_bits", [(3, 2), (12, 1), (2, 3),
                                                 (40, 0)])
def test_roundtrip_color_indexing(n_colors, width_bits):
    """Palette transform incl. sub-byte pixel bundling (2/4/8 px per
    byte) and the unbundled >16-color case."""
    from tests.vp8l_encoder import palette_writer
    w, h = 13, 5  # 13 % bundle sizes != 0: exercises the ragged tail
    palette = lcg_pixels(n_colors, seed=41)
    idx = [(x * 5 + y * 11 + x * y) % n_colors
           for y in range(h) for x in range(w)]
    px = [palette[i] for i in idx]
    if width_bits:
        per = 1 << width_bits
        bp = 8 >> width_bits
        packed_w = (w + per - 1) // per
        stored = []
        for y in range(h):
            for bx in range(packed_w):
                v = 0
                for k in range(per):
                    x = bx * per + k
                    if x < w:
                        v |= idx[y * w + x] << (k * bp)
                stored.append(0xFF000000 | (v << 8))
    else:
        stored = [0xFF000000 | (i << 8) for i in idx]
    data = encode_vp8l(w, h, tokenize(stored),
                       transforms=[(3, palette_writer(palette))])
    assert decode_vp8l(data) == (w, h, px)


def test_roundtrip_meta_prefix_groups():
    """Two prefix-code groups selected by the meta image (8x8 blocks):
    left blocks code red-ish pixels, right blocks blue-ish, each with its
    own statistics."""
    w, h = 16, 8
    left = lcg_pixels(64, seed=51, spread=64)
    right = [0xFF000000 | (p & 0xFFFF) for p in lcg_pixels(64, seed=52)]
    px, order = [], []
    li = ri = 0
    for y in range(h):
        for x in range(w):
            if x < 8:
                px.append(left[li]); li += 1; order.append(0)
            else:
                px.append(right[ri]); ri += 1; order.append(1)
    toks0 = [("lit", p) for i, p in enumerate(px) if order[i] == 0]
    toks1 = [("lit", p) for i, p in enumerate(px) if order[i] == 1]
    data = encode_vp8l(w, h, [toks0, toks1], meta=(3, [0, 1]), order=order)
    assert decode_vp8l(data) == (w, h, px)


def test_dist_map_pinned_prefix():
    """The first 24 distance-map entries exactly as the spec lists them
    (packed plane codes 0x18 0x07 0x17 0x19 0x28 0x06 ...)."""
    want = [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
            (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
            (1, 3), (-1, 3), (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2),
            (-3, 2), (0, 4), (4, 0)]
    assert DIST_MAP[:24] == want
    assert len(DIST_MAP) == len(set(DIST_MAP)) == 120


def test_corrupt_streams_raise():
    px = lcg_pixels(12)
    data = encode_vp8l(4, 3, tokenize(px))
    assert decode_vp8l(data) == (4, 3, px)
    with pytest.raises(ValueError):
        decode_vp8l(data[:20])  # truncated mid-stream
    with pytest.raises(ValueError):
        decode_vp8l(b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"\x00" * 10)
    bad = bytearray(data)
    bad[20] ^= 0xFF  # corrupt the header region
    try:
        decode_vp8l(bytes(bad))
    except ValueError:
        pass  # either outcome acceptable: error or garbage pixels


def test_decode_image_webp_lossless_pixels():
    """modality.decode_image produces the REAL block-averaged gray grid
    for a lossless WebP (not a digest stand-in), pixel-accurate against
    the known source image."""
    from fortissimo_spark.modality import _gray_grid, decode_image
    w, h = 20, 12
    px = lcg_pixels(w * h, seed=77)
    data = encode_vp8l(w, h, tokenize(px))

    def luma(x, y):
        p = px[y * w + x]
        return ((p >> 16 & 0xFF) * 299 + (p >> 8 & 0xFF) * 587
                + (p & 0xFF) * 114) // 1000

    assert decode_image(data) == (w, h, _gray_grid(w, h, luma))


def test_roundtrip_randomized_fuzz():
    """Deterministic fuzz: 40 random images through random feature
    combinations (dims, palette-like content, cache bits, subtract-green,
    LZ77 self-copies) must round-trip pixel-exact."""
    rs = 12345

    def rnd(n):
        nonlocal rs
        rs = (rs * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
        return (rs >> 17) % n

    for case in range(40):
        w, h = 1 + rnd(23), 1 + rnd(17)
        n = w * h
        style = rnd(3)
        if style == 0:  # diverse pixels
            px = lcg_pixels(n, seed=case + 1)
        elif style == 1:  # tiny palette -> repeats, cache-friendly
            pal = lcg_pixels(1 + rnd(5), seed=case + 100)
            px = [pal[rnd(len(pal))] for _ in range(n)]
        else:  # rows repeat -> LZ77 copies
            row = lcg_pixels(w, seed=case + 200)
            px = (row * h)[:n]
        cache_bits = (1 + rnd(8)) if rnd(2) else 0
        copies = []
        if style == 2 and h >= 3 and n > 2 * w:
            copies = [(w, min(w, n - w), w)]
        toks = tokenize(px, cache_bits=cache_bits, copies=copies)
        toks = [("copy", t[1], stream_dist(t[2], w)) if t[0] == "copy"
                else t for t in toks]
        sub_green = rnd(2) == 1
        if sub_green:
            stored_px = []
            for p in px:
                g = (p >> 8) & 0xFF
                r = (((p >> 16) & 0xFF) - g) & 0xFF
                b = ((p & 0xFF) - g) & 0xFF
                stored_px.append((p & 0xFF00FF00) | (r << 16) | b)
            toks = tokenize(stored_px, cache_bits=cache_bits)
            data = encode_vp8l(w, h, toks, cache_bits=cache_bits,
                               transforms=[(2, lambda bw: None)])
        else:
            data = encode_vp8l(w, h, toks, cache_bits=cache_bits)
        assert decode_vp8l(data) == (w, h, px), (case, w, h, style,
                                                 cache_bits, sub_green)


def test_real_world_vp8l_alpha_stream():
    """Real libwebp encoder output: a WebP ALPH chunk with compression
    method 1 is a VP8L image stream (spec: the lossless format minus the
    signature/dims header). CPython ships one in its test data — the
    Python-logo alpha mask. Decoding it with _decode_image_stream
    cross-checks the prefix-code machinery, bit packing, and image-
    stream layout against a REAL producer, which the self-made test
    encoder cannot do."""
    import glob
    import sys

    from fortissimo_spark.vp8l import _BitReader, _decode_image_stream
    candidates = glob.glob(
        sys.prefix + "/lib/python*/test/imghdrdata/python.webp") + glob.glob(
        sys.prefix + "/lib/python*/test/test_email/data/python.webp")
    if not candidates:
        pytest.skip("no CPython webp test file in this build")
    raw = open(candidates[0], "rb").read()
    alph = canvas = None
    i = 12
    while i + 8 <= len(raw):
        cc, sz = raw[i:i + 4], int.from_bytes(raw[i + 4:i + 8], "little")
        if cc == b"ALPH":
            alph = raw[i + 8:i + 8 + sz]
        if cc == b"VP8X":
            d = raw[i + 8:i + 8 + sz]
            canvas = (int.from_bytes(d[4:7], "little") + 1,
                      int.from_bytes(d[7:10], "little") + 1)
        i += 8 + sz + (sz & 1)
    if alph is None or (alph[0] & 3) != 1:
        pytest.skip("no lossless-compressed ALPH chunk")
    w, h = canvas
    px = _decode_image_stream(_BitReader(alph[1:]), w, h, level0=True)
    alpha = [(p >> 8) & 0xFF for p in px]
    assert len(alpha) == w * h
    # the known shape of the 16x16 python-logo mask: opaque core,
    # transparent border, anti-aliased edge values in between
    assert alpha.count(255) > w * h // 3
    assert alpha.count(0) > w * h // 8
    assert any(0 < a < 255 for a in alpha)


def test_decode_image_vp8x_wrapped_lossless():
    """A VP8X-extended container with an ICCP chunk BEFORE the VP8L
    image still takes the real pixel-decode path (exact chunk walk, not
    a fixed-window byte search); a lossy VP8 container with 'VP8L' as
    literal bytes inside its compressed data does NOT."""
    from fortissimo_spark.modality import _gray_grid, decode_image
    w, h = 8, 6
    px = lcg_pixels(w * h, seed=99)
    plain = encode_vp8l(w, h, tokenize(px))
    vp8l_chunk = plain[20 - 8:]  # the VP8L chunk incl. its header

    def chunk(cc, data):
        return cc + len(data).to_bytes(4, "little") + data \
            + (b"\x00" if len(data) & 1 else b"")

    vp8x = chunk(b"VP8X", b"\x20\x00\x00\x00"  # ICC flag
                 + (w - 1).to_bytes(3, "little")
                 + (h - 1).to_bytes(3, "little"))
    iccp = chunk(b"ICCP", b"\x00" * 97)  # odd size: exercises padding
    body = b"WEBP" + vp8x + iccp + vp8l_chunk
    wrapped = b"RIFF" + len(body).to_bytes(4, "little") + body

    def luma(x, y):
        p = px[y * w + x]
        return ((p >> 16 & 0xFF) * 299 + (p >> 8 & 0xFF) * 587
                + (p & 0xFF) * 114) // 1000

    assert decode_image(wrapped) == (w, h, _gray_grid(w, h, luma))

    # lossy VP8 whose payload contains the literal 'VP8L' bytes: the
    # chunk walk must not take the lossless path (sniff dims instead)
    lossy_body = (b"\x00\x00\x00\x9d\x01\x2a"
                  + (320).to_bytes(2, "little")
                  + (240).to_bytes(2, "little") + b"VP8L" + b"\x00" * 20)
    lossy = b"RIFF" + (4 + 8 + len(lossy_body)).to_bytes(4, "little") \
        + b"WEBP" + chunk(b"VP8 ", lossy_body)
    got = decode_image(lossy)
    assert (got[0], got[1]) == (320, 240) and len(got[2]) == 32  # digest
