"""GIF decoder vs an independent test-side GIF/LZW encoder.

Same cross-check pattern as test_vp8l.py: encoder and decoder are both
written from the public GIF89a specification with no shared code, so
pixel-exact round-trips verify the LZW details (variable code width,
clear/end codes, dictionary growth and the KwKwK case), color tables,
interlacing, and frame placement."""

import pytest

from fortissimo_spark.modality import _gray_grid, decode_gif, decode_image


def lzw_encode(indices, min_code_size):
    """Classic GIF LZW compressor: dictionary growth, width bumps, CLEAR
    when the table fills."""
    clear = 1 << min_code_size
    end = clear + 1
    out_bits = []

    def emit(code, width):
        for i in range(width):
            out_bits.append((code >> i) & 1)

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    buf = ()
    for sym in indices:
        cand = buf + (sym,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            # the code JUST ASSIGNED crossed the width boundary: the
            # decoder will bump after it RECEIVES a code making its
            # next_code reach 1<<width, i.e. in sync with this
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        buf = (sym,)
    if buf:
        emit(table[buf], width)
    emit(end, width)
    by = bytearray((len(out_bits) + 7) // 8)
    for i, b in enumerate(out_bits):
        if b:
            by[i >> 3] |= 1 << (i & 7)
    return bytes(by)


def build_gif(width, height, palette, indices, *, min_code_size=None,
              interlace=False, local_table=False, frame=None,
              version=b"GIF89a", bg=0, extensions=True):
    """Whole GIF file. ``frame``=(left, top, fw, fh) places the image
    inside the logical screen (defaults to full coverage)."""
    left, top, fw, fh = frame or (0, 0, width, height)
    n = max(2, len(palette))
    size_bits = max(1, (n - 1).bit_length())
    n_slots = 1 << size_bits
    table = b"".join(bytes(c) for c in palette) + b"\x00\x00\x00" * (
        n_slots - len(palette))
    out = bytearray()
    out += version
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    if local_table:
        out += bytes([0x00, bg, 0])  # no global table
    else:
        out += bytes([0x80 | (size_bits - 1), bg, 0])
        out += table
    if extensions:
        # a graphic-control extension the decoder must skip
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        out += b"\x21\xfe\x05hello\x00"  # comment extension
    out += b"\x2c"
    out += left.to_bytes(2, "little") + top.to_bytes(2, "little")
    out += fw.to_bytes(2, "little") + fh.to_bytes(2, "little")
    out += bytes([(0x80 | (size_bits - 1) if local_table else 0)
                  | (0x40 if interlace else 0)])
    if local_table:
        out += table
    if interlace:
        order = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order.extend(range(start, fh, step))
        indices = [indices[r * fw + x] for r in order for x in range(fw)]
    mcs = min_code_size or max(2, size_bits)
    out += bytes([mcs])
    data = lzw_encode(indices, mcs)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def lcg_indices(n, k, seed=7):
    s = seed
    out = []
    for _ in range(n):
        s = (s * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
        out.append((s >> 19) % k)
    return out


def grid_for(width, height, palette, indices):
    def gray_at(x, y):
        c = palette[indices[y * width + x]]
        return (c[0] * 299 + c[1] * 587 + c[2] * 114) // 1000
    return _gray_grid(width, height, gray_at)


PAL8 = [(i * 31 % 256, i * 57 % 256, i * 93 % 256) for i in range(8)]


def test_gif_roundtrip_basic():
    w, h = 19, 11
    idx = lcg_indices(w * h, 8)
    data = build_gif(w, h, PAL8, idx)
    assert decode_gif(data) == (w, h, grid_for(w, h, PAL8, idx))
    assert decode_image(data) == decode_gif(data)  # wired into the kernel


def test_gif_roundtrip_two_color_and_dict_growth():
    # 2-color: min code size 2 (GIF floor); long runs force dictionary
    # growth through several width bumps
    w, h = 64, 32
    pal = [(0, 0, 0), (255, 255, 255)]
    idx = [(x // 7 + y // 3) % 2 for y in range(h) for x in range(w)]
    data = build_gif(w, h, pal, idx)
    assert decode_gif(data) == (w, h, grid_for(w, h, pal, idx))


def test_gif_roundtrip_kwkwk():
    # aaa... from a cold dictionary hits the code==next_code case
    w, h = 10, 1
    pal = [(10, 20, 30), (200, 100, 50)]
    idx = [0] * 10
    data = build_gif(w, h, pal, idx)
    assert decode_gif(data) == (w, h, grid_for(w, h, pal, idx))


def test_gif_roundtrip_interlaced():
    w, h = 17, 13
    idx = lcg_indices(w * h, 8, seed=11)
    data = build_gif(w, h, PAL8, idx, interlace=True)
    assert decode_gif(data) == (w, h, grid_for(w, h, PAL8, idx))


def test_gif_roundtrip_local_table_and_frame():
    # frame smaller than the logical screen: uncovered area reads the
    # background index (of the frame's table, matching the decoder rule)
    sw, sh = 12, 9
    fw, fh = 6, 4
    idx = lcg_indices(fw * fh, 8, seed=13)
    data = build_gif(sw, sh, PAL8, idx, local_table=True,
                     frame=(3, 2, fw, fh), bg=5)

    def gray_at(x, y):
        fx, fy = x - 3, y - 2
        i = idx[fy * fw + fx] if (0 <= fx < fw and 0 <= fy < fh) else 5
        c = PAL8[i]
        return (c[0] * 299 + c[1] * 587 + c[2] * 114) // 1000

    assert decode_gif(data) == (sw, sh, _gray_grid(sw, sh, gray_at))


def test_gif_roundtrip_dict_full_clear():
    # enough distinct material to fill the 4096-entry table and force a
    # mid-stream CLEAR + full reset
    w, h = 128, 80
    idx = lcg_indices(w * h, 8, seed=17)
    data = build_gif(w, h, PAL8, idx)
    assert decode_gif(data) == (w, h, grid_for(w, h, PAL8, idx))


def test_gif_87a_and_corrupt():
    w, h = 6, 4
    idx = lcg_indices(w * h, 2, seed=19)
    pal = [(0, 0, 0), (255, 255, 255)]
    data = build_gif(w, h, pal, idx, version=b"GIF87a", extensions=False)
    assert decode_gif(data) == (w, h, grid_for(w, h, pal, idx))
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 20)  # zero dims
    with pytest.raises(ValueError):
        decode_gif(data[:18])  # truncated


def test_real_world_gifs_decode():
    """Real encoder output (CPython's idlelib icons, shipped with the
    running interpreter): every icon decodes through the full LZW path
    with header-consistent dimensions and non-degenerate content — the
    cross-check a self-made encoder can't provide."""
    import glob
    import os

    idlelib = pytest.importorskip("idlelib")
    icons = sorted(glob.glob(os.path.join(
        os.path.dirname(idlelib.__file__), "Icons", "*.gif")))
    if not icons:
        pytest.skip("no idlelib icons in this build")
    decoded = 0
    for f in icons:
        raw = open(f, "rb").read()
        w, h, grid = decode_gif(raw)
        assert w == int.from_bytes(raw[6:8], "little")
        assert h == int.from_bytes(raw[8:10], "little")
        assert len(grid) == 16
        assert max(grid) > min(grid)  # real content, not a flat guess
        decoded += 1
    assert decoded >= 5


def test_gif_animated_duration_sniff():
    """sniff_gif sums Graphic Control Extension delays (x10 ms) over an
    animated GIF via a header-only walk; single-frame GIFs report None."""
    from fortissimo_spark.modality import sniff_gif, sniff_media
    pal = [(0, 0, 0), (255, 255, 255)]
    one = build_gif(4, 4, pal, [0] * 16)
    assert sniff_gif(one)[2] is None

    # two frames with 50 cs + 25 cs delays = 750 ms
    def frame(delay_cs, idx):
        gce = (b"\x21\xf9\x04\x00" + delay_cs.to_bytes(2, "little")
               + b"\x00\x00")
        body = bytearray()
        body += b"\x2c" + b"\x00" * 4
        body += (4).to_bytes(2, "little") + (4).to_bytes(2, "little")
        body += b"\x00"  # no local table, no interlace
        data = lzw_encode(idx, 2)
        body += bytes([2])
        body += bytes([len(data)]) + data + b"\x00"
        return gce + bytes(body)

    size_bits = 1  # 2 palette slots -> 6 table bytes
    table = b"\x00\x00\x00\xff\xff\xff"
    anim = (b"GIF89a" + (4).to_bytes(2, "little")
            + (4).to_bytes(2, "little")
            + bytes([0x80 | (size_bits - 1), 0, 0]) + table
            + frame(50, [0] * 16) + frame(25, [1] * 16) + b"\x3b")
    assert sniff_gif(anim) == (4, 4, 750)
    s = sniff_media(anim)
    assert (s["format"], s["duration_ms"]) == ("gif", 750)
    # the pixel decoder still reads the FIRST frame of the animation
    w, h, grid = decode_gif(anim)
    assert (w, h) == (4, 4) and set(grid) == {0}
