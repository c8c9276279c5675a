"""Animated GIF frame sampling: timeline, disposal methods,
transparency — over the same independent LZW encoder the still-GIF
round-trip tests use (tests/test_gif.py), so expectations are
hand-computable palette lumas, never the decoder's own output."""
from __future__ import annotations

from fortissimo_spark.modality import (_gray_grid, decode_video_frames,
                                       sniff_media)
from tests.test_gif import lzw_encode


def _luma(rgb):
    return (rgb[0] * 299 + rgb[1] * 587 + rgb[2] * 114) // 1000


PALETTE = [(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 0, 255)]
L = [_luma(c) for c in PALETTE]


def build_anim_gif(frames, sw, sh, *, bg=1):
    """frames: [(left, top, fw, fh, indices, delay_cs, disposal,
    trans_idx)] over the 4-color shared palette."""
    out = bytearray()
    out += b"GIF89a" + sw.to_bytes(2, "little") + sh.to_bytes(2, "little")
    out += bytes([0x81, bg, 0])  # global table, 4 entries
    out += b"".join(bytes(c) for c in PALETTE)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop ext
    for left, top, fw, fh, idx, delay, disposal, trans in frames:
        flags = (disposal & 7) << 2 | (1 if trans is not None else 0)
        out += bytes([0x21, 0xF9, 4, flags])
        out += delay.to_bytes(2, "little")
        out += bytes([trans if trans is not None else 0, 0])
        out += b"\x2c" + left.to_bytes(2, "little") \
            + top.to_bytes(2, "little") + fw.to_bytes(2, "little") \
            + fh.to_bytes(2, "little") + b"\x00"
        out += bytes([2])
        data = lzw_encode(idx, 2)
        for i in range(0, len(data), 255):
            ch = data[i:i + 255]
            out += bytes([len(ch)]) + ch
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def _grid(flat, sw, sh):
    return _gray_grid(sw, sh, lambda x, y: flat[y * sw + x], 4)


def test_two_full_frames():
    sw = sh = 16
    f0 = [2] * (sw * sh)          # all red
    f1 = [3] * (sw * sh)          # all blue
    gif = build_anim_gif([
        (0, 0, sw, sh, f0, 50, 0, None),
        (0, 0, sw, sh, f1, 50, 0, None),
    ], sw, sh)
    s = sniff_media(gif)
    assert s["format"] == "gif"
    out = decode_video_frames(gif, every_ms=250)
    assert [t for t, *_ in out] == [0, 250, 500, 750]
    assert out[0][3] == _grid([L[2]] * (sw * sh), sw, sh)
    assert out[2][3] == _grid([L[3]] * (sw * sh), sw, sh)
    assert out[0][1:3] == (sw, sh)


def test_transparent_patch_keeps_base():
    sw = sh = 16
    base = [2] * (sw * sh)
    # patch: left half transparent (index 0), right half white
    patch = [(0 if c < 4 else 1) for r in range(8) for c in range(8)]
    gif = build_anim_gif([
        (0, 0, sw, sh, base, 40, 0, None),
        (4, 4, 8, 8, patch, 40, 0, 0),
    ], sw, sh)
    out = decode_video_frames(gif, every_ms=400)
    comp = base[:]
    for r in range(8):
        for c in range(4, 8):
            comp[(4 + r) * sw + 4 + c] = 1
    expected = [L[i] for i in comp]
    assert out[1][3] == _grid(expected, sw, sh)


def test_disposal_restore_background():
    """Frame 1 (red, dispose-to-background) then a small patch: during
    frame 2 the red rect is cleared — uncovered pixels show the
    background color (white, index 1)."""
    sw = sh = 16
    f0 = [2] * (sw * sh)
    patch = [3] * 16  # 4x4 blue
    gif = build_anim_gif([
        (0, 0, sw, sh, f0, 40, 2, None),
        (0, 0, 4, 4, patch, 40, 0, None),
    ], sw, sh, bg=1)
    out = decode_video_frames(gif, every_ms=400)
    assert out[0][3] == _grid([L[2]] * (sw * sh), sw, sh)
    comp = [L[1]] * (sw * sh)
    for r in range(4):
        for c in range(4):
            comp[r * sw + c] = L[3]
    assert out[1][3] == _grid(comp, sw, sh)


def test_disposal_restore_previous():
    """A dispose-to-previous overlay vanishes for the frame after it."""
    sw = sh = 16
    base = [1] * (sw * sh)
    overlay = [2] * 64  # 8x8 red
    final = [3] * 16    # 4x4 blue
    gif = build_anim_gif([
        (0, 0, sw, sh, base, 40, 0, None),
        (4, 4, 8, 8, overlay, 40, 3, None),
        (12, 12, 4, 4, final, 40, 0, None),
    ], sw, sh)
    out = decode_video_frames(gif, every_ms=400)
    comp = [L[1]] * (sw * sh)  # overlay restored away
    for r in range(4):
        for c in range(4):
            comp[(12 + r) * sw + 12 + c] = L[3]
    assert out[2][3] == _grid(comp, sw, sh)
    # while displayed, the overlay IS visible
    over = [L[1]] * (sw * sh)
    for r in range(8):
        for c in range(8):
            over[(4 + r) * sw + 4 + c] = L[2]
    assert out[1][3] == _grid(over, sw, sh)


def test_single_frame_gif_is_not_video():
    sw = sh = 8
    gif = build_anim_gif([(0, 0, sw, sh, [2] * 64, 10, 0, None)], sw, sh)
    assert decode_video_frames(gif, every_ms=100) is None


def test_anim_canvas_bomb_degrades():
    """A 9000x9000 2-frame GIF must raise (the sample_frames kernel
    converts that into the NULL-pixel token lanes) instead of
    compositing an 81-megapixel canvas in Python."""
    import pytest
    sw = sh = 9000
    out = bytearray()
    out += b"GIF89a" + sw.to_bytes(2, "little") + sh.to_bytes(2, "little")
    out += bytes([0x81, 0, 0]) + b"".join(bytes(c) for c in PALETTE)
    for k in range(2):
        out += bytes([0x21, 0xF9, 4, 0, 10, 0, 0, 0])
        out += b"\x2c" + bytes(4) + (2).to_bytes(2, "little") \
            + (2).to_bytes(2, "little") + b"\x00"
        out += bytes([2])
        data = lzw_encode([1, 1, 1, 1], 2)
        out += bytes([len(data)]) + data + b"\x00"
    out += b"\x3b"
    from fortissimo_spark.modality import decode_video_frames as dvf
    with pytest.raises(ValueError):
        dvf(bytes(out), every_ms=100)
