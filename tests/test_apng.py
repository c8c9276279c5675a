"""APNG (animated PNG) frame sampling: acTL/fcTL/fdAT walk, frame
rebuild through the full PNG decode path, dispose/blend compositing.
Fixtures are spec-built chunk streams over stdlib zlib — expectations
are hand-computed gray values."""
from __future__ import annotations

import struct
import zlib

from fortissimo_spark.modality import (_gray_grid, decode_video_frames,
                                       sniff_media)

SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ, data):
    c = typ + data
    return struct.pack(">I", len(data)) + c + struct.pack(
        ">I", zlib.crc32(c))


def _ihdr(w, h, color=0):
    return _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))


def _scan(w, h, px_bytes):
    """raw scanlines with filter 0; px_bytes per pixel already packed"""
    bpp = len(px_bytes) // (w * h)
    return b"".join(
        b"\x00" + px_bytes[r * w * bpp:(r + 1) * w * bpp]
        for r in range(h))


def _fctl(seq, w, h, x, y, num, den, dispose=0, blend=0):
    return _chunk(b"fcTL", struct.pack(
        ">IIIIIHHBB", seq, w, h, x, y, num, den, dispose, blend))


def _fdat(seq, raw):
    return _chunk(b"fdAT", struct.pack(">I", seq) + zlib.compress(raw))


def _grid(flat, w, h):
    return _gray_grid(w, h, lambda x, y: flat[y * w + x], 4)


def test_two_gray_frames_and_sniff():
    w = h = 16
    f0 = bytes([60] * (w * h))
    f1 = bytes([200] * (w * h))
    apng = (SIG + _ihdr(w, h)
            + _chunk(b"acTL", struct.pack(">II", 2, 0))
            + _fctl(0, w, h, 0, 0, 1, 2)       # 500 ms
            + _chunk(b"IDAT", zlib.compress(_scan(w, h, f0)))
            + _fctl(1, w, h, 0, 0, 1, 2)
            + _fdat(2, _scan(w, h, f1))
            + _chunk(b"IEND", b""))
    s = sniff_media(apng)
    assert s["format"] == "png-anim" and s["duration_ms"] == 1000
    out = decode_video_frames(apng, every_ms=500)
    assert [t for t, *_ in out] == [0, 500]
    assert out[0][3] == bytes([60] * 16)
    assert out[1][3] == bytes([200] * 16)


def test_default_image_outside_timeline():
    """IDAT before the first fcTL: the default image is NOT frame 0 —
    the animation starts at the first fdAT frame."""
    w = h = 8
    default = bytes([255] * (w * h))
    f0 = bytes([10] * (w * h))
    f1 = bytes([90] * (w * h))
    apng = (SIG + _ihdr(w, h)
            + _chunk(b"acTL", struct.pack(">II", 2, 0))
            + _chunk(b"IDAT", zlib.compress(_scan(w, h, default)))
            + _fctl(0, w, h, 0, 0, 1, 4)
            + _fdat(1, _scan(w, h, f0))
            + _fctl(2, w, h, 0, 0, 1, 4)
            + _fdat(3, _scan(w, h, f1))
            + _chunk(b"IEND", b""))
    out = decode_video_frames(apng, every_ms=250)
    assert out[0][3] == bytes([10] * 16)
    assert out[1][3] == bytes([90] * 16)


def test_subframe_dispose_background():
    w = h = 16
    base = bytes([100] * (w * h))
    patch = bytes([0] * 16)  # 4x4 black at (12, 12)
    apng = (SIG + _ihdr(w, h)
            + _chunk(b"acTL", struct.pack(">II", 2, 0))
            + _fctl(0, w, h, 0, 0, 2, 5, dispose=1)  # 400 ms, dispose bg
            + _chunk(b"IDAT", zlib.compress(_scan(w, h, base)))
            + _fctl(1, 4, 4, 12, 12, 2, 5)
            + _fdat(2, _scan(4, 4, patch))
            + _chunk(b"IEND", b""))
    out = decode_video_frames(apng, every_ms=400)
    assert out[0][3] == _grid([100] * (w * h), w, h)
    # after dispose: transparent canvas (flattens white) + the patch
    comp = [255] * (w * h)
    for r in range(4):
        for c in range(4):
            comp[(12 + r) * w + 12 + c] = 0
    assert out[1][3] == _grid(comp, w, h)


def test_rgba_blend_over():
    w = h = 8
    base = b"".join(bytes([200, 200, 200, 255]) for _ in range(w * h))
    over = b"".join(bytes([0, 0, 0, 128]) for _ in range(w * h))
    apng = (SIG + _ihdr(w, h, color=6)
            + _chunk(b"acTL", struct.pack(">II", 2, 0))
            + _fctl(0, w, h, 0, 0, 3, 10)
            + _chunk(b"IDAT", zlib.compress(_scan(w, h, base)))
            + _fctl(1, w, h, 0, 0, 3, 10, blend=1)
            + _fdat(2, _scan(w, h, over))
            + _chunk(b"IEND", b""))
    out = decode_video_frames(apng, every_ms=300)
    assert out[0][3] == bytes([200] * 16)
    aout = 128 * 255 + 255 * (255 - 128)
    blend = (0 * 128 * 255 + 200 * 255 * (255 - 128)) // aout
    assert out[1][3] == bytes([blend] * 16)


def test_plain_png_is_not_video():
    w = h = 8
    png = (SIG + _ihdr(w, h)
           + _chunk(b"IDAT", zlib.compress(_scan(w, h, bytes(64))))
           + _chunk(b"IEND", b""))
    assert decode_video_frames(png, every_ms=100) is None
    assert sniff_media(png)["format"] == "png"
