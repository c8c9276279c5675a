"""ICO (favicon) pixel decode + SVG/TIFF census sniffing.

ICO expectations are hand-computed from spec-built directory/DIB bytes
(uniform colors -> exact grids); the real-producer loop closes on
CPython's bundled idle.ico and the system Adwaita SVGs when present.
"""
from __future__ import annotations

import glob
import sys

import pytest

from fortissimo_spark.modality import (decode_ico, decode_image,
                                       sniff_ico, sniff_media, sniff_svg,
                                       sniff_tiff)


def _dib_entry(w, h, bpp, xor, and_mask, palette=b""):
    dib = ((40).to_bytes(4, "little") + w.to_bytes(4, "little")
           + (2 * h).to_bytes(4, "little") + (1).to_bytes(2, "little")
           + bpp.to_bytes(2, "little") + (0).to_bytes(4, "little")
           + (0).to_bytes(4, "little") * 5)
    return dib + palette + xor + and_mask


def _ico(entries):
    """entries: [(w, h, bpp, data)]"""
    out = bytearray(b"\x00\x00\x01\x00" + len(entries).to_bytes(2, "little"))
    off = 6 + 16 * len(entries)
    blobs = b""
    for w, h, bpp, data in entries:
        out += bytes([w % 256, h % 256, 0, 0]) + (1).to_bytes(2, "little") \
            + bpp.to_bytes(2, "little") + len(data).to_bytes(4, "little") \
            + off.to_bytes(4, "little")
        off += len(data)
        blobs += data
    return bytes(out) + blobs


def test_ico_32bpp_uniform():
    w = h = 8
    xor = bytes([40, 80, 120, 255]) * (w * h)  # BGR=40,80,120 opaque
    ico = _ico([(w, h, 32, _dib_entry(w, h, 32, xor, b"\x00\x00\x00\x00" * h))])
    W, H, grid = decode_ico(ico)
    lum = (120 * 299 + 80 * 587 + 40 * 114) // 1000
    assert (W, H) == (w, h) and grid == bytes([lum] * 16)
    assert sniff_media(ico)["format"] == "ico"
    assert decode_image(ico)[:2] == (w, h)  # routed in decode_image


def test_ico_and_mask_transparency():
    """AND-mask bits punch through to white (page background)."""
    w = h = 8
    xor = bytes([0, 0, 0, 255]) * (w * h)  # black
    # left half transparent: mask rows 0xF0 (high nibble = x 0-3)
    and_mask = (b"\xf0\x00\x00\x00") * h
    ico = _ico([(w, h, 32, _dib_entry(w, h, 32, xor, and_mask))])
    _, _, grid = decode_ico(ico)
    # 4x4 grid: left half white-ish, right half black
    assert grid[0] == 255 and grid[1] == 255
    assert grid[2] == 0 and grid[3] == 0


def test_ico_4bpp_palette():
    w = h = 4
    # a 0 colors-used field means the full 2^bpp palette is present
    palette = bytes([0, 0, 0, 0]) + bytes([255, 255, 255, 0]) \
        + bytes(4) * 14
    rows = b""
    for y in range(4):
        rows += bytes([0x11, 0x11]) + b"\x00\x00"  # all index 1, padded
    ico = _ico([(w, h, 4, _dib_entry(w, h, 4, rows,
                                     b"\x00\x00\x00\x00" * h, palette))])
    W, H, grid = decode_ico(ico)
    assert (W, H) == (4, 4) and grid == bytes([255] * 16)


def test_ico_largest_entry_wins_and_png_member():
    """Multi-size icon: the 16x16 PNG member outranks the 8x8 DIB."""
    import struct
    import zlib

    def png_gray(w, h, val):
        def chunk(typ, data):
            c = typ + data
            return struct.pack(">I", len(data)) + c + struct.pack(
                ">I", zlib.crc32(c))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        raw = b"".join(b"\x00" + bytes([val] * w) for _ in range(h))
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))

    small = _dib_entry(8, 8, 32, bytes([0, 0, 0, 255]) * 64,
                       b"\x00\x00\x00\x00" * 8)
    ico = _ico([(8, 8, 32, small), (16, 16, 32, png_gray(16, 16, 200))])
    W, H, grid = decode_ico(ico)
    assert (W, H) == (16, 16) and grid == bytes([200] * 16)
    assert sniff_ico(ico) == (16, 16, 2)


def test_real_world_idle_ico():
    cands = glob.glob(sys.prefix + "/lib/python*/idlelib/Icons/idle.ico")
    if not cands:
        pytest.skip("no bundled idle.ico")
    raw = open(cands[0], "rb").read()
    n = sniff_ico(raw)[2]
    assert n >= 2
    w, h, grid = decode_ico(raw)
    assert w >= 16 and h >= 16 and len(grid) == 16
    assert len(set(grid)) > 1  # real pixels, not a constant


def test_sniff_svg_variants():
    assert sniff_svg(b'<svg width="120" height="80">') == (120, 80)
    assert sniff_svg(
        b'<?xml version="1.0"?>\n<svg viewBox="0 0 300 150">') == (300, 150)
    assert sniff_svg(b'<svg width="24px" height="24px">') == (24, 24)
    assert sniff_svg(b"not xml") is None
    assert sniff_media(b'<svg width="10" height="10"></svg>')["format"] \
        == "svg"


def test_real_world_adwaita_svg():
    cands = glob.glob("/usr/share/icons/Adwaita/scalable/*/*.svg")
    if not cands:
        pytest.skip("no system SVGs")
    raw = open(sorted(cands)[0], "rb").read()
    dims = sniff_svg(raw)
    assert dims is not None and dims[0] and dims[1]


def test_sniff_tiff():
    le = (b"II*\x00" + (8).to_bytes(4, "little")
          + (2).to_bytes(2, "little")
          + (256).to_bytes(2, "little") + (3).to_bytes(2, "little")
          + (1).to_bytes(4, "little") + (640).to_bytes(2, "little")
          + b"\x00\x00"
          + (257).to_bytes(2, "little") + (4).to_bytes(2, "little")
          + (1).to_bytes(4, "little") + (480).to_bytes(4, "little")
          + (0).to_bytes(4, "little"))
    assert sniff_tiff(le) == (640, 480)
    be = (b"MM\x00*" + (8).to_bytes(4, "big")
          + (2).to_bytes(2, "big")
          + (256).to_bytes(2, "big") + (3).to_bytes(2, "big")
          + (1).to_bytes(4, "big") + (320).to_bytes(2, "big") + b"\x00\x00"
          + (257).to_bytes(2, "big") + (3).to_bytes(2, "big")
          + (1).to_bytes(4, "big") + (200).to_bytes(2, "big") + b"\x00\x00"
          + (0).to_bytes(4, "big"))
    assert sniff_tiff(be) == (320, 200)
    assert sniff_tiff(b"II\x00\x00") is None
    assert sniff_media(le)["format"] == "tiff"
