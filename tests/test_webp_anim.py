"""Animated WebP (ANMF) frame sampling + ALPH alpha decoding.

Container bytes come from the spec-written muxer (tests/webp_mux.py);
the frame payloads are REAL producer streams — libwebp lossy VP8 and
the independent VP8L encoder — so the per-frame pixels are pinned by
the already-validated still decoders, and what's under test here is
the timeline walk + the container-spec compositing rules (overwrite
vs alpha-blend, dispose-to-background, subframe placement).
"""
from __future__ import annotations

import math

import pytest

from fortissimo_spark.modality import (_alph_decode, _gray_grid,
                                       decode_video_frames, sniff_media)
from fortissimo_spark.vp8 import _parse_webp_vp8_chunk, decode_vp8_frame
from tests.webp_mux import anmf, chunk, mux_anim_webp

try:
    from tests import webp_ref
    _HAVE_LIB = webp_ref.load() is not None
except Exception:  # pragma: no cover
    _HAVE_LIB = False

needs_libwebp = pytest.mark.skipif(
    not _HAVE_LIB, reason="system libwebp not available")


def photo(w, h, phase=0.0):
    out = bytearray()
    for y in range(h):
        for x in range(w):
            out += bytes((
                max(0, min(255, int(127 + 80 * math.sin(x / 9.0 + phase)
                                    * math.cos(y / 13.0)))),
                max(0, min(255, int(127 + 100
                                    * math.sin((x + y) / 17.0 + phase)))),
                max(0, min(255, int(127 + 60
                                    * math.cos(x * y / 301.0 + phase))))))
    return bytes(out)


def _vp8_stream(w, h, phase):
    return _parse_webp_vp8_chunk(
        webp_ref.encode_rgb(photo(w, h, phase), w, h, 70.0))


def _still_luma(stream):
    w, h, y, _, _ = decode_vp8_frame(stream)
    return w, h, list(y)


@needs_libwebp
def test_full_canvas_frames_equal_stills():
    """Opaque full-canvas frames: every sampled grid must be EXACTLY
    the standalone still decode of the governing frame."""
    streams = [_vp8_stream(64, 48, 1.5 * i) for i in range(3)]
    frames = [anmf(0, 0, 64, 48, 500, chunk(b"VP8 ", s), no_blend=True)
              for s in streams]
    payload = mux_anim_webp(frames, 64, 48)
    s = sniff_media(payload)
    assert s["format"] == "webp-anim" and s["duration_ms"] == 1500
    out = decode_video_frames(payload, every_ms=250)
    assert [t for t, *_ in out] == [0, 250, 500, 750, 1000, 1250]
    expected = []
    for st in streams:
        w, h, y = _still_luma(st)
        expected.append(_gray_grid(w, h, lambda x, yy: y[yy * w + x], 4))
    assert [g for *_, g in out] == [expected[0], expected[0], expected[1],
                                    expected[1], expected[2], expected[2]]


@needs_libwebp
def test_subframe_overwrite_composites():
    """A 32x16 patch at (16, 8) over a full base frame: the sampled
    canvas must equal a hand-composited luma plane built from the two
    independent still decodes."""
    base = _vp8_stream(64, 48, 0.0)
    patch = _vp8_stream(32, 16, 2.5)
    payload = mux_anim_webp([
        anmf(0, 0, 64, 48, 400, chunk(b"VP8 ", base), no_blend=True),
        anmf(16, 8, 32, 16, 400, chunk(b"VP8 ", patch), no_blend=True),
    ], 64, 48)
    out = decode_video_frames(payload, every_ms=400)
    assert [t for t, *_ in out] == [0, 400]
    _, _, bl = _still_luma(base)
    pw, ph, pl = _still_luma(patch)
    comp = bl[:]
    for r in range(ph):
        for c in range(pw):
            comp[(8 + r) * 64 + 16 + c] = pl[r * pw + c]
    want = _gray_grid(64, 48, lambda x, y: comp[y * 64 + x], 4)
    assert out[1][3] == want
    assert out[0][3] == _gray_grid(64, 48, lambda x, y: bl[y * 64 + x], 4)
    assert out[0][3] != out[1][3]


@needs_libwebp
def test_dispose_to_background():
    """Frame 1 disposes to the white ANIM background: the tick inside
    frame 2's window shows frame 2's small patch over white, not over
    frame 1's pixels."""
    base = _vp8_stream(64, 48, 0.0)
    patch = _vp8_stream(32, 16, 2.5)
    payload = mux_anim_webp([
        anmf(0, 0, 64, 48, 400, chunk(b"VP8 ", base),
             no_blend=True, dispose_bg=True),
        anmf(0, 0, 32, 16, 400, chunk(b"VP8 ", patch), no_blend=True),
    ], 64, 48, bg_bgra=b"\xff\xff\xff\xff")
    out = decode_video_frames(payload, every_ms=400)
    pw, ph, pl = _still_luma(patch)
    comp = [255] * (64 * 48)
    for r in range(ph):
        for c in range(pw):
            comp[r * 64 + c] = pl[r * pw + c]
    want = _gray_grid(64, 48, lambda x, y: comp[y * 64 + x], 4)
    assert out[1][3] == want


def test_vp8l_frame_alpha_blend():
    """A half-transparent VP8L frame alpha-blends over an opaque VP8L
    base per the container-spec formula (exact integer replay)."""
    from tests.vp8l_encoder import encode_vp8l, tokenize
    w, h = 16, 8
    base_px = [(0xFF << 24) | (200 << 16) | (200 << 8) | 200] * (w * h)
    over_px = [(128 << 24) | (0 << 16) | (0 << 8) | 0] * (w * h)
    base_chunk = encode_vp8l(w, h, tokenize(base_px))[12:]
    over_chunk = encode_vp8l(w, h, tokenize(over_px))[12:]
    payload = mux_anim_webp([
        anmf(0, 0, w, h, 300, base_chunk, no_blend=True),
        anmf(0, 0, w, h, 300, over_chunk),
    ], w, h)
    out = decode_video_frames(payload, every_ms=300)
    base_l = 200
    over_l = 0
    aout = 128 * 255 + 255 * (255 - 128)
    blend = (over_l * 128 * 255 + base_l * 255 * (255 - 128)) // aout
    assert out[0][3] == bytes([base_l] * 16)
    assert out[1][3] == bytes([blend] * 16)


def test_alph_decode_filters():
    """Raw ALPH planes with every filtering method reconstruct the
    spec prediction (left / top / gradient) exactly."""
    w, h = 4, 3
    plane = [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120]
    # method 0: raw passthrough
    assert _alph_decode(bytes([0]) + bytes(plane), w, h) == plane
    # method 1 (horizontal): residual[x] = value - left (first col: top)
    res = []
    for y in range(h):
        for x in range(w):
            if x:
                p = plane[y * w + x - 1]
            elif y:
                p = plane[(y - 1) * w]
            else:
                p = 0
            res.append((plane[y * w + x] - p) & 0xFF)
    assert _alph_decode(bytes([0 | (1 << 2)]) + bytes(res), w, h) == plane
    # method 3 (gradient)
    res = []
    for y in range(h):
        for x in range(w):
            if x and y:
                g = (plane[y * w + x - 1] + plane[(y - 1) * w + x]
                     - plane[(y - 1) * w + x - 1])
                p = max(0, min(255, g))
            elif x:
                p = plane[y * w + x - 1]
            elif y:
                p = plane[(y - 1) * w + x]
            else:
                p = 0
            res.append((plane[y * w + x] - p) & 0xFF)
    assert _alph_decode(bytes([0 | (3 << 2)]) + bytes(res), w, h) == plane


@needs_libwebp
def test_lossy_frame_with_raw_alph():
    """A lossy VP8 frame carrying a raw ALPH plane: transparent half
    blends to background, opaque half shows the frame."""
    patch = _vp8_stream(16, 8, 1.0)
    pw, ph, pl = _still_luma(patch)
    alpha = bytes([255] * (pw * 4) + [0] * (pw * 4))  # top opaque
    image = chunk(b"ALPH", bytes([0]) + alpha) + chunk(b"VP8 ", patch)
    payload = mux_anim_webp([anmf(0, 0, pw, ph, 200, image)],
                            pw, ph, bg_bgra=b"\xff\xff\xff\xff")
    out = decode_video_frames(payload, every_ms=200)
    comp = []
    for i, l in enumerate(pl):
        comp.append(l if i < pw * 4 else 255)
    want = _gray_grid(pw, ph, lambda x, y: comp[y * pw + x], 4)
    assert out[0][3] == want
