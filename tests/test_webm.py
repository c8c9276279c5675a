"""WebM (Matroska/EBML) sniffing + VP8 keyframe frame sampling.

Container bytes come from the spec-written muxer (tests/webm_mux.py);
the video payloads inside are REAL libwebp-encoded VP8 keyframe
bitstreams, so the sampled luma grids are pinned against vp8.py's
independently-validated decode of the same streams.
"""
from __future__ import annotations

import math

import pytest

from fortissimo_spark.modality import (_gray_grid, decode_video_frames,
                                       sniff_media)
from fortissimo_spark.vp8 import _parse_webp_vp8_chunk, decode_vp8_frame
from tests.webm_mux import mux_webm

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


def _keyframes(n, w=64, h=48):
    return [_parse_webp_vp8_chunk(
        webp_ref.encode_rgb(photo(w, h, 1.5 * i), w, h, 70.0))
        for i in range(n)]


@needs_libwebp
def test_sniff_webm_video():
    frames = [(k, True) for k in _keyframes(3)]
    webm = mux_webm(frames, 64, 48, frame_ms=500)
    s = sniff_media(webm)
    assert s["format"] == "webm-vp8"
    assert (s["width"], s["height"]) == (64, 48)
    assert s["duration_ms"] == 1500


@needs_libwebp
def test_keyframe_snapped_sampling():
    """Keyframes at 0/1000/2000 ms with stand-in interframe slots at
    500/1500/2500 ms: every sampled tick must carry the pixels of the
    governing keyframe — never touch the interframe bytes."""
    keys = _keyframes(3)
    frames = []
    for k in keys:
        frames.append((k, True))
        frames.append((b"\x07not-a-keyframe", False))
    webm = mux_webm(frames, 64, 48, frame_ms=500)
    out = decode_video_frames(webm, every_ms=500)
    assert [t for t, *_ in out] == [0, 500, 1000, 1500, 2000, 2500]
    expected = []
    for k in keys:
        w, h, y, _, _ = decode_vp8_frame(k)
        expected.append(_gray_grid(w, h, lambda x, yy: y[yy * w + x], 4))
    grids = [g for *_, g in out]
    assert grids == [expected[0], expected[0], expected[1], expected[1],
                     expected[2], expected[2]]
    assert len(set(expected)) == 3  # distinct content per keyframe


@needs_libwebp
def test_block_group_equals_simple_block():
    frames = [(k, i % 2 == 0) for i, k in
              enumerate(_keyframes(4))]
    a = decode_video_frames(mux_webm(frames, 64, 48), 1000)
    b = decode_video_frames(
        mux_webm(frames, 64, 48, use_block_group=True), 1000)
    assert a == b and a


@needs_libwebp
def test_non_vp8_codec_gets_no_frames():
    frames = [(k, True) for k in _keyframes(2)]
    webm = mux_webm(frames, 64, 48, codec=b"V_VP9")
    assert decode_video_frames(webm, 500) is None
    s = sniff_media(webm)
    assert s["format"] == "webm-vp9"  # census still sees it


def test_not_webm():
    assert sniff_media(b"\x1aE\xdf\xa3 garbage") is None
    assert decode_video_frames(b"not ebml at all", 500) is None
