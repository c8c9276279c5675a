"""Lossy VP8 keyframe decoder (fortissimo_spark/vp8.py) validation.

Two layers:

* pinned regression — committed libwebp-encoded fixtures under
  tests/data/ decode to pinned Y/UV digests with no native dependency,
  so the suite guards the decoder everywhere;
* differential — when the system libwebp is present (tests/webp_ref.py
  ctypes bindings), every decode must be BIT-EXACT against
  WebPDecodeYUV across content classes, non-MB-aligned sizes, the full
  quality range, and the advanced-config paths the simple encoder API
  never emits (simple loop filter, filter sharpness, multiple token
  partitions, forced segmentation).

The real-producer check decodes CPython's bundled python.webp (a
libwebp VP8X + ALPH + lossy-VP8 still) — the same anti-tautology
fixture strategy as test_vp8l.py / test_gif.py.
"""
from __future__ import annotations

import glob
import hashlib
import math
import random
import sys
from pathlib import Path

import pytest

from fortissimo_spark.vp8 import decode_vp8, decode_vp8_luma

DATA = Path(__file__).parent / "data"

try:
    from tests import webp_ref
    _HAVE_LIB = webp_ref.load() is not None
except Exception:  # pragma: no cover - import-path / loader quirks
    _HAVE_LIB = False

needs_libwebp = pytest.mark.skipif(
    not _HAVE_LIB, reason="system libwebp not available")


# --- deterministic content generators ------------------------------------

def gradient(w, h):
    return bytes(((x * 255) // max(w - 1, 1), (y * 255) // max(h - 1, 1),
                  ((x + y) * 255) // max(w + h - 2, 1))[k]
                 for y in range(h) for x in range(w) for k in range(3))


def photo(w, h):
    out = bytearray()
    for y in range(h):
        for x in range(w):
            out += bytes((
                max(0, min(255, int(127 + 80 * math.sin(x / 9.0)
                                    * math.cos(y / 13.0)))),
                max(0, min(255, int(127 + 100 * math.sin((x + y) / 17.0)))),
                max(0, min(255, int(127 + 60 * math.cos(x * y / 301.0))))))
    return bytes(out)


def noise(w, h, seed=7):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(w * h * 3))


def blocky(w, h):
    return bytes((255 if (x // 8 + y // 8) % 2 else 0)
                 for y in range(h) for x in range(w) for _ in range(3))


# --- pinned offline regression -------------------------------------------

PINNED = [
    ("vp8_grad_33x17_q80.webp", 33, 17,
     "6695ffd6c77a42e661551dc870036b898a5123bce3d872426d9d8c9c2c8385e6",
     "a3439bd841d23b11f11470f6856e218ba47013050d2c58f9c6422f0127c350ae"),
    ("vp8_photo_64x48_q60.webp", 64, 48,
     "29f44bc6aff9a62a0f1635f7cfee917566acc34f69dc7926ea925cebcc4d118f",
     "fb0204ab2936913f3dcedeea1c6e0b45c4ead0f22d9e6fad3546de6a8c98d0df"),
    # simple loop filter + 4 token partitions (advanced-API encode)
    ("vp8_photo_96x80_simple_parts4.webp", 96, 80,
     "ca98f5406b1d5deef1744bc37c7f37394145a7d749dc4da29a5ac64923a1f957",
     "128ecba23c9c90714881d717434b5d5e70d9b93321ed7f7cfd1434df347daf6c"),
]


@pytest.mark.parametrize("name,w,h,y_digest,uv_digest",
                         PINNED, ids=[p[0] for p in PINNED])
def test_pinned_fixture(name, w, h, y_digest, uv_digest):
    payload = (DATA / name).read_bytes()
    W, H, y, u, v = decode_vp8(payload)
    assert (W, H) == (w, h)
    assert hashlib.sha256(y).hexdigest() == y_digest
    assert hashlib.sha256(u + v).hexdigest() == uv_digest


def test_luma_entry_point():
    payload = (DATA / PINNED[0][0]).read_bytes()
    w, h, arr = decode_vp8_luma(payload)
    assert arr.shape == (h, w) and arr.dtype.name == "uint8"


def test_rejects_garbage():
    with pytest.raises(ValueError):
        decode_vp8(b"\x00" * 32)
    with pytest.raises(ValueError):
        decode_vp8(b"RIFF\x00\x00\x00\x00WEBPVP8 ")


# --- differential vs libwebp ---------------------------------------------

def _assert_bit_exact(payload):
    W, H, y, u, v = webp_ref.decode_yuv(payload)
    w2, h2, y2, u2, v2 = decode_vp8(payload)
    assert (W, H) == (w2, h2)
    assert y == y2 and u == u2 and v == v2


@needs_libwebp
@pytest.mark.parametrize("gen", [gradient, photo, noise, blocky],
                         ids=lambda g: g.__name__)
@pytest.mark.parametrize("dims", [(16, 16), (64, 48), (127, 63), (31, 97)],
                         ids=lambda d: f"{d[0]}x{d[1]}")
def test_differential_quality_sweep(gen, dims):
    w, h = dims
    rgb = gen(w, h)
    for q in (0, 25, 60, 90, 100):
        _assert_bit_exact(webp_ref.encode_rgb(rgb, w, h, q))


@needs_libwebp
@pytest.mark.parametrize("cfg", [
    dict(filter_type=0, filter_strength=40, autofilter=0),
    dict(filter_type=0, filter_strength=63, filter_sharpness=3,
         autofilter=0),
    dict(filter_sharpness=7, filter_strength=50, autofilter=0),
    dict(filter_strength=0, autofilter=0),
    dict(partitions=3, method=0),  # 8 token partitions
    dict(partitions=1, method=0),
    dict(segments=4, sns_strength=100),
], ids=["simple", "simple-sharp", "sharp7", "nofilter",
        "parts8", "parts2", "segments"])
def test_differential_advanced_configs(cfg):
    rgb = photo(160, 96)
    _assert_bit_exact(webp_ref.encode_advanced(rgb, 160, 96, 55.0, **cfg))


@needs_libwebp
def test_differential_multi_partition_large():
    payload = webp_ref.encode_advanced(photo(320, 240), 320, 240, 60.0,
                                       partitions=3, method=0)
    _assert_bit_exact(payload)


def test_real_world_lossy_webp():
    """CPython ships python.webp — a real libwebp VP8X still whose color
    stream is lossy VP8; decoding it closes the self-made-fixture
    loop for this decoder exactly like the VP8L ALPH test."""
    cands = glob.glob(
        sys.prefix + "/lib/python*/test/imghdrdata/python.webp") + glob.glob(
        sys.prefix + "/lib/python*/test/test_email/data/python.webp")
    if not cands:
        pytest.skip("no bundled python.webp in this build")
    raw = Path(cands[0]).read_bytes()
    w, h, y, u, v = decode_vp8(raw)
    assert (w, h) == (16, 16)
    assert len(y) == 256 and len(u) == 64 and len(v) == 64
    if _HAVE_LIB:
        assert (w, h, y, u, v) == webp_ref.decode_yuv(raw)


# --- modality integration -------------------------------------------------

def test_lossy_webp_joins_dhash_surface():
    """The motivating consumer: lossy WebP now pixel-decodes inside
    decode_image, so image_dhash yields a REAL hash (not NULL), and
    re-encodes of the same image at different qualities land within a
    few bits — the near-dup property the banded join exploits."""
    from fortissimo_spark.modality import decode_image, image_dhash

    payload = (DATA / "vp8_photo_64x48_q60.webp").read_bytes()
    w, h, cells = decode_image(payload, grid=(9, 8))
    assert (w, h) == (64, 48) and len(cells) == 72

    h60 = image_dhash(payload)
    assert h60 is not None

    # the SAME pixels as a lossless PPM: dHash must be a near-dup
    rgb = photo(64, 48)
    ppm = b"P6\n64 48\n255\n" + rgb
    hppm = image_dhash(ppm)
    dist = bin((h60 ^ hppm) & ((1 << 64) - 1)).count("1")
    assert dist <= 6, dist

    if _HAVE_LIB:
        h90 = image_dhash(webp_ref.encode_rgb(rgb, 64, 48, 90.0))
        dist = bin((h60 ^ h90) & ((1 << 64) - 1)).count("1")
        assert dist <= 6, dist
