"""ctypes bindings to the system libwebp — TEST-ONLY ground truth.

The engine's lossy-VP8 decoder (fortissimo_spark/vp8.py) is pure
Python with no native dependency; these bindings exist so the test
suite can (a) produce real libwebp-encoded lossy WebP fixtures at
several quality levels and (b) obtain the reference Y/U/V planes the
pure decoder must reproduce bit-exactly. Skip-guarded: tests that need
them skip when the shared library is absent.
"""
from __future__ import annotations

import ctypes
import ctypes.util

_LIB = None


def load():
    global _LIB
    if _LIB is not None:
        return _LIB
    name = ctypes.util.find_library("webp") \
        or "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        return None
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.WebPFree.restype = None
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def encode_rgb(rgb: bytes, w: int, h: int, quality: float) -> bytes:
    """Lossy-encode packed RGB to a complete .webp (RIFF) payload."""
    lib = load()
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(rgb, w, h, w * 3, quality, ctypes.byref(out))
    if n == 0:
        raise RuntimeError("WebPEncodeRGB failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(out)


def decode_yuv(payload: bytes):
    """(w, h, y, u, v) reference planes — y cropped to w x h, u/v to
    ceil-half dimensions, matching decode_vp8's output contract."""
    lib = load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    y = lib.WebPDecodeYUV(payload, len(payload), ctypes.byref(w),
                          ctypes.byref(h), ctypes.byref(u),
                          ctypes.byref(v), ctypes.byref(stride),
                          ctypes.byref(uv_stride))
    if not y:
        raise RuntimeError("WebPDecodeYUV failed")
    try:
        W, H, S, US = w.value, h.value, stride.value, uv_stride.value
        cw, ch = (W + 1) >> 1, (H + 1) >> 1
        yb = b"".join(ctypes.string_at(
            ctypes.addressof(y.contents) + r * S, W) for r in range(H))
        ub = b"".join(ctypes.string_at(
            ctypes.addressof(u.contents) + r * US, cw) for r in range(ch))
        vb = b"".join(ctypes.string_at(
            ctypes.addressof(v.contents) + r * US, cw) for r in range(ch))
        return W, H, yb, ub, vb
    finally:
        lib.WebPFree(y)


# --- advanced encoder API (WebPConfig / WebPPicture via raw offsets) ----
# Offsets follow the public webp/encode.h layout on LP64; structs are
# over-allocated and the ABI version probed, so a mismatched system
# libwebp fails loudly at init rather than corrupting memory.

_CFG_OFF = {  # WebPConfig int/float field byte offsets
    "lossless": 0, "quality": 4, "method": 8, "segments": 24,
    "sns_strength": 28, "filter_strength": 32, "filter_sharpness": 36,
    "filter_type": 40, "autofilter": 44, "pass": 60, "partitions": 72,
}


def _abi_probe(lib):
    for ver in range(0x0210, 0x01ff, -1):
        buf = ctypes.create_string_buffer(512)
        if lib.WebPConfigInitInternal(buf, 0, ctypes.c_float(75.0), ver):
            return ver
    raise RuntimeError("no accepted WebPConfig ABI version")


def encode_advanced(rgb: bytes, w: int, h: int, quality: float = 75.0,
                    **cfg_overrides) -> bytes:
    """Lossy encode through WebPEncode with explicit WebPConfig fields
    (filter_type=0 for the simple loop filter, partitions=N for 2^N
    token partitions, filter_sharpness, segments, ...)."""
    lib = load()
    lib.WebPConfigInitInternal.restype = ctypes.c_int
    lib.WebPPictureInitInternal.restype = ctypes.c_int
    lib.WebPEncode.restype = ctypes.c_int
    ver = _abi_probe(lib)
    cfg = ctypes.create_string_buffer(512)
    if not lib.WebPConfigInitInternal(cfg, 0, ctypes.c_float(quality), ver):
        raise RuntimeError("WebPConfigInit failed")
    for k, val in cfg_overrides.items():
        off = _CFG_OFF[k]
        if isinstance(val, float):
            ctypes.memmove(ctypes.addressof(cfg) + off,
                           ctypes.byref(ctypes.c_float(val)), 4)
        else:
            ctypes.memmove(ctypes.addressof(cfg) + off,
                           ctypes.byref(ctypes.c_int(val)), 4)
    if not lib.WebPValidateConfig(cfg):
        raise RuntimeError(f"invalid config overrides {cfg_overrides}")

    pic = ctypes.create_string_buffer(1024)
    if not lib.WebPPictureInitInternal(pic, ver):
        raise RuntimeError("WebPPictureInit failed")
    base = ctypes.addressof(pic)
    ctypes.memmove(base + 8, ctypes.byref(ctypes.c_int(w)), 4)    # width
    ctypes.memmove(base + 12, ctypes.byref(ctypes.c_int(h)), 4)   # height
    if not lib.WebPPictureImportRGB(pic, rgb, w * 3):
        raise RuntimeError("WebPPictureImportRGB failed")

    wrt = ctypes.create_string_buffer(64)  # WebPMemoryWriter
    lib.WebPMemoryWriterInit(wrt)
    # picture.writer = WebPMemoryWrite; picture.custom_ptr = &wrt
    ctypes.memmove(base + 96, ctypes.byref(
        ctypes.c_void_p(ctypes.cast(lib.WebPMemoryWrite,
                                    ctypes.c_void_p).value)), 8)
    ctypes.memmove(base + 104, ctypes.byref(
        ctypes.c_void_p(ctypes.addressof(wrt))), 8)
    ok = lib.WebPEncode(cfg, pic)
    try:
        if not ok:
            err = ctypes.c_int.from_buffer_copy(pic, 136).value
            raise RuntimeError(f"WebPEncode failed (error {err})")
        mem = ctypes.c_void_p.from_buffer_copy(wrt, 0).value
        size = ctypes.c_size_t.from_buffer_copy(wrt, 8).value
        return ctypes.string_at(mem, size)
    finally:
        lib.WebPPictureFree(pic)
        lib.WebPMemoryWriterClear(wrt)
