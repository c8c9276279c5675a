"""Minimal spec-written animated-WebP (ANMF) muxer — TEST-ONLY.

Builds RIFF/VP8X/ANIM/ANMF containers per the public WebP container
spec around REAL still image streams: lossy VP8 bitstreams from
libwebp (tests/webp_ref.py) and VP8L streams from the independent
spec-written encoder (tests/vp8l_encoder.py). Container bytes are
bookkeeping; the codec payloads under test come from real producers.
"""
from __future__ import annotations


def chunk(cc: bytes, data: bytes) -> bytes:
    return cc + len(data).to_bytes(4, "little") + data \
        + (b"\x00" if len(data) & 1 else b"")


def anmf(x: int, y: int, w: int, h: int, dur_ms: int, image: bytes, *,
         dispose_bg: bool = False, no_blend: bool = False) -> bytes:
    flags = (1 if dispose_bg else 0) | (2 if no_blend else 0)
    return chunk(b"ANMF", (x // 2).to_bytes(3, "little")
                 + (y // 2).to_bytes(3, "little")
                 + (w - 1).to_bytes(3, "little")
                 + (h - 1).to_bytes(3, "little")
                 + dur_ms.to_bytes(3, "little") + bytes([flags]) + image)


def mux_anim_webp(frames: list[bytes], canvas_w: int, canvas_h: int, *,
                  bg_bgra: bytes = b"\x00\x00\x00\xff",
                  loops: int = 0) -> bytes:
    """``frames`` are complete ANMF chunks (from :func:`anmf`)."""
    vp8x = chunk(b"VP8X", bytes([0x02, 0, 0, 0])
                 + (canvas_w - 1).to_bytes(3, "little")
                 + (canvas_h - 1).to_bytes(3, "little"))
    anim = chunk(b"ANIM", bg_bgra + loops.to_bytes(2, "little"))
    body = b"WEBP" + vp8x + anim + b"".join(frames)
    return b"RIFF" + len(body).to_bytes(4, "little") + body
