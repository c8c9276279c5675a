"""Minimal spec-written Matroska/WebM muxer — TEST-ONLY fixture source.

Writes the element subset a WebM VP8 video needs (EBML header, Segment
Info with TimestampScale/Duration, one video TrackEntry, Clusters with
SimpleBlock or BlockGroup frames) per the public Matroska EBML spec.
The video payloads themselves are REAL libwebp-encoded VP8 keyframe
bitstreams (tests/webp_ref.py), so the codec layer under test is
validated against a real producer; only the container bytes are
self-made (writing a container is bookkeeping, not a codec).
"""
from __future__ import annotations

import struct


def _vint_size(value: int) -> bytes:
    for length in range(1, 9):
        if value < (1 << (7 * length)) - 1:
            data = value | (1 << (7 * length))
            return data.to_bytes(length, "big")
    raise ValueError("size too large")


def _el(eid: int, payload: bytes) -> bytes:
    id_len = (eid.bit_length() + 7) // 8
    return eid.to_bytes(id_len, "big") + _vint_size(len(payload)) + payload


def _uint(value: int) -> bytes:
    n = max(1, (value.bit_length() + 7) // 8)
    return value.to_bytes(n, "big")


def mux_webm(frames, width: int, height: int, *,
             codec: bytes = b"V_VP8", frame_ms: int = 500,
             cluster_every: int = 4, use_block_group: bool = False,
             timescale_ns: int = 1_000_000) -> bytes:
    """``frames`` is [(payload, is_keyframe)]; frame k is presented at
    k * frame_ms. Clusters hold ``cluster_every`` frames each."""
    header = _el(0x1A45DFA3, b"".join([
        _el(0x4286, _uint(1)), _el(0x42F7, _uint(1)),
        _el(0x42F2, _uint(4)), _el(0x42F3, _uint(8)),
        _el(0x4282, b"webm"), _el(0x4287, _uint(2)),
        _el(0x4285, _uint(2))]))
    tick = 1_000_000 / timescale_ns  # ticks per ms
    duration_ticks = len(frames) * frame_ms * tick
    info = _el(0x1549A966, b"".join([
        _el(0x2AD7B1, _uint(timescale_ns)),
        _el(0x4489, struct.pack(">d", duration_ticks))]))
    tracks = _el(0x1654AE6B, _el(0xAE, b"".join([
        _el(0xD7, _uint(1)), _el(0x73C5, _uint(1)),
        _el(0x83, _uint(1)), _el(0x86, codec),
        _el(0xE0, _el(0xB0, _uint(width)) + _el(0xBA, _uint(height)))])))
    clusters = []
    for c0 in range(0, len(frames), cluster_every):
        cluster_ts = int(c0 * frame_ms * tick)
        parts = [_el(0xE7, _uint(cluster_ts))]
        for k in range(c0, min(c0 + cluster_every, len(frames))):
            payload, is_key = frames[k]
            rel = int(k * frame_ms * tick) - cluster_ts
            blk = b"\x81" + struct.pack(">h", rel)
            if use_block_group:
                group = _el(0xA1, blk + b"\x00" + payload)
                if not is_key:
                    group += _el(0xFB, _uint(1))
                parts.append(_el(0xA0, group))
            else:
                flags = 0x80 if is_key else 0x00
                parts.append(_el(0xA3, blk + bytes([flags]) + payload))
        clusters.append(_el(0x1F43B675, b"".join(parts)))
    return header + _el(0x18538067, info + tracks + b"".join(clusters))
