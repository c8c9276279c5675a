"""Independent test-side FLAC encoder, written from the public FLAC
format spec (RFC 9639) with NO code shared with fortissimo_spark/flac.py
— round-trips cross-check the bitstream details (the vp8l_encoder.py
methodology).

Supports: STREAMINFO, one or more frames, subframe types constant /
verbatim / fixed(0-4) with Rice-coded residuals (chosen parameter,
optional multi-partition, raw-bits escape), independent or
left-side/right-side/mid-side stereo, wasted bits.
"""

from __future__ import annotations


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, value: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.bits.append((value >> k) & 1)

    def s(self, value: int, n: int) -> None:
        self.u(value & ((1 << n) - 1), n)

    def unary(self, q: int) -> None:
        self.bits.extend([0] * q)
        self.bits.append(1)

    def align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for b in self.bits[i:i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


FIXED_COEFS = {0: (), 1: (1,), 2: (2, -1), 3: (3, -3, 1), 4: (4, -6, 4, -1)}


def fixed_residuals(samples: list[int], order: int) -> list[int]:
    out = []
    for i in range(order, len(samples)):
        e = samples[i]
        for j, c in enumerate(FIXED_COEFS[order]):
            e -= c * samples[i - 1 - j]
        out.append(e)
    return out


def write_rice(w: BitWriter, residuals: list[int], order: int,
               blocksize: int, *, partition_order: int = 0,
               param: int | None = None, escape_raw: int | None = None):
    """Residual section: method 0 (4-bit params). ``param`` fixes the
    Rice parameter (else chosen from the partition mean); ``escape_raw``
    forces the raw-bits escape with that bit width."""
    w.u(0, 2)
    w.u(partition_order, 4)
    nparts = 1 << partition_order
    assert blocksize % nparts == 0
    pos = 0
    for p in range(nparts):
        n = (blocksize >> partition_order) - (order if p == 0 else 0)
        part = residuals[pos:pos + n]
        pos += n
        if escape_raw is not None:
            w.u(0xF, 4)
            w.u(escape_raw, 5)
            if escape_raw:
                for v in part:
                    w.s(v, escape_raw)
            continue
        if param is None:
            zz = [(v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
                  for v in part]
            mean = (sum(zz) // max(1, len(zz))) or 1
            k = max(0, min(14, mean.bit_length() - 1))
        else:
            k = param
        w.u(k, 4)
        for v in part:
            uval = (v << 1) if v >= 0 else ((-v) << 1) - 1
            w.unary(uval >> k)
            w.u(uval & ((1 << k) - 1), k)


def write_subframe(w: BitWriter, samples: list[int], bps: int, *,
                   kind: str = "verbatim", wasted: int = 0,
                   blocksize: int | None = None,
                   partition_order: int = 0,
                   param: int | None = None,
                   escape_raw: int | None = None) -> None:
    blocksize = len(samples) if blocksize is None else blocksize
    w.u(0, 1)
    if kind == "constant":
        w.u(0, 6)
    elif kind == "verbatim":
        w.u(1, 6)
    elif kind.startswith("fixed"):
        order = int(kind[5:])
        w.u(8 + order, 6)
    else:
        raise ValueError(kind)
    if wasted:
        w.u(1, 1)
        w.unary(wasted - 1)
    else:
        w.u(0, 1)
    eff = bps - wasted
    stored = [v >> wasted for v in samples]
    if kind == "constant":
        assert len(set(stored)) == 1
        w.s(stored[0], eff)
    elif kind == "verbatim":
        for v in stored:
            w.s(v, eff)
    else:
        order = int(kind[5:])
        for v in stored[:order]:
            w.s(v, eff)
        write_rice(w, fixed_residuals(stored, order), order, blocksize,
                   partition_order=partition_order, param=param,
                   escape_raw=escape_raw)


def streaminfo(rate: int, nch: int, bps: int, total: int) -> bytes:
    body = bytearray(34)
    body[0:2] = (16).to_bytes(2, "big")      # min block size
    body[2:4] = (65535).to_bytes(2, "big")   # max block size
    packed = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | total
    body[10:18] = packed.to_bytes(8, "big")
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def encode_frame(channel_samples: list[list[int]], rate: int, bps: int,
                 frame_no: int = 0, *, stereo: str = "independent",
                 subframe_kwargs: dict | None = None,
                 per_channel_kwargs: list[dict] | None = None) -> bytes:
    """One frame. ``stereo``: independent | left_side | right_side |
    mid_side (2-channel inputs are given as decoded left/right and
    transformed here)."""
    blocksize = len(channel_samples[0])
    nch = len(channel_samples)
    w = BitWriter()
    w.u(0b11111111111110, 14)
    w.u(0, 1)
    w.u(0, 1)            # fixed blocksize stream
    w.u(7, 4)            # blocksize-1 as 16 bit at header end
    w.u(13, 4)           # sample rate: 16 bit Hz at header end
    chan_map = {"independent": nch - 1, "left_side": 8,
                "right_side": 9, "mid_side": 10}
    w.u(chan_map[stereo], 4)
    sz_map = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
    w.u(sz_map[bps], 3)
    w.u(0, 1)
    assert frame_no < 0x80
    w.u(frame_no, 8)     # coded number, single byte
    w.u(blocksize - 1, 16)
    w.u(rate, 16)
    w.align()
    head = w.bytes()
    head += bytes([crc8(head)])

    wb = BitWriter()
    kw = subframe_kwargs or {}
    if stereo == "independent":
        subs = [(s, bps) for s in channel_samples]
    else:
        left, right = channel_samples
        side = [l - r for l, r in zip(left, right)]
        if stereo == "left_side":
            subs = [(left, bps), (side, bps + 1)]
        elif stereo == "right_side":
            subs = [(side, bps + 1), (right, bps)]
        else:
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            subs = [(mid, bps), (side, bps + 1)]
    for c, (s, b) in enumerate(subs):
        ckw = (per_channel_kwargs[c] if per_channel_kwargs else kw)
        write_subframe(wb, s, b, blocksize=blocksize, **ckw)
    wb.align()
    body = head + wb.bytes()
    return body + crc16(body).to_bytes(2, "big")


def encode_flac(channel_samples: list[list[int]], rate: int, bps: int,
                *, frame_size: int | None = None,
                stereo: str = "independent",
                subframe_kwargs: dict | None = None,
                per_channel_kwargs: list[dict] | None = None) -> bytes:
    total = len(channel_samples[0])
    out = bytearray(streaminfo(rate, len(channel_samples), bps, total))
    fs = frame_size or total
    for fno, start in enumerate(range(0, total, fs)):
        chunk = [s[start:start + fs] for s in channel_samples]
        out += encode_frame(chunk, rate, bps, fno, stereo=stereo,
                            subframe_kwargs=subframe_kwargs,
                            per_channel_kwargs=per_channel_kwargs)
    return bytes(out)
