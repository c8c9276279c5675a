"""Pure-Python FLAC sample decoder (public FLAC format / RFC 9639).

The last audio codec decodable in this container without external codec
tables: everything is bit-packing plus integer predictors. Covers the
whole frame layout — STREAMINFO + metadata-block walk, frame headers
(coded numbers, block-size/sample-rate extensions, CRC-8 verification),
subframe types CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32), Rice-coded
residual partitions (4- and 5-bit parameters, raw-bits escape), wasted
bits, and the three stereo decorrelation modes (left/side, right/side,
mid/side).

Validated against an INDEPENDENT test-side encoder written from the same
public spec (tests/flac_encoder.py) — no shared bitstream code — with
hand-computed vectors for the fixed-predictor and zigzag arithmetic
(mirroring the vp8l.py methodology).

Used by ``modality.decode_audio``: FLAC payloads now produce a REAL
windowed RMS loudness profile instead of the digest stand-in.
"""

from __future__ import annotations

__all__ = ["decode_flac"]


# --- CRCs (public polynomials from the spec) ------------------------------

def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


# --- bit reader ------------------------------------------------------------

class _Bits:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def u(self, n: int) -> int:
        """Read n bits MSB-first as an unsigned int."""
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("EOF in FLAC bitstream")
        first, last = self.pos >> 3, (end + 7) >> 3
        chunk = int.from_bytes(self.data[first:last], "big")
        chunk >>= (last << 3) - end
        self.pos = end
        return chunk & ((1 << n) - 1)

    def s(self, n: int) -> int:
        v = self.u(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        """Count 0-bits up to the terminating 1 (FLAC unary coding)."""
        q = 0
        while not self.u(1):
            q += 1
            if q > 1 << 20:
                raise ValueError("runaway unary code")
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


# --- frame machinery --------------------------------------------------------

_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
               8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
               13: 8192, 14: 16384, 15: 32768}
_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
          7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# fixed-predictor reconstruction coefficients by order (applied to the
# PREVIOUS samples; spec polynomial predictors)
_FIXED = {0: (), 1: (1,), 2: (2, -1), 3: (3, -3, 1), 4: (4, -6, 4, -1)}


def _coded_number(br: _Bits) -> int:
    """The frame header's UTF-8-style coded frame/sample number (up to
    36 bits over 7 bytes)."""
    b0 = br.u(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError("bad coded number")
    val = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = br.u(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad coded-number continuation")
        val = (val << 6) | (c & 0x3F)
    return val


def _residual(br: _Bits, blocksize: int, order: int) -> list[int]:
    method = br.u(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.u(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise ValueError("partition order does not divide block size")
    out: list[int] = []
    for p in range(nparts):
        n = (blocksize >> po) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("predictor order exceeds first partition")
        param = br.u(pbits)
        if param == escape:
            raw = br.u(5)
            if raw == 0:
                out.extend([0] * n)
            else:
                out.extend(br.s(raw) for _ in range(n))
        else:
            for _ in range(n):
                q = br.unary()
                uval = (q << param) | br.u(param)
                out.append((uval >> 1) ^ -(uval & 1))  # zigzag
    return out


def _subframe(br: _Bits, blocksize: int, bps: int) -> list[int]:
    if br.u(1):
        raise ValueError("subframe header padding bit set")
    stype = br.u(6)
    wasted = 0
    if br.u(1):
        wasted = br.unary() + 1
    bps -= wasted
    if bps <= 0:
        raise ValueError("wasted bits exceed sample size")

    if stype == 0:  # CONSTANT
        v = br.s(bps)
        out = [v] * blocksize
    elif stype == 1:  # VERBATIM
        out = [br.s(bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED, order = stype - 8
        order = stype - 8
        out = [br.s(bps) for _ in range(order)]
        coefs = _FIXED[order]
        for e in _residual(br, blocksize, order):
            v = e
            for j, c in enumerate(coefs):
                v += c * out[-1 - j]
            out.append(v)
    elif stype >= 32:  # LPC, order = (stype & 31) + 1
        order = (stype & 31) + 1
        out = [br.s(bps) for _ in range(order)]
        prec = br.u(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision")
        shift = br.s(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.s(prec) for _ in range(order)]
        for e in _residual(br, blocksize, order):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * out[-1 - j]
            out.append(e + (acc >> shift))
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(raw: bytes):
    """Decode a FLAC stream to
    ``(sample_rate, n_channels, bits_per_sample, channels)`` where
    ``channels`` is a list of per-channel sample lists. Raises
    ``ValueError`` on anything malformed (incl. CRC-8/CRC-16
    mismatches)."""
    if raw[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    i = 4
    si_rate = si_nch = si_bps = None
    while i + 4 <= len(raw):
        hdr = raw[i]
        length = int.from_bytes(raw[i + 1:i + 4], "big")
        if (hdr & 0x7F) == 0:  # STREAMINFO
            if length < 34 or i + 4 + 18 > len(raw):
                raise ValueError("truncated STREAMINFO")
            packed = int.from_bytes(raw[i + 14:i + 22], "big")
            si_rate = packed >> 44
            si_nch = ((packed >> 41) & 0x7) + 1
            si_bps = ((packed >> 36) & 0x1F) + 1
        i += 4 + length
        if hdr & 0x80:
            break
    if si_rate is None:
        raise ValueError("FLAC without STREAMINFO")

    channels: list[list[int]] = []
    nch_out = si_nch
    while i < len(raw):
        if i + 2 > len(raw):
            break
        frame_start = i
        br = _Bits(raw, i * 8)
        sync = br.u(14)
        if sync != 0b11111111111110:
            raise ValueError("lost frame sync")
        if br.u(1):
            raise ValueError("reserved frame-header bit set")
        br.u(1)  # blocking strategy
        bs_code = br.u(4)
        sr_code = br.u(4)
        chan = br.u(4)
        sz_code = br.u(3)
        if br.u(1):
            raise ValueError("reserved frame-header bit set")
        _coded_number(br)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 6:
            blocksize = br.u(8) + 1
        elif bs_code == 7:
            blocksize = br.u(16) + 1
        else:
            blocksize = _BLOCKSIZES[bs_code]
        if sr_code == 0:
            rate = si_rate
        elif sr_code == 12:
            rate = br.u(8) * 1000
        elif sr_code == 13:
            rate = br.u(16)
        elif sr_code == 14:
            rate = br.u(16) * 10
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        else:
            rate = _RATES[sr_code]
        bps = si_bps if sz_code == 0 else _SIZES.get(sz_code)
        if bps is None:
            raise ValueError("reserved sample size code")
        hdr_end = (br.pos + 7) >> 3
        if _crc8(raw[frame_start:hdr_end]) != br.u(8) or br.pos % 8:
            raise ValueError("frame header CRC-8 mismatch")

        if chan <= 7:
            nch = chan + 1
            subs = [_subframe(br, blocksize, bps) for _ in range(nch)]
        elif chan in (8, 9, 10):
            nch = 2
            extra = (0, 1) if chan == 8 else ((1, 0) if chan == 9
                                              else (0, 1))
            a = _subframe(br, blocksize, bps + extra[0])
            b = _subframe(br, blocksize, bps + extra[1])
            if chan == 8:    # left/side: right = left - side
                subs = [a, [x - y for x, y in zip(a, b)]]
            elif chan == 9:  # right/side: left = right + side
                subs = [[x + y for x, y in zip(a, b)], b]
            else:            # mid/side
                left, right = [], []
                for m, s in zip(a, b):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                subs = [left, right]
        else:
            raise ValueError("reserved channel assignment")
        nch_out = nch

        br.align()
        body_end = br.pos >> 3
        if body_end + 2 > len(raw):
            raise ValueError("truncated frame footer")
        if _crc16(raw[frame_start:body_end]) != int.from_bytes(
                raw[body_end:body_end + 2], "big"):
            raise ValueError("frame CRC-16 mismatch")
        i = body_end + 2

        while len(channels) < nch:
            channels.append([])
        for c in range(nch):
            channels[c].extend(subs[c])

    if not channels:
        raise ValueError("FLAC with no audio frames")
    return si_rate, nch_out, si_bps, channels
