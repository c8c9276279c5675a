"""FLAC sample decoder vs the independent test-side encoder
(flac_encoder.py) — both written from the public FLAC format spec with
no shared bitstream code, plus hand vectors for the predictor/zigzag
arithmetic a matching-error round-trip could hide."""

import math
import random

import pytest

from fortissimo_spark.flac import _Bits, _crc8, _crc16, decode_flac
from tests.flac_encoder import encode_flac


def sine(n, amp=20000, freq=440, rate=44100):
    return [int(amp * math.sin(2 * math.pi * freq * i / rate))
            for i in range(n)]


def test_roundtrip_verbatim_and_constant():
    random.seed(7)
    s = [random.randint(-30000, 30000) for _ in range(256)]
    rate, nch, bps, ch = decode_flac(
        encode_flac([s], 44100, 16, subframe_kwargs={"kind": "verbatim"}))
    assert (rate, nch, bps) == (44100, 1, 16) and ch[0] == s
    c = [1234] * 192
    assert decode_flac(encode_flac(
        [c], 8000, 16, subframe_kwargs={"kind": "constant"}))[3][0] == c


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_roundtrip_fixed_orders_rice_partitions(order):
    s = sine(4096)
    data = encode_flac([s], 44100, 16, frame_size=1024,
                       subframe_kwargs={"kind": f"fixed{order}",
                                        "partition_order": 2})
    assert decode_flac(data)[3][0] == s


def test_roundtrip_escape_and_wasted_bits():
    s = [v & ~0b11 for v in sine(512)]  # low 2 bits zero -> wasted
    data = encode_flac([s], 44100, 16,
                       subframe_kwargs={"kind": "fixed1",
                                        "escape_raw": 18, "wasted": 2})
    assert decode_flac(data)[3][0] == s
    # escape_raw = 0 means an all-zero partition
    z = [5] * 300  # order-1 residuals all zero after warmup
    data = encode_flac([z], 8000, 16,
                       subframe_kwargs={"kind": "fixed1", "escape_raw": 0})
    assert decode_flac(data)[3][0] == z


@pytest.mark.parametrize("stereo", ["independent", "left_side",
                                    "right_side", "mid_side"])
def test_roundtrip_stereo_modes(stereo):
    left = sine(1024)
    right = [v // 3 for v in left]
    data = encode_flac([left, right], 48000, 16, stereo=stereo,
                       subframe_kwargs={"kind": "fixed2"})
    rate, nch, bps, ch = decode_flac(data)
    assert nch == 2 and ch[0] == left and ch[1] == right


def test_fixed_predictor_hand_vectors():
    """Order-2..4 reconstruction on hand-computed residuals (shared-math
    guard: the encoder derives residuals with the same coefficients, so
    a sign error would round-trip invisibly)."""
    # samples 10, 13, 18: order-2 residual of 18 is 18 - 2*13 + 10 = 2
    from tests.flac_encoder import fixed_residuals
    assert fixed_residuals([10, 13, 18], 2) == [2]
    assert fixed_residuals([1, 4, 9, 16], 3) == [16 - 3 * 9 + 3 * 4 - 1]
    assert fixed_residuals([1, 2, 4, 8, 16], 4) == [
        16 - 4 * 8 + 6 * 4 - 4 * 2 + 1]
    # decoder inverse on a raw bitstream built around those residuals
    s = [10, 13, 18, 25, 34]
    data = encode_flac([s], 8000, 16, subframe_kwargs={"kind": "fixed2"})
    assert decode_flac(data)[3][0] == s


def test_zigzag_and_unary_bit_vectors():
    """Rice decode primitives: unary is zeros-terminated-by-one; zigzag
    maps 0,-1,1,-2,2... from 0,1,2,3,4."""
    br = _Bits(bytes([0b00101100]))
    assert br.unary() == 2 and br.unary() == 1 and br.unary() == 0
    for uval, want in [(0, 0), (1, -1), (2, 1), (3, -2), (4, 2)]:
        assert (uval >> 1) ^ -(uval & 1) == want


def test_crc_rejection():
    s = sine(256)
    data = bytearray(encode_flac([s], 44100, 16,
                                 subframe_kwargs={"kind": "verbatim"}))
    good = bytes(data)
    assert decode_flac(good)[3][0] == s
    data[-1] ^= 0xFF  # footer CRC-16
    with pytest.raises(ValueError):
        decode_flac(bytes(data))
    data = bytearray(good)
    # flip a frame-header byte (blocksize field) -> CRC-8 must catch it
    hdr_at = len(good) - 2 - 2 - (256 * 16) // 8 - 2  # inside the header
    data[42 + 4] ^= 0x01
    with pytest.raises(ValueError):
        decode_flac(bytes(data))
    assert _crc8(b"123456789") == 0xF4      # public check value
    assert _crc16(b"123456789") == 0xFEE8   # CRC-16/BUYPASS check value


def test_decode_audio_flac_real_rms():
    """The verdict's done-criterion: a FLAC sine decodes through
    decode_audio to a REAL loudness profile — every full window's RMS ==
    amp/sqrt(2) (not a digest stand-in)."""
    from fortissimo_spark.modality import decode_audio
    amp = 16384
    s = sine(44100, amp=amp)  # 1 s: each of 16 windows holds many periods
    data = encode_flac([s], 44100, 16, frame_size=4096,
                       subframe_kwargs={"kind": "fixed2",
                                        "partition_order": 2})
    rate, nch, dur, rms = decode_audio(data)
    assert (rate, nch, dur) == (44100, 1, 1000)
    want = amp / 32768.0 / math.sqrt(2)
    assert all(abs(r - want) < 0.01 * want for r in rms)


def test_decode_audio_flac_corrupt_frames_degrade_to_metadata():
    """A FLAC whose STREAMINFO is readable but whose frames are garbage
    must keep the old metadata + digest stand-in behavior, not raise."""
    from fortissimo_spark.modality import decode_audio
    packed = (22050 << 44) | (0 << 41) | (15 << 36) | 44100
    flac = (b"fLaC" + b"\x80" + (34).to_bytes(3, "big") + b"\x00" * 10
            + packed.to_bytes(8, "big") + b"\x00" * 16
            + b"\xde\xad\xbe\xef not frames")
    rate, nch, dur, rms = decode_audio(flac)
    assert (rate, nch, dur) == (22050, 1, 2000)
    assert len(rms) == 16  # digest stand-in profile
