"""Layer III decoder validation: complete-prefix-code tables, exact
Huffman bit symmetry vs the independent encoder, TDAC exactness of
the MDCT pair, full encode->decode round-trips, and the real-world
MPEG-2 fixture (gsutil's public test.mp3 — 45 frames of digital
silence at 22.05 kHz mono, which exercises header/LSF-side-info/
reservoir/accounting paths end-to-end)."""
import math
import os

import numpy as np
import pytest

from fortissimo_spark.mp3 import (HUFF_PATTERNS, QUAD_A, QUAD_B,
                                  SUPPORTED_TABLES, Mp3Error, _Bits,
                                  _BIG_MAPS, _QUAD_MAPS, _cum,
                                  _decode_huffman, decode_mp3,
                                  parse_frame_header, probe_mp3,
                                  SFB_LONG)
from tests.mp3_encoder import (_BitWriter, analyze, encode_big_values,
                               encode_count1, encode_mp3, mdct_bands)

REAL_MP3 = ("/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
            "test_data/test.mp3")


def test_tables_complete_prefix_codes():
    for tid, (xl, yl, hlen, hcod) in HUFF_PATTERNS.items():
        seen = {}
        kraft = 0.0
        for x in range(xl):
            for y in range(yl):
                bits = format(hcod[x][y], f"0{hlen[x][y]}b")
                for o in seen:
                    assert not (o.startswith(bits)
                                or bits.startswith(o)), (tid, bits, o)
                seen[bits] = (x, y)
                kraft += 2.0 ** -hlen[x][y]
        assert abs(kraft - 1.0) < 1e-12, tid
    for tab in (QUAD_A, QUAD_B):
        assert abs(sum(2.0 ** -h for h, _ in tab) - 1.0) < 1e-12


@pytest.mark.parametrize("tid", sorted(HUFF_PATTERNS))
def test_huffman_bit_symmetry(tid):
    """encode_big_values -> _decode_huffman returns the exact signed
    integers for every table in the validated set."""
    xl = HUFF_PATTERNS[tid][0]
    rng = np.random.RandomState(tid)
    vals = [int(v) for v in rng.randint(-(xl - 1), xl, size=120)]
    bw = _BitWriter()
    encode_big_values(bw, vals, tid)
    g = {"big_values": 60, "window_switching": 0, "region0_count": 15,
         "region1_count": 5, "table_select": [tid, tid, tid],
         "count1table_select": 0}
    data = bw.bytes() + b"\x00" * 4
    br = _Bits(data)
    xs, idx, closed = _decode_huffman(
        br, g, _cum(SFB_LONG[(3, 0)]), bw.tell())
    assert closed
    assert xs[:120] == vals
    assert all(v == 0 for v in xs[120:])


def test_count1_bit_symmetry():
    quads = [(1, 0, -1, 1), (0, 0, 0, 0), (-1, -1, 1, 0),
             (1, 1, 1, 1), (0, 1, 0, -1)]
    for table_b in (False, True):
        bw = _BitWriter()
        encode_count1(bw, quads, table_b)
        g = {"big_values": 0, "window_switching": 0, "region0_count": 0,
             "region1_count": 0, "table_select": [0, 0, 0],
             "count1table_select": 1 if table_b else 0}
        br = _Bits(bw.bytes() + b"\x00" * 4)
        xs, idx, closed = _decode_huffman(
            br, g, _cum(SFB_LONG[(3, 0)]), bw.tell())
        assert closed and idx == 20
        assert xs[:20] == [v for q in quads for v in q]


def test_mdct_tdac_exact():
    """The encoder's forward MDCT is the machine-precision TDAC
    inverse of the decoder's IMDCT + sine window + overlap-add."""
    from fortissimo_spark import mp3 as m
    c = np.array(m._IMDCT36)
    w = np.array(m._WIN_NORMAL)
    rng = np.random.RandomState(3)
    blocks = [rng.randn(18) for _ in range(6)]
    prev = np.zeros(18)
    ovl = np.zeros(18)
    outs = []
    for b in blocks:
        z = np.concatenate([prev, b])
        x_spec = ((z * w) @ c) / 9.0
        zz = (c @ x_spec) * w
        outs.append(zz[:18] + ovl)
        ovl = zz[18:]
        prev = b
    for g in range(1, 6):
        assert np.abs(outs[g] - blocks[g - 1]).max() < 1e-12


def test_filterbank_chain_reconstruction():
    """analysis -> MDCT -> alias/inversion -> decoder IMDCT ->
    synthesis reconstructs within the documented ~0.3% filterbank
    floor (no quantization)."""
    from fortissimo_spark import mp3 as m
    sr = 44100
    t = np.arange(12288)
    x = (0.5 * np.sin(2 * np.pi * 440 * t / sr)
         + 0.2 * np.sin(2 * np.pi * 5000 * t / sr + 1.0))
    sub = analyze(x)
    prev = np.zeros((18, 32))
    overlap = [[0.0] * 18 for _ in range(32)]
    acc = np.zeros(512)
    ys = []
    for gi in range(len(sub) // 18):
        cur = sub[gi * 18:(gi + 1) * 18]
        xr = list(mdct_bands(cur, prev))
        prev = cur
        m._alias_reduce(xr)
        out = [0.0] * 576
        m._imdct_granule(xr, 0, False, overlap, out)
        ys.append(m._synthesize(np.array(out).reshape(32, 18).T, acc))
    y = np.concatenate(ys)
    d = 1056  # analysis (480) + granule buffer (576) + synthesis offset
    sx, sy = x[4000:10000], y[4000 + d:10000 + d]
    err = np.sqrt(np.mean((sx - sy) ** 2)) / np.sqrt(np.mean(sx ** 2))
    assert err < 0.01, err


def test_encode_decode_roundtrip_sine():
    sr = 44100
    t = np.arange(sr // 2)
    x = 0.5 * np.sin(2 * np.pi * 440 * t / sr)
    raw = encode_mp3(x, table=9, max_q=5)
    # the stream really selects only validated tables
    assert all(sup for _, _, _, _, sup in probe_mp3(raw))
    srd, nch, pcm = decode_mp3(raw)
    assert (srd, nch) == (44100, 1)
    y = pcm[:, 0]
    d = 1056
    sx, sy = x[4000:12000], y[4000 + d:12000 + d]
    err = np.sqrt(np.mean((sx - sy) ** 2)) / np.sqrt(np.mean(sx ** 2))
    assert err < 0.2, err          # max_q=5 quantization noise bound
    rms_in = float(np.sqrt(np.mean(x ** 2)))
    rms_out = float(np.sqrt(np.mean(y[2000:] ** 2)))
    assert abs(rms_out - rms_in) / rms_in < 0.1


@pytest.mark.parametrize("table", [1, 2, 3, 5, 6, 7, 8])
def test_encode_decode_tables(table):
    """Every validated table round-trips a (coarser) sine through the
    full bitstream."""
    sr = 32000
    t = np.arange(sr // 4)
    x = 0.4 * np.sin(2 * np.pi * 330 * t / sr)
    xl = HUFF_PATTERNS[table][0]
    raw = encode_mp3(x, sample_rate=sr, table=table, max_q=xl - 1)
    srd, nch, pcm = decode_mp3(raw)
    assert (srd, nch) == (sr, 1)
    assert float(np.abs(pcm).max()) > 0.1


def test_real_world_mpeg2_fixture():
    if not os.path.exists(REAL_MP3):
        pytest.skip("gsutil fixture not present")
    raw = open(REAL_MP3, "rb").read()
    frames = probe_mp3(raw)
    assert len(frames) == 45
    assert all(ver == 2 for _, ver, _, _, _ in frames)
    assert all(sup for *_, sup in frames)
    sr, nch, pcm = decode_mp3(raw)
    assert (sr, nch) == (22050, 1)
    # every frame decoded (none dropped to accounting failures)
    assert pcm.shape == (45 * 576, 1)
    # the file is digital silence, and the decoder must say exactly that
    assert float(np.abs(pcm).max()) == 0.0


def test_unvalidated_table_refused():
    """A stream selecting table 16 must raise, not decode garbage."""
    sr = 44100
    x = 0.3 * np.sin(2 * np.pi * 500 * np.arange(8192) / sr)
    raw = bytearray(encode_mp3(x, table=9, max_q=5))
    # patch the first granule's first table_select (bits 18+12+9+8+4+1
    # .. of side info) from 9 to 16: side info starts at byte 4
    bits = []
    for b in raw[4:21]:
        bits += [(b >> k) & 1 for k in range(7, -1, -1)]
    off = 18 + 12 + 9 + 8 + 4 + 1
    for k in range(5):
        bits[off + k] = (16 >> (4 - k)) & 1
    for i in range(17):
        v = 0
        for bit in bits[i * 8:(i + 1) * 8]:
            v = (v << 1) | bit
        raw[4 + i] = v
    with pytest.raises(Mp3Error):
        decode_mp3(bytes(raw), max_frames=1)


def test_header_parse():
    h = parse_frame_header(bytes([0xFF, 0xFB, 0x90, 0xC0]), 0)
    assert h["version"] == 3 and h["sr"] == 44100 and h["nch"] == 1
    assert h["bitrate"] == 128 and h["frame_len"] == 417
