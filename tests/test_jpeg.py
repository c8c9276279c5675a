"""Baseline JPEG decoder tests: a test-side pure-Python ENCODER (same
public T.81 spec, written independently as the inverse pipeline) produces
bitstreams from known pixels; the decoder must recover the luma plane to
within DCT rounding error (quant tables are all-ones, so loss is float
rounding only). Covers 4:4:4 / 4:2:0 / grayscale, restart intervals,
16-bit quant tables, and the refusal contract for progressive files."""

import numpy as np
import pytest

from fortissimo_spark.jpeg import ZIGZAG, decode_jpeg_luma

_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = _c / 2 * np.cos((2 * _x + 1) * _u * np.pi / 16)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for k in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _canonical(bits, vals):
    """symbol -> (code, length), canonical assignment (mirror of decoder)."""
    enc = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


# simple valid tables: DC = 12 categories at 4 bits; AC = 255 symbols at
# 9 bits + 1 at 10 (a DHT length count is a single byte, so max 255/length)
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = bytes(range(12))
_AC_BITS = [0] * 8 + [255, 1] + [0] * 6
_AC_VALS = bytes(range(256))
_DC_ENC = _canonical(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical(_AC_BITS, _AC_VALS)


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(bw, samples, pred):
    """8x8 spatial samples (uint8) -> huffman-coded coefficients; q=1."""
    f = _M @ (samples.astype(np.float64) - 128.0) @ _M.T
    zz = [int(np.rint(f.flat[ZIGZAG[k]])) for k in range(64)]
    diff = zz[0] - pred
    s = _category(diff)
    code, ln = _DC_ENC[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_ENC[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = _AC_ENC[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = _AC_ENC[0x00]  # EOB
        bw.write(code, ln)
    return zz[0]


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def encode_jpeg(rgb, subsampling="444", restart_interval=0,
                quant_precision=0):
    """rgb: H x W x 3 uint8 array -> baseline JFIF bytes (quality = lossless
    modulo DCT rounding: all-ones quant tables)."""
    h, w = rgb.shape[:2]
    gray = rgb.ndim == 2 or rgb.shape[2] == 1
    r = rgb[..., 0].astype(np.float64) if not gray else rgb.astype(np.float64)
    if gray:
        y = r
        comps = [(1, 1, 1)]  # id, hs, vs
        planes = {1: y}
    else:
        g = rgb[..., 1].astype(np.float64)
        b = rgb[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        if subsampling == "420":
            comps = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]
        else:
            comps = [(1, 1, 1), (2, 1, 1), (3, 1, 1)]
        planes = {1: y, 2: cb, 3: cr}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component padded planes at their sampled resolution
    samp = {}
    for cid, hs, vs in comps:
        p = planes[cid]
        if (hs, vs) != (hmax, vmax):  # downsample by box average
            fy, fx = vmax // vs, hmax // hs
            py = ((h + fy - 1) // fy), ((w + fx - 1) // fx)
            sm = np.zeros(py)
            for yy in range(py[0]):
                for xx in range(py[1]):
                    blk = p[yy * fy:min((yy + 1) * fy, h),
                            xx * fx:min((xx + 1) * fx, w)]
                    sm[yy, xx] = blk.mean()
            p = sm
        ph, pw = mcuy * 8 * vs, mcux * 8 * hs
        pad = np.zeros((ph, pw))
        pad[:p.shape[0], :p.shape[1]] = p
        pad[:p.shape[0], p.shape[1]:] = p[:, -1:]  # edge-extend
        pad[p.shape[0]:, :] = pad[p.shape[0] - 1:p.shape[0], :]
        samp[cid] = pad

    out = bytearray(b"\xff\xd8")
    if quant_precision == 0:
        out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    else:  # 16-bit table, still all ones
        out += _seg(0xDB, bytes([0x10]) + b"\x00\x01" * 64)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([len(comps)])
    for cid, hs, vs in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS)
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + _AC_VALS)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([len(comps)])
    for cid, _, _ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    preds = {cid: 0 for cid, _, _ in comps}
    mcu_n = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                bw.flush()
                out += bw.out
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                bw = _BitWriter()
                preds = {cid: 0 for cid, _, _ in comps}
            for cid, hs, vs in comps:
                for by in range(vs):
                    for bx in range(hs):
                        y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                        preds[cid] = _encode_block(
                            bw, samp[cid][y0:y0 + 8, x0:x0 + 8], preds[cid])
            mcu_n += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 37 + yy * 11) % 256,
                     (xx * 5 + yy * 93) % 256,
                     (xx * 201 + yy * 67) % 256], axis=-1).astype(np.uint8)


def _luma(rgb):
    return (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
            + 0.114 * rgb[..., 2])


@pytest.mark.parametrize("size", [(16, 16), (24, 16), (13, 9)])
def test_jpeg_444_luma_roundtrip(size):
    w, h = size
    rgb = _gradient(h, w)
    jw, jh, plane = decode_jpeg_luma(encode_jpeg(rgb, "444"))
    assert (jw, jh) == (w, h)
    assert plane.shape == (h, w)
    # all-ones quant: error is DCT float rounding only
    assert np.abs(plane.astype(float) - _luma(rgb)).max() <= 2.0


def test_jpeg_420_and_restarts_and_16bit_quant():
    rgb = _gradient(32, 48)
    for kwargs in ({"subsampling": "420"},
                   {"subsampling": "420", "restart_interval": 2},
                   {"subsampling": "444", "restart_interval": 1},
                   {"subsampling": "444", "quant_precision": 1}):
        jw, jh, plane = decode_jpeg_luma(encode_jpeg(rgb, **kwargs))
        assert (jw, jh) == (48, 32)
        assert np.abs(plane.astype(float) - _luma(rgb)).max() <= 2.0, kwargs


def test_jpeg_grayscale_single_component():
    g = ((np.mgrid[0:16, 0:16][0] * 16 + np.mgrid[0:16, 0:16][1]) % 256
         ).astype(np.uint8)
    jw, jh, plane = decode_jpeg_luma(encode_jpeg(g))
    assert (jw, jh) == (16, 16)
    assert np.abs(plane.astype(float) - g).max() <= 2.0


def test_jpeg_refusals():
    rgb = _gradient(16, 16)
    good = encode_jpeg(rgb)
    # progressive: flip SOF0 -> SOF2
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg_luma(prog)
    with pytest.raises(ValueError):
        decode_jpeg_luma(b"\x89PNG not a jpeg")


def test_jpeg_through_decode_image_and_kernel():
    from fortissimo_spark.modality import decode_image
    rgb = _gradient(16, 16)
    w, h, grid = decode_image(encode_jpeg(rgb))
    assert (w, h) == (16, 16)
    # grid vs the luma-derived expectation (4x4 block means)
    exp = _luma(rgb)
    cells = [exp[gy * 4:(gy + 1) * 4, gx * 4:(gx + 1) * 4].mean()
             for gy in range(4) for gx in range(4)]
    assert max(abs(a - b) for a, b in zip(grid, cells)) <= 3.0
