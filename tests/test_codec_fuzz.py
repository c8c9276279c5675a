"""Property fuzz for the pure-Python image codecs: random pixels, sizes,
filter choices, subsampling, and scan scripts — decode must invert the
independent test-side encoders within the formats' error bounds (PNG
exact; JPEG within DCT rounding at all-ones quant)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from fortissimo_spark.jpeg import decode_jpeg_luma
from fortissimo_spark.modality import decode_png, decode_ppm

from .test_jpeg import _luma, encode_jpeg, encode_jpeg_progressive
from .test_spark_integration import _make_png


@st.composite
def _image(draw, max_side=25):
    w = draw(st.integers(1, max_side))
    h = draw(st.integers(1, max_side))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@settings(max_examples=20, deadline=None)
@given(_image(), st.lists(st.integers(0, 4), min_size=1, max_size=5))
def test_png_filter_fuzz(rgb, filters):
    h, w = rgb.shape[:2]
    px = lambda x, y: tuple(int(v) for v in rgb[y, x]) + (255,)  # noqa: E731
    ppm = (f"P6\n{w} {h}\n255\n".encode() + rgb.tobytes())
    expect = decode_ppm(ppm)
    assert decode_png(_make_png(w, h, px, 2, filters=tuple(filters))) == expect
    assert decode_png(_make_png(w, h, px, 6, filters=tuple(filters))) == expect


@settings(max_examples=12, deadline=None)
@given(_image(max_side=20), st.sampled_from(["444", "420"]),
       st.booleans())
def test_jpeg_fuzz(rgb, sub, progressive):
    h, w = rgb.shape[:2]
    data = (encode_jpeg_progressive(rgb, sub, successive=True) if progressive
            else encode_jpeg(rgb, sub))
    jw, jh, plane = decode_jpeg_luma(data)
    assert (jw, jh) == (w, h)
    assert np.abs(plane.astype(float) - _luma(rgb)).max() <= 2.0


@settings(max_examples=8, deadline=None)
@given(_image(max_side=20), st.sampled_from(["444", "420"]))
def test_jpeg_progressive_equals_baseline_fuzz(rgb, sub):
    base = decode_jpeg_luma(encode_jpeg(rgb, sub))[2]
    for successive in (False, True):
        prog = decode_jpeg_luma(
            encode_jpeg_progressive(rgb, sub, successive=successive))[2]
        assert np.array_equal(prog, base)


# --- WARC framing fuzz (Content-Length framing vs adversarial bodies) ---

from hypothesis import example  # noqa: E402

from fortissimo_spark.warc import build_warc, parse_warc_pages  # noqa: E402


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=6),
       st.booleans())
@example([b"WARC/1.0\r\nWARC-Type: response\r\n\r\n", b"\r\n\r\nHTTP/1.1 200 OK"],
         False)
def test_warc_framing_fuzz(bodies, compress):
    """Bodies are length-framed, so ARBITRARY payload bytes — including
    embedded 'WARC/1.0' record heads and CRLF-CRLF separators — must never
    desync the parser: every record comes back, bytes exact."""
    records = [{"url": f"http://f.example/{i}",
                "date": "2024-01-01T00:00:00Z", "body": b}
               for i, b in enumerate(bodies)]
    got = parse_warc_pages(build_warc(records, compress=compress))
    assert [p["url"] for p in got] == [r["url"] for r in records]
    assert [bytes(p["html"]) for p in got] == list(bodies)
