"""PDF text-extraction leg (north-rule 'PDF/layout parse'):
generator/extractor round-trips, string-escape handling, /Length-driven
stream slicing, unsupported-input refusals."""

import zlib

import hypothesis.strategies as st
import pytest
from hypothesis import given, settings

from fortissimo_spark.pdf import build_pdf, extract_pdf_text


CASES = [
    "Hello world",
    "line one\nline two\nline three",
    "parens (and) more (nested (deep)) \\ backslash",
    "unicode: Mañana 😀 テスト",
    "a\n\nb",
    "",
    "ends with newline\n",
    "<angle> & [brackets] 0000000000 n",
]


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("text", CASES)
def test_roundtrip(text, compress):
    assert extract_pdf_text(build_pdf(text, compress=compress)) == text


def test_structurally_valid():
    pdf = build_pdf("x")
    assert pdf.startswith(b"%PDF-1.4")
    assert pdf.rstrip().endswith(b"%%EOF")
    assert b"xref" in pdf and b"trailer" in pdf and b"/Root 1 0 R" in pdf


def test_length_protects_binary_eol_tails():
    """Flate output ending in EOL bytes must survive (the /Length slice,
    not an EOL-strip heuristic, delimits the stream)."""
    # brute-force a text whose compressed form ends with 0x0d or 0x0a
    found = 0
    for i in range(4000):
        t = f"payload {i} " + "z" * (i % 37)
        comp = zlib.compress(f"BT ({t}) Tj ET".encode())
        if comp[-1:] in (b"\r", b"\n"):
            assert extract_pdf_text(build_pdf(t, compress=True)) == t
            found += 1
            if found >= 3:
                break
    assert found >= 1  # the hostile shape was actually exercised


def test_literal_escapes():
    # hand-built content stream exercising octal + special escapes
    content = rb"BT (\101\102\103 \( \) \\ \n tail) Tj ET"
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF\n")
    assert extract_pdf_text(pdf) == "ABC ( ) \\ \n tail"


def test_refusals():
    with pytest.raises(ValueError):
        extract_pdf_text(build_pdf("x").replace(b"/Root", b"/Encrypt 9 0 R /Root"))
    # unsupported filter: stream skipped, no crash
    content = b"not really jpeg"
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
           + b" /Filter /DCTDecode >>\nstream\n" + content
           + b"\nendstream\nendobj\n%%EOF\n")
    assert extract_pdf_text(pdf) == ""


def test_indirect_length_falls_back():
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length 2 0 R >>\nstream\n"
           b"BT (Hello indirect world) Tj ET\nendstream\nendobj\n"
           b"2 0 obj\n31\nendobj\n%%EOF\n")
    assert extract_pdf_text(pdf) == "Hello indirect world"


def test_inline_content_dict_skipped():
    content = b"BT /P << /MCID 0 >> BDC (real text) Tj EMC ET"
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF\n")
    assert extract_pdf_text(pdf) == "real text"


def test_kernel_degrades_per_row(spark_is_not_needed=None):
    # kernel-level: encrypted/corrupt rows produce null text + error, not a crash
    import pandas as pd
    from fortissimo_spark.pdf import make_pdf_extract_kernel
    enc = build_pdf("secret").replace(b"/Root", b"/Encrypt 9 0 R /Root")
    batch = pd.DataFrame({"doc_id": [1, 2], "pdf": [build_pdf("fine"), enc]})
    out = pd.concat(list(make_pdf_extract_kernel()([batch])))
    rows = {r.doc_id: r for r in out.itertuples()}
    assert rows[1].text == "fine" and rows[1].error is None
    assert rows[2].text is None and "encrypted" in rows[2].error


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300), st.booleans())
def test_roundtrip_fuzz(text, compress):
    """Arbitrary unicode text survives build->extract byte-identically
    (2000-example deep run performed offline; 200 here keeps CI fast)."""
    assert extract_pdf_text(build_pdf(text, compress=compress)) == text


def test_operator_token_boundaries():
    # a resource name like /TD1 or /Tj0 must not act as an operator: the
    # old byte-pair matcher would inject a newline (TD) or flush (Tj) here
    content = b"BT (x) Tj /TD1 12 Tf (y) Tj ET"
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF\n")
    assert extract_pdf_text(pdf) == "xy"
    # a real Td between the shows still advances the line
    content2 = b"BT (x) Tj 0 -14 Td (y) Tj ET"
    pdf2 = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content2)).encode()
            + b" >>\nstream\n" + content2 + b"\nendstream\nendobj\n%%EOF\n")
    assert extract_pdf_text(pdf2) == "x\ny"


def test_encrypted_xref_stream_pdf_refused():
    # PDF 1.5+ cross-reference-stream file: no 'trailer' keyword anywhere;
    # the trailer dict (with /Encrypt) lives in the startxref-addressed
    # xref stream object — must still raise, not return garbage
    body = b"%PDF-1.5\n"
    off = len(body)
    body += (b"1 0 obj\n<< /Type /XRef /Encrypt 2 0 R /W [1 1 1] >>\n"
             b"stream\n\x00\x00\x00\nendstream\nendobj\n")
    body += b"startxref\n" + str(off).encode() + b"\n%%EOF\n"
    with pytest.raises(ValueError):
        extract_pdf_text(body)


# ---------------------------------------------------------------------------
# PDF 1.5 machinery: xref streams, ObjStm, ToUnicode CMaps
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("objstm", [False, True])
@pytest.mark.parametrize("cid", [False, True])
@pytest.mark.parametrize("text", CASES)
def test_roundtrip_modern_layouts(text, objstm, cid):
    """The post-2005 layouts: ObjStm + xref stream (PNG Up predictor),
    Type0/CID font whose text is only readable via the ToUnicode CMap —
    byte-identical round-trips in every combination."""
    pdf = build_pdf(text, objstm=objstm, cid=cid, compress=True)
    assert extract_pdf_text(pdf) == text


def test_objstm_layout_is_really_modern():
    pdf = build_pdf("modern layout", objstm=True)
    assert b"trailer" not in pdf            # xref stream, no classic trailer
    assert b"/Type /ObjStm" in pdf
    assert b"/Predictor 12" in pdf
    # the catalog/pages/page dicts live INSIDE the compressed ObjStm
    assert b"/Type /Catalog" not in pdf


def test_cid_text_is_unreadable_without_cmap():
    """The CID fixture's content stream holds 2-byte codes, not the text:
    without ToUnicode decoding the raw scan yields garbage — proving the
    CMap path is load-bearing, not decorative."""
    text = "only the cmap knows"
    pdf = build_pdf(text, cid=True)
    assert text.encode() not in pdf
    from fortissimo_spark.pdf import _iter_streams, _text_from_content
    raw_parts = []
    for head, raw in _iter_streams(pdf):
        if b"/Filter" not in head and b"BT" in raw:
            raw_parts.extend(_text_from_content(raw))
    raw_text = b"".join(raw_parts).decode("utf-8", errors="replace")
    assert raw_text != text  # CID codes, not chars


def test_tounicode_cmap_uses_both_forms():
    from fortissimo_spark.pdf import _cid_code_table, _tounicode_cmap
    # 'abcdef' -> consecutive ordinals = bfrange; 'z' + emoji -> bfchar
    cmap = _tounicode_cmap(_cid_code_table("abcdef z \U0001F600"))
    assert b"beginbfrange" in cmap and b"beginbfchar" in cmap
    # the emoji target is a UTF-16 surrogate pair (4 bytes = 8 hex digits)
    assert b"<D83DDE00>" in cmap


def test_tounicode_cmap_decode_forms():
    """CMap parser unit vectors: array-form bfrange, multi-unit target
    increment (last code unit), mixed 1/2-byte codespaces."""
    from fortissimo_spark.pdf import _ToUnicodeCMap
    cm = _ToUnicodeCMap(b"""
2 begincodespacerange
<00> <7F>
<8000> <FFFF>
endcodespacerange
1 beginbfchar
<41> <0058>
endbfchar
2 beginbfrange
<8001> <8003> [<0041> <0042 0043> <0044>]
<9000> <9002> <00480065006C>
endbfrange
""")
    assert cm.decode(b"\x41") == "X"                 # 1-byte bfchar
    assert cm.decode(b"\x80\x01\x80\x02") == "ABC"   # array form
    # increment applies to the LAST UTF-16 unit of the base target
    assert cm.decode(b"\x90\x00") == "Hel"
    assert cm.decode(b"\x90\x02") == "Hen"
    # 1-byte then 2-byte code back to back (codespace-driven lengths)
    assert cm.decode(b"\x41\x90\x00") == "XHel"


def test_png_unpredict_vectors():
    from fortissimo_spark.pdf import _png_unpredict
    # rows of 3 bytes; hand-applied Sub/Up/Average/Paeth forward filters
    plain = [bytes([10, 20, 30]), bytes([13, 24, 35]), bytes([20, 20, 20])]
    enc = bytearray()
    enc += bytes([1, 10, 10, 10])                    # Sub: 10,20-10,30-20
    enc += bytes([2, 3, 4, 5])                       # Up: +prev row
    enc += bytes([0, 20, 20, 20])                    # None
    assert _png_unpredict(bytes(enc), 3) == b"".join(plain)
    # Paeth row after a known row
    row0 = bytes([100, 50, 25])
    want = bytes([110, 60, 35])
    # forward-filter want against row0 (left=out[x-1], up=row0[x])
    out = bytearray()
    prev_out = []
    for x in range(3):
        a = prev_out[x - 1] if x >= 1 else 0
        b = row0[x]
        c = row0[x - 1] if x >= 1 else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out.append((want[x] - pred) & 0xFF)
        prev_out.append(want[x])
    enc2 = bytes([0]) + row0 + bytes([4]) + bytes(out)
    assert _png_unpredict(enc2, 3) == row0 + want


def test_incremental_update_newest_wins():
    """Classic incremental update: an appended body + xref section with
    /Prev must shadow the original object (first-loaded = newest)."""
    base = build_pdf("old text that gets replaced")
    old_xref_at = int(base.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
    content = b"BT /F1 11 Tf (new text wins) Tj ET"
    buf = bytearray(base)
    new_obj_at = len(buf)
    buf += (b"4 0 obj\n<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    xref_at = len(buf)
    buf += (b"xref\n4 1\n" + f"{new_obj_at:010d} 00000 n \n".encode()
            + b"trailer\n<< /Size 6 /Root 1 0 R /Prev "
            + str(old_xref_at).encode() + b" >>\nstartxref\n"
            + str(xref_at).encode() + b"\n%%EOF\n")
    assert extract_pdf_text(bytes(buf)) == "new text wins"


def test_hostile_structures_no_hang():
    """Self-referencing ObjStm containers and cyclic page trees must
    terminate (cycle guards), degrading to empty/fallback output."""
    from fortissimo_spark.pdf import extract_pdf_text as ex
    # ObjStm whose entries point back at itself
    body = b"%PDF-1.5\n"
    o1 = len(body)
    body += (b"1 0 obj\n<< /Type /ObjStm /N 1 /First 4 /Length 8 >>\n"
             b"stream\n2 0 blah\nendstream\nendobj\n")
    x = len(body)
    body += (b"2 0 obj\n<< /Type /XRef /Size 3 /Root 2 0 R /W [1 1 1] "
             b"/Index [1 2] /Length 6 >>\nstream\n")
    # entries: obj1 at o1 (type 1), obj2 in objstm 1 idx 0 (type 2)
    body += bytes([1, o1, 0, 2, 1, 0])
    body += b"\nendstream\nendobj\nstartxref\n" + str(x).encode() + b"\n%%EOF\n"
    ex(bytes(body))  # must return, any output
    # cyclic Pages tree
    p = b"%PDF-1.4\n"
    objs = [b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Pages /Kids [2 0 R] /Count 1 >>"]
    buf2 = bytearray(p)
    offs = []
    for i, b2 in enumerate(objs, 1):
        offs.append(len(buf2))
        buf2 += f"{i} 0 obj\n".encode() + b2 + b"\nendobj\n"
    xa = len(buf2)
    buf2 += b"xref\n0 4\n0000000000 65535 f \n"
    for o in offs:
        buf2 += f"{o:010d} 00000 n \n".encode()
    buf2 += (b"trailer\n<< /Size 4 /Root 1 0 R >>\nstartxref\n"
             + str(xa).encode() + b"\n%%EOF\n")
    assert ex(bytes(buf2)) == ""
