"""PDF text-extraction leg (north-rule 'PDF/layout parse'):
generator/extractor round-trips, string-escape handling, /Length-driven
stream slicing, unsupported-input refusals."""

import zlib

import pytest

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
