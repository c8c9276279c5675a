"""Minimal PDF text extraction (the north-rule's "PDF/layout parse" leg).

Real, dependency-free parsing of the PDF constructs a text pipeline needs:

* object/stream scanning over the raw bytes (``stream``/``endstream``
  pairs with their owning dictionaries);
* real ``FlateDecode`` decompression (stdlib zlib);
* content-stream text operators: literal strings ``( ... )`` with escape
  sequences (``\\( \\) \\\\ \\n \\r \\t`` + octal) and nesting, hex strings
  ``<...>``, ``Tj`` / ``'`` show ops, ``TJ`` arrays, and the line-advance
  ops ``Td/TD/T*`` (mapped to newlines).

Out of scope (documented): encrypted PDFs, non-Flate filters (DCT/LZW),
CID/Type0 font decoding, layout reflow — those need codec/font machinery
not present in this container; :func:`extract_pdf_text` raises
``ValueError`` on encrypted input and skips streams with unsupported
filters rather than guessing.

``build_pdf`` is the deterministic fixture generator (pages.py's role for
the PDF leg): a structurally valid single-page PDF whose text content is
exactly the input text, alternating literal/hex string ops and optionally
Flate-compressing the content stream — so the Spark-side extract kernel is
oracle-checkable against the ``documents`` table byte-for-byte.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterable, Iterator

__all__ = ["build_pdf", "extract_pdf_text", "make_pdf_extract_kernel"]


# --------------------------------------------------------------------------
# generator (fixture role)
# --------------------------------------------------------------------------

_LIT_ESCAPE = {ord("\\"): b"\\\\", ord("("): b"\\(", ord(")"): b"\\)",
               ord("\r"): b"\\r"}


def _literal_string(line: str) -> bytes:
    out = bytearray(b"(")
    for byte in line.encode("utf-8"):
        out += _LIT_ESCAPE.get(byte, bytes((byte,)))
    out += b")"
    return bytes(out)


def _hex_string(line: str) -> bytes:
    return b"<" + line.encode("utf-8").hex().encode("ascii") + b">"


def build_pdf(text: str, *, compress: bool = False) -> bytes:
    """Structurally valid one-page PDF whose extracted text == ``text``.

    Lines alternate literal and hex string operators (both real PDF
    syntaxes); line breaks become ``T*`` ops. ``compress`` wraps the
    content stream in FlateDecode.
    """
    ops = [b"BT", b"/F1 11 Tf", b"12 TL", b"72 720 Td"]
    for i, line in enumerate(text.split("\n")):
        if i > 0:
            ops.append(b"T*")
        s = _literal_string(line) if i % 2 == 0 else _hex_string(line)
        ops.append(s + b" Tj")
    ops.append(b"ET")
    content = b"\n".join(ops)

    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"

    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + filt + b" >>\nstream\n"
        + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += f"xref\n0 {len(objects) + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for off in offsets:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (b"trailer\n<< /Size " + str(len(objects) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n")
    return bytes(buf)


# --------------------------------------------------------------------------
# extractor
# --------------------------------------------------------------------------

_RE_STREAM = re.compile(rb"stream\r?\n")

_OCTAL = b"01234567"


# direct /Length only: the FULL number ((?![0-9]) forbids backtracking into
# the digit run, so '/Length 12 0 R' can't half-match as '1'), NOT followed
# by '<gen> R' (indirect ref)
_RE_LENGTH = re.compile(
    rb"/Length[ \t\r\n]+(\d+)(?![0-9])(?![ \t\r\n]+\d+[ \t\r\n]+R)")


def _iter_streams(payload: bytes) -> Iterator[tuple[bytes, bytes]]:
    """Yield (owning_dict_bytes, raw_stream_bytes) pairs.

    The stream's byte count comes from the dict's direct ``/Length`` when
    present — binary data may legitimately end in EOL bytes, so trimming
    by pattern would corrupt it (e.g. Flate data ending in 0x0D) — and the
    scan resumes past the /Length-delimited body, so binary data
    containing the letters ``endstream`` can't derail it. The EOL-strip
    heuristic only covers indirect ``/Length N 0 R`` dictionaries (whose
    value lives in another object)."""
    pos = 0
    n = len(payload)
    while True:
        m = _RE_STREAM.search(payload, pos)
        if not m:
            return
        # owning dictionary: back-scan to the nearest 'obj' keyword
        obj_at = payload.rfind(b"obj", 0, m.start())
        head = payload[obj_at:m.start()] if obj_at >= 0 else b""
        lm = _RE_LENGTH.search(head)
        if lm:
            body_end = min(m.end() + int(lm.group(1)), n)
            raw = payload[m.end():body_end]
            end = payload.find(b"endstream", body_end)
        else:
            end = payload.find(b"endstream", m.end())
            if end < 0:
                return
            raw = payload[m.end():end]
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith(b"\n"):
                raw = raw[:-1]
        yield head, raw
        pos = (end + 9) if end >= 0 else n


def _parse_literal(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(...)`` literal starting at ``i`` (at '('); returns
    (decoded bytes, index past ')')."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in b"nrtbf":
                out += {ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
                        ord("b"): b"\b", ord("f"): b"\f"}[e]
                i += 1
            elif e in _OCTAL:
                oct_digits = bytearray()
                while i < n and data[i] in _OCTAL and len(oct_digits) < 3:
                    oct_digits.append(data[i])
                    i += 1
                out.append(int(oct_digits, 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
            continue
        if c == 0x28:  # (
            depth += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                i += 1
                break
        out.append(c)
        i += 1
    return bytes(out), i


def _parse_hex(data: bytes, i: int) -> tuple[bytes, int]:
    end = data.find(b">", i)
    if end < 0:
        end = len(data)
    digits = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1:end])
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii")), end + 1


def _skip_dict(data: bytes, i: int) -> int:
    """Skip an inline ``<< ... >>`` dictionary starting at ``i`` (at the
    first '<'), including nested dicts and any strings inside (BDC/DP
    property lists like /ActualText carry strings that are NOT shown
    text). Returns the index past the closing '>>'."""
    n = len(data)
    depth = 1
    i += 2
    while i < n and depth:
        if data.startswith(b"<<", i):
            depth += 1
            i += 2
        elif data.startswith(b">>", i):
            depth -= 1
            i += 2
        elif data[i] == 0x28:  # ( literal string
            _, i = _parse_literal(data, i)
        elif data[i] == 0x3C:  # < hex string
            _, i = _parse_hex(data, i)
        else:
            i += 1
    return i


# PDF whitespace + delimiter bytes: an operator token must be bounded by
# these (or start/end of stream) — without the boundary check, a resource
# name like /Tj0 or /TD1 would spuriously match the text-show operators
_PDF_DELIMS = b"\x00\t\n\f\r ()<>[]{}/%"


def _is_op(data: bytes, i: int, tok: bytes) -> bool:
    """True when ``tok`` at ``i`` is a whole operator token (delimiter or
    boundary on both sides)."""
    if not data.startswith(tok, i):
        return False
    j = i + len(tok)
    return ((i == 0 or data[i - 1] in _PDF_DELIMS)
            and (j >= len(data) or data[j] in _PDF_DELIMS))


def _text_from_content(data: bytes) -> list[bytes]:
    """Scan one content stream for text-showing operators (tokenized:
    names are consumed whole and operator matches require token
    boundaries, so identifiers containing operator bytes can't flush or
    inject text)."""
    parts: list[bytes] = []
    pending: list[bytes] = []  # strings awaiting their operator
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x28:  # (
            s, i = _parse_literal(data, i)
            pending.append(s)
        elif data.startswith(b"<<", i):  # inline dict (BDC/DP props): skip
            i = _skip_dict(data, i)
        elif c == 0x3C:  # < hex string
            s, i = _parse_hex(data, i)
            pending.append(s)
        elif c == 0x5B:  # [ TJ array: strings inside collect as one run
            i += 1
        elif c == 0x2F:  # / name token: consume whole (e.g. /Tj0, /TD1)
            i += 1
            while i < n and data[i] not in _PDF_DELIMS:
                i += 1
        elif _is_op(data, i, b"Tj") or _is_op(data, i, b"TJ") \
                or _is_op(data, i, b"'") or _is_op(data, i, b'"'):
            if data[i] in b"'\"":
                parts.append(b"\n")
            parts.extend(pending)
            pending.clear()
            i += 2 if data[i] in b"T" else 1
        elif _is_op(data, i, b"T*") or _is_op(data, i, b"TD") \
                or _is_op(data, i, b"Td"):
            # line advance: only meaningful once text exists
            if parts:
                parts.append(b"\n")
            i += 2
        else:
            i += 1
    return parts


def extract_pdf_text(payload: bytes) -> str:
    """Extract the text content of a (simple) PDF. Raises ``ValueError``
    on encrypted documents; silently skips streams whose filters aren't
    FlateDecode/none (no codecs in this container)."""
    # encryption sniff scoped to the trailer dictionary (the only place
    # /Encrypt is structural) — document TEXT may legally contain the
    # literal bytes '/Encrypt', which must not trigger a false refusal.
    # PDF 1.5+ cross-reference-stream files have NO 'trailer' keyword (the
    # trailer dict lives in the xref stream object), so in that case follow
    # startxref to the object and sniff its dictionary head instead.
    tpos = payload.rfind(b"trailer")
    if tpos >= 0:
        if b"/Encrypt" in payload[tpos:tpos + 2048]:
            raise ValueError("encrypted PDF (unsupported)")
    else:
        sx = payload.rfind(b"startxref")
        if sx >= 0:
            m = re.search(rb"\d+", payload[sx + 9:sx + 40])
            if m and int(m.group()) < len(payload):
                window = payload[int(m.group()):int(m.group()) + 2048]
                send = window.find(b"stream")
                if b"/Encrypt" in (window[:send] if send >= 0 else window):
                    raise ValueError("encrypted PDF (unsupported)")
    parts: list[bytes] = []
    for head, raw in _iter_streams(payload):
        if b"/FlateDecode" in head:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                continue
        elif b"/Filter" in head:
            continue  # unsupported filter (DCT/LZW/...)
        if b"BT" not in raw:
            continue
        parts.extend(_text_from_content(raw))
    return b"".join(parts).decode("utf-8", errors="replace")


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------

def make_pdf_extract_kernel():
    """mapInPandas kernel: (doc_id, pdf binary) batches ->
    (doc_id, text, n_bytes, error) — the PDF leg of the extraction
    pipeline. One undecodable document (encrypted, corrupt) degrades to a
    null-text row with the error recorded; it must never fail the Spark
    task (crawled corpora always contain hostile documents)."""
    import pandas as pd

    def kernel(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf_batch in batches:
            if len(pdf_batch) == 0:
                continue
            out = {"doc_id": [], "text": [], "n_bytes": [], "error": []}
            for doc_id, raw in zip(pdf_batch["doc_id"].tolist(),
                                   pdf_batch["pdf"].tolist()):
                raw = bytes(raw or b"")
                try:
                    text, err = extract_pdf_text(raw), None
                except Exception as e:  # noqa: BLE001 - per-row degradation
                    text, err = None, f"{type(e).__name__}: {e}"
                out["doc_id"].append(doc_id)
                out["text"].append(text)
                out["n_bytes"].append(len(raw))
                out["error"].append(err)
            yield pd.DataFrame(out)

    return kernel
