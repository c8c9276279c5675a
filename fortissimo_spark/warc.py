"""WARC source: read Common-Crawl-style WARC archives into the pages table.

The crawl-ingest leg in front of the extraction pipeline: real WARC/1.0
parsing (ISO 28500, a public format) with both storage conventions —
plain ``.warc`` and ``.warc.gz`` where EACH RECORD is its own gzip member
(the Common Crawl convention; stdlib zlib handles member concatenation).

Scale shape: ``read_warcs`` lists files with Spark's binaryFile source —
one task per WARC file, the unit Common Crawl shards at (~1 GB gz) — and
parses records inside an Arrow-batched ``mapInPandas`` kernel, emitting
PAGES_SCHEMA rows (url, warc_ts, html BYTES, text=NULL, lang=NULL). Byte
payloads stay raw: charset detection/decoding already lives in the
extraction kernel (kernel.py BOM/meta sniff + re-decode retry), so the
WARC leg composes with dedup/extract unchanged. A 100 TB crawl is ~10^5
files → 10^5 parallel tasks, no shuffle until the dedup window.

``build_warc`` is the deterministic fixture generator (pages.py's role
for the WARC leg) so parsing is testable byte-for-byte with no network.
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .schema import PAGES_SCHEMA

__all__ = ["build_warc", "iter_warc_records", "parse_warc_pages",
           "read_warcs"]


def build_warc(records: list[dict], *, compress: bool = False,
               warcinfo: bool = True) -> bytes:
    """Deterministic WARC/1.0 bytes. Each record dict: ``url``, ``date``
    (ISO-8601 Z string), ``body`` (bytes — the HTML), optional ``status``
    (default 200), ``content_type`` (default text/html), ``kind``
    (default 'response'; 'request'/'metadata' records are built too so
    parsers must skip them). ``compress=True`` gzips each record as its
    own member (the .warc.gz convention)."""
    out = []

    def record(headers: list[tuple[str, str]], block: bytes) -> bytes:
        head = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}\r\n".encode() for k, v in headers
            ) + f"Content-Length: {len(block)}\r\n".encode() + b"\r\n"
        raw = head + block + b"\r\n\r\n"
        return gzip.compress(raw, mtime=0) if compress else raw

    if warcinfo:
        block = b"software: fortissimo-spark-fixture\r\n"
        out.append(record([("WARC-Type", "warcinfo"),
                           ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000000>"),
                           ("WARC-Date", "2024-01-01T00:00:00Z"),
                           ("Content-Type", "application/warc-fields")], block))
    for i, r in enumerate(records):
        kind = r.get("kind", "response")
        if kind == "response":
            status = r.get("status", 200)
            ctype = r.get("content_type", "text/html; charset=utf-8")
            http = (f"HTTP/1.1 {status} OK\r\n"
                    f"Content-Type: {ctype}\r\n"
                    f"Content-Length: {len(r['body'])}\r\n\r\n").encode() \
                + r["body"]
            headers = [("WARC-Type", "response"),
                       ("WARC-Record-ID", f"<urn:uuid:{i:032x}>"),
                       ("WARC-Date", r["date"]),
                       ("WARC-Target-URI", r["url"]),
                       ("Content-Type", "application/http; msgtype=response")]
            out.append(record(headers, http))
        else:
            headers = [("WARC-Type", kind),
                       ("WARC-Record-ID", f"<urn:uuid:{i:032x}>"),
                       ("WARC-Date", r["date"]),
                       ("WARC-Target-URI", r["url"]),
                       ("Content-Type", "application/http; msgtype=request")]
            out.append(record(headers, r.get("body", b"GET / HTTP/1.1\r\n\r\n")))
    return b"".join(out)


def _gunzip_members(payload: bytes) -> bytes:
    """Concatenated-gzip-member decompression (one WARC record per member).

    The remaining tail is advanced through a ``memoryview`` — slicing the
    raw bytes would COPY the remainder once per member, and a ~1 GB
    Common-Crawl shard with ~100k record-members would do O(N·M) bytes of
    memcpy (tens of TB) before any parsing happened."""
    view = memoryview(payload)
    out = []
    while len(view):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(view))
        rest = d.unused_data
        if not rest:
            break
        view = view[len(view) - len(rest):]
    return b"".join(out)


def iter_warc_records(payload: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (warc_headers, block_bytes) for every record in a WARC file
    (plain or per-record-gzipped)."""
    if payload[:2] == b"\x1f\x8b":
        payload = _gunzip_members(payload)
    i = 0
    n = len(payload)
    while i < n:
        # skip inter-record blank lines
        while i < n and payload[i:i + 2] in (b"\r\n",) :
            i += 2
        if i >= n or not payload.startswith(b"WARC/", i):
            break
        # record-framing tolerance: a record whose header block never
        # terminates (`index` ValueError) or carries a non-numeric
        # Content-Length (`int` ValueError) must not discard the records
        # already yielded from this archive — resync at the next record
        # marker instead of letting the exception escape the generator.
        try:
            head_end = payload.index(b"\r\n\r\n", i)
            head_lines = payload[i:head_end].decode("latin-1").split("\r\n")
            headers = {}
            for line in head_lines[1:]:
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
            length = int(headers.get("content-length", "0"))
        except ValueError:
            nxt = payload.find(b"\r\nWARC/", i + 5)
            if nxt < 0:
                return
            i = nxt + 2
            continue
        block_start = head_end + 4
        yield headers, payload[block_start:block_start + length]
        i = block_start + length


def _split_http_response(block: bytes) -> tuple[int, dict, bytes]:
    """(status, http_headers, body) from an application/http response block."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return 0, {}, b""
    head = block[:sep].decode("latin-1", errors="replace").split("\r\n")
    parts = head[0].split(" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = 0
    headers = {}
    for line in head[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    return status, headers, block[sep + 4:]


def parse_warc_pages(payload: bytes) -> list[dict]:
    """Extract page rows from one WARC file's bytes: response records with
    an HTML content type and a 2xx status. Returns dicts matching
    PAGES_SCHEMA column names (html = raw bytes — charset decoding is the
    extraction kernel's job, which re-sniffs BOM/meta and retries)."""
    pages = []
    for headers, block in iter_warc_records(payload):
        # record-level tolerance: one malformed record (bad date, mangled
        # HTTP head) must not discard the archive's other records
        try:
            if headers.get("warc-type") != "response":
                continue
            url = headers.get("warc-target-uri")
            date = headers.get("warc-date")
            if not url or not date:
                continue
            status, http_headers, body = _split_http_response(block)
            if not (200 <= status < 300):
                continue
            ctype = http_headers.get("content-type", "")
            if "html" not in ctype:
                continue
            ts = _parse_warc_date(date)
        except Exception:  # noqa: BLE001 - skip the record, keep the file
            continue
        pages.append({"url": url, "warc_ts": ts, "html": bytearray(body),
                      "text": None, "lang": None})
    return pages


def _parse_warc_date(date: str) -> datetime:
    """WARC-Date per WARC 1.0 (second precision) AND 1.1 (arbitrary
    fractional seconds, as wget/warcio emit)."""
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return (datetime.strptime(date, fmt)
                    .replace(tzinfo=timezone.utc).replace(tzinfo=None))
        except ValueError:
            continue
    raise ValueError(f"unparseable WARC-Date: {date!r}")


def _warc_kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ("url", "warc_ts", "html", "text", "lang")
    for pdf in batches:
        if len(pdf) == 0:
            continue
        rows: dict[str, list] = {k: [] for k in cols}
        for content in pdf["content"].tolist():
            # one corrupt archive (truncated gzip member, mangled headers)
            # must not kill the task — skip the file, keep the fleet moving
            try:
                pages = parse_warc_pages(bytes(content))
            except Exception:  # noqa: BLE001 - malformed crawl shard
                continue
            for page in pages:
                for k in cols:
                    rows[k].append(page[k])
        if rows["url"]:  # an all-empty frame defaults to uncastable dtypes
            yield pd.DataFrame(rows, columns=cols)


def read_warcs(spark: SparkSession, path_glob: str) -> DataFrame:
    """pages DataFrame (PAGES_SCHEMA) from a directory/glob of .warc /
    .warc.gz files. One task per file (the Common-Crawl sharding unit);
    everything downstream (dedup window, extract kernel, production
    writer) composes unchanged."""
    files = (spark.read.format("binaryFile").load(path_glob)
             .select("content"))
    return files.mapInPandas(_warc_kernel, PAGES_SCHEMA)
