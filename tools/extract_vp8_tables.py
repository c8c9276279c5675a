"""Extract RFC 6386 constant tables into fortissimo_spark/vp8_tables.py.

The tables below are published verbatim in RFC 6386 (the VP8 Data Format
and Decoding Guide) sections 11.2-14.1 — default keyframe mode
probabilities, default/update DCT coefficient probabilities, and the
dequantization lookup tables. They are public-spec constants; this script
reads their exact byte values out of the system libwebp rodata
(anchored on values quoted in the RFC text) instead of hand-typing
~3,000 numbers. The generated module is validated end-to-end by
tests/test_vp8.py's bit-exact differential decode against libwebp.

Run: python tools/extract_vp8_tables.py
"""
from __future__ import annotations

import struct
import sys
from pathlib import Path

SO = Path("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
OUT = Path(__file__).resolve().parent.parent / "fortissimo_spark" / "vp8_tables.py"


def find_once(blob: bytes, anchor: bytes, what: str, span: int) -> int:
    """First anchor hit; extra hits must be byte-identical copies of the
    whole span (libwebp embeds the tables in both the encoder and the
    decoder compilation units)."""
    i = blob.find(anchor)
    if i < 0:
        raise SystemExit(f"anchor for {what} not found")
    j = blob.find(anchor, i + 1)
    while j >= 0:
        if blob[j:j + span] != blob[i:i + span]:
            raise SystemExit(f"anchor for {what} has divergent copies")
        j = blob.find(anchor, j + 1)
    return i


def main() -> None:
    blob = SO.read_bytes()

    # --- VP8CoeffsProba0 [4][8][3][11] (RFC 6386 section 13.5) ---------
    # RFC text: block-type 0 band 0 is three all-128 rows, then the row
    # {253, 136, 254, 255, 228, 219, 128, ...} opens band 1.
    a = find_once(blob, bytes([253, 136, 254, 255, 228, 219]), "CoeffsProba0", 1056 - 33)
    p0 = a - 33
    proba0 = blob[p0:p0 + 1056]
    assert proba0[:33] == bytes([128] * 33), "proba0 prefix rows"

    # --- VP8CoeffsUpdateProba [4][8][3][11] (RFC 6386 section 13.4) ----
    # A 1056-byte region dominated by 255s; same compilation unit as
    # proba0 so it lives nearby — scan the surrounding 64 KiB.
    lo, hi = max(0, p0 - 65536), min(len(blob), p0 + 65536 + 1056)
    cands = []
    region = blob[lo:hi]
    for off in range(0, len(region) - 1056):
        if lo + off == p0:
            continue
        w = region[off:off + 1056]
        if w[0] != 255 or w[10] != 255:
            continue
        n255 = w.count(255)
        if n255 > 850 and min(w) > 100:
            cands.append((lo + off, n255))
    if not cands:
        raise SystemExit("no CoeffsUpdateProba candidate")
    # candidates cluster around each rodata copy of the table (nearby
    # offsets are windows shifted into the same mostly-255 run); take
    # the densest window per cluster and require the clusters to agree
    cands.sort()
    clusters: list[list[tuple[int, int]]] = [[cands[0]]]
    for c in cands[1:]:
        if c[0] - clusters[-1][-1][0] > 1056:
            clusters.append([])
        clusters[-1].append(c)
    picks = [max(cl, key=lambda t: t[1])[0] for cl in clusters]
    upd = blob[picks[0]:picks[0] + 1056]
    for off in picks[1:]:
        if blob[off:off + 1056] != upd:
            raise SystemExit(
                f"divergent update-proba candidates: {picks[0]} vs {off}")

    # --- kf_bmode_prob [10][10][9] (RFC 6386 section 11.2) -------------
    a = find_once(blob, bytes([231, 120, 48, 89, 115, 113, 120, 152, 112]),
                  "kf_bmode_prob", 900)
    lib_bmode = blob[a:a + 900]
    # libwebp's B-mode enum orders (RD, VR) before (LD, VL); the RFC's
    # intra_bmode enum is DC, TM, VE, HE, LD, RD, VR, VL, HD, HU.
    # Re-index the [above][left] rows into RFC numbering (the 9 node
    # probabilities per row are tree-positional and unaffected).
    perm = (0, 1, 2, 3, 6, 4, 5, 7, 8, 9)  # RFC index -> libwebp index
    bmode = bytearray(900)
    for ai in range(10):
        for li in range(10):
            src = (perm[ai] * 10 + perm[li]) * 9
            dst = (ai * 10 + li) * 9
            bmode[dst:dst + 9] = lib_bmode[src:src + 9]

    # --- dequant lookup tables, uint16[128] (RFC 6386 section 14.1) ----
    # dc values max out at 157, so libwebp stores the DC table as uint8
    dc_anchor = bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17])
    a = find_once(blob, dc_anchor, "dc_qlookup", 128)
    dc_q = tuple(blob[a:a + 128])
    assert dc_q[-1] == 157 and all(b >= a_ for a_, b in zip(dc_q, dc_q[1:])), dc_q
    ac_anchor = struct.pack("<12H", 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    a = find_once(blob, ac_anchor, "ac_qlookup", 256)
    ac_q = struct.unpack_from("<128H", blob, a)
    assert ac_q[-1] == 284 and all(b > a_ for a_, b in zip(ac_q, ac_q[1:])), ac_q

    def fmt(vals, per_line=16):
        lines = []
        vals = list(vals)
        for i in range(0, len(vals), per_line):
            lines.append("    " + ", ".join(str(v) for v in vals[i:i + per_line]) + ",")
        return "\n".join(lines)

    OUT.write_text(f'''"""RFC 6386 (VP8 Data Format and Decoding Guide) constant tables.

All values are published in the RFC text: the default keyframe
intra-mode probabilities (section 11.2), the default and update DCT
coefficient probabilities (sections 13.4-13.5), and the dequantization
lookups (section 14.1). Extracted byte-exact by
tools/extract_vp8_tables.py and validated end-to-end by the bit-exact
differential decode in tests/test_vp8.py.

GENERATED FILE - regenerate with: python tools/extract_vp8_tables.py
"""

# [4][8][3][11] flattened: default coefficient-token probabilities
COEFFS_PROBA0 = bytes([
{fmt(proba0)}
])

# [4][8][3][11] flattened: per-frame coefficient-probability update flags
COEFFS_UPDATE_PROBA = bytes([
{fmt(upd)}
])

# [10][10][9] flattened: keyframe 4x4 B-mode probabilities by
# (above-subblock-mode, left-subblock-mode) context
KF_BMODE_PROB = bytes([
{fmt(bmode)}
])

# uint16[128]: DC / AC dequantization factors by clamped quantizer index
DC_QLOOKUP = (
{fmt(dc_q)}
)

AC_QLOOKUP = (
{fmt(ac_q)}
)
''')
    n255 = upd.count(255)
    print(f"wrote {OUT} (update-proba density {n255}/1056)")


if __name__ == "__main__":
    sys.exit(main())
