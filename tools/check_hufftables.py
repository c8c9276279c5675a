"""Validate the Layer III Huffman tables in fortissimo_spark.mp3:
every ISO 11172-3 Table B.7 code table is a COMPLETE prefix code
(Kraft sum exactly 1, no codeword a prefix of another). A wrong or
mistyped entry almost always breaks one of the two. Run standalone:

    python tools/check_hufftables.py
"""
import sys

sys.path.insert(0, ".")

from fortissimo_spark.mp3 import HUFF_PATTERNS, QUAD_A, QUAD_B  # noqa: E402


def check(name, entries):
    """entries: list of (hlen, hcod) for every symbol."""
    ok = True
    kraft = 0.0
    seen = {}
    for hlen, hcod in entries:
        if hcod >= (1 << hlen):
            print(f"  {name}: code {hcod:#x} does not fit in {hlen} bits")
            ok = False
        kraft += 2.0 ** -hlen
        bits = format(hcod, f"0{hlen}b")
        for other in seen:
            if other.startswith(bits) or bits.startswith(other):
                print(f"  {name}: '{bits}' clashes with '{other}' "
                      f"({seen[other]})")
                ok = False
        seen[bits] = (hlen, hcod)
    if abs(kraft - 1.0) > 1e-12:
        print(f"  {name}: Kraft sum {kraft} != 1 "
              f"(deficit {1.0 - kraft} = {round((1.0-kraft)*2048)}/2048)")
        ok = False
    return ok


def main():
    bad = []
    for tid, (xlen, ylen, hlen, hcod) in sorted(HUFF_PATTERNS.items()):
        entries = []
        assert len(hlen) == xlen and len(hcod) == xlen, tid
        for x in range(xlen):
            assert len(hlen[x]) == ylen and len(hcod[x]) == ylen, (tid, x)
            for y in range(ylen):
                entries.append((hlen[x][y], hcod[x][y]))
        if not check(f"table {tid}", entries):
            bad.append(tid)
    for name, tab in (("quadA", QUAD_A), ("quadB", QUAD_B)):
        if not check(name, list(tab)):
            bad.append(name)
    if bad:
        print("BAD:", bad)
        sys.exit(1)
    print(f"all {len(HUFF_PATTERNS) + 2} tables complete prefix codes")


if __name__ == "__main__":
    main()
