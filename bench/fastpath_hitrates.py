#!/usr/bin/env python3
"""Count parser fast-path hit rates over corpus docs (round-8 evidence:
~64% of start tags are attribute-less, ~97% of the rest single-attribute,
end tags ~100% simple).  Usage: python bench/fastpath_hitrates.py [ndocs]
"""
import glob
import sys

sys.path.insert(0, "/root/repo")
import pyarrow.parquet as pq  # noqa: E402

import fortissimo_spark.parser as P  # noqa: E402

NDOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 10000


class Counter:
    def __init__(self, m):
        self.m = m
        self.hit = 0
        self.miss = 0

    def __call__(self, t, pos):
        r = self.m(t, pos)
        if r is None:
            self.miss += 1
        else:
            self.hit += 1
        return r


counters = {}
for name in ("_RE_STAG_SIMPLE", "_RE_STAG_ONEATTR", "_RE_ATTR_FAST",
             "_RE_TAG_CLOSE", "_RE_END_FAST"):
    c = Counter(getattr(P, name).match)
    counters[name] = c
    setattr(P, name, type("X", (), {"match": staticmethod(c)}))

from fortissimo_spark.kernel import decode_parse  # noqa: E402

raws = []
for f in sorted(glob.glob("/root/repo/.bench_scratch/pages_sf0.1_x20/*.parquet")):
    t = pq.read_table(f, columns=["html"])
    raws.extend(t.column("html").to_pylist())
    if len(raws) >= NDOCS:
        break
for raw in raws[:NDOCS]:
    decode_parse(bytes(raw or b""))

for name, c in counters.items():
    tot = c.hit + c.miss
    print(f"{name:16s} hit {c.hit:8d}  miss {c.miss:8d}"
          f"  ({100 * c.hit / max(tot, 1):.1f}% hit)")
