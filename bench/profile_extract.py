#!/usr/bin/env python3
"""cProfile the per-document extract hot path over real bench-corpus docs.

Reads the materialized bench corpus parquet directly with pyarrow (no Spark),
samples N docs, and profiles process_document(raw, "density") exactly as the
mapInPandas kernel calls it.  Run ALONE (CPU timing).

Usage: python bench/profile_extract.py [ndocs] [--time-only]
"""
import cProfile
import glob
import pstats
import sys
import time

import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")
from fortissimo_spark.kernel import process_document  # noqa: E402

NDOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
TIME_ONLY = "--time-only" in sys.argv

files = sorted(glob.glob("/root/repo/.bench_scratch/pages_sf0.1_x20/*.parquet"))
raws = []
for f in files:
    t = pq.read_table(f, columns=["html"])
    raws.extend(t.column("html").to_pylist())
    if len(raws) >= NDOCS:
        break
raws = raws[:NDOCS]
print(f"{len(raws)} docs, {sum(len(r or b'') for r in raws)/1e6:.1f} MB")


def run():
    for raw in raws:
        process_document(bytes(raw or b""), "density")


# warmup (imports, regex caches)
for raw in raws[:50]:
    process_document(bytes(raw or b""), "density")

t0 = time.perf_counter()
run()
t1 = time.perf_counter()
print(f"wall: {t1-t0:.3f}s  -> {len(raws)/(t1-t0):.0f} docs/s single-thread")

if not TIME_ONLY:
    pr = cProfile.Profile()
    pr.enable()
    run()
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(35)
    st.sort_stats("tottime").print_stats(35)
