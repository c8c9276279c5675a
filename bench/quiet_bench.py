#!/usr/bin/env python3
"""Wait for a quiet membw window (co-tenant gone), then run the frozen
bench at sf0.1 and sf1.0. Results printed as JSON lines."""
import os
import subprocess
import sys
import time

import numpy as np

arr = np.ones(128 * 1024 * 1024 // 8)


def membw():
    t0 = time.perf_counter()
    for _ in range(8):
        arr.sum()
    return time.perf_counter() - t0


deadline = time.time() + float(sys.argv[1] if len(sys.argv) > 1 else 45) * 60
quiet = False
while time.time() < deadline:
    s = min(membw() for _ in range(3))
    print(f"membw {s:.3f}", flush=True)
    if s < 0.134:
        quiet = True
        break
    time.sleep(90)

if not quiet and "--force" not in sys.argv:
    print("NEVER QUIET — skipping benches", flush=True)
    sys.exit(0)
print("RUNNING BENCHES", flush=True)
for sf in ("sf0.1", "sf1.0"):
    env = {**os.environ, "SPARK_GRAFT_SF_DIR": f"/root/testdata/{sf}",
           "SPARK_GRAFT_CPUS": "32"}
    r = subprocess.run(["python", "bench.py"], capture_output=True,
                       text=True, env=env, cwd="/root/repo")
    out = [l for l in r.stdout.splitlines() if l.strip().startswith("{")]
    print(sf, out[-1] if out else f"rc={r.returncode}", flush=True)
print("DONE", flush=True)
