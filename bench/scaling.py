#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in the sandbox, so per the driver instruction this
runs the SAME job on the SAME materialized input at several local[N]
parallelism levels and reports throughput + scaling efficiency
(rate_4N / rate_N) / 4 for each N -> 4N pair.

Writes bench/scaling_results.json. Run:  python bench/scaling.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEVELS = [int(x) for x in os.environ.get("SCALING_LEVELS", "2,8,32").split(",")]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
AMPLIFY = os.environ.get("BENCH_AMPLIFY", "20")


def run_level(cpus: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=SF_DIR,
               BENCH_AMPLIFY=AMPLIFY)
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True, timeout=3600)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    results = {}
    for cpus in LEVELS:
        print(f"--- local[{cpus}] ...", flush=True)
        r = run_level(cpus)
        results[cpus] = r
        print(f"    extract: {r['extract_docs']} docs, "
              f"{r['queries']['extract_density']}s, "
              f"{r['extract_docs_per_sec']} docs/s", flush=True)

    pairs = []
    for n in LEVELS:
        if n * 4 in results:
            rate_n = results[n]["extract_docs_per_sec"]
            rate_4n = results[n * 4]["extract_docs_per_sec"]
            eff = round(rate_4n / rate_n / 4.0, 3)
            pairs.append({"n": n, "4n": n * 4, "rate_n": rate_n,
                          "rate_4n": rate_4n, "efficiency": eff})
            print(f"    {n} -> {n*4} cores: {rate_n} -> {rate_4n} docs/s, "
                  f"efficiency {eff}")

    summary = {"sf_dir": SF_DIR, "amplify": int(AMPLIFY),
               "levels": {str(k): v for k, v in results.items()},
               "scaling_pairs": pairs}
    out_path = os.path.join(REPO, "bench", "scaling_results.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
