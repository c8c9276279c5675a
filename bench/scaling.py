#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in the sandbox, so per the driver instruction this
runs the SAME dedup+extract job on the SAME materialized pages parquet at
several local[N] parallelism levels (subprocess per level so each gets a
fresh JVM) and reports throughput + scaling efficiency
(rate_4N / rate_N) / 4 for each N -> 4N pair.

Writes bench/scaling_results.json. Run:  python bench/scaling.py
Env: SCALING_LEVELS=2,8,32  SPARK_GRAFT_SF_DIR  BENCH_AMPLIFY=40
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEVELS = [int(x) for x in os.environ.get("SCALING_LEVELS", "1,2,4,8").split(",")]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
AMPLIFY = int(os.environ.get("BENCH_AMPLIFY", "40"))


def ensure_corpus() -> str:
    """Materialize the shared pages corpus (one-off, any parallelism)."""
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession
    from fortissimo_spark.io_tables import build_pages

    tag = os.path.basename(SF_DIR.rstrip("/"))
    path = os.path.join(REPO, ".bench_scratch", f"pages_{tag}_x{AMPLIFY}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        spark = (SparkSession.builder.master("local[32]")
                 .config("spark.sql.session.timeZone", "UTC")
                 .config("spark.driver.memory", "24g")
                 .config("spark.ui.enabled", "false").getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        build_pages(spark, SF_DIR, amplify=AMPLIFY, num_partitions=128) \
            .write.mode("overwrite").parquet(path)
        spark.stop()
    return path


def run_level(path: str, cpus: int, reps: int = 1) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench", "scaling_run.py"),
         path, str(cpus), str(reps)],
        capture_output=True, text=True, timeout=3600)
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"scaling_run failed at {cpus}: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


ROUNDS = int(os.environ.get("SCALING_ROUNDS", "3"))


def main():
    path = ensure_corpus()
    results = {}
    # interleave the levels across ROUNDS so noisy-neighbor periods on the
    # sandbox host hit every level equally; keep each level's best round
    for rnd in range(ROUNDS):
        for cpus in LEVELS:
            print(f"--- round {rnd + 1}/{ROUNDS}: {cpus} executors x 2 cores ...",
                  flush=True)
            r = run_level(path, cpus)
            if cpus not in results or r["seconds"] < results[cpus]["seconds"]:
                results[cpus] = r
            print(f"    {r['docs']} docs in {r['seconds']}s = {r['docs_per_sec']} docs/s",
                  flush=True)

    pairs = []
    for n in LEVELS:
        if n * 4 in results:
            rate_n = results[n]["docs_per_sec"]
            rate_4n = results[n * 4]["docs_per_sec"]
            eff = round(rate_4n / rate_n / 4.0, 3)
            pairs.append({"n": n, "4n": n * 4, "rate_n": rate_n,
                          "rate_4n": rate_4n, "efficiency": eff})
            print(f"    {n} -> {n*4} executors: {rate_n} -> {rate_4n} docs/s, "
                  f"efficiency {eff}")

    summary = {"sf_dir": SF_DIR, "amplify": AMPLIFY, "job": "dedup+extract(density)", "cluster_model": "local-cluster[N,2,3072] executor JVMs",
               "levels": {str(k): v for k, v in results.items()},
               "scaling_pairs": pairs}
    out_path = os.path.join(REPO, "bench", "scaling_results.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
