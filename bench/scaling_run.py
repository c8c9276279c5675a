#!/usr/bin/env python3
"""Single-cluster-size extraction timing (invoked by scaling.py).

Usage: python bench/scaling_run.py <pages_parquet> <n_executors> [reps]
Prints one JSON line {"executors": N, "docs": D, "seconds": S, "docs_per_sec": R}.

Cluster model: ``local-cluster[N,2,3072]`` — N real executor JVMs with 2
cores each, engine shipped to executors as a zip (the ``spark-submit
--py-files`` contract). Methodology: one untimed warmup pass (JVM + Python
worker spin-up), then best-of-``reps`` timed dedup+extract runs (the sandbox
host has noisy neighbors; best-of-N isolates the engine's cost).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from fortissimo_spark.pipeline import dedup_latest_crawl, extract_df  # noqa: E402
from fortissimo_spark.submit import attach_to_session  # noqa: E402


def main():
    path = sys.argv[1]
    n_exec = int(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cores_per_exec = 2

    spark = (SparkSession.builder
             .master(f"local-cluster[{n_exec},{cores_per_exec},3072]")
             .appName(f"scaling-{n_exec}x{cores_per_exec}")
             .config("spark.executor.memory", "2g")
             .config("spark.sql.shuffle.partitions",
                     str(max(n_exec * cores_per_exec * 2, 8)))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    attach_to_session(spark)

    pages = spark.read.parquet(path)
    # warmup: spin up executors + python workers + JIT on a slice
    extract_df(pages.limit(2000), "density").agg(F.count("*")).collect()

    docs = 0
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        row = (extract_df(dedup_latest_crawl(pages), "density")
               .agg(F.count("*").alias("docs")).collect()[0])
        dt = time.time() - t0
        docs = row["docs"]
        best = min(best, dt)

    print(json.dumps({"executors": n_exec, "cores_per_executor": cores_per_exec,
                      "docs": docs, "seconds": round(best, 2),
                      "docs_per_sec": round(docs / best, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
