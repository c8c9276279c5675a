#!/usr/bin/env python3
"""Single-parallelism-level extraction timing (invoked by scaling.py).

Usage: python bench/scaling_run.py <pages_parquet> <cpus> [reps]
Prints one JSON line {"cpus": N, "docs": D, "seconds": S, "docs_per_sec": R}.

Methodology: warm the JVM + Python workers with one untimed pass over a
slice, then time ``reps`` full dedup+extract runs and keep the best (the
sandbox host has noisy neighbors; best-of-N isolates the engine's cost).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from fortissimo_spark.pipeline import dedup_latest_crawl, extract_df  # noqa: E402


def main():
    path = sys.argv[1]
    cpus = int(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName(f"scaling-{cpus}")
             .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.read.parquet(path)
    # warmup: spin up python workers / JIT on a slice
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

    print(json.dumps({"cpus": cpus, "docs": docs, "seconds": round(best, 2),
                      "docs_per_sec": round(docs / best, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
