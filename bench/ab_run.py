#!/usr/bin/env python3
"""One cluster size, kernel-only + full-job timings. Used by scaling docs.
Usage: python bench/ab_run.py <n_executors> [reps]"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, Window, functions as F  # noqa: E402

from fortissimo_spark.io_tables import register_bucketed_pages  # noqa: E402
from fortissimo_spark.pipeline import dedup_latest_crawl, extract_df  # noqa: E402
from fortissimo_spark.submit import attach_to_session  # noqa: E402

BUCKETED = "/root/repo/.bench_scratch/warehouse/pages_bucketed"


def _bucketed_dedup(spark):
    bt = register_bucketed_pages(spark, "pages_bucketed_ab", BUCKETED)
    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc())
    return (bt.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def main():
    n_exec = int(sys.argv[1])
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = (SparkSession.builder.master(f"local-cluster[{n_exec},2,3072]")
             .config("spark.executor.memory", "2g")
             .config("spark.sql.shuffle.partitions", str(max(n_exec * 4, 8)))
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    attach_to_session(spark)
    pages = spark.read.parquet("/root/repo/.bench_scratch/pages_sf0.1_x40")
    extract_df(pages.limit(2000), "density").agg(F.count("*")).collect()
    out = {"executors": n_exec}
    jobs = [("kernel_only", lambda: pages),
            ("full_job", lambda: dedup_latest_crawl(pages, "broadcast"))]
    if os.path.exists(BUCKETED):
        jobs.append(("full_job_bucketed", lambda: _bucketed_dedup(spark)))
    for name, src_fn in jobs:
        best = 1e9
        docs = 0
        for _ in range(reps):
            t0 = time.time()
            docs = extract_df(src_fn(), "density").agg(F.count("*")).collect()[0][0]
            best = min(best, time.time() - t0)
        out[name] = {"docs": docs, "seconds": round(best, 2),
                     "docs_per_sec": round(docs / best, 1)}
    print("RESULT " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
