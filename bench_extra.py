#!/usr/bin/env python3
"""Isolation benchmarks (guide §1.4): noop-sink timings for each stage of the
headline extract query plus the four small bench queries. Does NOT replace
bench.py (frozen); cites numbers for OPTIMIZATION_r08.md.

Usage: python bench_extra.py [stages|queries|plans] ...
Env: same as bench.py (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_AMPLIFY).
"""
from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, Window, functions as F  # noqa: E402

from fortissimo_spark.io_tables import load_table  # noqa: E402
from fortissimo_spark.pipeline import dedup_latest_crawl, extract_df  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
AMPLIFY = int(os.environ.get("BENCH_AMPLIFY", "20"))
SCRATCH = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_scratch")
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "2"))


def build_session() -> SparkSession:
    # Mirrors the frozen bench.py session exactly.
    return (SparkSession.builder
            .master(f"local[{CPUS}]")
            .appName("fortissimo-bench-extra")
            .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
            .config("spark.sql.files.maxPartitionBytes", "16m")
            .config("spark.driver.memory", "24g")
            .config("spark.ui.enabled", "false")
            .getOrCreate())


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, out):
    best = float("inf")
    for _ in range(REPS):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    out[name] = round(best, 3)
    print(f"  {name}: {out[name]}s", file=sys.stderr)


def corpus_path() -> str:
    tag = os.path.basename(SF_DIR.rstrip("/"))
    return os.path.join(SCRATCH, f"pages_{tag}_x{AMPLIFY}")


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    modes = sys.argv[1:] or ["stages"]
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    path = corpus_path()
    pages = spark.read.parquet(path)
    # warm page cache + JVM, like bench.py
    spark.range(1000).agg(F.sum("id")).collect()
    pages.agg(F.sum(F.length("html"))).collect()

    results: dict = {}

    if "stages" in modes:
        # 1. scan only (all columns the kernel uses, forced via noop)
        timed(spark, "scan_only",
              lambda: noop(pages.select("url", "warc_ts", "html", "lang")), results)
        # 2. scan + dedup window (no Python)
        timed(spark, "scan_dedup",
              lambda: noop(dedup_latest_crawl(pages)
                           .select("url", "warc_ts", "html", "lang")), results)
        # 3. full extract to noop (no agg collect)
        timed(spark, "extract_noop",
              lambda: noop(extract_df(dedup_latest_crawl(pages), "density")),
              results)
        # 4. exactly what bench.py times (agg + collect)
        def bench_like():
            out = extract_df(dedup_latest_crawl(pages), "density")
            (out.agg(F.count("*").alias("docs"),
                     F.sum("token_count").alias("tokens"),
                     F.sum("html_bytes").alias("bytes"),
                     F.sum("errors").alias("errors")).collect())
        timed(spark, "extract_bench", bench_like, results)
        # 5. kernel with no dedup (isolates the window's contribution)
        timed(spark, "extract_nodedup_noop",
              lambda: noop(extract_df(pages, "density")), results)

    if "queries" in modes:
        li = load_table(spark, SF_DIR, "lineitem")
        cust = load_table(spark, SF_DIR, "customer")
        orders = load_table(spark, SF_DIR, "orders")
        ev = load_table(spark, SF_DIR, "events")
        emb = (load_table(spark, SF_DIR, "embeddings")
               .select("vec_id", F.col("embedding").cast("array<double>").alias("v")))

        def q1():
            (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
             .groupBy("l_returnflag", "l_linestatus")
             .agg(F.sum("l_quantity").alias("sum_qty"),
                  F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
                  F.avg("l_extendedprice").alias("avg_price"),
                  F.count("*").alias("count_order"))
             .collect())

        def q3():
            (cust.filter(F.col("c_mktsegment") == "BUILDING")
             .join(orders, F.col("c_custkey") == F.col("o_custkey"))
             .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
             .groupBy("l_orderkey")
             .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
             .orderBy(F.desc("revenue")).limit(10).collect())

        def wdedup():
            w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
            (ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
             .agg(F.count("*")).collect())

        def ann():
            q = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
            dot = F.aggregate(F.zip_with("v", "qv", lambda a, b: a * b),
                              F.lit(0.0), lambda acc, x: acc + x)
            (emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
             .select("vec_id", dot.alias("sim"))
             .orderBy(F.desc("sim")).limit(10).collect())

        timed(spark, "q1_pricing", q1, results)
        timed(spark, "q3_topk_join", q3, results)
        timed(spark, "window_dedup", wdedup, results)
        timed(spark, "ann_cosine", ann, results)

    if "plans" in modes:
        outdir = sys.argv[sys.argv.index("plans") + 1] if \
            len(sys.argv) > sys.argv.index("plans") + 1 else "plans/r08"
        os.makedirs(outdir, exist_ok=True)
        suffix = os.environ.get("PLAN_SUFFIX", "before")
        plans = {
            "extract_density": extract_df(dedup_latest_crawl(pages), "density")
                .agg(F.count("*"), F.sum("token_count"), F.sum("html_bytes"),
                     F.sum("errors")),
            "q1_pricing": load_table(spark, SF_DIR, "lineitem")
                .filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
                .groupBy("l_returnflag", "l_linestatus")
                .agg(F.sum("l_quantity"),
                     F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                     F.avg("l_extendedprice"), F.count("*")),
            "q3_topk_join": load_table(spark, SF_DIR, "customer")
                .filter(F.col("c_mktsegment") == "BUILDING")
                .join(load_table(spark, SF_DIR, "orders"),
                      F.col("c_custkey") == F.col("o_custkey"))
                .join(load_table(spark, SF_DIR, "lineitem"),
                      F.col("o_orderkey") == F.col("l_orderkey"))
                .groupBy("l_orderkey")
                .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
                .orderBy(F.desc("revenue")).limit(10),
            "window_dedup": load_table(spark, SF_DIR, "events")
                .withColumn("rn", F.row_number().over(
                    Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))))
                .filter(F.col("rn") == 1).agg(F.count("*")),
        }
        emb = (load_table(spark, SF_DIR, "embeddings")
               .select("vec_id", F.col("embedding").cast("array<double>").alias("v")))
        qv = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
        dot = F.aggregate(F.zip_with("v", "qv", lambda a, b: a * b),
                          F.lit(0.0), lambda acc, x: acc + x)
        plans["ann_cosine"] = (emb.filter(F.col("vec_id") != 0)
                               .crossJoin(F.broadcast(qv))
                               .select("vec_id", dot.alias("sim"))
                               .orderBy(F.desc("sim")).limit(10))
        for name, df in plans.items():
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(explain_str(df))
            print(f"  wrote {outdir}/{name}_{suffix}.txt", file=sys.stderr)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
