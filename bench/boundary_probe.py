#!/usr/bin/env python3
"""Isolate the Python-boundary cost of the extract kernel (guide §4):
passthrough kernels vs parse-only vs full, mapInPandas vs mapInArrow.
Run ALONE.  cwd must be /root/repo."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PATH = "/root/repo/.bench_scratch/pages_sf0.1_x20"

spark = (SparkSession.builder.master(f"local[{CPUS}]")
         .appName("boundary-probe")
         .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
         .config("spark.sql.files.maxPartitionBytes", "16m")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

pages = spark.read.parquet(PATH).select("url", "warc_ts", "html", "lang")
pages.agg(F.sum(F.length("html"))).collect()  # warm cache


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{name}: {best:.3f}s")


# 1. pandas passthrough: JVM->pandas->JVM, html column included, no work
def pd_pass(batches):
    import pandas as pd
    for pdf in batches:
        yield pd.DataFrame({"url": pdf["url"],
                            "n": [len(b or b"") for b in pdf["html"]]})


# 2. arrow passthrough
def ar_pass(batches):
    import pyarrow as pa
    for b in batches:
        n = [len(x or b"") for x in b.column("html").to_pylist()]
        yield pa.RecordBatch.from_arrays(
            [b.column("url"), pa.array(n, type=pa.int64())], ["url", "n"])


# 3. parse-only (no output assembly): parse every doc, return counts
def parse_only(batches):
    import pandas as pd
    from fortissimo_spark.kernel import process_document
    for pdf in batches:
        k = 0
        for raw in pdf["html"]:
            d = process_document(bytes(raw or b""), "density")
            k += d["node_count"]
        yield pd.DataFrame({"n": [k]})


timed("pd_passthrough", lambda: noop(
    pages.mapInPandas(pd_pass, "url string, n long")))
timed("arrow_passthrough", lambda: noop(
    pages.mapInArrow(ar_pass, "url string, n long")))
timed("parse_only", lambda: noop(
    pages.mapInPandas(parse_only, "n long")))

from fortissimo_spark.pipeline import extract_df  # noqa: E402
timed("full_extract", lambda: noop(extract_df(pages, "density")))

spark.stop()
