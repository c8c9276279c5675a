#!/usr/bin/env python3
"""Before/after micro-bench for the r3 dedup plan changes, on the amplified
corpus. Reproduces the r2 shapes inline (per-coefficient minhash; un-pruned
triple-scan verify) and times them against the current implementations.

Run: python bench/dedup_bench.py [sf_dir] [amplify]
Appends one JSON line per measurement to bench/dedup_bench_results.txt.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from fortissimo_spark.dedup import (  # noqa: E402
    _MERSENNE_P, _coeffs, canonicalize, lsh_candidate_pairs,
    minhash_signatures, near_duplicate_pairs, shingle_sets,
    verified_near_duplicates,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
AMPLIFY = int(sys.argv[2]) if len(sys.argv) > 2 else 10
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "16")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "dedup_bench_results.txt")


def minhash_signatures_r2(shingled, num_hashes=128, seed=42):
    """The r2 shape: one transform + array_min column per coefficient."""
    hashes = F.transform("shingles", lambda s: F.abs(F.xxhash64(s)) % _MERSENNE_P)
    sig_cols = []
    for a, b in _coeffs(num_hashes, seed):
        perm = F.transform(hashes, lambda h: (h * a + b) % _MERSENNE_P)  # noqa: B023
        sig_cols.append(F.array_min(perm))
    return shingled.withColumn("sig", F.array(*sig_cols))


def near_duplicate_pairs_r2(docs, threshold=0.5):
    """The r2 shape: verify sides re-shingle the FULL corpus (no candidate
    pruning, no materialization)."""
    shingled = shingle_sets(docs, "doc_id", "text", 3)
    signed = minhash_signatures(shingled, 128)
    candidates = lsh_candidate_pairs(signed.select("id", "sig"), 32, 1000)
    return verified_near_duplicates(shingled, candidates, threshold)


def timed(label, fn, results):
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    rec = {"label": label, "seconds": round(dt, 3), "rows": n,
           "sf_dir": SF_DIR, "amplify": AMPLIFY, "cpus": int(CPUS)}
    print(json.dumps(rec))
    results.append(rec)
    return dt


def main():
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")) \
        .select("doc_id", "text")
    if AMPLIFY > 1:
        reps = spark.range(AMPLIFY).withColumnRenamed("id", "rep")
        # every WORD gets the replica tag so replicas share no shingles —
        # the only near-dups are the deliberately planted ones below
        tagged = F.concat_ws(" ", F.transform(
            F.split(F.trim("text"), r"\s+"),
            lambda w: F.concat(F.col("rep").cast("string"), w)))
        docs = (docs.crossJoin(reps)
                .select((F.col("doc_id") + F.col("rep") * 10_000_000)
                        .alias("doc_id"), tagged.alias("text")))
    # materialize to parquet: verify-side rescans hit real IO like the
    # production table, not an in-memory cache
    scratch = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_scratch", "dedup_bench_corpus")
    docs.repartition(int(CPUS)).write.mode("overwrite").parquet(scratch)
    docs = spark.read.parquet(scratch)
    n_docs = docs.count()
    print(f"corpus: {n_docs} docs", file=sys.stderr)

    results = []
    # --- minhash signature computation (force with a cheap aggregate) ---
    for label, fn in (("minhash_r2_per_coefficient", minhash_signatures_r2),
                      ("minhash_r3_single_pass", minhash_signatures)):
        sh = shingle_sets(docs, "doc_id", "text", 3)
        signed = fn(sh, 128)
        agg = signed.select(F.sum(F.element_at("sig", 1)).alias("s"))
        timed(label, lambda a=agg: a.collect() and n_docs, results)

    # --- end-to-end near-dup pairs: triple-scan verify vs pruned verify.
    #     Two plant rates: dense (1/7 of docs have a near-dup; candidates =
    #     ~1/3 of the corpus, pruning saves little) and sparse (1/97 — the
    #     realistic post-exact-dedup shape where candidates are rare and
    #     pruning skips nearly two full corpus re-shingles) ---
    for mod, tag in ((7, "dense_1in7"), (97, "sparse_1in97")):
        planted = docs.union(
            docs.filter(F.col("doc_id") % mod == 0)
            .select((F.col("doc_id") + 100_000_000).alias("doc_id"),
                    F.concat(F.lit("zz yy "), F.col("text")).alias("text")))
        timed(f"near_dups_r2_unpruned_verify_{tag}",
              lambda p=planted: near_duplicate_pairs_r2(p).count(), results)
        timed(f"near_dups_r3_pruned_verify_{tag}",
              lambda p=planted: near_duplicate_pairs(p).count(), results)
    planted = docs.union(
        docs.filter(F.col("doc_id") % 7 == 0)
        .select((F.col("doc_id") + 100_000_000).alias("doc_id"),
                F.concat(F.lit("zz yy "), F.col("text")).alias("text")))

    # --- canonicalize end-to-end (current implementation only; the r2
    #     variant is the unpruned verify above plus the same clustering) ---
    timed("canonicalize_r3",
          lambda: canonicalize(planted, threshold=0.5).count(), results)

    with open(OUT, "a") as f:
        for rec in results:
            f.write(json.dumps(rec) + "\n")
    print("appended to", OUT, file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
