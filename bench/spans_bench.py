#!/usr/bin/env python3
"""duplicate_spans pre-filter micro-bench.

Two corpora, both deterministic:

* ``realistic``: mostly-unique token streams with a shared boilerplate
  span planted in 10% of docs — the crawl-like shape where the
  overwhelming majority of gram positions are singletons and the
  join-back pre-filter should pay for its extra count job;
* ``hot`` (worst case, the r4 recipe): every interior gram corpus-hot —
  the pre-filter can drop nothing, so this measures its overhead bound.

For each corpus, times the finder under ``prefilter=None`` (the r4 lazy
plan) and ``prefilter="auto"`` (tiered broadcast/bloom), best-of-REPS,
and appends one JSON line per (corpus, mode) to spans_bench.txt.

Run ALONE (no concurrent pytest/bench) — co-tenant load corrupts timings.
    SPARK_GRAFT_CPUS=16 python bench/spans_bench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from fortissimo_spark.dedup import duplicate_spans  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
REPS = int(os.environ.get("BENCH_ROUNDS", "2"))
K = 20


def corpora():
    boiler = " ".join(f"b{i}" for i in range(30))  # 30-token boilerplate
    realistic = [(d, (" ".join(f"d{d}x{i}" for i in range(30))
                      + (" " + boiler if d % 10 == 0 else "")
                      + " " + " ".join(f"d{d}y{i}" for i in range(30))))
                 for d in range(80000)]
    base = [(d, " ".join(f"w{d % 1000}t{i}" for i in range(55)))
            for d in range(20000)]  # every doc repeated 20x -> all hot
    return {"realistic": realistic, "hot": base}


def main():
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("spans_bench")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.ui.enabled", "true")  # for shuffle-byte metrics
             .config("spark.ui.port", "4297")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import urllib.request

    def shuffle_bytes() -> tuple[int, int]:
        """(write, read) bytes across all completed stages so far — the
        per-mode DELTA is the scale-honest metric: local[N] wall-clock
        hides exchange cost (in-memory shuffle), a 1000-executor network
        does not."""
        app = json.load(urllib.request.urlopen(
            "http://localhost:4297/api/v1/applications"))[0]["id"]
        stages = json.load(urllib.request.urlopen(
            f"http://localhost:4297/api/v1/applications/{app}/stages"
            "?status=complete"))
        return (sum(s.get("shuffleWriteBytes", 0) for s in stages),
                sum(s.get("shuffleReadBytes", 0) for s in stages))
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "spans_bench.txt")
    lines = []
    for name, rows in corpora().items():
        docs = spark.createDataFrame(rows, "doc_id long, text string") \
            .repartition(CPUS).localCheckpoint(eager=True)  # pin input
        n_tokens = sum(len(t.split()) for _, t in rows)
        for label, mode, kw in (
                ("none", None, {}),
                ("auto", "auto", {}),
                ("bloom-forced", "auto", {"broadcast_dup_limit": 0})):
            best, spans = float("inf"), -1
            for _ in range(REPS):
                w0, r0 = shuffle_bytes()
                t0 = time.time()
                spans = duplicate_spans(docs, k=K, prefilter=mode,
                                        **kw).count()
                best = min(best, time.time() - t0)
                time.sleep(0.5)  # let the UI ingest the last stages
                w1, r1 = shuffle_bytes()
            lines.append(json.dumps({
                "op": f"duplicate_spans k={K}", "corpus": name,
                "docs": len(rows), "corpus_tokens": n_tokens,
                "prefilter": label,
                "strategy": duplicate_spans.last_strategy["strategy"],
                "n_dup_grams": duplicate_spans.last_strategy["n_dup"],
                "spans_found": spans, "finder_sec": round(best, 2),
                "tokens_per_sec": int(n_tokens / best),
                "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
                "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
                "cpus": CPUS, "load1": round(os.getloadavg()[0], 1)}))
            print(lines[-1])
    with open(out_path, "a") as fh:
        fh.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
