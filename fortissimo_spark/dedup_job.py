"""Resumable corpus-deduplication job: the production wrapper around
dedup.py's operators, with per-stage checkpoints + metrics (the dedup
analogue of pipeline.ExtractionJob's resume/lineage contract).

A 100 TB canonicalize run is hours of work across five stages with very
different failure profiles; restarting from scratch after a stage-4 blip
is unacceptable. Each stage writes its output as a parquet table and is
skipped on resume when its ``_SUCCESS`` marker exists:

1. ``signatures/``  — (id, sig[K]) minhash signatures: the expensive full
   corpus scan+shingle+sign, exactly once.
2. ``candidates/``  — (id_a, id_b) LSH candidate pairs, banded from the
   signatures TABLE (never recomputed from text).
3. ``pairs/``       — exact-Jaccard-verified near-dup pairs; verify sides
   scan the corpus pruned to candidate ids (broadcast semi-join).
4. ``clusters/``    — (id, cluster_id) connected components.
5. ``losers/``      — the doc ids to drop (cluster members that are not
   the minimum id). Small by construction; the canonical corpus is
   ``docs`` anti-joined with it — composable with any downstream writer.

``metrics/metrics.json`` records per-stage rows / seconds / skipped plus
the capped-bucket count from :func:`dedup.lsh_bucket_stats` (no silent
recall loss at scale). Exact-dup removal is intentionally upstream
(exact_duplicates / canonicalize's window) — this job handles the
near-dup leg, whose stages are the expensive, restart-worthy ones.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import (
    duplicate_clusters, lsh_bucket_stats, lsh_candidate_pairs,
    minhash_signatures, shingle_sets, verify_candidates_pruned,
)

__all__ = ["DedupJob"]


class DedupJob:
    def __init__(self, spark: SparkSession, out_dir: str, *,
                 id_col: str = "doc_id", text_col: str = "text",
                 n: int = 3, num_hashes: int = 128, bands: int = 32,
                 threshold: float = 0.5, max_bucket_size: int = 1000):
        self.spark = spark
        self.out_dir = out_dir
        self.id_col = id_col
        self.text_col = text_col
        self.n = n
        self.num_hashes = num_hashes
        self.bands = bands
        self.threshold = threshold
        self.max_bucket_size = max_bucket_size
        for name in ("signatures", "candidates", "pairs", "clusters",
                     "losers", "metrics"):
            setattr(self, f"{name}_path", os.path.join(out_dir, name))

    # --- filesystem plumbing ------------------------------------------
    # Resume detection and small-file metrics persistence go through the
    # Hadoop FileSystem API (py4j), not the driver's local os/open: with a
    # driver-local check a "resumable 100 TB" job on an HDFS/S3 out_dir
    # would silently never resume (always rebuild) and crash on the
    # metrics write, even though the parquet stage writes themselves work.
    def _fs(self, path: str):
        jvm = self.spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs, jpath, jvm

    def _exists(self, path: str) -> bool:
        fs, jpath, _ = self._fs(path)
        return fs.exists(jpath)

    def _read_json(self, path: str) -> dict:
        fs, jpath, jvm = self._fs(path)
        stream = fs.open(jpath)
        try:
            text = jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8")
        finally:
            stream.close()
        return json.loads(text)

    def _write_json(self, path: str, obj: dict) -> None:
        fs, jpath, _ = self._fs(path)
        out = fs.create(jpath, True)  # overwrite; creates parent dirs
        try:
            out.write(bytearray(json.dumps(obj, indent=2).encode("utf-8")))
        finally:
            out.close()

    def _done(self, path: str) -> bool:
        return self._exists(os.path.join(path, "_SUCCESS"))

    def _stage(self, name: str, path: str, build, resume: bool,
               metrics: list) -> DataFrame:
        t0 = time.perf_counter()
        skipped = resume and self._done(path)
        if not skipped:
            build().write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        metrics.append({"stage": name, "rows": out.count(),
                        "seconds": round(time.perf_counter() - t0, 3),
                        "skipped": skipped})
        return out

    def run(self, docs: DataFrame, *, resume: bool = True) -> dict:
        """Execute (or resume) the five stages; returns the metrics dict.
        The canonical corpus afterwards is ``docs.join(losers, id,
        'left_anti')`` via :meth:`canonical`."""
        metrics: list[dict] = []

        sigs = self._stage(
            "signatures", self.signatures_path,
            lambda: minhash_signatures(
                shingle_sets(docs, self.id_col, self.text_col, self.n),
                self.num_hashes).select("id", "sig"),
            resume, metrics)

        cands = self._stage(
            "candidates", self.candidates_path,
            lambda: lsh_candidate_pairs(sigs, self.bands,
                                        self.max_bucket_size),
            resume, metrics)
        # capped-bucket observability is checkpointed WITH the candidates
        # stage: recomputing it would re-shuffle the full signature table
        # on every resume, including a no-op one
        capped_file = os.path.join(self.metrics_path, "capped_buckets.json")
        if resume and metrics[-1]["skipped"] and self._exists(capped_file):
            capped = self._read_json(capped_file)["capped_buckets"]
        else:
            capped = lsh_bucket_stats(sigs, self.bands,
                                      self.max_bucket_size).count()
            self._write_json(capped_file, {"capped_buckets": capped})

        pairs = self._stage(
            "pairs", self.pairs_path,
            lambda: verify_candidates_pruned(
                docs, cands, id_col=self.id_col, text_col=self.text_col,
                n=self.n, threshold=self.threshold),
            resume, metrics)

        clusters = self._stage(
            "clusters", self.clusters_path,
            lambda: duplicate_clusters(pairs.select("id_a", "id_b")),
            resume, metrics)

        self._stage(
            "losers", self.losers_path,
            lambda: (clusters.filter(F.col("id") != F.col("cluster_id"))
                     .select(F.col("id").alias(self.id_col))),
            resume, metrics)

        stats = {"stages": metrics, "capped_buckets": capped,
                 "threshold": self.threshold, "bands": self.bands,
                 "num_hashes": self.num_hashes}
        self._write_json(os.path.join(self.metrics_path, "metrics.json"),
                         stats)
        return stats

    def canonical(self, docs: DataFrame) -> DataFrame:
        """The surviving rows of ``docs`` (requires :meth:`run` complete)."""
        losers = self.spark.read.parquet(self.losers_path)
        return docs.join(losers, self.id_col, "left_anti")
