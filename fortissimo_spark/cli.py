"""spark-submit entry point (the distributed analogue of the reference CLI,
cli.ts:12-61 — glob inputs, parse with encoding retry, write results).

Usage:
    spark-submit --py-files fortissimo_spark.zip -m fortissimo_spark.cli \\
        --input  <pages table path or parquet glob> \\
        --output <output root> \\
        [--strip density|basic|none] [--no-resume] [--salt-factor 8]
        [--verify-roundtrip]

or locally:
    python -m fortissimo_spark.cli --input ... --output ... --master local[8]
"""

from __future__ import annotations

import argparse
import json
import sys


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="fortissimo-spark",
                                description="Main-content extraction over Common-Crawl-style pages")
    p.add_argument("--input", required=True, help="pages parquet path/glob")
    p.add_argument("--input-format", default="parquet",
                   choices=["parquet", "warc"],
                   help="'warc' ingests .warc/.warc.gz crawl archives "
                        "(one task per file) instead of a pages table")
    p.add_argument("--output", required=True, help="output root (extracted/ + lineage/)")
    p.add_argument("--strip", default="density", choices=["density", "basic", "none"])
    p.add_argument("--no-resume", action="store_true",
                   help="ignore committed lineage and reprocess everything")
    p.add_argument("--no-dedup", action="store_true",
                   help="skip the per-url latest-crawl dedup")
    p.add_argument("--canonical-urls", action="store_true",
                   help="dedup on canonical urls (tracking params/case/port "
                        "variants collapse; urls.normalize_url)")
    p.add_argument("--salt-factor", type=int, default=8)
    p.add_argument("--master", default=None,
                   help="override master (omit under spark-submit)")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--verify-roundtrip", action="store_true",
                   help="also verify lossless round-trip per document (slower)")
    return p


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("fortissimo-extract")
    if args.master:
        builder = builder.master(args.master)
    builder = builder.config("spark.sql.session.timeZone", "UTC")
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions",
                                 str(args.shuffle_partitions))
    spark = builder.getOrCreate()

    from .pipeline import ExtractionJob

    dedup = False if args.no_dedup else ("canonical" if args.canonical_urls
                                         else True)
    job = ExtractionJob(spark, args.output, strip=args.strip,
                        salt_factor=args.salt_factor, dedup=dedup)
    if args.input_format == "warc":
        from .warc import read_warcs
        pages = read_warcs(spark, args.input)
    else:
        pages = spark.read.parquet(args.input)
    stats = job.run(pages, resume=not args.no_resume)
    print(json.dumps(stats, default=str))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
