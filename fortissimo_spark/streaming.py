"""Structured Streaming ingest for continuous crawls.

The extraction kernel is stateless per document, so streaming is the same
``mapInPandas`` plan under ``readStream``: micro-batches of pages flow
through decode→parse→extract and land in the partitioned output via
``foreachBatch`` (which reuses the batch writer, keeping one code path).

Late data / duplicates: a watermark on ``warc_ts`` plus ``dropDuplicates``
on url bounds the dedup state; recrawls older than the watermark are
resolved at read time by the batch dedup window instead (latest crawl wins),
so the streaming path only needs at-most-once per url within the watermark
horizon.

This mirrors the reference's incremental ``parseAsync``/``request-data``
surface (html-parser.ts:276-304): micro-batches play the role of the
"request more data" callback, and job cancellation replaces ``stop()``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .io_tables import with_layout_columns
from .pipeline import extract_df
from .schema import PAGES_SCHEMA

__all__ = ["read_pages_stream", "streaming_extract", "start_streaming_job",
           "streaming_host_stats", "streaming_crawl_rates"]


def read_pages_stream(spark: SparkSession, input_path: str,
                      max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream over a directory of pages parquet drops."""
    return (spark.readStream
            .schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_path))


def streaming_extract(pages_stream: DataFrame, *, strip: str = "density",
                      watermark: str = "1 hour") -> DataFrame:
    """Watermarked, url-deduped streaming extraction.

    ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``): with
    the plain operator, a watermark only evicts dedup state when the
    event-time column is PART of the key subset — keyed on ``url`` alone
    the state would hold every url ever seen, which at 10^12 documents is
    an unbounded-state OOM. The WithinWatermark variant evicts each url's
    entry once the watermark passes its event time, so state is bounded by
    the crawl rate × watermark horizon regardless of corpus size."""
    deduped = (pages_stream
               .withWatermark("warc_ts", watermark)
               .dropDuplicatesWithinWatermark(["url"]))
    return extract_df(deduped, strip)


def streaming_crawl_rates(pages_stream: DataFrame, *, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Event-time tumbling-window crawl rates per host with a late-data
    watermark: rows older than ``watermark`` behind the max observed
    ``warc_ts`` are dropped (bounded state); windows finalize once the
    watermark passes them."""
    return (pages_stream
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("w"),
                     F.parse_url(F.col("url"), F.lit("HOST")).alias("host"))
            .agg(F.count("*").alias("n_pages"))
            .select(F.col("w.start").alias("window_start"), "host", "n_pages"))


def streaming_host_stats(extracted_stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    running per-host page/token/error counters across micro-batches — the
    kind of arbitrary keyed state Spark's built-in windowed aggregations
    can't express when the update logic grows beyond sums."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        pages = tokens = errors = 0
        if state.exists:
            pages, tokens, errors = state.get
        for pdf in pdfs:
            pages += len(pdf)
            tokens += int(pdf["token_count"].sum())
            errors += int(pdf["errors"].sum())
        state.update((pages, tokens, errors))
        yield pd.DataFrame({"host": [key[0]], "pages": [pages],
                            "tokens": [tokens], "errors": [errors]})

    keyed = extracted_stream.withColumn(
        "host", F.parse_url(F.col("url"), F.lit("HOST")))
    return keyed.groupBy("host").applyInPandasWithState(
        update,
        outputStructType="host string, pages bigint, tokens bigint, errors bigint",
        stateStructType="pages bigint, tokens bigint, errors bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)


def start_streaming_job(spark: SparkSession, input_path: str, output_path: str,
                        checkpoint_path: str, *, strip: str = "density",
                        trigger_seconds: int = 10):
    """End-to-end streaming job; returns the StreamingQuery handle.

    Idempotency: ``foreachBatch`` is at-least-once — a batch retried after a
    failure runs again with the SAME batch_id. Each batch therefore writes to
    its own ``batch_id=N`` subdirectory with ``overwrite`` mode, so a retry
    replaces its own previous (possibly partial) output instead of appending
    duplicates. Readers of ``output_path`` see ``batch_id`` as a discovered
    partition column.
    """
    stream = read_pages_stream(spark, input_path)
    extracted = streaming_extract(stream, strip=strip)
    # same layout helper as the batch job: bucket count can't drift
    extracted = with_layout_columns(extracted)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.write.mode("overwrite")
         .partitionBy("crawl_date", "host_bucket")
         .parquet(os.path.join(output_path, f"batch_id={batch_id}")))

    return (extracted.writeStream
            .foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(processingTime=f"{trigger_seconds} seconds")
            .start())
