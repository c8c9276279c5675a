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
           "streaming_host_stats", "streaming_crawl_rates",
           "streaming_curate", "DOCS_STREAM_SCHEMA"]


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


DOCS_STREAM_SCHEMA = ("doc_id long, lang string, text string, "
                      "crawl_ts timestamp")


def streaming_curate(spark: SparkSession, input_path: str, output_path: str,
                     checkpoint_path: str, *, lm=None,
                     ppl_cutoff: float = 100.0, watermark: str = "1 hour",
                     max_files_per_trigger: int = 1,
                     trigger_seconds: int = 10):
    """``pipeline.curate_corpus``'s dedup + LM-gate stages as an
    INCREMENTAL job — the continuous-crawl shape of the composed recipe.

    * **exact dedup** streams as ``dropDuplicatesWithinWatermark`` on
      ``sha256(text)``: the first-seen copy of each byte-identical text
      wins (equal to the batch recipe's min-id winner whenever ids
      arrive in crawl order), and content-hash state is EVICTED once the
      watermark passes its event time — bounded by crawl rate x horizon,
      never by corpus size (the same argument as
      :func:`streaming_extract`; recrawls older than the horizon are the
      batch dedup window's job at read time).
    * **LM quality gate** runs inside ``foreachBatch``: the bounded
      count tables broadcast into each micro-batch exactly as in the
      batch plan — the gate is stateless, so batch and stream scores are
      identical by construction.
    * **mixture quotas stay batch-side**: a quota is a corpus-level
      publication decision (which K of ALL candidates), not a per-row
      predicate — applying it per micro-batch would admit the first K
      of each batch instead. Run ``corpus.stratified_sample`` over the
      accumulated output at publication time.

    Each batch writes ``batch_id=N`` with overwrite (the
    :func:`start_streaming_job` at-least-once idempotency contract).
    Returns the StreamingQuery handle."""
    from .lm import with_perplexity

    stream = (spark.readStream.schema(DOCS_STREAM_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(input_path))
    deduped = (stream
               .withColumn("_th", F.sha2(F.col("text"), 256))
               .withWatermark("crawl_ts", watermark)
               .dropDuplicatesWithinWatermark(["_th"])
               .drop("_th"))

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df
        if lm is not None:
            ppl = with_perplexity(out, lm, "doc_id", "text")
            out = (out.join(ppl, "doc_id")
                   .filter(F.col("ppl").isNotNull()
                           & (F.col("ppl") <= ppl_cutoff)))
        cols = ["doc_id", "lang"] + (["ppl"] if lm is not None else [])
        (out.select(*cols).write.mode("overwrite")
         .parquet(os.path.join(output_path, f"batch_id={batch_id}")))

    return (deduped.writeStream
            .foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(processingTime=f"{trigger_seconds} seconds")
            .start())
