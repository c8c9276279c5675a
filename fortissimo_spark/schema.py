"""Spark schemas for the extraction pipeline."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType, BinaryType, BooleanType, IntegerType, LongType, StringType,
    StructField, StructType, TimestampType,
)

# input table shape (BASELINE.json input_hint)
PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])

# one output row per page; spans are parallel int arrays (columnar-friendly:
# an array<struct> pays per-row dict building in the Python worker and a
# nested Arrow layout downstream)
EXTRACT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("lang", StringType()),
    StructField("text", StringType()),
    StructField("span_starts", ArrayType(IntegerType())),
    StructField("span_ends", ArrayType(IntegerType())),
    StructField("used_encoding", StringType()),
    StructField("declared_charset", StringType()),
    StructField("encoding_retried", BooleanType()),
    StructField("errors", IntegerType()),
    StructField("unclosed", IntegerType()),
    StructField("implicitly_closed", IntegerType()),
    StructField("node_count", IntegerType()),
    StructField("text_node_count", IntegerType()),
    StructField("characters", LongType()),
    StructField("lines", IntegerType()),
    StructField("text_len", LongType()),
    StructField("token_count", LongType()),
    StructField("html_bytes", IntegerType()),
    StructField("roundtrip_ok", BooleanType()),
])

# flat per-node debug/analytics export
NODES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("node_idx", IntegerType()),
    StructField("kind", IntegerType()),
    StructField("tag", StringType()),
    StructField("parent", IntegerType()),
    StructField("closure", IntegerType()),
    StructField("synthetic", BooleanType()),
    StructField("depth", IntegerType()),
    StructField("n_attrs", IntegerType()),
    StructField("text_len", IntegerType()),
    StructField("src_start", IntegerType()),
    StructField("src_end", IntegerType()),
])
