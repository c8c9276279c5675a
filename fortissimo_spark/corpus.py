"""Corpus-preparation operators for training-data pipelines.

All JVM-side DataFrame work (no Python UDFs):

* :func:`chunk_documents`     — fixed-token-window chunking with overlap
  (the context-window prep step), map-side only: array slice + posexplode,
  no shuffle.
* :func:`deterministic_sample`— content-stable hash sampling: the same row
  keeps/drops regardless of partitioning, executor count, or retry —
  re-runs and resumes see the same corpus (rand() would not survive a
  retry, let alone a resume). md5-based so DuckDB can mirror it exactly.
* :func:`pack_shards`         — assign docs to fixed-token-budget training
  shards by cumulative token count in stable doc order. Two-phase prefix
  sum: per-partition partials -> tiny driver-side scan -> broadcast
  offsets -> per-partition window. A naive ``Window.orderBy(id)`` with no
  partition key collapses the whole corpus into ONE task; this shape keeps
  every phase parallel and moves only #partitions numbers to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["chunk_documents", "deterministic_sample", "pack_shards",
           "stratified_sample", "incremental_new_pages",
           "importance_resample"]


def chunk_documents(docs: DataFrame, chunk_tokens: int = 256,
                    overlap: int = 32, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(doc_id, chunk_id, chunk_text, n_chunk_tokens) — whitespace-token
    windows of ``chunk_tokens`` with ``overlap`` tokens carried between
    consecutive chunks (stride = chunk_tokens - overlap; last chunk may be
    short, and a doc shorter than one chunk yields exactly one chunk).

    Map-side only: the chunk list is built per row with sequence/slice and
    posexploded — no shuffle, so chunking composes with any upstream
    partitioning (and at 100 TB the output inherits the input's layout).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(words)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.concat_ws(" ", F.slice(words, i * stride + 1, chunk_tokens))
            .alias("chunk_text"),
            F.least(n - i * stride, F.lit(chunk_tokens)).alias("n_chunk_tokens")))
    return (docs.select(F.col(id_col).alias("doc_id"),
                        F.posexplode(chunks).alias("chunk_id", "c"))
            .select("doc_id", "chunk_id", F.col("c.chunk_text").alias("chunk_text"),
                    F.col("c.n_chunk_tokens").alias("n_chunk_tokens")))


def deterministic_sample(docs: DataFrame, rate: float,
                         id_col: str = "doc_id",
                         salt: str = "") -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows keyed on the id.

    hash = first 15 hex chars of md5(salt || id) as an integer; keep when
    ``hash % 10000 < rate * 10000``. Stable across partitioning, executor
    count, task retries, and resumes — and across engines (DuckDB:
    ``CAST('0x' || substr(md5(...), 1, 15) AS BIGINT)``), unlike
    ``df.sample``/``rand()`` whose output depends on the split layout.
    Change ``salt`` to draw an independent sample at the same rate.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
        16, 10).cast("long")
    # round, not int(): int(0.57*10000) == 5699 — truncation would bias
    # the realized rate low and disagree with any mirror computing exactly
    return docs.filter(h % 10000 < round(rate * 10000))


def pack_shards(docs: DataFrame, shard_tokens: int = 100_000,
                id_col: str = "doc_id", text_col: str = "text",
                num_partitions: int | None = None,
                token_count_col: str | None = None) -> DataFrame:
    """(doc_id, n_tokens, shard_id) — pack docs into fixed-token-budget
    training shards in stable ``id_col`` order: a doc goes to shard
    ``floor(cum_tokens_before_it / shard_tokens)``.

    The token denominator is the whitespace count of ``text_col`` by
    default; pass ``token_count_col`` to budget in REAL tokenizer tokens
    instead (e.g. the ``n_tokens_bpe`` column from
    :func:`fortissimo_spark.bpe.with_bpe_token_counts`) — at 100 TB the
    training budget is denominated in tokenizer tokens, and the
    whitespace proxy drifts 20-40% against any real vocabulary.

    Scale shape (the reason this isn't one ``Window.orderBy``): a global
    ordered window has no partition key, so Spark plans a SINGLE task over
    the whole corpus. Instead:

    1. ``repartitionByRange(id)`` — ordered ranges, all partitions parallel;
    2. per-partition token totals (one tiny agg: #partitions rows);
    3. driver-side exclusive prefix scan over those totals (a few thousand
       numbers at any real corpus size), broadcast back as a literal map;
    4. per-partition cumulative sum window + the broadcast offset.

    Deterministic given the id order; the result equals the naive global
    cumsum (the oracle computes exactly that in DuckDB).
    """
    n_tok = (F.col(token_count_col).cast("long") if token_count_col
             else F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
    base = docs.select(F.col(id_col).alias("doc_id"),
                       n_tok.alias("n_tokens"))
    if num_partitions:
        base = base.repartitionByRange(num_partitions, "doc_id")
    else:
        base = base.repartitionByRange("doc_id")
    base = base.withColumn("_pid", F.spark_partition_id())
    # localCheckpoint pins the range assignment: the partials below and the
    # final pass must see the SAME _pid per row (two separate computations
    # of a nondeterministic-ish layout could disagree after a retry)
    base = base.localCheckpoint(eager=True)

    partials = (base.groupBy("_pid").agg(F.sum("n_tokens").alias("t"))
                .orderBy("_pid").collect())
    offsets = {}
    run = 0
    for r in partials:
        offsets[r["_pid"]] = run
        run += r["t"]
    off_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("_pid")) if offsets else F.lit(0)

    w = (Window.partitionBy("_pid").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + off_expr
    return (base.select("doc_id", "n_tokens",
                        F.floor(cum_before / shard_tokens)
                        .cast("int").alias("shard_id")))


def stratified_sample(docs: DataFrame, quotas: dict, strata_col: str,
                      id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Keep a deterministic per-stratum quota of rows — the data-mixing
    step that caps each source/language at a target document count
    (the Pile/Dolma-style mixture recipe, expressed as hard quotas).

    ``quotas`` maps stratum value -> max rows; strata absent from the map
    are DROPPED (an explicit mixture is a whitelist). Selection within a
    stratum follows the content-stable md5(salt||id) order with an id
    tiebreak — the same engine-portable determinism contract as
    :func:`deterministic_sample`/``cap_per_host`` — so the realized
    mixture is identical across partitioning, retries, and engines.
    The ``row_number() <= quota`` filter takes Spark's WindowGroupLimit
    rewrite: map tasks pre-prune each stratum before the exchange.

    An empty ``quotas`` map is an empty whitelist: every stratum is
    dropped, so the result is an empty frame with ``docs``'s schema
    (short-circuited — schema inference on an empty quota list would
    otherwise fail)."""
    spark = docs.sparkSession
    if not quotas:
        return docs.filter(F.lit(False))
    qdf = spark.createDataFrame(
        [(k, int(v)) for k, v in quotas.items()],
        [strata_col, "_quota"])
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
        16, 10).cast("long")
    w = (Window.partitionBy(strata_col)
         .orderBy(h.asc(), F.col(id_col).asc()))
    # two-stage limit: the LITERAL max-quota bound is what Spark's
    # WindowGroupLimit rewrite recognizes (map tasks pre-prune every
    # stratum to max(quota) rows before the exchange — the per-stratum
    # column bound alone would ship whole mega-strata); the exact
    # per-stratum quota then refines the survivors
    max_quota = max((int(v) for v in quotas.values()), default=0)
    ranked = (docs.join(F.broadcast(qdf), strata_col)
              .withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= F.lit(max_quota)))
    return (ranked.filter(F.col("_rn") <= F.col("_quota"))
            .drop("_rn", "_quota"))


def incremental_new_pages(current: DataFrame, previous: DataFrame,
                          url_col: str = "url",
                          content_col: str = "html") -> DataFrame:
    """Rows of ``current`` a previous snapshot has not already processed,
    tagged ``change='new'`` (url never seen) or ``'changed'`` (seen, but
    the content hash differs) — the incremental-ingest step that lets a
    monthly 100 TB recrawl reprocess only its delta.

    Shape: both sides reduce to (url, md5(content)) map-side BEFORE any
    shuffle, so the previous snapshot's payload bytes never cross the
    network; the previous side aggregates to one row per url (a bounded
    ``collect_set`` of its hashes — re-crawled urls may carry several);
    the join is a plain url-keyed hash join (AQE-skew-safe,
    co-partitionable with the url-bucketed layout). Unchanged rows drop
    out; every surviving row keeps all of ``current``'s columns.

    NULL content hashes to a sentinel (no md5 output is 8 chars, so it
    cannot collide), so a NULL-content row is classified like any other
    instead of vanishing through three-valued logic: NULL at a
    never-seen url is ``new``, NULL where the previous crawl had real
    content is ``changed``, and NULL at a url whose previous crawl was
    also NULL is unchanged (same content, dropped)."""
    h = F.coalesce(F.md5(F.col(content_col).cast("binary")),
                   F.lit("\x00NULL\x00"))
    prev = (previous
            .select(F.col(url_col).alias("_u"), h.alias("_h"))
            .groupBy("_u")
            .agg(F.collect_set("_h").alias("_prev_hashes")))
    cur = current.withColumn("_h", h)
    joined = cur.join(prev, cur[url_col] == prev["_u"], "left")
    status = (F.when(F.col("_prev_hashes").isNull(), F.lit("new"))
              .when(~F.array_contains("_prev_hashes", F.col("_h")),
                    F.lit("changed")))
    return (joined.withColumn("change", status)
            .filter(F.col("change").isNotNull())
            .drop("_u", "_h", "_prev_hashes"))


def importance_resample(docs: DataFrame, weight_col,
                        id_col: str = "doc_id", salt: str = "",
                        max_copies: int = 16,
                        out_col: str = "copy_idx") -> DataFrame:
    """Weighted resampling WITH repetition — the mixture step that
    realizes per-document sampling weights (quality upsampling, domain
    temperature mixing, DoReMi-style reweighting): a doc with weight w
    keeps ``floor(w)`` full copies plus one more with probability
    ``frac(w)``; w < 1 is a plain Bernoulli keep; w <= 0 or NULL drops.
    The expected copy count is exactly w (capped), and every kept row
    carries ``out_col`` = 0..n-1 so downstream shard packing can spread
    the copies.

    The coin is the same deterministic md5 draw as
    :func:`deterministic_sample` — md5(salt || id) % 10000 against a
    1e-4 probability grid — so the realized sample is stable across
    partitioning, retries, resumes, AND engines; a fresh ``salt`` is an
    independent draw. ``max_copies`` bounds the fan-out against a
    runaway weight column.

    Shape: pure map + bounded explode, no shuffle.
    """
    w = (F.col(weight_col) if isinstance(weight_col, str)
         else weight_col).cast("double")
    wc = F.least(F.coalesce(w, F.lit(0.0)), F.lit(float(max_copies)))
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
        16, 10).cast("long")
    u = (h % 10000) / 10000.0
    n = (F.floor(wc)
         + F.when(u < wc - F.floor(wc), F.lit(1)).otherwise(F.lit(0))) \
        .cast("int")
    return (docs.withColumn("_n", n).filter(F.col("_n") >= 1)
            .withColumn(out_col,
                        F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
            .drop("_n"))
