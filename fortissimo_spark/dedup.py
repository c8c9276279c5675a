"""Deduplication operators for large text corpora.

All operators are pure DataFrame compositions — shingling, hashing, banding,
and verification run JVM-side under whole-stage codegen (no Python UDFs), so
they scale with executors and shuffle only what the algorithm requires:

* ``exact_duplicates``       — hash-groupBy on a content fingerprint.
* ``shingle_sets``           — word n-gram (shingle) sets per doc.
* ``minhash_signatures``     — K permutation minhashes over shingle hashes.
* ``lsh_candidate_pairs``    — band the signatures, bucket-join, emit
  candidate pairs (the only shuffle whose width is controlled by B bands).
* ``verified_near_duplicates`` — exact shingle-set Jaccard on candidates.
* ``simhash64``              — 64-bit SimHash per doc + hamming-band buckets.

MinHash math: h_k(x) = (a_k * x + b_k) mod p with p = 2^31 - 1 (Mersenne),
a_k/b_k drawn deterministically from a seeded generator, over the base
``xxhash64`` shingle hash reduced mod p. The 31-bit domain keeps every
intermediate product under 2^62, inside Spark's ANSI bigint range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["exact_duplicates", "shingle_sets", "minhash_signatures",
           "lsh_candidate_pairs", "lsh_bucket_stats",
           "verified_near_duplicates", "verify_candidates_pruned",
           "simhash64", "duplicate_clusters", "canonicalize",
           "md5_word_hash", "near_duplicate_pairs",
           "duplicate_spans", "remove_duplicate_spans",
           "remove_near_dup_paragraphs"]

_MERSENNE_P = (1 << 31) - 1


def _coeffs(k: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the K permutation hashes."""
    out = []
    state = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        a = (state % (_MERSENNE_P - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        b = state % _MERSENNE_P
        out.append((a, b))
    return out


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", sample_ids: int = 8) -> DataFrame:
    """Groups of byte-identical documents:
    (text_hash, n_copies, first_doc_id, sample_doc_ids).

    Per-group state is BOUNDED: count + min + a row_number-capped id sample
    (``sample_ids`` per group, 0 disables the sample entirely). A boilerplate
    page repeated 10^8 times costs one counter, never a 10^8-element array —
    the unbounded ``collect_list`` this replaces would OOM on exactly the
    groups this operator exists to find."""
    hashed = docs.select(F.sha2(F.col(text_col), 256).alias("text_hash"),
                         F.col(id_col).alias("_id"))
    if not sample_ids:
        return (hashed.groupBy("text_hash")
                .agg(F.count("*").alias("n_copies"),
                     F.min("_id").alias("first_doc_id"))
                .filter(F.col("n_copies") > 1))
    # single pass: the window and the groupBy share the text_hash
    # partitioning, so the source (and its sha2) is scanned exactly once
    # and only one exchange runs; collect_list skips the nulls the
    # row_number cap produces, bounding the sample
    w = Window.partitionBy("text_hash").orderBy("_id")
    marked = hashed.withColumn("_rn", F.row_number().over(w))
    return (marked.groupBy("text_hash")
            .agg(F.count("*").alias("n_copies"),
                 F.min("_id").alias("first_doc_id"),
                 F.sort_array(F.collect_list(
                     F.when(F.col("_rn") <= sample_ids, F.col("_id"))))
                 .alias("sample_doc_ids"))
            .filter(F.col("n_copies") > 1))


def shingle_sets(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingles) — distinct word n-grams, JVM-side via transform/sequence."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    k = F.size(words) - (n - 1)
    shingles = F.when(k <= 0, F.array(F.concat_ws(" ", words))).otherwise(
        F.array_distinct(F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))))
    return docs.select(F.col(id_col).alias("id"), shingles.alias("shingles"))


def minhash_signatures(shingled: DataFrame, num_hashes: int = 128,
                       seed: int = 42) -> DataFrame:
    """(id, shingles, sig[num_hashes]) — min over shingles of each
    permutation hash of xxhash64(shingle).

    Single traversal of the shingle-hash array: one ``F.aggregate``
    carries a ``num_hashes``-length running-min array, updated per shingle
    by zipping literal a/b coefficient arrays (permutation values for this
    hash) against the accumulator with ``least``. The previous shape
    materialized ``num_hashes`` intermediate permuted copies of the whole
    array per row and leaned on Catalyst subexpression elimination to
    avoid re-hashing the shingles 128× — same fix pattern as
    :func:`simhash64`'s single-pass counters. Values are bit-identical to
    the per-coefficient ``array_min`` formulation (same coefficients, same
    modular math, same min)."""
    coeffs = _coeffs(num_hashes, seed)
    a_arr = F.array(*[F.lit(a).cast("long") for a, _ in coeffs])
    b_arr = F.array(*[F.lit(b).cast("long") for _, b in coeffs])
    hashes = F.transform("shingles", lambda s: F.abs(F.xxhash64(s)) % _MERSENNE_P)
    # init = p: every permuted value is in [0, p-1], so one shingle is
    # enough to pull each slot below the sentinel (shingle_sets never
    # emits an empty array)
    sig = F.aggregate(
        hashes,
        F.array_repeat(F.lit(_MERSENNE_P).cast("long"), num_hashes),
        lambda acc, h: F.zip_with(
            F.zip_with(a_arr, b_arr, lambda a, b: (h * a + b) % _MERSENNE_P),
            acc, lambda perm, cur: F.least(perm, cur)))
    return shingled.withColumn("sig", sig)


def _banded(signed: DataFrame, bands: int) -> DataFrame:
    """(id, band, band_hash) — one row per (doc, band), hashing each
    signature slice. Shared by candidate generation and bucket stats."""
    sig_size_expr = F.size("sig")
    # rows per band r = len(sig)/bands, computed with fixed bands
    return (signed
            .select("id", F.posexplode(F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(F.concat_ws(
                    ",", F.transform(
                        F.slice("sig", b * (sig_size_expr / bands).cast("int") + 1,
                                (sig_size_expr / bands).cast("int")),
                        lambda v: v.cast("string"))))))
                .alias("band", "band_hash")))


def lsh_candidate_pairs(signed: DataFrame, bands: int = 32,
                        max_bucket_size: int = 1000) -> DataFrame:
    """Band the signature, bucket-join on (band, band_hash), emit (id_a, id_b)
    candidate pairs (id_a < id_b). Shuffle key = (band, hash(slice)).

    Degenerate-bucket guard: a bucket is capped at ``max_bucket_size``
    members (first K by id, deterministic), so one hot bucket — e.g. a
    constant boilerplate column — contributes at most K(K-1)/2 pairs instead
    of going quadratic in the corpus. **This is a recall trade-off**: a
    shared (band, band_hash) bucket only means one matching signature slice,
    so members dropped past the cap can miss a true near-dup in every band
    and survive canonicalization. Use :func:`lsh_bucket_stats` with the same
    arguments to see exactly which buckets were truncated (no silent caps);
    raise the cap — or 0 to disable — when over-capacity buckets carry real
    near-dup structure rather than boilerplate. Exact-duplicate rows should
    be removed by :func:`exact_duplicates` upstream so they don't consume
    bucket capacity."""
    buckets = _banded(signed, bands)
    if max_bucket_size:
        w = Window.partitionBy("band", "band_hash").orderBy("id")
        buckets = (buckets.withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") <= max_bucket_size).drop("_rn"))
    joined = (buckets.alias("x")
              .join(buckets.alias("y"),
                    (F.col("x.band") == F.col("y.band"))
                    & (F.col("x.band_hash") == F.col("y.band_hash"))
                    & (F.col("x.id") < F.col("y.id"))))
    return (joined.select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct())


def lsh_bucket_stats(signed: DataFrame, bands: int = 32,
                     max_bucket_size: int = 1000) -> DataFrame:
    """Observability for the bucket cap: (band, band_hash, n_members,
    n_dropped) for every bucket LARGER than ``max_bucket_size`` — the
    buckets whose members past the cap were silently excluded from
    candidate generation. Empty result = the cap did not bite and
    candidate recall is whatever the band layout gives. Run this alongside
    :func:`lsh_candidate_pairs` (same ``signed``/``bands``/cap) and log the
    counts; at 100 TB a hot bucket here usually means boilerplate that
    exact-dedup should have removed upstream."""
    return (_banded(signed, bands)
            .groupBy("band", "band_hash")
            .agg(F.count("*").alias("n_members"))
            .filter(F.col("n_members") > max_bucket_size)
            .withColumn("n_dropped", F.col("n_members") - max_bucket_size))


def verified_near_duplicates(shingled: DataFrame, candidates: DataFrame,
                             threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs only."""
    a = shingled.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = shingled.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    joined = candidates.join(a, "id_a").join(b, "id_b")
    jaccard = (F.size(F.array_intersect("sh_a", "sh_b"))
               / F.size(F.array_union("sh_a", "sh_b")))
    return (joined.select("id_a", "id_b", F.round(jaccard, 6).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def verify_candidates_pruned(docs: DataFrame, candidates: DataFrame, *,
                             id_col: str = "doc_id", text_col: str = "text",
                             n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact-verify ``candidates`` against ``docs`` PRUNED to candidate ids
    (broadcast semi-join applied before shingling) — the single shared
    implementation of the verify stage for :func:`near_duplicate_pairs`
    and the resumable :class:`~fortissimo_spark.dedup_job.DedupJob`, so a
    fix to the pruning logic cannot diverge between them."""
    cand_ids = (candidates.select(F.col("id_a").alias(id_col))
                .union(candidates.select(F.col("id_b").alias(id_col)))
                .distinct())
    pruned = docs.join(F.broadcast(cand_ids), id_col, "left_semi")
    return verified_near_duplicates(shingle_sets(pruned, id_col, text_col, n),
                                    candidates, threshold)


def near_duplicate_pairs(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", *, n: int = 3,
                         num_hashes: int = 128, bands: int = 32,
                         threshold: float = 0.5,
                         max_bucket_size: int = 1000,
                         verify_docs: DataFrame | None = None) -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection: shingle → sign → band →
    bucket-join → exact-verify.

    Verify-side pruning: the candidate pair set is materialized once
    (``localCheckpoint`` — it is small by construction, LSH buckets are
    capped), then each exact-verify side scans only the rows whose ids
    appear in some candidate pair, via a broadcast semi-join applied
    BEFORE shingling. Without this the corpus would be scanned and
    re-shingled three times (once to sign, once per verify side); with it
    the full corpus is shingled exactly once and the verify recompute
    touches only the (typically tiny) candidate set.

    ``verify_docs``: frame to read verify-side text from; defaults to
    ``docs``. :func:`canonicalize` passes the raw pre-exact-dedup corpus
    here so the verify scans skip its row_number window — sound whenever
    ids are unique, because candidate ids are a subset of ``docs`` ids.
    """
    shingled = shingle_sets(docs, id_col, text_col, n)
    signed = minhash_signatures(shingled, num_hashes)
    candidates = lsh_candidate_pairs(signed.select("id", "sig"), bands,
                                     max_bucket_size)
    candidates = candidates.localCheckpoint(eager=True)
    src = docs if verify_docs is None else verify_docs
    return verify_candidates_pruned(src, candidates, id_col=id_col,
                                    text_col=text_col, n=n,
                                    threshold=threshold)


def canonicalize(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", *, n: int = 3,
                 num_hashes: int = 128, bands: int = 32,
                 threshold: float = 0.5,
                 max_bucket_size: int = 1000,
                 max_cluster_iterations: int = 20) -> DataFrame:
    """The dedup endgame: one canonical document per duplicate group.

    1. exact dedup — keep the min-id row per byte-identical text
       (row_number over the content hash, one shuffle);
    2. near-dup pairs over the survivors (MinHash-LSH + exact verify);
    3. connected components over the pairs; drop every member that is not
       its cluster's minimum id (anti-join — losers only, never the full
       corpus, cross the exchange).

    Returns the surviving rows of ``docs`` (same schema). Requires unique
    ids in ``docs`` (standard for a corpus key): the exact-verify sides
    read the RAW corpus pruned to candidate ids (``verify_docs=docs``),
    and exact-dedup is expressed as a ONE-TIME window whose only output is
    the (small) exact-LOSER id set, materialized once — every survivor
    consumer is then a plain anti-join on ids. The exchange+sort of the
    full corpus happens exactly once; the sign path and the final result
    are anti-joins AQE turns into broadcasts whenever the loser sets are
    small (and plain exchanges — still cheaper than a sort — when a
    pathological corpus makes them huge).
    """
    w = Window.partitionBy(F.sha2(F.col(text_col), 256)).orderBy(id_col)
    exact_losers = (docs.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") > 1).select(id_col))
    exact_losers = exact_losers.localCheckpoint(eager=True)
    survivors = docs.join(exact_losers, id_col, "left_anti")
    pairs = near_duplicate_pairs(survivors, id_col, text_col, n=n,
                                 num_hashes=num_hashes, bands=bands,
                                 threshold=threshold,
                                 max_bucket_size=max_bucket_size,
                                 verify_docs=docs)
    clusters = duplicate_clusters(pairs.select("id_a", "id_b"),
                                  max_cluster_iterations)
    near_losers = (clusters.filter(F.col("id") != F.col("cluster_id"))
                   .select(F.col("id").alias(id_col)))
    return survivors.join(near_losers, id_col, "left_anti")


def md5_word_hash(w):
    """60-bit word hash both Spark and DuckDB can compute identically:
    the first 15 hex chars of md5 parsed as an integer (always positive).
    DuckDB equivalent: ``CAST('0x' || substr(md5(w), 1, 15) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long")


def duplicate_clusters(pairs: DataFrame, max_iterations: int = 20) -> DataFrame:
    """Connected components over near-dup pairs -> (id, cluster_id).

    The dedup endgame: near-dup PAIRS must become GROUPS so one canonical
    doc per group survives. Iterative min-label propagation expressed as
    DataFrame joins (alternating large-star/small-star-style relaxation):
    every node adopts the smallest label among itself and its neighbors;
    rounds needed = component diameter, which is tiny for the clique/star
    shapes near-dup graphs take. Each round is ONE Spark action: the
    changed-label flag is computed inside the relaxation select, the round's
    frame is (lazily) localCheckpoint-ed, and the convergence count is the
    action that materializes it — later rounds reuse the checkpointed
    blocks, so nothing is computed twice (r2 ran a second join+count action
    per round that re-derived the change set from scratch).

    Scale note: label propagation keeps only (id, label) state — never an
    adjacency list per node — and the pair input is already bounded by the
    LSH bucket caps upstream. cluster_id = min doc id of the component (a
    stable canonical representative).
    """
    edges = (pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
             .union(pairs.select(F.col("id_b").alias("a"),
                                 F.col("id_a").alias("b"))))
    labels = (edges.select(F.col("a").alias("id"))
              .union(edges.select(F.col("b").alias("id")))
              .distinct()
              .withColumn("label", F.col("id")))
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (edges
                        .join(labels.withColumnRenamed("id", "b")
                              .withColumnRenamed("label", "nb_label"), "b")
                        .groupBy("a").agg(F.min("nb_label").alias("min_nb")))
        relaxed = F.coalesce(F.col("min_nb"), F.col("label"))
        updated = (labels
                   .join(neighbor_min.withColumnRenamed("a", "id"), "id", "left")
                   .select("id",
                           F.least(F.col("label"), relaxed).alias("label"),
                           (relaxed < F.col("label")).alias("_chg")))
        # lazy checkpoint: the count below is the single action that both
        # materializes this round's labels (lineage cut) and decides
        # convergence; the next round's join reads the checkpointed blocks
        updated = updated.localCheckpoint(eager=False)
        changed = updated.filter(F.col("_chg")).count()
        labels = updated.drop("_chg")
        if changed == 0:
            converged = True
            break
    if not converged:
        # the final allowed round may itself have completed convergence —
        # verify with one read-only relaxation before declaring failure
        neighbor_min = (edges
                        .join(labels.withColumnRenamed("id", "b")
                              .withColumnRenamed("label", "nb_label"), "b")
                        .groupBy("a").agg(F.min("nb_label").alias("min_nb")))
        would_change = (labels
                        .join(neighbor_min.withColumnRenamed("a", "id"), "id")
                        .filter(F.col("min_nb") < F.col("label")).count())
        if would_change:
            raise RuntimeError(
                f"duplicate_clusters did not converge in {max_iterations} "
                "rounds (component diameter exceeds the cap) — raise "
                "max_iterations")
    return labels.select("id", F.col("label").alias("cluster_id"))


def simhash64(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", *, num_bits: int = 64,
              word_hash=None) -> DataFrame:
    """(id, simhash) — SimHash over word hashes, fully JVM-side.

    For each bit b: count(+1/-1 over words by bit b of hash(word)); the
    simhash sets bit b when the count is positive. Single traversal of the
    word-hash array: one ``F.aggregate`` carries an array of ``num_bits``
    counters (zip_with against a literal mask array), then one more pass
    folds the counters into the signature — O(W) array visits per row, not
    O(64·W) separate aggregates.

    ``word_hash`` defaults to ``xxhash64`` (production). Pass
    :func:`md5_word_hash` with ``num_bits=60`` for the oracle-verifiable
    variant (DuckDB has no xxhash64).
    """
    if word_hash is None:
        def word_hash(w):
            return F.xxhash64(w)
    # signed-long mask literals (bit 63 wraps negative)
    masks = [(1 << b) if b < 63 else (1 << b) - (1 << 64)
             for b in range(num_bits)]
    mask_arr = F.array(*[F.lit(m).cast("long") for m in masks])

    words = F.split(F.trim(F.col(text_col)), r"\s+")
    hashes = F.transform(words, word_hash)
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), num_bits),
        lambda acc, h: F.zip_with(
            acc, mask_arr,
            lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1)))
    sim = F.aggregate(
        F.zip_with(counts, mask_arr,
                   lambda c, m: F.when(c > 0, m).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"), lambda a, v: a + v)
    return docs.select(F.col(id_col).alias("id"), sim.alias("simhash"))


def duplicate_spans(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", *, k: int = 50,
                    min_count: int = 2,
                    materialize_grams: bool = False,
                    prefilter: str | None = "auto",
                    broadcast_dup_limit: int = 4_000_000,
                    bloom_dup_limit: int = 64_000_000) -> DataFrame:
    """Substring-level exact dedup, finder half (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499, the ExactSubstr setting): every maximal token-index
    span ``[s, e)`` covered by ``k``-token grams that occur at least
    ``min_count`` times corpus-wide (including repeats inside one
    document). This catches the dominant residual duplication in real
    crawls — repeated 50-token spans *inside* otherwise-unique pages —
    that document- and paragraph-granular dedup can't see.

    Shape (all JVM-side, no Python):

    1. one row per token position: ``(doc_id, pos, gram_hash)`` where the
       gram hash is :func:`md5_word_hash` of the k-token window — the
       corpus-token-count explode that IS the cost of substring dedup
       (the suffix-array formulation touches the same volume);
    2. ``groupBy(gram_hash).count()`` — map-side partial aggregation
       collapses a 10^9-copy boilerplate gram to one row per map task;
    3. join positions back to the >=min_count hashes (AQE skew-join
       splits hot boilerplate hashes; no pair enumeration anywhere, so a
       mega-hot gram costs O(copies), never O(copies^2));
    4. merge flagged windows into maximal spans per doc with a
       gaps-and-islands pass (lag + running sum over a per-doc window —
       per-doc rows are bounded by the doc's own token count).

    Returns ``(doc_id, s, e)`` with ``s``/``e`` in token indices over
    ``split(trim(text), '\\s+')``.

    The gram subtree feeds BOTH the count aggregation and the join back,
    so by default the corpus is scanned (and re-shingled) twice — usually
    the right trade at warehouse scale, where re-scanning columnar input
    is cheaper than storing a corpus-token-count intermediate.
    ``materialize_grams=True`` pins the gram table once
    (``localCheckpoint``) for when compute dominates storage (expensive
    upstream transforms, small-to-mid corpora).

    **Join-back pre-filter** (``prefilter="auto"``, the default): the
    count exchange is irreducible (exact global ``min_count`` needs one
    row per distinct gram to meet its peers), but it only carries
    ``(long, long)`` rows after map-side partial aggregation. The
    EXPENSIVE exchange is the join back — ``(doc_id, pos, gh)`` for
    every corpus token position, shuffled for a sort-merge join even
    though at crawl-like duplication rates ~90% of positions hold
    singleton grams that cannot match. ``"auto"`` therefore pins the
    duplicate-hash set once (eager ``localCheckpoint`` — the count
    aggregation runs at call time), counts it, and picks by size:

    * ``n_dup <= broadcast_dup_limit`` (~32 MB of longs): broadcast-hash
      semi-filter — the gram side of the join back never shuffles AT
      ALL; flagged positions flow map-side into the per-doc window.
    * ``n_dup <= bloom_dup_limit``: a bit-packed Bloom filter (one hash
      probe, ``8 * n_dup`` bits packed into ``(block, bits64)`` rows —
      ~2 bytes/dup vs 8 for the exact set) broadcast-joins on the block
      id and drops ~87% of singleton positions BEFORE the exact
      shuffled join; false positives (~n/W = 12.5%) just ride through
      the exact join and drop there, so results are bit-identical.
    * larger: the plain shuffled join (the honest linear cost — no
      sub-linear structure can decide count>=2 at that cardinality).

    ``prefilter=None`` keeps the fully-lazy single-plan shape.
    ``duplicate_spans.last_strategy`` records the decision (no silent
    tier changes). Results are identical under every tier.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = (docs
             .select(F.col(id_col).alias("doc_id"), toks.alias("w"))
             .filter(F.size("w") >= k)
             .select("doc_id",
                     F.posexplode(F.transform(
                         F.sequence(F.lit(0), F.size("w") - k),
                         lambda i: md5_word_hash(
                             F.concat_ws(" ", F.slice("w", i + 1, k)))))
                     .alias("pos", "gh")))
    if materialize_grams:
        grams = grams.localCheckpoint(eager=True)
    dup_hashes = (grams.groupBy("gh").agg(F.count("*").alias("_n"))
                  .filter(F.col("_n") >= min_count)
                  .select("gh"))
    if prefilter == "auto":
        dup_hashes = dup_hashes.localCheckpoint(eager=True)
        n_dup = dup_hashes.count()
        if n_dup <= broadcast_dup_limit:
            duplicate_spans.last_strategy = {
                "strategy": "broadcast", "n_dup": n_dup}
            flagged = (grams.join(F.broadcast(dup_hashes), "gh")
                       .select("doc_id", "pos"))
        elif n_dup <= bloom_dup_limit:
            nbits = max(1 << 13, 1 << (8 * n_dup - 1).bit_length())
            blocks = (dup_hashes
                      .select(F.shiftrightunsigned(
                          F.col("gh").bitwiseAND(nbits - 1), 6)
                          .alias("_blk"),
                          F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                                 f"CAST(gh & {nbits - 1} AS INT) & 63)")
                          .alias("_m"))
                      .groupBy("_blk").agg(F.bit_or("_m").alias("_bits")))
            duplicate_spans.last_strategy = {
                "strategy": "bloom", "n_dup": n_dup, "bloom_bits": nbits}
            cand = (grams
                    .withColumn("_blk", F.shiftrightunsigned(
                        F.col("gh").bitwiseAND(nbits - 1), 6))
                    .join(F.broadcast(blocks), "_blk")
                    .filter(F.expr(
                        f"(_bits & shiftleft(CAST(1 AS BIGINT), "
                        f"CAST(gh & {nbits - 1} AS INT) & 63)) != 0"))
                    .select("doc_id", "pos", "gh"))
            flagged = cand.join(dup_hashes, "gh").select("doc_id", "pos")
        else:
            duplicate_spans.last_strategy = {
                "strategy": "shuffle", "n_dup": n_dup}
            flagged = grams.join(dup_hashes, "gh").select("doc_id", "pos")
    else:
        duplicate_spans.last_strategy = {"strategy": "lazy", "n_dup": None}
        flagged = grams.join(dup_hashes, "gh").select("doc_id", "pos")

    w = Window.partitionBy("doc_id").orderBy("pos")
    # windows [prev, prev+k) and [pos, pos+k) overlap or touch iff
    # pos <= prev + k; positions are increasing, so the running island
    # end is always last_pos + k and a lag() test is exact
    brk = F.when(F.col("pos") - F.lag("pos").over(w) > k, 1).otherwise(0)
    islands = (flagged.withColumn("_brk", brk)
               .withColumn("_isl", F.sum("_brk").over(
                   w.rowsBetween(Window.unboundedPreceding, 0))))
    return (islands.groupBy("doc_id", "_isl")
            .agg(F.min("pos").alias("s"),
                 (F.max("pos") + k).alias("e"))
            .select("doc_id", "s", "e"))


def remove_duplicate_spans(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", *, k: int = 50,
                           min_count: int = 2,
                           out_col: str = "text_clean",
                           prefilter: str | None = "auto") -> DataFrame:
    """Substring-level exact dedup, rewriter half: drop every token inside
    a :func:`duplicate_spans` span and rejoin the survivors with single
    spaces. Like Lee et al.'s ExactSubstr remover this operates on the
    token sequence, so output text is whitespace-normalized (a normalizer,
    not a lossless transform — same contract as
    ``remove_duplicate_paragraphs``). Adds ``n_tokens_removed``.

    The span list rides back to each doc as one array column (bounded by
    the doc's own token count); token filtering is an index lambda under
    whole-stage codegen — no Python, no second corpus scan.
    """
    spans = duplicate_spans(docs, id_col, text_col, k=k,
                            min_count=min_count, prefilter=prefilter)
    span_arr = (spans.groupBy("doc_id")
                .agg(F.array_sort(F.collect_list(F.struct("s", "e")))
                     .alias("_spans")))
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = (docs.select(F.col(id_col).alias("doc_id"), toks.alias("_w"))
            .join(span_arr, "doc_id", "left"))
    in_span = lambda i: F.exists(  # noqa: E731
        "_spans", lambda sp: (i >= sp["s"]) & (i < sp["e"]))
    kept = F.when(F.col("_spans").isNull(), F.col("_w")).otherwise(
        F.filter("_w", lambda x, i: ~in_span(i)))
    return base.select(
        F.col("doc_id").alias(id_col),
        F.array_join(kept, " ").alias(out_col),
        (F.size("_w") - F.size(kept)).cast("int")
        .alias("n_tokens_removed"))


def remove_near_dup_paragraphs(docs: DataFrame, id_col: str = "doc_id",
                               text_col: str = "text", *,
                               threshold: float = 0.8, shingle_n: int = 3,
                               num_hashes: int = 64, bands: int = 32,
                               min_words: int = 5,
                               max_paras: int = 100_000,
                               out_col: str = "text_clean") -> DataFrame:
    """FUZZY corpus-wide paragraph dedup (the RefinedWeb/MassiveText
    rule one level above exact paragraph matching): paragraphs whose
    word-shingle Jaccard reaches ``threshold`` cluster across the whole
    corpus, and only the cluster's canonical copy (smallest paragraph
    id) survives — boilerplate that mutates a token per site (年份,
    brand, counter) slips exact dedup but not this. Paragraphs under
    ``min_words`` words skip dedup entirely (always kept): micro-lines
    would otherwise cluster on trivial shingles. Returns (id, text,
    ``out_col``, n_paras_removed) with survivors rejoined in original
    order.

    This is the document-level MinHash chain re-aimed at paragraph
    granularity, reusing every stage unchanged — shingle_sets ->
    minhash_signatures -> banded LSH (bucket caps + observability) ->
    EXACT Jaccard verification -> min-label connected components — on
    ids ``doc_id * max_paras + pos`` (documents above ``max_paras``
    paragraphs would alias; raise it for pathological corpora). Scale
    shape is the chain's own (no new shuffles) plus the same
    anti-join + one doc-id regroup reassembly as
    remove_duplicate_paragraphs."""
    d = docs.select(F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("text"))
    paras = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), r"\n\n", -1))
        .alias("pos", "para")) \
        .withColumn("_pid", F.col("doc_id") * max_paras + F.col("pos"))
    nw = F.size(F.filter(F.split(F.trim(F.col("para")), r"\s+"),
                         lambda x: x != ""))
    elig = paras.filter(nw >= min_words)
    sh = shingle_sets(elig, "_pid", "para", shingle_n)
    cands = lsh_candidate_pairs(minhash_signatures(sh, num_hashes), bands)
    ver = verified_near_duplicates(sh, cands, threshold)
    clusters = duplicate_clusters(ver.select("id_a", "id_b"))
    losers = clusters.filter(F.col("id") != F.col("cluster_id")) \
        .select(F.col("id").alias("_pid"))
    kept = paras.join(losers, "_pid", "left_anti")
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct(F.col("pos"), F.col("para")))),
                            lambda s: s["para"]),
                        "\n\n").alias(out_col),
                    F.count("*").alias("_kept")))
    totals = d.select("doc_id", "text",
                      F.size(F.split(F.col("text"), r"\n\n", -1))
                      .alias("_total"))
    return (totals.join(rebuilt, "doc_id", "left")
            .select(F.col("doc_id").alias(id_col),
                    F.col("text").alias(text_col),
                    F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
                    (F.col("_total") - F.coalesce(F.col("_kept"), F.lit(0)))
                    .cast("int").alias("n_paras_removed")))
