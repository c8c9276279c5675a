"""Text-analysis operators for training-data pipelines.

All JVM-side DataFrame expressions (whole-stage codegen; no Python UDFs):
language-ID by marker-word profiles, quality scoring, token counting, and
rolling-hash document fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["with_token_counts", "with_quality_features", "with_langid",
           "with_fingerprints", "tf_idf_top_terms", "gopher_quality_filter",
           "decontaminate", "collapse_repeated_tokens", "LANG_MARKERS"]

# tiny marker-word profiles (public-knowledge function words)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "is"),
    "de": ("der", "die", "und", "das", "nicht", "ist"),
    "es": ("el", "la", "que", "de", "los", "es"),
    "fr": ("le", "la", "les", "des", "est", "une"),
}


def _occurrences(col, word: str):
    """Count of whitespace-delimited occurrences of ``word`` (JVM-side).

    Every whitespace run is first normalized to TWO spaces so (a) adjacent
    occurrences ("the the") don't share a delimiter — each gets its own
    surrounding spaces — and (b) newline/tab-delimited occurrences count.
    RE2-safe (no lookarounds), so the DuckDB oracle can mirror it exactly.
    """
    padded = F.concat(F.lit(" "), F.regexp_replace(col, r"\s+", "  "), F.lit(" "))
    return F.size(F.split(padded, f" {word} ", -1)) - 1


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    return (df
            .withColumn("n_tokens_ws", F.size(words))
            .withColumn("n_tokens_bpe_ish",
                        # BPE-flavored proxy: word pieces of <=4 chars
                        F.aggregate(words, F.lit(0),
                                    lambda acc, w: acc + F.ceil(F.length(w) / 4).cast("int"))))


def with_quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    n = F.greatest(F.length(t), F.lit(1))
    words = F.split(F.trim(t), r"\s+")
    n_words = F.greatest(F.size(words), F.lit(1))
    alpha = F.length(F.regexp_replace(t, r"[^a-zA-Z]", ""))
    digits = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}-]", ""))
    upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    stop_hits = None
    for w in LANG_MARKERS["en"]:
        occ = _occurrences(t, w)
        stop_hits = occ if stop_hits is None else stop_hits + occ
    return (df
            .withColumn("q_len", F.length(t))
            .withColumn("q_n_words", F.size(words))
            .withColumn("q_alpha_ratio", F.round(alpha / n, 6))
            .withColumn("q_digit_ratio", F.round(digits / n, 6))
            .withColumn("q_punct_ratio", F.round(punct / n, 6))
            .withColumn("q_upper_ratio", F.round(upper / n, 6))
            .withColumn("q_mean_word_len", F.round((n - n_words + 1) / n_words, 6))
            .withColumn("q_stopword_ratio", F.round(stop_hits / n_words, 6)))


def with_langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Best marker-profile language + its score (deterministic tie-break by
    language code)."""
    t = F.col(text_col)
    scored = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        score = None
        for w in markers:
            occ = _occurrences(t, w)
            score = occ if score is None else score + occ
        scored.append(F.struct(score.alias("score"),
                               F.lit(lang).alias("lang")))
    # max over structs: highest score wins; ties resolve to the
    # lexicographically LAST language code (deterministic)
    best = F.greatest(*scored) if len(scored) > 1 else scored[0]
    return (df
            .withColumn("langid_guess", best["lang"])
            .withColumn("langid_score", best["score"]))


def collapse_repeated_tokens(docs: DataFrame, text_col: str = "text",
                             out_col: str = "text_clean") -> DataFrame:
    """Collapse runs of consecutively repeated tokens ("batch batch batch"
    -> "batch") — the C4/Gopher-family intra-document repetition cleanup,
    entirely JVM-side (indexed array filter; no UDF). Adds ``out_col`` and
    ``n_tokens_removed``."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    kept = F.filter(words, lambda w, i: (i == 0)
                    | (w != F.element_at(words, i)))  # element_at is 1-based
    return (docs
            .withColumn(out_col, F.array_join(kept, " "))
            .withColumn("n_tokens_removed", F.size(words) - F.size(kept)))


def gopher_quality_filter(docs: DataFrame, text_col: str = "text", *,
                          min_words: int = 20, max_words: int = 100000,
                          min_mean_word_len: float = 2.0,
                          max_mean_word_len: float = 12.0,
                          min_alpha_ratio: float = 0.5,
                          min_stopword_hits: int = 1) -> DataFrame:
    """Gopher-family document quality gate (public heuristics: word-count
    bounds, mean word length band, alphabetic ratio, stopword presence).

    Adds per-rule booleans and a combined ``keep`` column — rules stay
    inspectable so a pipeline can log WHY documents were dropped (no
    silent filtering at 100 TB). All JVM-side expressions.
    """
    out = with_quality_features(docs, text_col)
    r_words = (F.col("q_n_words") >= min_words) & (F.col("q_n_words") <= max_words)
    r_wordlen = ((F.col("q_mean_word_len") >= min_mean_word_len)
                 & (F.col("q_mean_word_len") <= max_mean_word_len))
    r_alpha = F.col("q_alpha_ratio") >= min_alpha_ratio
    # exact hit count (re-deriving it from the 6dp-rounded ratio goes wrong
    # past ~1M words); same expression with_quality_features sums
    stop_hits = None
    for w_ in LANG_MARKERS["en"]:
        occ = _occurrences(F.col(text_col), w_)
        stop_hits = occ if stop_hits is None else stop_hits + occ
    r_stop = stop_hits >= min_stopword_hits
    return (out
            .withColumn("rule_word_count", r_words)
            .withColumn("rule_word_len", r_wordlen)
            .withColumn("rule_alpha", r_alpha)
            .withColumn("rule_stopwords", r_stop)
            .withColumn("keep", r_words & r_wordlen & r_alpha & r_stop))


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_id_col: str = "bench_id",
                  gram_col: str = "gram") -> DataFrame:
    """Benchmark decontamination: flag documents containing any benchmark
    n-gram (substring containment — the standard eval-leakage check).

    The benchmark gram set is small by construction (eval suites), so the
    containment join broadcasts it: each doc row is checked against the
    grams with no shuffle of the corpus. Empty grams are dropped —
    contains(text, '') is true for EVERY document, so one blank benchmark
    row would flag the whole corpus and blow up the join output. Returns
    (doc_id, bench_id, gram) match rows.
    """
    b = F.broadcast(benchmark
                    .select(F.col(bench_id_col).alias("bench_id"),
                            F.col(gram_col).alias("gram"))
                    .filter(F.length("gram") > 0))
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    return (d.join(b, F.expr("contains(_t, gram)"))
            .select("doc_id", "bench_id", "gram"))


def tf_idf_top_terms(docs: DataFrame, top_n: int = 5, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-document top-N terms by smoothed tf-idf (the corpus-weighting
    building block for near-dup shingle weighting / quality filters).

    All JVM-side: explode tokens -> tf per (doc, term); df per term
    (distinct docs); idf = ln((N+1)/(df+1)); top-N per doc via row_number
    (WindowGroupLimit pushes the per-group top-k down, so no full sort).
    Shuffles: one on (doc, term), one on term — both uniform keys.
    """
    from pyspark.sql import Window

    terms = docs.select(F.col(id_col).alias("doc_id"),
                        F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
                        .alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (tf.join(df_, "term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("tfidf",
                          F.round(F.col("tf") * F.log((F.col("n_docs") + 1)
                                                      / (F.col("df") + 1)), 6)))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_n)
            .select("doc_id", "term", "tf", "df", "tfidf", "rank"))


def with_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Cryptographic + rolling-hash fingerprints.

    fp_rolling: polynomial rolling hash over word hashes,
    h = (h * 1000003 + xxhash64(word)) mod 2^31-1 — order-sensitive, unlike
    a bag-of-words hash (31-bit domain keeps products in ANSI bigint range).
    """
    t = F.col(text_col)
    p = (1 << 31) - 1
    words = F.split(F.trim(t), r"\s+")
    rolling = F.aggregate(
        F.transform(words, lambda w: F.abs(F.xxhash64(w)) % p),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 1000003 + h) % p)
    return (df
            .withColumn("fp_md5", F.md5(t))
            .withColumn("fp_sha256", F.sha2(t, 256))
            .withColumn("fp_rolling", rolling))
