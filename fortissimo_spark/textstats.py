"""Text-analysis operators for training-data pipelines.

All JVM-side DataFrame expressions (whole-stage codegen; no Python UDFs):
language-ID by marker-word profiles, quality scoring, token counting,
Gopher-family repetition/format rules, and rolling-hash fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["with_token_counts", "with_quality_features", "with_langid",
           "with_fingerprints", "tf_idf_top_terms", "gopher_quality_filter",
           "decontaminate", "collapse_repeated_tokens",
           "remove_duplicate_paragraphs", "strip_host_boilerplate",
           "train_quality_classifier",
           "score_quality", "with_script_ratios", "redact_pii",
           "with_sentence_stats", "normalize_text",
           "inverted_index", "index_segment", "index_from_segments",
           "bm25_search", "bm25f_search", "best_snippet", "zipf_stats",
           "LANG_MARKERS", "SCRIPT_CLASSES", "PII_PATTERNS"]

# C0 controls except \t \n \r, plus DEL and the C1 block — the bytes a
# pre-tokenization cleanup strips (same class in Java regex and RE2, so
# the oracle can run the identical pattern)
CONTROL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]"


def normalize_text(docs: DataFrame, text_col: str = "text", *,
                   form: str = "NFC", strip_controls: bool = True,
                   out_col: str = "text_norm") -> DataFrame:
    """Unicode normalization (the pre-tokenization step every
    training-data pipeline runs: decomposed accents, compatibility
    forms) + optional control-character strip.

    Spark has NO built-in Unicode-normalization expression, so this is
    the documented pandas-UDF case — Arrow-batched ``unicodedata``
    vectorized over each batch, never row-at-a-time Python, map-side
    only (no shuffle). The control strip stays JVM-side
    (``regexp_replace`` over :data:`CONTROL_CLASS`)."""
    import pandas  # noqa: F401 — resolves the UDF type hints below
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    def _norm_fn(s: "pandas.Series") -> "pandas.Series":
        import unicodedata
        return s.map(lambda t: None if t is None
                     else unicodedata.normalize(form, t))
    _norm_fn.__annotations__ = {"s": pandas.Series, "return": pandas.Series}
    _norm = pandas_udf(_norm_fn, "string")

    col = _norm(F.col(text_col))
    if strip_controls:
        col = F.regexp_replace(col, CONTROL_CLASS, "")
    return docs.withColumn(out_col, col)

# tiny marker-word profiles (public-knowledge function words)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "is"),
    "de": ("der", "die", "und", "das", "nicht", "ist"),
    "es": ("el", "la", "que", "de", "los", "es"),
    "fr": ("le", "la", "les", "des", "est", "une"),
    "it": ("il", "la", "che", "di", "non", "per"),
    "pt": ("o", "que", "de", "não", "uma", "com"),
    "nl": ("de", "het", "een", "van", "niet", "ik"),
    "sv": ("och", "att", "det", "som", "inte", "av"),
}

# Unicode scripts for codepoint-ratio detection: (name, Java regex class,
# RE2/DuckDB class) — marker-word langid is Latin-script-only, so script
# ratios are the first gate a multilingual crawl needs (CJK/Cyrillic/
# Arabic documents score 0 on every Latin marker profile)
SCRIPT_CLASSES: tuple[tuple[str, str, str], ...] = (
    ("latin", r"\p{IsLatin}", r"\p{Latin}"),
    ("cyrillic", r"\p{IsCyrillic}", r"\p{Cyrillic}"),
    ("han", r"\p{IsHan}", r"\p{Han}"),
    ("arabic", r"\p{IsArabic}", r"\p{Arabic}"),
    ("devanagari", r"\p{IsDevanagari}", r"\p{Devanagari}"),
    ("greek", r"\p{IsGreek}", r"\p{Greek}"),
)

# the padded whitespace-normalized text every marker count splits against;
# materialized ONCE per operator (see _with_ws_norm) instead of one
# regexp_replace per marker word
_NORM_COL = "_ws_norm"


def _with_ws_norm(df: DataFrame, text_col: str) -> DataFrame:
    """Add the padded two-space-normalized text column used by
    :func:`_occurrences_in_norm`.

    Every whitespace run is normalized to TWO spaces so (a) adjacent
    occurrences ("the the") don't share a delimiter — each gets its own
    surrounding spaces — and (b) newline/tab-delimited occurrences count.
    RE2-safe (no lookarounds), so the DuckDB oracle can mirror it exactly.

    Computed once per operator and referenced by every marker-word count:
    the normalized column is used many times, which stops Catalyst's
    CollapseProject from inlining (duplicating) the non-cheap
    regexp_replace — one regexp_replace per query by construction, not by
    optimizer courtesy. Callers drop the column before returning.
    """
    padded = F.concat(F.lit(" "),
                      F.regexp_replace(F.col(text_col), r"\s+", "  "),
                      F.lit(" "))
    return df.withColumn(_NORM_COL, padded)


def _occurrences_in_norm(word: str):
    """Count of whitespace-delimited occurrences of ``word`` against the
    pre-normalized ``_ws_norm`` column (JVM-side split, no regex)."""
    return F.size(F.split(F.col(_NORM_COL), f" {word} ", -1)) - 1


def _stop_hits_expr():
    """Sum of English marker-word occurrences over ``_ws_norm``."""
    total = None
    for w in LANG_MARKERS["en"]:
        occ = _occurrences_in_norm(w)
        total = occ if total is None else total + occ
    return total


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
    return (_with_ws_norm(df, text_col)
            .withColumn("q_len", F.length(t))
            .withColumn("q_n_words", F.size(words))
            .withColumn("q_alpha_ratio", F.round(alpha / n, 6))
            .withColumn("q_digit_ratio", F.round(digits / n, 6))
            .withColumn("q_punct_ratio", F.round(punct / n, 6))
            .withColumn("q_upper_ratio", F.round(upper / n, 6))
            .withColumn("q_mean_word_len", F.round((n - n_words + 1) / n_words, 6))
            .withColumn("q_stopword_ratio",
                        F.round(_stop_hits_expr() / n_words, 6))
            .drop(_NORM_COL))


def with_langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Best marker-profile language + its score (deterministic tie-break by
    language code). One whitespace normalization feeds all
    ``len(LANG_MARKERS) * 6`` marker counts (48 at the shipped 8
    languages)."""
    scored = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        score = None
        for w in markers:
            occ = _occurrences_in_norm(w)
            score = occ if score is None else score + occ
        scored.append(F.struct(score.alias("score"),
                               F.lit(lang).alias("lang")))
    # max over structs: highest score wins; ties resolve to the
    # lexicographically LAST language code (deterministic)
    best = F.greatest(*scored) if len(scored) > 1 else scored[0]
    return (_with_ws_norm(df, text_col)
            .withColumn("langid_guess", best["lang"])
            .withColumn("langid_score", best["score"])
            .drop(_NORM_COL))


def with_script_ratios(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-script character ratios + dominant script (JVM-side regex
    counts over Unicode script classes; Java ``\\p{IsX}`` here, RE2
    ``\\p{X}`` in the DuckDB oracle — same script semantics).

    ``script_guess`` = the highest-ratio script among
    :data:`SCRIPT_CLASSES` (ties resolve to the lexicographically LAST
    name, deterministic), or 'other' when none of them appear — the
    routing gate in front of the Latin-marker language ID."""
    t = F.col(text_col)
    n = F.greatest(F.length(t), F.lit(1))
    out = df
    scored = []
    for name, java_cls, _re2 in SCRIPT_CLASSES:
        cnt = F.length(t) - F.length(F.regexp_replace(t, java_cls, ""))
        out = out.withColumn(f"script_{name}_ratio", F.round(cnt / n, 6))
        scored.append(F.struct(F.col(f"script_{name}_ratio").alias("r"),
                               F.lit(name).alias("s")))
    best = F.greatest(*scored)
    return out.withColumn(
        "script_guess",
        F.when(best["r"] > 0, best["s"]).otherwise(F.lit("other")))


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


def _clean_lines(t, sep: str):
    """Trimmed non-empty segments after splitting on ``sep`` (regex)."""
    return F.filter(F.transform(F.split(t, sep, -1), lambda s: F.trim(s)),
                    lambda s: F.length(s) > 0)


def _sum_len(arr):
    return F.aggregate(arr, F.lit(0).cast("long"),
                       lambda acc, s: acc + F.length(s))


def _top_gram_char_frac(words, n: int, total_chars):
    """Max over REPEATED word n-grams of count(gram) * char_len(gram), as a
    fraction of ``total_chars`` — the Gopher "fraction of characters
    contained in the most frequent n-gram" statistic. Grams occurring once
    don't count (a lone n-gram is a large fraction of any short clean doc;
    the public reimplementations gate on count >= 2 for the same reason),
    so a document with no repeated n-gram scores 0.

    Deterministic without tie-breaks (max of products) and shuffle-free:
    sort the gram array, then one aggregate pass tracks the current run and
    the best count*len product — O(W log W) per row, all JVM-side."""
    k = F.size(words) - (n - 1)
    grams = F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(0), k - 1),
                    lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))))
    run_len = lambda acc, g: F.when(  # noqa: E731
        g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
    best = F.aggregate(
        F.array_sort(grams),
        F.struct(F.lit("").alias("prev"),
                 F.lit(0).cast("long").alias("run"),
                 F.lit(0).cast("long").alias("best")),
        lambda acc, g: F.struct(
            g.alias("prev"),
            run_len(acc, g).alias("run"),
            # only runs of length >= 2 (g == prev) can take the max
            F.greatest(acc["best"],
                       F.when(g == acc["prev"],
                              run_len(acc, g) * F.length(g))
                       .otherwise(F.lit(0).cast("long"))).alias("best")),
        lambda acc: acc["best"])
    return F.round(best / F.greatest(total_chars, F.lit(1)), 6)


def gopher_quality_filter(docs: DataFrame, text_col: str = "text", *,
                          min_words: int = 20, max_words: int = 100000,
                          min_mean_word_len: float = 2.0,
                          max_mean_word_len: float = 12.0,
                          min_alpha_ratio: float = 0.5,
                          min_stopword_hits: int = 1,
                          max_dup_line_frac: float = 0.30,
                          max_dup_para_frac: float = 0.30,
                          max_dup_line_char_frac: float = 0.20,
                          max_dup_para_char_frac: float = 0.20,
                          max_top2gram_char_frac: float = 0.20,
                          max_top3gram_char_frac: float = 0.18,
                          max_top4gram_char_frac: float = 0.16,
                          max_symbol_word_ratio: float = 0.10,
                          max_bullet_line_frac: float = 0.90,
                          max_ellipsis_line_frac: float = 0.30) -> DataFrame:
    """Gopher-family document quality gate — the full public rule battery.

    Core rules (word-count bounds, mean word length band, alphabetic ratio,
    stopword presence) plus the repetition/format rules that catch SEO spam
    and boilerplate the length gates miss:

    * duplicate-line / duplicate-paragraph fraction — share of segments
      (trimmed, non-empty; paragraphs split on blank lines) that repeat an
      earlier identical segment;
    * duplicate-line / duplicate-paragraph CHARACTER fraction — characters
      in repeat occurrences over characters in all segments
      (``sum - sum(distinct)`` over segment lengths);
    * top 2/3/4-gram character fraction — max over word n-grams of
      ``count * char_len`` over total text length;
    * symbol-to-word ratio — '#' and '...' occurrences per word;
    * bullet-line / ellipsis-line fraction — lines starting with a bullet
      (•, -, *) / ending with '...' or '…'.

    Adds per-rule fraction columns and booleans plus a combined ``keep`` —
    rules stay inspectable so a pipeline can log WHY documents were dropped
    (no silent filtering at 100 TB). All JVM-side, shuffle-free (array
    sort + aggregate per row; no explode, no groupBy). Rule booleans
    compare the 6dp-ROUNDED fractions so the DuckDB oracle can mirror every
    threshold decision exactly.
    """
    t = F.col(text_col)
    n_chars = F.greatest(F.length(t), F.lit(1))
    words = F.split(F.trim(t), r"\s+")
    n_words = F.greatest(F.size(words), F.lit(1))

    lines = _clean_lines(t, r"\n")
    paras = _clean_lines(t, r"\n\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))

    def dup_frac(arr):
        return F.round((F.size(arr) - F.size(F.array_distinct(arr)))
                       / F.greatest(F.size(arr), F.lit(1)), 6)

    def dup_char_frac(arr):
        total = _sum_len(arr)
        return F.round((total - _sum_len(F.array_distinct(arr)))
                       / F.greatest(total, F.lit(1)), 6)

    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    # both ASCII "..." and U+2026 "…" count as ellipses, matching the
    # ellipsis-line rule below — otherwise "…"-heavy spam passes
    # rule_symbols while failing rule_ellipsis
    n_ellipsis = (((F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit(""))))
                   / 3).cast("long")
                  + (F.length(t)
                     - F.length(F.replace(t, F.lit("…"), F.lit("")))))
    bullet_lines = F.size(F.filter(
        lines, lambda s: F.substring(s, 1, 1).isin("•", "-", "*")))
    ellipsis_lines = F.size(F.filter(
        lines, lambda s: F.endswith(s, F.lit("...")) | F.endswith(s, F.lit("…"))))

    out = (_with_ws_norm(docs, text_col)
           .withColumn("gq_dup_line_frac", dup_frac(lines))
           .withColumn("gq_dup_para_frac", dup_frac(paras))
           .withColumn("gq_dup_line_char_frac", dup_char_frac(lines))
           .withColumn("gq_dup_para_char_frac", dup_char_frac(paras))
           .withColumn("gq_top2gram_char_frac",
                       _top_gram_char_frac(words, 2, n_chars))
           .withColumn("gq_top3gram_char_frac",
                       _top_gram_char_frac(words, 3, n_chars))
           .withColumn("gq_top4gram_char_frac",
                       _top_gram_char_frac(words, 4, n_chars))
           .withColumn("gq_symbol_word_ratio",
                       F.round((n_hash + n_ellipsis) / n_words, 6))
           .withColumn("gq_bullet_line_frac",
                       F.round(bullet_lines / n_lines, 6))
           .withColumn("gq_ellipsis_line_frac",
                       F.round(ellipsis_lines / n_lines, 6))
           .withColumn("_n_words", F.size(words))
           .withColumn("_mean_word_len",
                       F.round((n_chars - n_words + 1) / n_words, 6))
           .withColumn("_alpha_ratio",
                       F.round(F.length(F.regexp_replace(t, r"[^a-zA-Z]", ""))
                               / n_chars, 6))
           .withColumn("_stop_hits", _stop_hits_expr()))

    rules = {
        "rule_word_count": (F.col("_n_words") >= min_words)
                           & (F.col("_n_words") <= max_words),
        "rule_word_len": (F.col("_mean_word_len") >= min_mean_word_len)
                         & (F.col("_mean_word_len") <= max_mean_word_len),
        "rule_alpha": F.col("_alpha_ratio") >= min_alpha_ratio,
        "rule_stopwords": F.col("_stop_hits") >= min_stopword_hits,
        "rule_dup_lines": F.col("gq_dup_line_frac") <= max_dup_line_frac,
        "rule_dup_paras": F.col("gq_dup_para_frac") <= max_dup_para_frac,
        "rule_dup_line_chars":
            F.col("gq_dup_line_char_frac") <= max_dup_line_char_frac,
        "rule_dup_para_chars":
            F.col("gq_dup_para_char_frac") <= max_dup_para_char_frac,
        "rule_top2gram": F.col("gq_top2gram_char_frac") <= max_top2gram_char_frac,
        "rule_top3gram": F.col("gq_top3gram_char_frac") <= max_top3gram_char_frac,
        "rule_top4gram": F.col("gq_top4gram_char_frac") <= max_top4gram_char_frac,
        "rule_symbols": F.col("gq_symbol_word_ratio") <= max_symbol_word_ratio,
        "rule_bullets": F.col("gq_bullet_line_frac") <= max_bullet_line_frac,
        "rule_ellipsis":
            F.col("gq_ellipsis_line_frac") <= max_ellipsis_line_frac,
    }
    keep = None
    for name, expr in rules.items():
        out = out.withColumn(name, expr)
        keep = F.col(name) if keep is None else keep & F.col(name)
    return (out.withColumn("keep", keep)
            .drop(_NORM_COL, "_n_words", "_mean_word_len", "_alpha_ratio",
                  "_stop_hits"))


# RE2-safe PII patterns (no lookarounds/backrefs, so the DuckDB oracle —
# also RE2 — runs the IDENTICAL regex): pattern, replacement token.
# Order matters: emails first (an email contains no ip/phone match damage),
# then IPv4, then phone-ish digit runs (the loosest pattern last so it
# can't eat the structured ones).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\[\]. -]{7,}[0-9]", "<PHONE>"),
)


def redact_pii(docs: DataFrame, text_col: str = "text",
               out_col: str = "text_redacted") -> DataFrame:
    """PII scrubbing (the ROOTS/Dolma-style masking pass): replace emails,
    IPv4 addresses, and phone-like digit runs with typed tokens, and count
    each category so redaction volume is observable per document. All
    JVM-side ``regexp_replace``/``regexp_count`` under whole-stage codegen;
    patterns are RE2-safe so the DuckDB oracle runs the identical regexes.
    Detection is pattern-based and documented — a production pipeline adds
    locale-specific validators on top, but the masking plumbing, ordering
    (structured patterns before loose ones) and observability are the
    contract here.

    Each redaction stage is materialized as a column referenced twice
    (next count + next replace) — the same multi-reference construction
    as ``_with_ws_norm`` — so every regexp_replace runs once per row by
    CollapseProject's own rules, not by optimizer-courtesy subexpression
    elimination of a nested chain."""
    out = docs
    prev = text_col
    stage_cols = []
    for i, (name, pattern, token) in enumerate(PII_PATTERNS):
        out = out.withColumn(f"n_{name}",
                             F.regexp_count(F.col(prev), F.lit(pattern)))
        nxt = f"_pii_r{i}"
        out = out.withColumn(nxt, F.regexp_replace(F.col(prev), pattern, token))
        stage_cols.append(nxt)
        prev = nxt
    return (out.withColumn(out_col, F.col(prev))
            .drop(*stage_cols))


def strip_host_boilerplate(docs: DataFrame, id_col: str = "doc_id",
                           host_col: str = "host",
                           text_col: str = "text", *,
                           min_docs: int = 2, frac: float = 0.5,
                           out_col: str = "text_main") -> DataFrame:
    """RefinedWeb-style HOST-TEMPLATE boilerplate strip: a line that
    recurs (whitespace-trimmed) on at least ``min_docs`` pages AND at
    least ``frac`` of all pages of the SAME host is site chrome — nav
    bars, cookie banners, copyright footers — and is removed from every
    page of that host. This is the inter-document signal the per-page
    density heuristic (extract.py) cannot see: a nav line can be locally
    text-dense yet appear on 100% of the host's pages. Corpus-wide
    paragraph dedup (remove_duplicate_paragraphs) is the complementary
    global rule; this one catches per-site templates whose absolute
    frequency never crosses a global threshold. Adds ``out_col``
    (surviving lines rejoined with ``\\n``, original order; blank lines
    always survive) and ``n_lines_removed``.

    Scale shape: line frequencies are a ``groupBy(host, line_hash)``
    over per-doc-DISTINCT lines (map-side partial agg collapses repeated
    chrome before the exchange); per-host page totals are a second
    partial agg on host alone. The flagged set joins back on
    ``(host, line_hash)`` — an anti-join whose build side holds only
    lines ABOVE the frequency floor, a tiny fraction of distinct lines —
    and AQE's skew-join splits any mega-host key. The doc regroup for
    reassembly is one exchange on the doc id with per-doc bounded state.
    No window over the line hash (a 10^9-copy banner would funnel into
    one task), no driver-side state.
    """
    d = docs.select(F.col(id_col).alias("doc_id"),
                    F.col(host_col).alias("host"),
                    F.col(text_col).alias("text"))
    lines = d.select(
        "doc_id", "host",
        F.posexplode(F.split(F.col("text"), "\n", -1)).alias("pos", "line"))
    keyed = lines.withColumn("_k", F.sha2(F.trim(F.col("line")), 256)) \
                 .withColumn("_blank",
                             F.length(F.trim(F.col("line"))) == 0)
    line_docs = (keyed.filter(~F.col("_blank"))
                 .select("host", "_k", "doc_id").distinct()
                 .groupBy("host", "_k").agg(F.count("*").alias("_nd")))
    host_docs = d.groupBy("host").agg(F.count("*").alias("_hd"))
    boiler = (line_docs.join(host_docs, "host")
              .filter((F.col("_nd") >= min_docs) &
                      (F.col("_nd") >= F.col("_hd") * frac))
              .select("host", "_k"))
    kept = keyed.join(boiler, ["host", "_k"], "left_anti")
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct(F.col("pos"), F.col("line")))),
                            lambda s: s["line"]),
                        "\n").alias(out_col),
                    F.count("*").alias("_kept")))
    totals = d.select("doc_id", "host",
                      F.size(F.split(F.col("text"), "\n", -1))
                      .alias("_total"))
    return (totals.join(rebuilt, "doc_id", "left")
            .select("doc_id", "host",
                    F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
                    (F.col("_total") - F.coalesce(F.col("_kept"), F.lit(0)))
                    .cast("int").alias("n_lines_removed")))


def remove_duplicate_paragraphs(docs: DataFrame, id_col: str = "doc_id",
                                text_col: str = "text", *,
                                max_count: int = 1,
                                out_col: str = "text_clean") -> DataFrame:
    """CCNet-style CORPUS-WIDE duplicate-paragraph removal: drop every
    occurrence of a paragraph (``\\n\\n``-separated segment) that appears
    more than ``max_count`` times across the whole corpus — the cleanup
    that strips cookie banners, nav footers, and license boilerplate that
    per-document rules can't see. Adds ``out_col`` (survivors rejoined
    with blank lines, original order) and ``n_paras_removed``.

    Skew-safe shape: the corpus-wide count is a ``groupBy(hash).count()``
    (map-side partial aggregation collapses even a 10^9-copy boilerplate
    paragraph to one row per map task) joined back on the hash (AQE
    skew-join splits any hot key) — NOT a window over the hash, which
    would funnel every copy of a hot paragraph into a single task with no
    partial aggregation. The regroup is one exchange on the doc id;
    per-doc state is bounded by document size. Whitespace-only segments
    share one hash bucket and are dropped like any other repeated
    paragraph (blank-run collapse), which this operator's cleanup
    semantics accept — it is a normalizer, not a lossless transform.
    """
    paras = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), r"\n\n", -1))
        .alias("pos", "para")).withColumn("_h", F.sha2(F.col("para"), 256))
    counts = paras.groupBy("_h").agg(F.count("*").alias("_n"))
    kept = (paras.join(counts, "_h")
            .filter(F.col("_n") <= max_count))
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct(F.col("pos"), F.col("para")))),
                            lambda s: s["para"]),
                        "\n\n").alias(out_col),
                    F.count("*").alias("_kept")))
    totals = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col),
                         F.size(F.split(F.col(text_col), r"\n\n", -1))
                         .alias("_total"))
    return (totals.join(rebuilt, "doc_id", "left")
            .select(F.col("doc_id").alias(id_col), text_col,
                    F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
                    (F.col("_total") - F.coalesce(F.col("_kept"), F.lit(0)))
                    .cast("int").alias("n_paras_removed")))


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


def inverted_index(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", *, min_df: int = 1,
                   max_postings: int = 1000, ngram: int = 1) -> DataFrame:
    """Positional inverted index — the search-index build over a web
    corpus: one row per term with (df, cf, truncated, postings), where
    postings is the doc_id-sorted list "doc:tf:first_pos,..." capped at
    ``max_postings`` entries (the stop-term guard: 'the' posts in most
    of a 10^12-doc corpus; real systems block/skip-list those, here the
    full df/cf survive and ``truncated`` flags the cap).

    All JVM-side. Shuffles: one partial-agg groupBy on (doc, term) for
    tf/first-position, then TWO branches over it joined on term —
    df/cf by partial-agg groupBy (map-side combine), and the cap by a
    STANDALONE row_number window so WindowGroupLimit's partial mode
    prunes each mapper to ``max_postings`` rows per term BEFORE the
    exchange (a df/cf window on the same shuffle would need the full
    partition and forfeit that pruning — which is exactly the hot-term
    skew hazard the cap exists for). Tokenization matches
    tf_idf_top_terms (whitespace, case-preserving). ``ngram`` > 1
    indexes space-joined word n-grams instead of unigrams (phrase
    indexing); pos stays the gram's starting token offset."""
    return index_from_segments(
        index_segment(docs, id_col=id_col, text_col=text_col, ngram=ngram),
        min_df=min_df, max_postings=max_postings)


def index_segment(docs: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text", ngram: int = 1) -> DataFrame:
    """The per-corpus-slice half of the index build: one
    (term, doc_id, tf, first_pos) row per posting — the IMMUTABLE
    SEGMENT shape of log-structured search indexes (Lucene's segment
    model). Stateless map + one partial-agg groupBy, so it runs
    unchanged inside a streaming micro-batch; segments from successive
    batches merge at read time via :func:`index_from_segments`."""
    arr = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                   lambda w: w != "")
    if ngram > 1:
        arr = F.when(
            F.size(arr) >= ngram,
            F.transform(
                F.sequence(F.lit(0), F.size(arr) - ngram),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(arr, i + k + 1)
                           for k in range(ngram)]))
        ).otherwise(F.array().cast("array<string>"))
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(arr).alias("pos", "term"))
    return toks.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf"), F.min("pos").alias("first_pos"))


def index_from_segments(segments: DataFrame, *, min_df: int = 1,
                        max_postings: int = 1000) -> DataFrame:
    """Compact (term, doc_id, tf, first_pos) segment rows into the
    final index (see :func:`inverted_index` for the output contract).
    A doc split across segments (same doc re-emitted) re-merges by
    summing tf and taking the earliest first_pos — segment merge
    semantics; version supersession is the upstream dedup's job."""
    from pyspark.sql import Window

    tf = segments.groupBy("term", "doc_id").agg(
        F.sum("tf").alias("tf"), F.min("first_pos").alias("first_pos"))
    stats = tf.groupBy("term").agg(F.count("*").alias("df"),
                                   F.sum("tf").alias("cf"))
    w_rank = Window.partitionBy("term").orderBy("doc_id")
    postings = (tf.withColumn("_rn", F.row_number().over(w_rank))
                .filter(F.col("_rn") <= max_postings)
                .groupBy("term")
                .agg(F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("doc_id", "tf", "first_pos"))),
                        lambda p: F.concat_ws(
                            ":", p["doc_id"], p["tf"], p["first_pos"])),
                    ",").alias("postings")))
    return (stats.filter(F.col("df") >= min_df)
            .join(postings, "term")
            .select("term", "df", "cf",
                    (F.col("df") > max_postings).alias("truncated"),
                    "postings"))


def bm25_search(docs: DataFrame, query_terms: list[str], *, top_k: int = 10,
                k1: float = 1.2, b: float = 0.75, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Top-k BM25 retrieval (Robertson/Sparck Jones probabilistic
    ranking — the scoring half of the inverted index): returns
    (doc_id, n_hits, score, rank) for the ``top_k`` best-scoring
    documents containing at least one query term.

    score = sum over hit terms of idf(t) * tf*(k1+1) /
    (tf + k1*(1 - b + b*dl/avgdl)), idf = ln(1 + (N-df+0.5)/(df+0.5))
    (the non-negative variant Lucene uses). Per-(doc,term) components
    round to 9 dp before the sum and the sum to 9 dp: ln() is not
    correctly-rounded in either engine (~1e-16 ulp drift), so the grid
    must sit >= 7 orders above it to make boundary flips negligible
    across partitionings and engine replays.

    Scale shape, all JVM: the query-term filter lands BEFORE the tf
    aggregation so only hit postings shuffle; doc length and N/avgdl
    come from a partial-agg groupBy with the two corpus scalars
    broadcast via crossJoin; df per query term is a tiny broadcast
    join; final top-k is orderBy+limit (TakeOrderedAndProject — per-
    partition heaps, no global sort)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term")) \
        .filter(F.col("term") != "")
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    corpus = dl.agg(F.count("*").alias("n_docs"),
                    F.avg("dl").alias("avgdl"))
    hits = toks.filter(F.col("term").isin(list(query_terms)))
    tf = hits.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    comp = (tf.join(F.broadcast(df_), "term")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(corpus))
            .withColumn(
                "c",
                F.round(
                    F.log(F.lit(1.0)
                          + (F.col("n_docs") - F.col("df") + 0.5)
                          / (F.col("df") + 0.5))
                    * (F.col("tf") * (k1 + 1))
                    / (F.col("tf") + k1 * (1 - b + b * F.col("dl")
                                           / F.col("avgdl"))), 9)))
    scored = comp.groupBy("doc_id").agg(
        F.count("*").alias("n_hits"),
        F.round(F.sum("c"), 9).alias("score"))
    top = (scored.orderBy(F.desc("score"), "doc_id").limit(top_k)
           .select("doc_id", "n_hits", "score"))
    # rank over the already-reduced top_k rows only (single tiny task)
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("score"), "doc_id")
    return top.withColumn("rank", F.row_number().over(w))


def zipf_stats(docs: DataFrame, top_n: int = 100,
               text_col: str = "text") -> DataFrame:
    """One-row corpus-health diagnostic: the Zipf log-log slope of the
    top ``top_n`` term frequencies (natural text sits near -1; template
    spam flattens it, boilerplate floods steepen it), plus vocab size,
    token total, and the corpus share the top terms hold. A cheap
    whole-corpus tripwire to run per crawl snapshot before expensive
    curation.

    Shape: ONE partial-agg token count feeds everything; the top-N cut
    is the deterministic (count desc, term) order; the regression is
    the closed-form least squares over (ln rank, ln count). Every
    AGGREGATE is an exact int64 sum of 6-dp-integer-scaled logs (the
    degree_assortativity pattern: integer sums are order-free, so no
    partitioning or engine can drift them), and the slope/intercept
    come from ONE fixed-shape double expression over those exact
    integers — bit-identical across engines. Range proof: x <= ln(N),
    y <= ln(2^63) ~ 43.7, so scaled by 1e6 the int64 products
    n*sxy <= ~2.3e18 stay inside int64. No window over the full
    vocabulary."""
    from pyspark.sql import Window
    toks = docs.select(F.explode(
        F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                 lambda x: x != "")).alias("w"))
    counts = toks.groupBy("w").agg(F.count("*").alias("c"))
    totals = counts.agg(F.count("*").alias("vocab_size"),
                        F.sum("c").alias("total_tokens"))
    w_rank = Window.orderBy(F.desc("c"), F.asc("w"))
    scale = F.lit(1000000.0)
    top = (counts.orderBy(F.desc("c"), F.asc("w")).limit(top_n)
           .withColumn("rn", F.row_number().over(w_rank))
           .select(F.round(F.log(F.col("rn").cast("double")) * scale, 0)
                   .cast("long").alias("x"),
                   F.round(F.log(F.col("c").cast("double")) * scale, 0)
                   .cast("long").alias("y"),
                   "c"))
    sums = top.agg(F.count("*").alias("n"), F.sum("x").alias("sx"),
                   F.sum("y").alias("sy"),
                   F.sum(F.col("x") * F.col("y")).alias("sxy"),
                   F.sum(F.col("x") * F.col("x")).alias("sxx"),
                   F.sum("c").alias("top_c"))
    num = (F.col("n") * F.col("sxy")
           - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx")
           - F.col("sx") * F.col("sx")).cast("double")
    return (sums.crossJoin(totals)
            .select(
                F.round(num / den, 6).alias("zipf_slope"),
                F.round((F.col("sy").cast("double")
                         - (num / den) * F.col("sx").cast("double"))
                        / (F.col("n").cast("double") * F.lit(1000000.0)),
                        6).alias("zipf_intercept"),
                "vocab_size", "total_tokens",
                F.round(F.col("top_c") / F.col("total_tokens"), 6)
                .alias("top_share")))


def best_snippet(docs: DataFrame, query_terms: list[str], *,
                 window: int = 12, anchor_cap: int = 256,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Search-result snippet selection — the highlight window a results
    page shows under each BM25 hit: among all windows of ``window``
    tokens anchored at a query-term occurrence, pick the one covering
    the most DISTINCT query terms, then the most total hits, then the
    earliest start. Returns (doc_id, start_pos, n_distinct, n_hits,
    snippet) for documents with at least one hit; tokenization matches
    the inverted index (whitespace, case-preserving).

    Entirely JVM higher-order functions over the token array — a pure
    map, no shuffle, no Python: hit positions are one filtered
    transform, each anchor's window stats are nested array ops, and
    the argmax is a lexicographic ``array_max`` over (n_distinct,
    n_hits, -start) structs, which makes the tie rule explicit and
    engine-replayable. Anchoring at hits loses nothing: a window whose
    start is not a hit slides right to its first hit keeping every hit
    it contained (and possibly gaining some), so some hit-anchored
    window always ties or beats it.

    ``anchor_cap`` bounds the per-doc cost: only the FIRST ``anchor_cap``
    hits (by position) are window anchors, so a keyword-stuffed page
    with h hits costs O(anchor_cap * h) instead of O(h²) — a 10⁴-hit
    adversarial doc in a BM25 top-k can no longer burn ~10⁸ struct ops
    in one task. Window stats still count ALL hits, and for any doc
    with <= anchor_cap hits (every real page) the result is identical
    to the uncapped argmax. The cap is a literal both engines replay."""
    terms_arr = F.array(*[F.lit(t) for t in query_terms])
    arr = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                   lambda w: w != "")
    d = docs.select(F.col(id_col).alias("doc_id"), arr.alias("_toks"))
    hits = F.filter(
        F.transform(F.col("_toks"),
                    lambda x, i: F.struct(i.alias("pos"),
                                          x.alias("term"))),
        lambda s: F.array_contains(terms_arr, s["term"]))
    d = d.withColumn("_hits", hits).filter(F.size("_hits") > 0)

    def in_win(a):
        return F.filter(F.col("_hits"),
                        lambda x: (x["pos"] >= a["pos"])
                        & (x["pos"] < a["pos"] + window))

    cands = F.transform(
        F.slice(F.col("_hits"), 1, anchor_cap),
        lambda a: F.struct(
            F.size(F.array_distinct(
                F.transform(in_win(a), lambda x: x["term"])))
            .alias("nd"),
            F.size(in_win(a)).alias("nh"),
            (-a["pos"]).alias("neg")))
    return (d.withColumn("_best", F.array_max(cands))
            .select("doc_id",
                    (-F.col("_best.neg")).cast("int").alias("start_pos"),
                    F.col("_best.nd").cast("int").alias("n_distinct"),
                    F.col("_best.nh").cast("int").alias("n_hits"),
                    F.array_join(
                        F.slice(F.col("_toks"),
                                -F.col("_best.neg") + F.lit(1),
                                F.lit(window)), " ").alias("snippet")))


def bm25f_search(docs: DataFrame, anchors: DataFrame,
                 query_terms: list[str], *, top_k: int = 10,
                 k1: float = 1.2, b_body: float = 0.75,
                 b_anchor: float = 0.5, w_body: float = 1.0,
                 w_anchor: float = 2.0, title_col: str | None = None,
                 h1_col: str | None = None, b_title: float = 0.4,
                 w_title: float = 3.0, b_h1: float = 0.4,
                 w_h1: float = 1.5, id_col: str = "doc_id",
                 text_col: str = "text",
                 anchor_col: str = "anchor") -> DataFrame:
    """Top-k BM25F retrieval (Robertson/Zaragoza fielded BM25 — the
    web-search form where ANCHOR TEXT pointing at a page is a second,
    heavily-weighted field): per field, tf normalizes by its own length
    (1 - b_f + b_f * len/avglen), the weighted field tfs SUM into one
    pseudo-frequency, and saturation applies ONCE —
    score = sum_t idf(t) * tfF / (k1 + tfF) — which is the crucial
    difference from naively adding two BM25 scores (a term frequent in
    both fields must not double-saturate). idf uses document frequency
    over field-union presence; N is the body corpus size. A page with
    no body hits still ranks on its anchors — the off-page relevance
    signal. Components round to 9 dp (the bm25_search ln() grid).

    ``title_col`` / ``h1_col`` (columns on ``docs``, e.g.
    kernel.page_analysis's already-extracted ``title_text`` /
    ``first_h1`` — zero extra parse cost) add the classic on-page
    web-search fields with their own length normalization and weights,
    summed into the same single-saturation pseudo-frequency. NULL
    field values contribute 0, like pages without anchors.

    Scale shape mirrors bm25_search per field: query-term filters land
    BEFORE every tf agg (only hit postings shuffle), field lengths are
    partial-agg groupBys, corpus scalars and per-term dfs broadcast,
    the field combine is a chain of full outer joins on (doc, term) —
    hits only — and top-k is TakeOrderedAndProject."""
    terms = list(query_terms)
    b_toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term")) \
        .filter(F.col("term") != "")
    # (short name, field-text frame, b_f, w_f) — 'a' first keeps the
    # 2-field plan and float-expression shape byte-compatible
    fields = [("a", anchors.select(F.col(id_col).alias("doc_id"),
                                   F.col(anchor_col).alias("_ftext")),
               b_anchor, w_anchor)]
    if title_col is not None:
        fields.append(("t", docs.select(F.col(id_col).alias("doc_id"),
                                        F.col(title_col).alias("_ftext")),
                       b_title, w_title))
    if h1_col is not None:
        fields.append(("h", docs.select(F.col(id_col).alias("doc_id"),
                                        F.col(h1_col).alias("_ftext")),
                       b_h1, w_h1))
    dl = b_toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    corpus = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    tf_b = (b_toks.filter(F.col("term").isin(terms))
            .groupBy("doc_id", "term").agg(F.count("*").alias("tf_b")))
    hits = tf_b
    per_field = []
    for name, fdf, b_f, w_f in fields:
        ftoks = (fdf.filter(F.col("_ftext").isNotNull())
                 .select("doc_id",
                         F.explode(F.split(F.trim(F.col("_ftext")),
                                           r"\s+")).alias("term"))
                 .filter(F.col("term") != ""))
        fl = ftoks.groupBy("doc_id").agg(F.count("*").alias(f"{name}l"))
        favg = fl.agg(F.avg(f"{name}l").alias(f"avg{name}l"))
        tf_f = (ftoks.filter(F.col("term").isin(terms))
                .groupBy("doc_id", "term")
                .agg(F.count("*").alias(f"tf_{name}")))
        hits = hits.join(tf_f, ["doc_id", "term"], "full_outer")
        per_field.append((name, fl, favg, b_f, w_f))
    df_ = hits.groupBy("term").agg(F.count("*").alias("df"))
    comp = (hits
            .join(F.broadcast(df_), "term")
            .join(dl, "doc_id", "left"))
    for name, fl, favg, _, _ in per_field:
        comp = comp.join(fl, "doc_id", "left") \
            .crossJoin(F.broadcast(favg))
    comp = comp.crossJoin(F.broadcast(corpus))
    tfb_n = (F.coalesce(F.col("tf_b"), F.lit(0))
             / (1 - b_body + b_body * F.coalesce(F.col("dl"), F.lit(0))
                / F.col("avgdl")))
    tff = w_body * tfb_n
    for name, _, _, b_f, w_f in per_field:
        tf_fn = F.when(
            F.col(f"{name}l").isNotNull(),
            F.coalesce(F.col(f"tf_{name}"), F.lit(0))
            / (1 - b_f + b_f * F.col(f"{name}l")
               / F.col(f"avg{name}l"))) \
            .otherwise(F.lit(0.0))
        tff = tff + w_f * tf_fn
    comp = comp.withColumn(
        "c",
        F.round(F.log(F.lit(1.0)
                      + (F.col("n_docs") - F.col("df") + 0.5)
                      / (F.col("df") + 0.5))
                * tff / (F.lit(k1) + tff), 9))
    scored = comp.groupBy("doc_id").agg(
        F.count("*").alias("n_hits"),
        F.round(F.sum("c"), 9).alias("score"))
    top = (scored.orderBy(F.desc("score"), "doc_id").limit(top_k)
           .select("doc_id", "n_hits", "score"))
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("score"), "doc_id")
    return top.withColumn("rank", F.row_number().over(w))


def train_quality_classifier(labeled: DataFrame, label_col: str = "label",
                             text_col: str = "text"):
    """Train a logistic-regression document-quality classifier on the
    JVM-side quality features (the pyspark.ml analogue of the fasttext
    quality classifiers public pipelines train on weak labels — e.g.
    'looks like a reference corpus' vs 'random crawl'). Training is
    deterministic (LBFGS on assembled features — no stochastic stage).

    Features are exactly :func:`with_quality_features`'s columns, so
    scoring is one ml transform over a feature vector assembled from
    whole-stage-codegen expressions — no Python in the scoring path.
    Returns the fitted PipelineModel; apply with
    :func:`score_quality`."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = with_quality_features(labeled, text_col)
    cols = ["q_len", "q_n_words", "q_alpha_ratio", "q_digit_ratio",
            "q_punct_ratio", "q_upper_ratio", "q_mean_word_len",
            "q_stopword_ratio"]
    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=cols, outputCol="features"),
        LogisticRegression(featuresCol="features", labelCol=label_col,
                           maxIter=50, regParam=0.01)])
    return pipe.fit(feats)


def score_quality(docs: DataFrame, model, text_col: str = "text") -> DataFrame:
    """Apply a :func:`train_quality_classifier` model: adds
    ``quality_prob`` (P(label=1)) and ``quality_pred``. Distributed model
    scoring — the features are computed JVM-side per partition and the LR
    transform is a dot product; nothing collects to the driver."""
    from pyspark.ml.functions import vector_to_array

    feats = with_quality_features(docs, text_col)
    scored = model.transform(feats)
    return (scored
            .withColumn("quality_prob",
                        F.round(vector_to_array("probability")[1], 6))
            .withColumn("quality_pred", F.col("prediction").cast("int"))
            .drop("features", "rawPrediction", "probability", "prediction"))


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


def with_sentence_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Sentence segmentation + Flesch reading-ease, all JVM-side and
    RE2-mirrorable (no lookarounds — a terminator run ``[.!?]+`` followed
    by whitespace is marked with a sentinel, then split):

    * ``n_sentences`` — terminator-boundary count + the final fragment
      (a doc with no terminators is one sentence);
    * ``n_syllables`` — vowel-group count over the lowercased text (the
      standard public heuristic; word boundaries need no special casing
      because spaces are non-vowels too);
    * ``flesch``      — 206.835 − 1.015·(words/sentences) −
      84.6·(syllables/words), rounded to 6dp (Flesch 1948, public
      formula), with the degenerate guards both engines share.

    Map-side only — composes with any upstream layout, no shuffle.
    """
    t = F.col(text_col)
    marked = F.regexp_replace(t, r"[.!?]+\s+", "\x1e")
    sentences = F.filter(F.split(marked, "\x1e"),
                         lambda s: F.trim(s) != "")
    n_sent = F.greatest(F.size(sentences), F.lit(1))
    words = F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != "")
    n_words = F.greatest(F.size(words), F.lit(1))
    syll = F.size(F.filter(F.split(F.lower(t), r"[^aeiouy]+"),
                           lambda x: x != ""))
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sent)
        - F.lit(84.6) * (syll.cast("double") / n_words), 6)
    return (docs
            .withColumn("n_sentences", n_sent.cast("int"))
            .withColumn("n_words_ss", F.size(words).cast("int"))
            .withColumn("n_syllables", syll.cast("int"))
            .withColumn("flesch", flesch))
