"""N-gram language-model perplexity filter — CCNet's other half.

CCNet (Wenzek et al. 2020, arXiv:1911.00359) gates crawl text on the
perplexity of a KenLM n-gram model; this is the same public idea with a
bigram stupid-backoff model (Brants et al. 2007, arXiv via ACL D07-1090:
"Large Language Models in Machine Translation" — stupid backoff is the
web-scale simplification of Katz/Kneser-Ney that needs no discounting
pass):

    S(w | prev) = count(prev, w) / count(prev)        if the bigram is kept
                = alpha * count(w) / N                 else, if w is kept
                = alpha * 1 / N                        else (OOV floor)

    ppl(doc)    = 10 ** ( - mean_i log10 S(w_i | w_{i-1}) )

Scale shape: training is two ``groupBy().count()`` passes (map-side
partial aggregation) truncated to a BOUNDED top-V table each with a
deterministic (count desc, gram asc) order — the broadcast-size budget a
1000-executor scorer actually has. Scoring explodes each doc's bigrams
map-side (``zip_with`` over two array slices, no Python), joins the two
**broadcast** count tables, and regroups once on doc_id. The only wide
exchange in scoring is that final per-doc regroup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["train_bigram_lm", "with_perplexity", "BigramLM",
           "TrigramLM", "train_trigram_lm", "with_perplexity_trigram",
           "NgramLM", "train_ngram_lm", "with_perplexity_ngram",
           "KneserNeyLM", "train_kn_lm", "with_perplexity_kn",
           "with_ppl_buckets"]

_ALPHA = 0.4  # stupid-backoff weight (Brants et al. 2007)


def _clean_tokens(text_col: str):
    return F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                    lambda x: x != "")


def _bigram_structs(toks):
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(F.slice(toks, 1, n1), F.slice(toks, 2, n1),
                      lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))


class BigramLM:
    """Trained model handle: two bounded count DataFrames + the corpus
    token total. Both tables are small by construction (top_v rows) and
    are broadcast at scoring time."""

    def __init__(self, unigrams: DataFrame, bigrams: DataFrame,
                 total_tokens: int, alpha: float = _ALPHA):
        self.unigrams = unigrams
        self.bigrams = bigrams
        self.total_tokens = total_tokens
        self.alpha = alpha


def train_bigram_lm(docs: DataFrame, text_col: str = "text", *,
                    top_v: int = 100_000,
                    alpha: float = _ALPHA) -> BigramLM:
    """Count unigrams and bigrams corpus-wide, keep the top ``top_v`` of
    each under the deterministic (count desc, gram asc) order, and record
    the total token count N (one 1-row action)."""
    toks = _clean_tokens(text_col)
    uni_all = (docs.select(F.explode(toks).alias("w"))
               .groupBy("w").agg(F.count("*").alias("c")))
    uni = (uni_all.orderBy(F.desc("c"), F.asc("w")).limit(top_v))
    bi = (docs.select(F.explode(_bigram_structs(toks)).alias("p"))
          .select("p.w1", "p.w2")
          .groupBy("w1", "w2").agg(F.count("*").alias("c"))
          .orderBy(F.desc("c"), F.asc("w1"), F.asc("w2")).limit(top_v))
    total = uni_all.agg(F.sum("c").alias("n")).collect()[0]["n"] or 0
    return BigramLM(uni, bi, int(total), alpha)


def with_perplexity(docs: DataFrame, lm: BigramLM,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id_col, n_bigrams, ppl) — stupid-backoff bigram perplexity per
    document, rounded to 6dp; docs with fewer than two tokens score NULL
    with n_bigrams 0. Both count joins are broadcast."""
    toks = _clean_tokens(text_col)
    pairs = (docs.select(F.col(id_col).alias("doc_id"),
                         F.explode(_bigram_structs(toks)).alias("p"))
             .select("doc_id", "p.w1", "p.w2"))
    bi = F.broadcast(lm.bigrams.select(
        "w1", "w2", F.col("c").alias("c_bi")))
    uni1 = F.broadcast(lm.unigrams.select(
        F.col("w").alias("w1"), F.col("c").alias("c_w1")))
    uni2 = F.broadcast(lm.unigrams.select(
        F.col("w").alias("w2"), F.col("c").alias("c_w2")))
    n = float(lm.total_tokens)
    score = F.when(
        F.col("c_bi").isNotNull() & F.col("c_w1").isNotNull(),
        F.col("c_bi").cast("double") / F.col("c_w1")
    ).otherwise(
        F.lit(lm.alpha) * F.coalesce(F.col("c_w2"), F.lit(1))
        .cast("double") / F.lit(n))
    scored = (pairs
              .join(bi, ["w1", "w2"], "left")
              .join(uni1, ["w1"], "left")
              .join(uni2, ["w2"], "left")
              .groupBy("doc_id")
              .agg(F.count("*").cast("int").alias("n_bigrams"),
                   F.round(F.pow(F.lit(10.0),
                                 -F.avg(F.log10(score))), 6).alias("ppl")))
    base = docs.select(F.col(id_col).alias("doc_id"))
    return (base.join(scored, "doc_id", "left")
            .select(F.col("doc_id").alias(id_col),
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    "ppl"))


# --- trigram upgrade -----------------------------------------------------
# CCNet's KenLM is a 5-gram; bigram perplexity is a weak gibberish gate
# for near-English spam ("the the the of of"). The trigram chain is the
# same bounded-broadcast shape with ONE more top-V table:
#
#   S(w3 | w1 w2) = c(w1 w2 w3) / c(w1 w2)   if trigram AND context kept
#                 = alpha * S(w2->w3)         else (back off to bigram)
#   S(w2 -> w3)   = c(w2 w3) / c(w2)          if bigram AND w2 kept
#                 = alpha * c(w3) / N          else (coalesce OOV -> 1)
#
# Scoring stays one wide exchange (the per-doc regroup); the five count
# joins are all broadcast.


def _trigram_structs(toks):
    n2 = F.greatest(F.size(toks) - 2, F.lit(0))
    return F.zip_with(
        F.zip_with(F.slice(toks, 1, n2), F.slice(toks, 2, n2),
                   lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))),
        F.slice(toks, 3, n2),
        lambda p, c: F.struct(p["w1"].alias("w1"), p["w2"].alias("w2"),
                              c.alias("w3")))


class TrigramLM(BigramLM):
    """Bounded trigram stupid-backoff model: the bigram tables plus one
    top-V trigram count table, all broadcast at scoring time."""

    def __init__(self, unigrams: DataFrame, bigrams: DataFrame,
                 trigrams: DataFrame, total_tokens: int,
                 alpha: float = _ALPHA):
        super().__init__(unigrams, bigrams, total_tokens, alpha)
        self.trigrams = trigrams


def train_trigram_lm(docs: DataFrame, text_col: str = "text", *,
                     top_v: int = 100_000,
                     alpha: float = _ALPHA) -> TrigramLM:
    """Count unigrams, bigrams and trigrams corpus-wide (three
    partial-aggregated passes), keep the deterministic top ``top_v`` of
    each ((count desc, gram asc) order), and record N."""
    base = train_bigram_lm(docs, text_col, top_v=top_v, alpha=alpha)
    toks = _clean_tokens(text_col)
    tri = (docs.select(F.explode(_trigram_structs(toks)).alias("t"))
           .select("t.w1", "t.w2", "t.w3")
           .groupBy("w1", "w2", "w3").agg(F.count("*").alias("c"))
           .orderBy(F.desc("c"), F.asc("w1"), F.asc("w2"), F.asc("w3"))
           .limit(top_v))
    return TrigramLM(base.unigrams, base.bigrams, tri,
                     base.total_tokens, alpha)


def with_perplexity_trigram(docs: DataFrame, lm: TrigramLM,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """(id_col, n_trigrams, ppl3) — trigram stupid-backoff perplexity per
    document, rounded to 6dp; docs with fewer than three tokens score
    NULL with n_trigrams 0. All five count joins are broadcast; the only
    wide exchange is the per-doc regroup."""
    toks = _clean_tokens(text_col)
    trips = (docs.select(F.col(id_col).alias("doc_id"),
                         F.explode(_trigram_structs(toks)).alias("t"))
             .select("doc_id", "t.w1", "t.w2", "t.w3"))
    tri = F.broadcast(lm.trigrams.select(
        "w1", "w2", "w3", F.col("c").alias("c_tri")))
    bi12 = F.broadcast(lm.bigrams.select(
        "w1", "w2", F.col("c").alias("c_b12")))
    bi23 = F.broadcast(lm.bigrams.select(
        F.col("w1").alias("w2"), F.col("w2").alias("w3"),
        F.col("c").alias("c_b23")))
    uni2 = F.broadcast(lm.unigrams.select(
        F.col("w").alias("w2"), F.col("c").alias("c_w2")))
    uni3 = F.broadcast(lm.unigrams.select(
        F.col("w").alias("w3"), F.col("c").alias("c_w3")))
    n = float(lm.total_tokens)
    a = F.lit(lm.alpha)
    backoff = F.when(
        F.col("c_b23").isNotNull() & F.col("c_w2").isNotNull(),
        F.col("c_b23").cast("double") / F.col("c_w2")
    ).otherwise(
        a * F.coalesce(F.col("c_w3"), F.lit(1)).cast("double") / F.lit(n))
    score = F.when(
        F.col("c_tri").isNotNull() & F.col("c_b12").isNotNull(),
        F.col("c_tri").cast("double") / F.col("c_b12")
    ).otherwise(a * backoff)
    scored = (trips
              .join(tri, ["w1", "w2", "w3"], "left")
              .join(bi12, ["w1", "w2"], "left")
              .join(bi23, ["w2", "w3"], "left")
              .join(uni2, ["w2"], "left")
              .join(uni3, ["w3"], "left")
              .groupBy("doc_id")
              .agg(F.count("*").cast("int").alias("n_trigrams"),
                   F.round(F.pow(F.lit(10.0),
                                 -F.avg(F.log10(score))), 6).alias("ppl3")))
    base = docs.select(F.col(id_col).alias("doc_id"))
    return (base.join(scored, "doc_id", "left")
            .select(F.col("doc_id").alias(id_col),
                    F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
                    "ppl3"))


# --- general order-n upgrade ---------------------------------------------
# CCNet's production gate is a 5-gram KenLM. The generalization keeps the
# exact bounded-broadcast shape: one top-V count table per order k = 1..n
# (each a partial-aggregated groupBy + deterministic truncation), scoring
# via the recursive stupid-backoff chain
#
#   S_k(gram) = c_k(suffix_k) / c_{k-1}(context of suffix_k)   if both kept
#             = alpha * S_{k-1}(gram)                           else
#   S_1(w)    = coalesce(c_1(w), 1) / N
#
# which reduces to the bigram/trigram models above at n=2/3. Scoring joins
# 2n-1 broadcast tables (suffix + context per order, one shared base) and
# regroups once per doc — the n=5 CCNet shape is five small broadcasts and
# ONE wide exchange.


def _gram_structs_n(toks, k: int):
    """Array of w1..wk structs for every k-gram of the token array (JVM
    expression, no explode until the caller's posexplode/explode)."""
    n = F.size(toks) - (k - 1)
    return F.when(n < 1, F.array().cast(
        f"array<struct<{','.join(f'w{j + 1}:string' for j in range(k))}>>")
    ).otherwise(F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.struct(*[F.element_at(toks, i + j).alias(f"w{j + 1}")
                             for j in range(k)])))


class NgramLM:
    """Order-n stupid-backoff model: ``tables[k-1]`` is the top-V k-gram
    count DataFrame (columns w1..wk, c), all broadcast at scoring time."""

    def __init__(self, tables: list[DataFrame], total_tokens: int,
                 alpha: float = _ALPHA):
        self.tables = tables
        self.order = len(tables)
        self.total_tokens = total_tokens
        self.alpha = alpha


def train_ngram_lm(docs: DataFrame, text_col: str = "text", *,
                   order: int = 5, top_v: int = 100_000,
                   alpha: float = _ALPHA) -> NgramLM:
    """Count every order k = 1..``order`` corpus-wide (one
    partial-aggregated pass each), keep the deterministic top ``top_v``
    per order ((count desc, gram asc)), record N."""
    if order < 1:
        raise ValueError("order must be >= 1")
    toks = _clean_tokens(text_col)
    tables = []
    total = 0
    for k in range(1, order + 1):
        cols = [f"w{j + 1}" for j in range(k)]
        grams = (docs.select(F.explode(_gram_structs_n(toks, k)).alias("g"))
                 .select(*[F.col(f"g.{c}") for c in cols]))
        counts = grams.groupBy(*cols).agg(F.count("*").alias("c"))
        if k == 1:
            total = int(counts.agg(F.sum("c")).collect()[0][0] or 0)
        tables.append(counts.orderBy(F.desc("c"),
                                     *[F.asc(c) for c in cols])
                      .limit(top_v))
    return NgramLM(tables, total, alpha)


def with_perplexity_ngram(docs: DataFrame, lm: NgramLM,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """(id_col, n_ngrams, ppl) — order-n stupid-backoff perplexity per
    document, rounded to 6dp; docs with fewer than ``lm.order`` tokens
    score NULL with n_ngrams 0. All 2n-1 count joins broadcast; the only
    wide exchange is the per-doc regroup."""
    n = lm.order
    toks = _clean_tokens(text_col)
    grams = (docs.select(F.col(id_col).alias("doc_id"),
                         F.explode(_gram_structs_n(toks, n)).alias("g"))
             .select("doc_id", *[F.col(f"g.w{j + 1}").alias(f"w{j + 1}")
                                 for j in range(n)]))
    scored = grams
    # suffix_k of the n-gram = words n-k+1..n; its context = n-k+1..n-1
    for k in range(1, n + 1):
        sfx = [f"w{n - k + 1 + j}" for j in range(k)]
        tbl = lm.tables[k - 1]
        cols = [f"w{j + 1}" for j in range(k)]
        sel = tbl.select(*[F.col(c).alias(s) for c, s in zip(cols, sfx)],
                         F.col("c").alias(f"_c{k}s"))
        scored = scored.join(F.broadcast(sel), sfx, "left")
        if k < n:  # context table for order k+1's ratio
            ctx = [f"w{n - k + 1 + j - 1}" for j in range(k)]
            sel = tbl.select(*[F.col(c).alias(s)
                               for c, s in zip(cols, ctx)],
                             F.col("c").alias(f"_c{k}x"))
            scored = scored.join(F.broadcast(sel), ctx, "left")
    a = F.lit(lm.alpha)
    score = (F.coalesce(F.col("_c1s"), F.lit(1)).cast("double")
             / F.lit(float(lm.total_tokens)))
    for k in range(2, n + 1):
        score = F.when(
            F.col(f"_c{k}s").isNotNull()
            & F.col(f"_c{k - 1}x").isNotNull(),
            F.col(f"_c{k}s").cast("double") / F.col(f"_c{k - 1}x")
        ).otherwise(a * score)
    scored = (scored.groupBy("doc_id")
              .agg(F.count("*").cast("int").alias("n_ngrams"),
                   F.round(F.pow(F.lit(10.0),
                                 -F.avg(F.log10(score))), 6).alias("ppl")))
    base = docs.select(F.col(id_col).alias("doc_id"))
    return (base.join(scored, "doc_id", "left")
            .select(F.col("doc_id").alias(id_col),
                    F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
                    "ppl"))


def with_ppl_buckets(scored: DataFrame, strata_col: str = "lang",
                     ppl_col: str = "ppl",
                     cuts: tuple[float, float] = (1.0 / 3, 2.0 / 3),
                     cut_sample_frac: float | None = None,
                     id_col: str = "doc_id") -> DataFrame:
    """CCNet's head/middle/tail split: per-stratum perplexity percentile
    cutoffs, then each document labeled by which side of the cuts its
    ppl falls on (``head`` = lowest-perplexity third = highest quality).
    NULL-ppl rows (un-scoreable stubs) get a NULL bucket.

    Shape: the cutoff table is ONE row per stratum (tiny — broadcast
    back), exactly CCNet's precomputed-threshold design. The exact
    ``percentile`` aggregate holds a per-group value multiset, so at
    10^12-document scale pass ``cut_sample_frac`` to compute the cuts on
    a deterministic content-hash sample (corpus.deterministic_sample —
    resumable, engine-stable) — also CCNet practice (their thresholds
    come from a sample); labels are still assigned to EVERY row. Cutoffs
    round to 6dp so they compose with the 6dp-rounded perplexities."""
    src = scored.filter(F.col(ppl_col).isNotNull())
    if cut_sample_frac is not None:
        from .corpus import deterministic_sample
        src = deterministic_sample(src, cut_sample_frac, id_col=id_col)
    cutpoints = (src.groupBy(strata_col)
                 .agg(F.round(F.expr(
                     f"percentile({ppl_col}, {cuts[0]!r})"), 6)
                     .alias("_cut1"),
                     F.round(F.expr(
                         f"percentile({ppl_col}, {cuts[1]!r})"), 6)
                     .alias("_cut2")))
    out = scored.join(F.broadcast(cutpoints), strata_col, "left")
    bucket = (F.when(F.col(ppl_col).isNull(), F.lit(None))
              .when(F.col(ppl_col) <= F.col("_cut1"), F.lit("head"))
              .when(F.col(ppl_col) <= F.col("_cut2"), F.lit("middle"))
              .otherwise(F.lit("tail")))
    return (out.withColumn("ppl_bucket", bucket)
            .drop("_cut1", "_cut2"))


# --- Kneser-Ney (the smoothing KenLM itself uses) ------------------------

class KneserNeyLM:
    """Trained interpolated Kneser-Ney bigram handle: three bounded
    count tables (bigrams; contexts with follower-type counts;
    continuation-type counts), the absolute discount D, and the total
    bigram-type count. All tables broadcast at scoring time."""

    def __init__(self, bigrams: DataFrame, contexts: DataFrame,
                 continuations: DataFrame, discount: float,
                 n_types: int):
        self.bigrams = bigrams
        self.contexts = contexts
        self.continuations = continuations
        self.discount = discount
        self.n_types = n_types


def train_kn_lm(docs: DataFrame, text_col: str = "text", *,
                top_v: int = 100_000) -> KneserNeyLM:
    """Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995, in the
    Chen & Goodman 1999 interpolated formulation) — the smoothing the
    CCNet gate's KenLM actually applies, where stupid backoff is its
    web-scale shortcut:

        P(w2|w1) = max(c(w1 w2) - D, 0)/c(w1)
                   + D * N1+(w1 .)/c(w1) * Pcont(w2)
        Pcont(w2) = N1+(. w2) / #bigram-types

    with the Ney count-of-counts discount D = n1/(n1 + 2 n2). Unseen
    contexts score Pcont(w2) directly; unseen continuations floor at
    one type (the same bounded-OOV convention as the backoff models).

    Scale shape: ONE corpus-wide bigram groupBy feeds everything — the
    discount scalars (one 1-row agg), the context table (groupBy w1:
    c(w1) + follower-type count), and the continuation table (groupBy
    w2: predecessor-type count). Each table truncates to ``top_v``
    rows under a deterministic order, the broadcast budget a scorer
    fleet actually has; kept rows carry their FULL-corpus counts, so
    truncation only widens the backoff path, never skews a kept
    estimate."""
    toks = _clean_tokens(text_col)
    bi_all = (docs.select(F.explode(_bigram_structs(toks)).alias("p"))
              .select("p.w1", "p.w2")
              .groupBy("w1", "w2").agg(F.count("*").alias("c")))
    cc = bi_all.agg(
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("n2"),
        F.count("*").alias("types")).collect()[0]
    n1 = int(cc["n1"] or 0)
    n2 = int(cc["n2"] or 0)
    types = int(cc["types"] or 0)
    discount = n1 / (n1 + 2.0 * n2) if (n1 + 2 * n2) > 0 else 0.75
    ctx = (bi_all.groupBy("w1")
           .agg(F.sum("c").alias("c_ctx"),
                F.count("*").alias("n_follow"))
           .orderBy(F.desc("c_ctx"), F.asc("w1")).limit(top_v))
    cont = (bi_all.groupBy("w2").agg(F.count("*").alias("n_prec"))
            .orderBy(F.desc("n_prec"), F.asc("w2")).limit(top_v))
    bi = bi_all.orderBy(F.desc("c"), F.asc("w1"), F.asc("w2")).limit(top_v)
    return KneserNeyLM(bi, ctx, cont, float(discount), types)


def with_perplexity_kn(docs: DataFrame, lm: KneserNeyLM,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(id_col, n_bigrams, ppl) — interpolated Kneser-Ney bigram
    perplexity, 6dp; <2-token docs score NULL with n_bigrams 0. Same
    scoring shape as the backoff models: map-side bigram explode,
    three BROADCAST joins, one per-doc regroup."""
    toks = _clean_tokens(text_col)
    pairs = (docs.select(F.col(id_col).alias("doc_id"),
                         F.explode(_bigram_structs(toks)).alias("p"))
             .select("doc_id", "p.w1", "p.w2"))
    bi = F.broadcast(lm.bigrams.select(
        "w1", "w2", F.col("c").alias("c_bi")))
    ctx = F.broadcast(lm.contexts)
    cont = F.broadcast(lm.continuations)
    t = float(max(lm.n_types, 1))
    d = lm.discount
    p_cont = F.coalesce(F.col("n_prec"), F.lit(1)).cast("double") / F.lit(t)
    # Chen-Goodman interpolated KN: a SEEN context always contributes
    # its back-off weight D*N1+(w1,.)/c(w1), even for an unseen bigram
    # (c_bi null -> the discounted-ML term is 0); raw Pcont applies
    # only to contexts outside the model, so each seen-context
    # conditional distribution sums to 1 (truncation aside).
    score = F.when(
        F.col("c_bi").isNotNull() & F.col("c_ctx").isNotNull(),
        (F.greatest(F.col("c_bi") - F.lit(d), F.lit(0.0))
         + F.lit(d) * F.col("n_follow") * p_cont) / F.col("c_ctx")
    ).when(
        F.col("c_ctx").isNotNull(),
        F.lit(d) * F.col("n_follow") * p_cont / F.col("c_ctx")
    ).otherwise(p_cont)
    scored = (pairs
              .join(bi, ["w1", "w2"], "left")
              .join(ctx, ["w1"], "left")
              .join(cont, ["w2"], "left")
              .groupBy("doc_id")
              .agg(F.count("*").cast("int").alias("n_bigrams"),
                   F.round(F.pow(F.lit(10.0),
                                 -F.avg(F.log10(score))), 6).alias("ppl")))
    base = docs.select(F.col(id_col).alias("doc_id"))
    return (base.join(scored, "doc_id", "left")
            .select(F.col("doc_id").alias(id_col),
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    "ppl"))
