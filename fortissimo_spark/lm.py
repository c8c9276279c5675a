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

__all__ = ["train_bigram_lm", "with_perplexity", "BigramLM"]

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
