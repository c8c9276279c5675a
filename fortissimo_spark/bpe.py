"""Byte-pair-encoding tokenizer: corpus-trained merges, distributed apply.

Public-knowledge BPE (Sennrich et al. 2016, arXiv:1508.07909; the GPT-2
rank-greedy apply): token budgets at 100 TB are denominated in real
tokenizer tokens, and the whitespace / ``n_tokens_bpe_ish`` proxies drift
20-40% against any real vocabulary, so shard packing and context chunking
need an actual trained tokenizer as their denominator.

Scale shape:

* **Training** (:func:`bpe_train`): the corpus-scale half — word counting —
  is one ``groupBy(word).count()`` (map-side partial aggregation), reduced
  to a BOUNDED driver collect of the ``top_words`` most frequent words
  (``orderBy.limit`` plans TakeOrderedAndProject: only ``top_words`` rows
  ever reach the driver, the same bounded-collect discipline as
  ``corpus.pack_shards``). The merge loop then runs driver-side over that
  frequency table — the standard practice (merges are learned from a word
  frequency dict, not from the raw corpus), deterministic by
  (count desc, word asc) and (pair count desc, pair asc) tie-breaks.
* **Apply** (:func:`with_bpe_token_counts`): a ``mapInPandas`` kernel under
  the repo's kernel discipline — per *distinct word* Python with per-batch
  memoization (a batch of web pages repeats most of its words), merges
  shipped in the task closure (a few KB). No shuffle: apply composes with
  any upstream partitioning.

Merge-application semantics (shared by trainer, kernel, and the DuckDB
oracle's replace-chain): for each merge in rank order, one left-to-right
non-overlapping sweep replaces every adjacent (x, y) by xy. A single sweep
per merge is complete: a merged symbol xy can never re-create the pair
(x, y), and a pair can only involve symbols created by STRICTLY earlier
merges, so rank order is a valid processing order. The rank-greedy loop in
:func:`encode_word` is the standard equivalent restatement.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

__all__ = ["bpe_train", "train_merges_from_counts", "encode_word",
           "with_bpe_token_counts", "bpe_vocab"]


def train_merges_from_counts(word_counts: Iterable[tuple[str, int]],
                             num_merges: int) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from (word, count) pairs.

    Deterministic: the winning pair each round is max count with
    lexicographically-smallest-pair tie-break. Characters are the initial
    symbols (no end-of-word marker — word-internal merges only, so a
    word's token count is independent of its neighbors)."""
    vocab: list[list] = [[list(w), int(c)] for w, c in word_counts if w]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab:
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        x, y = best
        for item in vocab:
            syms = item[0]
            if x not in syms:
                continue
            out, i, n = [], 0, len(syms)
            while i < n:
                if i < n - 1 and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            item[0] = out
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word, GPT-2 rank-greedy style: repeatedly merge
    every occurrence (leftmost-first) of the lowest-rank adjacent pair."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        x, y = best_pair
        out, i, n = [], 0, len(syms)
        while i < n:
            if i < n - 1 and syms[i] == x and syms[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_train(docs: DataFrame, text_col: str = "text", *,
              num_merges: int = 200,
              top_words: int = 30_000) -> list[tuple[str, str]]:
    """Train BPE merges on a corpus: distributed word counting, bounded
    top-``top_words`` collect, driver-side merge loop (see module doc)."""
    counts = (docs
              .select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
                      .alias("w"))
              .filter(F.length("w") > 0)
              .groupBy("w").agg(F.count("*").alias("c"))
              .orderBy(F.desc("c"), F.asc("w"))
              .limit(top_words)
              .collect())
    return train_merges_from_counts(((r["w"], r["c"]) for r in counts),
                                    num_merges)


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """The token strings the merge list can emit (merge outputs; single
    characters are implicit)."""
    return [x + y for x, y in merges]


def with_bpe_token_counts(docs: DataFrame,
                          merges: list[tuple[str, str]],
                          text_col: str = "text",
                          out_col: str = "n_tokens_bpe") -> DataFrame:
    """All input columns plus ``out_col``: the document's real BPE token
    count — sum of per-word token counts over ``split(trim(text), '\\s+')``
    under the trained merges. mapInPandas with a bounded word memo (kept
    across batches for hit rate, cleared whenever it exceeds
    ``memo_limit`` distinct words so a long task over a 100 TB input
    can't grow it without bound); no shuffle, composes with any upstream
    layout."""
    import re

    memo_limit = 1 << 20
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    # StructType.add mutates in place — copy, or the source df's own
    # schema object grows a phantom column
    schema = StructType(list(docs.schema.fields)
                        + [StructField(out_col, IntegerType(), False)])
    cols = [f.name for f in docs.schema.fields]
    # ASCII \s, matching Java-regex \s (Spark) and RE2 \s (DuckDB) exactly;
    # Python's own \s is Unicode-wide and would split on U+00A0 etc.
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}

        def n_tokens(text) -> int:
            if text is None:
                return 0
            total = 0
            for w in ws.split(text):
                if not w:
                    continue
                n = memo.get(w)
                if n is None:
                    n = len(encode_word(w, ranks))
                    memo[w] = n
                total += n
            return total

        for pdf in batches:
            if len(memo) > memo_limit:
                memo.clear()
            out = pdf[cols].copy()
            out[out_col] = (pdf[text_col].map(n_tokens).astype("int32"))
            yield out

    return docs.mapInPandas(kernel, schema)
