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

import unicodedata
from typing import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

__all__ = ["bpe_train", "train_merges_from_counts", "encode_word",
           "encode_symbols", "with_bpe_token_counts", "bpe_vocab",
           "gpt2_pretokenize", "byte_symbols", "bpe_train_bytes",
           "with_bpe_byte_token_counts"]


def train_merges_from_counts(word_counts: Iterable[tuple[str, int]],
                             num_merges: int,
                             symbolize: Callable[[str], list[str]] | None
                             = None) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from (word, count) pairs.

    Deterministic: the winning pair each round is max count with
    lexicographically-smallest-pair tie-break. ``symbolize`` maps a word
    to its initial symbol sequence — characters by default (no
    end-of-word marker — word-internal merges only, so a word's token
    count is independent of its neighbors), :func:`byte_symbols` for the
    byte-level variant."""
    if symbolize is None:
        symbolize = list
    vocab: list[list] = [[symbolize(w), int(c)] for w, c in word_counts
                         if w]
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
    return encode_symbols(list(word), ranks)


def encode_symbols(syms: list[str],
                   ranks: dict[tuple[str, str], int]) -> list[str]:
    """Rank-greedy merge application over an explicit initial symbol
    sequence (characters for :func:`encode_word`, per-byte hex pairs for
    the byte-level tokenizer)."""
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


# --- byte-level BPE with GPT-2-style pre-tokenization --------------------
# The whitespace tokenizer above fuses punctuation into word tokens, so
# its counts drift from production tokenizers. The byte-level variant
# follows the public GPT-2 recipe (Radford et al. 2019; the released
# regex in openai/gpt-2 encoder.py): pre-tokenize with the contraction /
# letter-run / number-run / punct-run / whitespace alternation, then BPE
# over each pre-token's UTF-8 BYTES, so any input — emoji, CJK, mojibake
# — tokenizes without an OOV path. Symbols are represented as uppercase
# hex pairs ("74", "68", merged "7468"): a per-byte bijection the DuckDB
# oracle can reproduce exactly via hex(encode(tok)), sidestepping GPT-2's
# cosmetic byte<->unicode display table (which only renames symbols and
# cannot change token counts).

# RE2's \s, exactly (ASCII, no \v) — the oracle engine's class; Python's
# unicode-wide \s would disagree on U+00A0 etc.
_WS = frozenset(" \t\n\f\r")
_CONTRACTIONS = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")


def gpt2_pretokenize(text: str) -> list[str]:
    """The GPT-2 pre-tokenizer as an explicit scanner: the ordered
    alternation ``'s|'t|'re|'ve|'m|'ll|'d| ?\\pL+| ?\\pN+|
    ?[^\\s\\pL\\pN]+|\\s+(?!\\S)|\\s+`` with Unicode L*/N* categories
    (via unicodedata) and RE2's ASCII ``\\s``. A scanner instead of a
    regex because stdlib ``re`` has no ``\\p{L}`` and the lookahead is
    exactly one branch — and it pins the semantics independently of any
    regex engine's quirks. ``''.join(result) == text`` always."""
    toks: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "'":
            matched = False
            for s in _CONTRACTIONS:
                if text.startswith(s, i):
                    toks.append(s)
                    i += len(s)
                    matched = True
                    break
            if matched:
                continue
        j = i + 1 if (c == " " and i + 1 < n) else i
        cj = text[j] if j < n else ""
        if cj and cj not in _WS:
            cat = unicodedata.category(cj)[0]
            if cat == "L":
                e = j + 1
                while e < n and unicodedata.category(text[e])[0] == "L":
                    e += 1
                toks.append(text[i:e])
                i = e
                continue
            if cat == "N":
                e = j + 1
                while e < n and unicodedata.category(text[e])[0] == "N":
                    e += 1
                toks.append(text[i:e])
                i = e
                continue
            e = j
            while e < n and text[e] not in _WS and \
                    unicodedata.category(text[e])[0] not in ("L", "N"):
                e += 1
            toks.append(text[i:e])
            i = e
            continue
        # whitespace run: \s+(?!\S) leaves the run's last char for the
        # following " ?X+" alternative; at end-of-string the lookahead
        # succeeds and the run matches whole; a single ws char before
        # non-space falls through to plain \s+
        e = i
        while e < n and text[e] in _WS:
            e += 1
        if e < n and e - i > 1:
            e -= 1
        toks.append(text[i:e])
        i = e
    return toks


def byte_symbols(pretoken: str) -> list[str]:
    """Initial byte-level symbols: one uppercase hex pair per UTF-8 byte
    — DuckDB's ``regexp_extract_all(hex(encode(tok)), '..')`` exactly."""
    return [f"{b:02X}" for b in pretoken.encode("utf-8")]


def bpe_train_bytes(docs: DataFrame, text_col: str = "text", *,
                    num_merges: int = 200,
                    top_pretokens: int = 30_000) -> list[tuple[str, str]]:
    """Train byte-level BPE merges: distributed pre-token counting (the
    kernel pre-aggregates per Arrow batch, so the exchange carries
    (pretoken, partial count) rows, not one row per occurrence), bounded
    top-``top_pretokens`` collect, driver merge loop over hex-pair
    symbols. Same (count desc, token asc) determinism as
    :func:`bpe_train`."""

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter
        for pdf in batches:
            counts: Counter = Counter()
            for text in pdf[text_col]:
                if text:
                    counts.update(gpt2_pretokenize(text))
            if counts:
                yield pd.DataFrame({"tok": list(counts.keys()),
                                    "c": list(counts.values())})

    counts = (docs.select(text_col)
              .mapInPandas(kernel, "tok string, c long")
              .groupBy("tok").agg(F.sum("c").alias("c"))
              .orderBy(F.desc("c"), F.asc("tok"))
              .limit(top_pretokens)
              .collect())
    return train_merges_from_counts(((r["tok"], r["c"]) for r in counts),
                                    num_merges, symbolize=byte_symbols)


def with_bpe_byte_token_counts(docs: DataFrame,
                               merges: list[tuple[str, str]],
                               text_col: str = "text",
                               out_col: str = "n_tokens_bpe_bytes",
                               ) -> DataFrame:
    """All input columns plus ``out_col``: the document's byte-level BPE
    token count under the trained merges — sum over GPT-2 pre-tokens of
    their merged-symbol counts. Same kernel discipline as
    :func:`with_bpe_token_counts`: bounded pre-token memo, mapInPandas,
    no shuffle."""
    memo_limit = 1 << 20
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    schema = StructType(list(docs.schema.fields)
                        + [StructField(out_col, IntegerType(), False)])
    cols = [f.name for f in docs.schema.fields]

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}

        def n_tokens(text) -> int:
            if text is None:
                return 0
            total = 0
            for t in gpt2_pretokenize(text):
                n = memo.get(t)
                if n is None:
                    n = len(encode_symbols(byte_symbols(t), ranks))
                    memo[t] = n
                total += n
            return total

        for pdf in batches:
            if len(memo) > memo_limit:
                memo.clear()
            out = pdf[cols].copy()
            out[out_col] = (pdf[text_col].map(n_tokens).astype("int32"))
            yield out

    return docs.mapInPandas(kernel, schema)
