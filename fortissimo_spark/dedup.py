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

from pyspark.sql import DataFrame, functions as F

__all__ = ["exact_duplicates", "shingle_sets", "minhash_signatures",
           "lsh_candidate_pairs", "verified_near_duplicates", "simhash64",
           "near_duplicate_pairs"]

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
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, n_copies, doc_ids)."""
    return (docs
            .groupBy(F.sha2(F.col(text_col), 256).alias("text_hash"))
            .agg(F.count("*").alias("n_copies"),
                 F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
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
    permutation hash of xxhash64(shingle)."""
    hashes = F.transform("shingles", lambda s: F.abs(F.xxhash64(s)) % _MERSENNE_P)
    sig_cols = []
    for a, b in _coeffs(num_hashes, seed):
        perm = F.transform(hashes, lambda h: (h * a + b) % _MERSENNE_P)  # noqa: B023
        sig_cols.append(F.array_min(perm))
    return shingled.withColumn("sig", F.array(*sig_cols))


def lsh_candidate_pairs(signed: DataFrame, bands: int = 32) -> DataFrame:
    """Band the signature, bucket-join on (band, band_hash), emit (id_a, id_b)
    candidate pairs (id_a < id_b). Shuffle key = (band, hash(slice))."""
    sig_size_expr = F.size("sig")
    # rows per band r = len(sig)/bands, computed with fixed bands
    buckets = (signed
               .select("id", F.posexplode(F.transform(
                   F.sequence(F.lit(0), F.lit(bands - 1)),
                   lambda b: F.xxhash64(F.concat_ws(
                       ",", F.transform(
                           F.slice("sig", b * (sig_size_expr / bands).cast("int") + 1,
                                   (sig_size_expr / bands).cast("int")),
                           lambda v: v.cast("string"))))))
                   .alias("band", "band_hash")))
    joined = (buckets.alias("x")
              .join(buckets.alias("y"),
                    (F.col("x.band") == F.col("y.band"))
                    & (F.col("x.band_hash") == F.col("y.band_hash"))
                    & (F.col("x.id") < F.col("y.id"))))
    return (joined.select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct())


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


def near_duplicate_pairs(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", *, n: int = 3,
                         num_hashes: int = 128, bands: int = 32,
                         threshold: float = 0.5) -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection: shingle → sign → band →
    bucket-join → exact-verify."""
    shingled = shingle_sets(docs, id_col, text_col, n)
    signed = minhash_signatures(shingled, num_hashes)
    candidates = lsh_candidate_pairs(signed.select("id", "sig"), bands)
    return verified_near_duplicates(shingled, candidates, threshold)


def simhash64(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(id, simhash) — 64-bit SimHash over word hashes, fully JVM-side.

    For each bit b: count(+1/-1 over words by bit b of xxhash64(word)); the
    simhash sets bit b when the count is positive.
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    docs = docs.withColumn("_wh", F.transform(words, lambda w: F.xxhash64(w)))

    def merge_for(mask_lit):
        # closure (not default-arg capture: PySpark introspects lambda arity)
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask_lit)) != 0, 1).otherwise(-1)

    sim = None
    for bit in range(64):
        # signed-long literal for the bit mask (bit 63 wraps negative)
        mask = 1 << bit
        mask_lit = mask if mask < (1 << 63) else mask - (1 << 64)
        cnt = F.aggregate(F.col("_wh"), F.lit(0), merge_for(mask_lit))
        term = F.when(cnt > 0, F.lit(mask_lit).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return docs.select(F.col(id_col).alias("id"), sim.alias("simhash"))
