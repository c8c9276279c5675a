"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``       — exact brute-force top-k vs a query vector; the dot
  product runs JVM-side (zip_with + aggregate), the query side is broadcast.
* ``hyperplane_buckets``— random-hyperplane LSH signature (sign bits of dots
  with H deterministic planes): the scale path. Bucketing turns the O(N)
  scan into a bucket lookup; multi-probe = hamming-adjacent buckets.
* ``cosine_near_pairs`` — near-duplicate embedding pairs via bucket join +
  exact cosine verify (embedding-cosine near-dup dedup).

Planes are generated deterministically on the driver (seeded LCG, unit-free
— only the sign matters) and inlined as literal arrays, so executors need no
side channel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["cosine_topk", "hyperplane_signature", "cosine_near_pairs",
           "hyperplane_bucket_stats",
           "normalize_col", "ivf_centroids", "ivf_fit_centroids",
           "ivf_assign", "ivf_topk",
           "write_ivf_partitioned", "ivf_topk_partitioned",
           "semantic_near_pairs", "semantic_cell_stats", "semantic_dedup",
           "default_subcents"]


def _planes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    state = seed & 0xFFFFFFFFFFFFFFFF
    planes = []
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
            # map to [-1, 1); only the sign of the dot product matters
            row.append((state >> 11) / float(1 << 53) * 2.0 - 1.0)
        planes.append(row)
    return planes


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(c):
    return F.sqrt(F.aggregate(F.transform(c, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def normalize_col(emb_col):
    """L2-normalize an array<double> column (JVM-side)."""
    n = _norm(emb_col)
    return F.transform(emb_col, lambda x: x / n)


def cosine_topk(embeddings: DataFrame, query_vec_id: int, k: int = 10,
                id_col: str = "vec_id", emb_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine similarity to the embedding of ``query_vec_id``."""
    base = embeddings.select(F.col(id_col).alias("vec_id"),
                             F.col(emb_col).cast("array<double>").alias("v"))
    q = base.filter(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    sim = _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))
    return (base.filter(F.col("vec_id") != query_vec_id)
            .crossJoin(F.broadcast(q))
            .select("vec_id", F.round(sim, 4).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), "vec_id")
            .limit(k))


def hyperplane_signature(embeddings: DataFrame, num_planes: int = 16,
                         dim: int = 64, seed: int = 42,
                         id_col: str = "vec_id",
                         emb_col: str = "embedding") -> DataFrame:
    """(vec_id, v, bucket) — bucket = integer of sign bits vs ``num_planes``
    deterministic hyperplanes."""
    planes = _planes(dim, num_planes, seed)
    base = embeddings.select(F.col(id_col).alias("vec_id"),
                             F.col(emb_col).cast("array<double>").alias("v"))
    bucket = None
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(F.col("v"), plane_col) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return base.withColumn("bucket", bucket.cast("long"))


def ivf_centroids(dim: int, n_centroids: int, seed: int = 7) -> list[list[float]]:
    """Deterministic unit-norm coarse-quantizer centroids (seeded LCG).

    With unit centroids, argmax over plain dot products == argmax over
    cosine — so the cell assignment needs no per-centroid norm at runtime.
    At production scale these would come from a sampled k-means fit
    (pyspark.ml.clustering.KMeans) written to a small centroids table; the
    assignment/probe/search plan below is identical either way.
    """
    raw = _planes(dim, n_centroids, seed)
    out = []
    for c in raw:
        norm = sum(x * x for x in c) ** 0.5 or 1.0
        out.append([x / norm for x in c])
    return out


def ivf_fit_centroids(embeddings: DataFrame, n_centroids: int = 8, *,
                      seed: int = 7, sample_fraction: float = 1.0,
                      emb_col: str = "embedding") -> list[list[float]]:
    """Production coarse quantizer: k-means over (a sample of) the corpus
    (``pyspark.ml.clustering.KMeans``), L2-normalized so the one-pass
    dot-product argmax in :func:`ivf_assign` stays valid. At 100 TB fit on
    a small ``sample_fraction`` — k-means quality saturates long before the
    full corpus — then assignment is the embarrassingly-parallel pass.
    Drop-in wherever :func:`ivf_centroids` literals are accepted
    (``ivf_assign`` / ``ivf_topk`` / :func:`write_ivf_partitioned`)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    src = embeddings
    if sample_fraction < 1.0:
        src = src.sample(fraction=sample_fraction, seed=seed)
    feats = src.select(array_to_vector(
        F.col(emb_col).cast("array<double>")).alias("features"))
    model = KMeans(k=n_centroids, seed=seed).fit(feats)
    out = []
    for c in model.clusterCenters():
        vec = [float(x) for x in c]
        norm = sum(x * x for x in vec) ** 0.5 or 1.0
        out.append([x / norm for x in vec])
    return out


def _cell_struct_array(v_col, cents):
    """array<struct<s: dot, negcid>> — sortable cell-preference list.
    Struct comparison is lexicographic: highest dot first, then highest
    -cid == SMALLEST centroid id (the deterministic tie-break both the
    engine and the DuckDB oracle use)."""
    return F.array(*[
        F.struct(_dot(v_col, F.array(*[F.lit(x) for x in c])).alias("s"),
                 F.lit(-i).alias("negcid"))
        for i, c in enumerate(cents)])


def ivf_assign(embeddings: DataFrame, cents: list[list[float]],
               id_col: str = "vec_id", emb_col: str = "embedding") -> DataFrame:
    """(vec_id, v, cell) — one-pass argmax assignment: greatest() over the
    per-centroid dot structs, NO explode/shuffle (the corpus never
    multiplies by n_centroids)."""
    base = embeddings.select(F.col(id_col).alias("vec_id"),
                             F.col(emb_col).cast("array<double>").alias("v"))
    return base.withColumn("cell", _argmax_cell(F.col("v"), cents))


def _argmax_cell(vcol, cents: list[list[float]]):
    """Argmax-dot cell id as a single JVM expression ((dot desc, cid asc)
    tie-break, no explode): greatest() over per-centroid structs."""
    best = F.greatest(*[
        F.struct(_dot(vcol, F.array(*[F.lit(x) for x in c])).alias("s"),
                 F.lit(-i).alias("negcid"))
        for i, c in enumerate(cents)])
    return (-best["negcid"]).cast("int")


def ivf_topk(embeddings: DataFrame, query_vec_id: int, k: int = 10, *,
             n_centroids: int = 8, n_probe: int = 2, dim: int = 64,
             seed: int = 7, id_col: str = "vec_id",
             emb_col: str = "embedding",
             cents: list[list[float]] | None = None) -> DataFrame:
    """IVF-style approximate top-k: assign corpus vectors to coarse cells
    (one JVM-side pass), probe the query's ``n_probe`` nearest cells, exact
    cosine only within the probed cells.

    Scale shape: the 100 TB path scans |corpus| * n_probe / n_centroids
    vectors instead of all of them; assignment is embarrassingly parallel
    and the probed-cell filter is a partition-prunable predicate when the
    corpus is written partitioned by cell.
    """
    if cents is None:
        cents = ivf_centroids(dim, n_centroids, seed)
    assigned = ivf_assign(embeddings, cents, id_col, emb_col)

    q = assigned.filter(F.col("vec_id") == query_vec_id)
    prefs = F.slice(F.sort_array(_cell_struct_array(F.col("v"), cents), False),
                    1, n_probe)
    q = q.select(F.col("v").alias("qv"),
                 F.transform(prefs, lambda st: (-st["negcid"]).cast("int"))
                 .alias("probe_cells"))

    cand = (assigned.filter(F.col("vec_id") != query_vec_id)
            .crossJoin(F.broadcast(q))
            .filter(F.array_contains("probe_cells", F.col("cell"))))
    sim = _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))
    return (cand.select("vec_id", F.round(sim, 4).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), "vec_id")
            .limit(k))


def write_ivf_partitioned(embeddings: DataFrame, path: str, *,
                          n_centroids: int = 8, dim: int = 64, seed: int = 7,
                          id_col: str = "vec_id",
                          emb_col: str = "embedding",
                          cents: list[list[float]] | None = None) -> list[list[float]]:
    """Write the IVF-assigned corpus PARTITIONED BY cell — the production
    layout where the probe filter becomes a partition-pruning predicate
    (the scan reads n_probe of n_centroids directories, not the corpus).
    Assignment is the same one-pass ``greatest()`` as :func:`ivf_assign`;
    the write shuffles once on ``cell`` (uniform by construction for
    LCG centroids; a k-means fit should repartition by cell + salt any
    mega-cell). Pass ``cents`` (e.g. from :func:`ivf_fit_centroids`) to
    use a fitted quantizer; the SAME list must then go to
    :func:`ivf_topk_partitioned` — returns the centroids used so callers
    can thread them through."""
    if cents is None:
        cents = ivf_centroids(dim, n_centroids, seed)
    assigned = ivf_assign(embeddings, cents, id_col, emb_col)
    (assigned.select("vec_id", "v", "cell")
     .repartition("cell")
     .write.mode("overwrite").partitionBy("cell").parquet(path))
    return cents


def ivf_topk_partitioned(spark, path: str, query_vec: list[float],
                         k: int = 10, *, n_centroids: int = 8,
                         n_probe: int = 2, dim: int = 64, seed: int = 7,
                         exclude_vec_id: int | None = None,
                         cents: list[list[float]] | None = None) -> DataFrame:
    """IVF top-k over the cell-partitioned table written by
    :func:`write_ivf_partitioned`.

    Probe cells are chosen DRIVER-side from the query vector (n_centroids
    dot products — trivially cheap, and the production shape: the query
    arrives at the driver anyway), so ``cell IN (...)`` is a literal
    predicate the scan can partition-prune: ``.explain`` shows
    PartitionFilters on ``cell`` and a pruned partition count. Identical
    tie-break (highest dot, then smallest centroid id) and float order as
    :func:`ivf_topk`, so results match the in-plan variant exactly.
    ``cents`` must be the SAME list the table was written with (fitted or
    LCG) — probing a fitted table with LCG cells returns wrong
    neighbors."""
    if cents is None:
        cents = ivf_centroids(dim, n_centroids, seed)
    dots = sorted(((sum(a * b for a, b in zip(query_vec, c)), -i)
                   for i, c in enumerate(cents)), reverse=True)
    probes = [-neg for _, neg in dots[:n_probe]]
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = _dot(F.col("v"), qv) / (_norm(F.col("v")) * _norm(qv))
    tbl = spark.read.parquet(path).filter(F.col("cell").isin(probes))
    if exclude_vec_id is not None:
        tbl = tbl.filter(F.col("vec_id") != exclude_vec_id)
    return (tbl.select("vec_id", F.round(sim, 4).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), "vec_id")
            .limit(k))


def cosine_near_pairs(embeddings: DataFrame, threshold: float = 0.9,
                      num_planes: int = 12, dim: int = 64, seed: int = 42,
                      num_probes: int = 4, id_col: str = "vec_id",
                      emb_col: str = "embedding",
                      max_bucket_size: int = 1000) -> DataFrame:
    """Embedding near-dup pairs: hyperplane bucket join + exact cosine verify.

    Recall note: single-table LSH misses pairs split across buckets;
    ``num_probes`` unions independently-seeded plane sets (multi-probe) —
    a pair is a candidate if ANY probe buckets them together. Verification
    is exact, so precision is 1.0 regardless.

    Degenerate-bucket guard: each probe's buckets are capped at
    ``max_bucket_size`` members (first K by id), bounding a hot bucket —
    e.g. a constant embedding column — at K(K-1)/2 candidate pairs instead
    of quadratic blowup. 0 disables the cap.
    """
    candidates = None
    for probe in range(num_probes):
        sig = hyperplane_signature(embeddings, num_planes, dim, seed + probe,
                                   id_col, emb_col)
        buckets = sig.select("vec_id", "bucket")
        if max_bucket_size:
            from pyspark.sql import Window
            w = Window.partitionBy("bucket").orderBy("vec_id")
            buckets = (buckets.withColumn("_rn", F.row_number().over(w))
                       .filter(F.col("_rn") <= max_bucket_size).drop("_rn"))
        a = buckets.select(F.col("vec_id").alias("id_a"), F.col("bucket"))
        b = buckets.select(F.col("vec_id").alias("id_b"), F.col("bucket"))
        cand = (a.join(b, "bucket")
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b"))
        candidates = cand if candidates is None else candidates.union(cand)
    candidates = candidates.distinct()

    base = embeddings.select(F.col(id_col).alias("vec_id"),
                             F.col(emb_col).cast("array<double>").alias("v"))
    va = base.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    vb = base.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    sim = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (candidates.join(va, "id_a").join(vb, "id_b")
            .select("id_a", "id_b", F.round(sim, 6).alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold))


def hyperplane_bucket_stats(embeddings: DataFrame, num_planes: int = 12,
                            dim: int = 64, seed: int = 42,
                            num_probes: int = 4,
                            max_bucket_size: int = 1000,
                            id_col: str = "vec_id",
                            emb_col: str = "embedding") -> DataFrame:
    """Observability for :func:`cosine_near_pairs`' bucket cap — the same
    no-silent-caps contract as ``dedup.lsh_bucket_stats``: one row per
    (probe, bucket) LARGER than ``max_bucket_size``, with the member and
    dropped counts. Members past the cap are excluded from candidate
    generation in that probe (a recall trade-off); an empty result means
    the cap never bit. A hot bucket here usually means a constant or
    near-constant embedding column (dead encoder, zero vectors) that
    should be filtered upstream. ``max_bucket_size=0`` (cap disabled in
    :func:`cosine_near_pairs`) returns an empty frame — nothing can be
    dropped when there is no cap."""
    if not max_bucket_size:
        return (embeddings.sparkSession.createDataFrame(
            [], "probe int, bucket long, n_members long, n_dropped long"))
    out = None
    for probe in range(num_probes):
        sig = hyperplane_signature(embeddings, num_planes, dim, seed + probe,
                                   id_col, emb_col)
        stats = (sig.groupBy("bucket")
                 .agg(F.count("*").alias("n_members"))
                 .filter(F.col("n_members") > max_bucket_size)
                 .select(F.lit(probe).alias("probe"), "bucket", "n_members",
                         (F.col("n_members") - max_bucket_size)
                         .alias("n_dropped")))
        out = stats if out is None else out.union(stats)
    return out


def semantic_near_pairs(embeddings: DataFrame, threshold: float = 0.95, *,
                        cents: list[list[float]],
                        max_cell_size: int = 10_000,
                        split_hot_cells: bool = True,
                        subcents: list[list[float]] | None = None,
                        id_col: str = "vec_id",
                        emb_col: str = "embedding") -> DataFrame:
    """(id_a, id_b, cos_sim) — embedding near-dup pairs found WITHIN
    coarse-quantizer cells (SemDedup, Abbas et al. 2023, arXiv:2303.09540:
    cluster first, compare only inside each cluster). The cell is the
    blocking key, so candidate generation is a self-join on ``cell`` —
    sum-of-cell-size² work instead of corpus², and near-dups always land
    in the same cell when they are truly near (the documented SemDedup
    recall trade-off for pairs that straddle a cell boundary).

    Hot cells are RE-QUANTIZED before any cap bites
    (``split_hot_cells``, default on): members of a cell larger than
    ``max_cell_size`` get a second-level assignment against
    ``subcents`` (deterministic finer centroids; per-cell counts are a
    tiny broadcast — at most ``len(cents)`` rows), so a mega-cell's
    within-cell self-join cost drops from Θ(cell²) toward
    Θ(Σ subcell²) while near-identical vectors — which land in the same
    subcell by construction — keep their pairs, instead of the tail of
    the cell being truncated away. The recall trade-off moves from
    "members past the cap are invisible" to the much weaker "pairs
    straddling a SUBcell boundary inside a hot cell are missed" (the
    same boundary trade-off SemDedup already accepts at level one).
    Cells at/below the cap never split, so results off the hot path are
    unchanged.

    Any (cell, subcell) STILL over the cap after splitting is capped
    deterministically (row_number by id, taking the WindowGroupLimit
    map-side pre-prune); :func:`semantic_cell_stats` surfaces any block
    the residual cap bit — the same no-silent-caps contract as the LSH
    operators."""
    assigned = _blocked_cells(embeddings, cents, max_cell_size,
                              split_hot_cells, subcents, id_col, emb_col)
    if max_cell_size:
        from pyspark.sql import Window
        w = Window.partitionBy("cell", "sub").orderBy("vec_id")
        assigned = (assigned.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") <= max_cell_size).drop("_rn"))
    a = assigned.select(F.col("vec_id").alias("id_a"),
                        F.col("v").alias("va"), "cell", "sub")
    b = assigned.select(F.col("vec_id").alias("id_b"),
                        F.col("v").alias("vb"), "cell", "sub")
    sim = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va"))
                                            * _norm(F.col("vb")))
    return (a.join(b, ["cell", "sub"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.round(sim, 6).alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold))


def default_subcents(dim: int, n_subcells: int = 8) -> list[list[float]]:
    """The deterministic second-level quantizer hot-cell splitting uses
    when the caller passes none (seed fixed so Spark and the DuckDB
    oracle derive identical literals)."""
    return ivf_centroids(dim, n_subcells, seed=9001)


def _blocked_cells(embeddings: DataFrame, cents: list[list[float]],
                   max_cell_size: int, split_hot_cells: bool,
                   subcents: list[list[float]] | None,
                   id_col: str, emb_col: str) -> DataFrame:
    """(vec_id, v, cell, sub): first-level assignment plus the hot-cell
    second-level subcell (-1 for members of cells at/below the cap, and
    everywhere when splitting is off)."""
    assigned = ivf_assign(embeddings, cents, id_col, emb_col)
    if not (max_cell_size and split_hot_cells):
        return assigned.withColumn("sub", F.lit(-1))
    if subcents is None:
        subcents = default_subcents(len(cents[0]))
    counts = assigned.groupBy("cell").agg(F.count("*").alias("_n"))
    return (assigned.join(F.broadcast(counts), "cell")
            .withColumn("sub",
                        F.when(F.col("_n") > max_cell_size,
                               _argmax_cell(F.col("v"), subcents))
                        .otherwise(F.lit(-1)))
            .drop("_n"))


def semantic_cell_stats(embeddings: DataFrame, *,
                        cents: list[list[float]],
                        max_cell_size: int = 10_000,
                        split_hot_cells: bool = True,
                        subcents: list[list[float]] | None = None,
                        id_col: str = "vec_id",
                        emb_col: str = "embedding") -> DataFrame:
    """One row per (cell, sub) block larger than ``max_cell_size`` AFTER
    hot-cell splitting (members + dropped) — the cap observability
    companion to :func:`semantic_near_pairs`, under the identical
    blocking. With splitting on, a row here means a subcell of a hot
    cell is itself over the cap (finer ``subcents`` needed); with
    ``split_hot_cells=False`` it reports over-cap cells directly
    (``sub`` = -1)."""
    return (_blocked_cells(embeddings, cents, max_cell_size,
                           split_hot_cells, subcents, id_col, emb_col)
            .groupBy("cell", "sub").agg(F.count("*").alias("n_members"))
            .filter(F.col("n_members") > max_cell_size)
            .select("cell", "sub", "n_members",
                    (F.col("n_members") - max_cell_size).alias("n_dropped")))


def semantic_dedup(embeddings: DataFrame, threshold: float = 0.95, *,
                   cents: list[list[float]],
                   max_cell_size: int = 10_000,
                   split_hot_cells: bool = True,
                   subcents: list[list[float]] | None = None,
                   id_col: str = "vec_id",
                   emb_col: str = "embedding") -> DataFrame:
    """(vec_id, canonical_id) for every vector that LOSES to a
    near-duplicate with a smaller id: SemDedup's keep-one-per-group over
    the connected components of the within-cell near-pair graph. The
    surviving corpus is ``embeddings`` anti-joined with these rows."""
    from .dedup import duplicate_clusters
    pairs = semantic_near_pairs(embeddings, threshold, cents=cents,
                                max_cell_size=max_cell_size,
                                split_hot_cells=split_hot_cells,
                                subcents=subcents,
                                id_col=id_col, emb_col=emb_col)
    clusters = duplicate_clusters(pairs.select("id_a", "id_b"))
    return (clusters.filter(F.col("id") != F.col("cluster_id"))
            .select(F.col("id").alias(id_col),
                    F.col("cluster_id").alias("canonical_id")))
