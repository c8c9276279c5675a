#!/usr/bin/env python3
"""Physical-plan audit: verify predicate pushdown, column pruning, broadcast
joins, and shuffle placement on the engine's key plans. Writes
bench/explain_audit.txt. Run: python tools/explain_audit.py [sf_dir]"""

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from fortissimo_spark.io_tables import build_pages, load_table  # noqa: E402
from fortissimo_spark.pipeline import dedup_latest_crawl, extract_df  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench", "explain_audit.txt")


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    sections = []

    # 1. extraction pipeline (window dedup, the scale-safe default):
    #    ONE source scan, ONE uniform hash(url) exchange, no broadcast of
    #    the url universe, kernel directly above the window
    pages = build_pages(spark, SF_DIR)
    ext = extract_df(dedup_latest_crawl(pages), "density") \
        .agg(F.count("*"), F.sum("token_count"))
    p = plan_of(ext)
    sections.append(("extraction (dedup=window default + kernel + agg)", p, [
        ("single source execution (one pages kernel)",
         p.count("_pages_kernel") == 1),
        ("exactly one dedup-key exchange (the window's)",
         p.count("hashpartitioning(_dk") == 1),
        ("no full-universe BroadcastExchange", "BroadcastExchange" not in p),
        ("window top-1 pushed down (WindowGroupLimit)", "WindowGroupLimit" in p),
        ("kernel runs via ArrowEvalPython/MapInPandas", "MapInPandas" in p or "ArrowEval" in p),
    ]))

    # 1b. canonical-url dedup: same single-scan/single-exchange shape (the
    #     canonical key is a map-side expression, not an extra stage)
    from fortissimo_spark.pipeline import dedup_latest_crawl_canonical
    ext_c = extract_df(dedup_latest_crawl_canonical(pages), "density") \
        .agg(F.count("*"))
    p = plan_of(ext_c)
    sections.append(("extraction (canonical-url dedup)", p, [
        ("single source execution", p.count("_pages_kernel") == 1),
        ("single dedup-key exchange", p.count("hashpartitioning(_dk") == 1),
        ("no BroadcastExchange", "BroadcastExchange" not in p),
    ]))

    # 2. q1: filter pushdown + partial aggregation
    li = load_table(spark, SF_DIR, "lineitem")
    q1 = (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(F.sum("l_quantity").alias("sum_qty")))
    p = plan_of(q1)
    sections.append(("q1 filter+agg", p, [
        ("shipdate predicate pushed to parquet", "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p),
        ("column pruning (only 4 cols read)", "ReadSchema: struct<l_quantity" in p),
        ("partial aggregation before shuffle", "partial_sum" in p),
    ]))

    # 3. q5: dimension tables broadcast
    cust = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    nation = load_table(spark, SF_DIR, "nation")
    q5ish = (cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
             .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
             .groupBy("n_name").agg(F.count("*").alias("n")))
    p = plan_of(q5ish)
    sections.append(("join w/ broadcast dim", p, [
        ("nation broadcast", "BroadcastHashJoin" in p),
    ]))

    # 4. metrics-only query must not read the html payload
    pages2 = build_pages(spark, SF_DIR)
    meta_only = pages2.groupBy("lang").count()
    p = plan_of(meta_only)
    sections.append(("pages metrics-only (html prune)", p, [
        # html is produced by the generator kernel, so pruning happens at the
        # documents scan: only doc_id/text/lang are read
        ("documents scan pruned", "ReadSchema: struct<doc_id" in p),
    ]))

    # 5. IVF partition pruning: the cell-partitioned layout turns the probe
    #    filter into PartitionFilters at the scan — the 100TB ANN scale path
    import shutil
    import tempfile
    import time
    from fortissimo_spark.similarity import (
        ivf_topk, ivf_topk_partitioned, write_ivf_partitioned,
    )
    emb = load_table(spark, SF_DIR, "embeddings")
    ivf_dir = tempfile.mkdtemp(prefix="ivf_cells_")
    try:
        write_ivf_partitioned(emb, ivf_dir, n_centroids=8, dim=64, seed=7)
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0)
                .select("embedding").first()[0]]
        pruned_q = ivf_topk_partitioned(spark, ivf_dir, qvec, 10,
                                        n_centroids=8, n_probe=2, dim=64,
                                        seed=7, exclude_vec_id=0)
        p = plan_of(pruned_q)
        # result parity with the in-plan variant + scan metrics after run
        t0 = time.perf_counter()
        pruned_rows = [(r.vec_id, r.cos_sim) for r in pruned_q.collect()]
        t_pruned = time.perf_counter() - t0
        t0 = time.perf_counter()
        full_rows = [(r.vec_id, r.cos_sim)
                     for r in ivf_topk(emb, 0, 10, n_centroids=8, n_probe=2,
                                       dim=64, seed=7).collect()]
        t_full = time.perf_counter() - t0

        def _scan_metric(df, name):
            def walk(node):
                if node.nodeName().startswith("Scan"):
                    it = node.metrics().iterator()
                    while it.hasNext():
                        kv = it.next()
                        if kv._1() == name:
                            return kv._2().value()
                for ci in range(node.children().length()):
                    r = walk(node.children().apply(ci))
                    if r is not None:
                        return r
                return None
            return walk(df._jdf.queryExecution().executedPlan())

        n_parts = _scan_metric(pruned_q, "numPartitions")
        sections.append((
            "IVF ANN over cell-partitioned layout "
            f"(probed scan {t_pruned:.3f}s vs full-corpus assign+scan {t_full:.3f}s)",
            p, [
                ("probe predicate is a PartitionFilter (pruned at scan)",
                 "PartitionFilters" in p and "cell" in p.split("PartitionFilters", 1)[1][:200]),
                ("scan read n_probe=2 of 8 cell partitions (scan metric)",
                 n_parts == 2),
                ("results identical to in-plan ivf_topk", pruned_rows == full_rows),
            ]))
    finally:
        shutil.rmtree(ivf_dir, ignore_errors=True)

    # 6. near-dup verify pruning + canonicalize residual plan: the verify
    #    sides must be LeftSemi-pruned to candidate ids fed from ONE
    #    materialization (checkpointed RDD), and by the time canonicalize
    #    returns, everything but the survivor window + losers anti-join has
    #    already run (clusters materialized during construction)
    from fortissimo_spark.dedup import canonicalize, near_duplicate_pairs
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    pairs = near_duplicate_pairs(docs, threshold=0.5)
    p = pairs._jdf.queryExecution().optimizedPlan().toString()
    sections.append(("near_duplicate_pairs logical plan (verify pruning)", p, [
        ("verify sides LeftSemi-pruned to candidate ids", "LeftSemi" in p),
        ("candidates from one materialization (checkpointed RDD)",
         "LogicalRDD" in p or "ExistingRDD" in p),
        # the sign path (128-hash minhash aggregate) ran once, at checkpoint
        # time — the residual plan re-shingles only the pruned verify sides
        ("no minhash recompute in residual plan",
         p.count("zip_with") <= 4),
    ]))
    kept = canonicalize(docs, threshold=0.5)
    p = kept._jdf.queryExecution().optimizedPlan().toString()
    sections.append(("canonicalize residual plan (dedup endgame)", p, [
        ("residual = two anti-joins on materialized id sets",
         p.count("LeftAnti") == 2),
        ("NO window/sort in the residual plan (the exact-dedup window ran "
         "once, its small loser set checkpointed)", "Window" not in p),
        ("loser sets read from materialized checkpoints",
         "LogicalRDD" in p or "ExistingRDD" in p),
        ("one corpus scan in the residual plan", p.count("Relation") == 1),
    ]))

    # 8. substring-level dedup (r4): gram counts must partial-aggregate
    #    map-side (a 10^9-copy boilerplate gram collapses before the
    #    exchange); span merge windows on doc_id; everything JVM-side
    from fortissimo_spark.dedup import duplicate_spans
    sp = duplicate_spans(docs, k=8, prefilter=None)
    p = plan_of(sp)
    sections.append(("duplicate_spans (substring dedup, lazy plan)", p, [
        ("gram-count exchange keyed on the gram hash",
         "hashpartitioning(gh" in p),
        ("map-side partial aggregation on gram counts",
         "partial_count" in p),
        ("island merge windows on doc_id", "hashpartitioning(doc_id" in p),
        ("no Python stage anywhere", "Python" not in p
         and "MapInPandas" not in p),
    ]))

    # 8b. r5 join-back pre-filter: with the duplicate-hash set pinned and
    #     broadcast, the gram explode feeds the flagged-position filter
    #     with NO exchange — the only shuffles left are the (irreducible)
    #     count exchange, already spent building the checkpoint, and the
    #     per-doc islands window
    sp = duplicate_spans(docs, k=8)  # prefilter="auto" -> broadcast tier
    assert duplicate_spans.last_strategy["strategy"] == "broadcast", \
        duplicate_spans.last_strategy
    p = plan_of(sp)
    sections.append(("duplicate_spans (broadcast pre-filter tier)", p, [
        ("flagged positions via broadcast-hash join",
         "BroadcastHashJoin" in p),
        ("no sort-merge join of the gram explode",
         "SortMergeJoin" not in p),
        ("single exchange in the residual plan (islands window only)",
         len(re.findall(r"^\(\d+\) Exchange$", p, re.M)) == 1),
        ("island merge windows on doc_id", "hashpartitioning(doc_id" in p),
        ("no Python stage anywhere", "Python" not in p
         and "MapInPandas" not in p),
    ]))

    # 9. LM perplexity scoring: both count tables broadcast, no
    #    sort-merge join, one final per-doc regroup
    from fortissimo_spark.lm import train_bigram_lm, with_perplexity
    lm = train_bigram_lm(docs.limit(200))
    p = plan_of(with_perplexity(docs, lm))
    sections.append(("ngram perplexity scoring", p, [
        ("count-table joins are broadcast", p.count("BroadcastHashJoin") >= 3),
        ("no SortMergeJoin", "SortMergeJoin" not in p),
        ("map-side partial aggregation into the per-doc regroup",
         "partial_count" in p or "partial_avg" in p),
        ("no Python stage", "Python" not in p and "MapInPandas" not in p),
    ]))

    # 9b. trigram LM scoring: same bounded-broadcast discipline, one
    #     order higher — all five count joins broadcast, one regroup
    from fortissimo_spark.lm import train_trigram_lm, with_perplexity_trigram
    lm3 = train_trigram_lm(docs.limit(200))
    p = plan_of(with_perplexity_trigram(docs, lm3))
    sections.append(("trigram perplexity scoring", p, [
        ("all five count-table joins broadcast",
         p.count("BroadcastHashJoin") >= 5),
        ("no SortMergeJoin", "SortMergeJoin" not in p),
        ("no Python stage", "Python" not in p and "MapInPandas" not in p),
    ]))

    # 9c. order-5 LM (the CCNet KenLM shape): 2n-1 = 9 broadcast joins,
    #     still exactly one wide exchange (the per-doc regroup)
    from fortissimo_spark.lm import train_ngram_lm, with_perplexity_ngram
    lm5 = train_ngram_lm(docs.limit(200), order=5, top_v=500)
    p = plan_of(with_perplexity_ngram(docs, lm5))
    sections.append(("5-gram perplexity scoring", p, [
        ("all nine count-table joins broadcast",
         p.count("BroadcastHashJoin") >= 9),
        ("no SortMergeJoin", "SortMergeJoin" not in p),
        ("no Python stage", "Python" not in p and "MapInPandas" not in p),
    ]))

    # 10. per-host cap: row_number<=N takes the WindowGroupLimit rewrite
    #     (map tasks pre-prune a mega-host before the exchange)
    from fortissimo_spark.urls import cap_per_host
    urls = docs.select("doc_id", F.concat(
        F.lit("https://h"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".example.com/p/"), F.col("doc_id").cast("string"))
        .alias("url"))
    p = plan_of(cap_per_host(urls, 20))
    sections.append(("cap_per_host (domain cap)", p, [
        ("WindowGroupLimit pre-prune present", "WindowGroupLimit" in p),
        ("no Python stage", "Python" not in p),
    ]))

    # 11. BPE apply: map-side only — composes with upstream layout
    from fortissimo_spark.bpe import with_bpe_token_counts
    p = plan_of(with_bpe_token_counts(docs, [("t", "h"), ("th", "e")]))
    sections.append(("with_bpe_token_counts (BPE apply)", p, [
        ("no shuffle (map-side kernel only)", "Exchange" not in p),
        ("Arrow-batched kernel", "MapInPandas" in p or "ArrowEval" in p),
    ]))

    # 12. composed curation recipe: each stage keeps its audited shape
    #     when chained — partial-agg dedup counts, broadcast LM tables,
    #     broadcast quota join, no Python anywhere
    from fortissimo_spark.pipeline import curate_corpus
    docs_l = load_table(spark, SF_DIR, "documents") \
        .select("doc_id", "lang", "text")
    lm2 = train_bigram_lm(docs_l.limit(200))
    p = plan_of(curate_corpus(docs_l, lm2, ppl_cutoff=100.0,
                              quotas={"en": 10, "es": 5}))
    sections.append(("curate_corpus (composed recipe)", p, [
        ("exact-dedup winners via partial-agg groupBy (no hash window)",
         "partial_min" in p and "WindowGroupLimit" in p),
        ("LM + quota joins broadcast", p.count("BroadcastHashJoin") >= 4),
        ("no SortMergeJoin", "SortMergeJoin" not in p),
        # the quota literal table scans as applySchemaToPythonRDD (a
        # driver-side 2-row RDD, not a per-row Python stage) — check for
        # actual Python EXECUTION operators instead
        ("no per-row Python execution stage",
         all(m not in p for m in ("BatchEvalPython", "ArrowEvalPython",
                                  "MapInPandas", "FlatMapGroupsInPandas"))),
    ]))

    # 13. robots.txt apply: rules broadcast, winner via partial min_by
    #     (map-side combine of the per-host rule fan-out), the ONLY
    #     sort-merge join is the url join-back of (url, decision) rows
    #     onto the payload — the documented at-scale exchange
    import __spark_entry__ as em
    p = plan_of(em._q_robots_apply(spark, SF_DIR))
    sections.append(("robots_apply (RFC 9309 gate)", p, [
        ("binding rules broadcast", "BroadcastHashJoin" in p),
        ("winner picked via partial min_by (map-side combine)",
         "partial_min_by" in p),
        ("shuffle joins bounded: intra-rules parse join + decision "
         "join-back only",
         len(re.findall(r"\(\d+\) SortMergeJoin", p)) <= 2),
        ("no per-row Python execution stage",
         all(m not in p for m in ("BatchEvalPython", "ArrowEvalPython",
                                  "MapInPandas", "FlatMapGroupsInPandas"))),
    ]))

    # 14. PageRank: per-iteration contribution aggregation partial-aggs
    #     (map-side combine before the dst shuffle); the DOM outlink
    #     kernel is the only Python stage in the composed link query
    from fortissimo_spark.graph import pagerank
    nodes = load_table(spark, SF_DIR, "documents") \
        .select(F.col("doc_id").alias("id"))
    edges = nodes.select(F.col("id").alias("src"),
                         ((F.col("id") * 31 + 7) % 500).alias("dst"))
    p = plan_of(pagerank(edges, nodes, num_iters=2, checkpoint=False))
    sections.append(("pagerank (2 power iterations)", p, [
        ("contribution sums partial-agg before the dst shuffle",
         "partial_sum" in p),
        ("no per-row Python execution stage",
         all(m not in p for m in ("BatchEvalPython", "ArrowEvalPython",
                                  "MapInPandas", "FlatMapGroupsInPandas"))),
    ]))

    # 15. exact harmonic centrality: frontier anti-joins the seen set
    #     (LeftAnti), final per-(v,d) counts partial-agg before the
    #     regroup, everything JVM-side
    from fortissimo_spark.graph import harmonic_centrality
    p = plan_of(harmonic_centrality(edges.select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst")),
        nodes.select(F.col("id").cast("string").alias("id")),
        radius=3, checkpoint=False))
    sections.append(("harmonic_centrality (exact, radius 3)", p, [
        ("frontier dedups against seen via anti-join", "LeftAnti" in p),
        ("per-distance counts partial-agg (map-side combine)",
         "partial_count" in p),
        ("no per-row Python execution stage",
         all(m not in p for m in ("BatchEvalPython", "ArrowEvalPython",
                                  "MapInPandas", "FlatMapGroupsInPandas"))),
    ]))

    # 16. HyperBall: the per-round register union is a partial-agg MAX
    #     (map-side combine before the (v, idx) shuffle); the estimate
    #     aggregation partial-aggs too; all JVM
    from fortissimo_spark.graph import hyperball_harmonic
    p = plan_of(hyperball_harmonic(edges.select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst")),
        nodes.select(F.col("id").cast("string").alias("id")),
        radius=2, checkpoint=False))
    sections.append(("hyperball_harmonic (sketch, radius 2)", p, [
        ("register max partial-aggs before the shuffle",
         "partial_max" in p),
        ("denominator sums partial-agg", "partial_sum" in p),
        ("no per-row Python execution stage",
         all(m not in p for m in ("BatchEvalPython", "ArrowEvalPython",
                                  "MapInPandas", "FlatMapGroupsInPandas"))),
    ]))

    # 17. redirect resolution: pointer doubling. Two invariants:
    #     (a) ONE doubling round is a plain self-join + terminal-source
    #         marking join (2 joins, all JVM) — audited un-checkpointed
    #         at max_hops=2 (1 round) where the plan tree is the round;
    #     (b) the production default (checkpoint=True) CUTS lineage per
    #         round, so 32 hops executes ceil(log2(32)) = 5 bounded
    #         rounds rather than compiling an exponential self-join
    #         tree — visible plan past the cut is just the terminal
    #         marking join over the checkpointed state.
    from fortissimo_spark.urls import resolve_redirects
    redirects = nodes.select(
        F.concat(F.lit("/u/"), F.col("id")).alias("src"),
        F.concat(F.lit("/u/"), F.col("id") + 1).alias("dst"))
    p = plan_of(resolve_redirects(redirects, max_hops=2,
                                  checkpoint=False))
    n_joins = len(re.findall(r"\(\d+\) (?:SortMergeJoin|BroadcastHashJoin"
                             r"|ShuffledHashJoin)", p))
    sections.append(("resolve_redirects (one doubling round, no cut)", p, [
        ("one round = self-join + terminal marking join (2 joins)",
         n_joins == 2),
        ("no per-row Python execution stage",
         all(m not in p for m in ("BatchEvalPython", "ArrowEvalPython",
                                  "MapInPandas", "FlatMapGroupsInPandas"))),
    ]))

    p = plan_of(resolve_redirects(redirects, max_hops=32,
                                  checkpoint=True))
    n_joins = len(re.findall(r"\(\d+\) (?:SortMergeJoin|BroadcastHashJoin"
                             r"|ShuffledHashJoin)", p))
    sections.append(("resolve_redirects (cap 32, per-round lineage cut)",
                     p, [
        ("lineage cut: checkpointed state scanned as RDD",
         "ExistingRDD" in p),
        ("only the terminal marking join remains past the cut",
         n_joins <= 2),
    ]))

    # 18. rel=canonical dedup over the one-pass analysis kernel: the
    #     canonical key is a map-side expression over kernel output —
    #     ONE analysis parse (the only MapInPandas beyond the synthetic
    #     page builder), ONE shuffle (the winner window's; the
    #     builder's REPARTITION_BY_NUM is fixture scaffolding), top-1
    #     pushed down
    from fortissimo_spark.kernel import page_analysis
    from fortissimo_spark.pipeline import dedup_canonical
    pages_ts = pages.select("url", "warc_ts", "html")
    p = plan_of(dedup_canonical(page_analysis(pages_ts)))
    sections.append(("dedup_canonical (one-pass kernel + window)", p, [
        ("one analysis parse beyond the page builder",
         len(re.findall(r"\(\d+\) MapInPandas", p)) == 2
         and p.count("_pages_kernel") == 1),
        ("one shuffle beyond the builder repartition",
         len(re.findall(r"ENSURE_REQUIREMENTS", p)) == 1),
        ("window top-1 pushed down (WindowGroupLimit)",
         "WindowGroupLimit" in p),
    ]))

    # 19. BM25 retrieval: the query-term IN filter must land BEFORE the
    #     tf aggregation (only hit postings shuffle), corpus scalars and
    #     df arrive by broadcast, and the top-k compiles to
    #     TakeOrderedAndProject (per-partition heaps, no global sort)
    from fortissimo_spark.textstats import bm25_search
    docs_tbl = load_table(spark, SF_DIR, "documents")
    p = plan_of(bm25_search(docs_tbl, ["spark", "merge", "window"],
                            top_k=15))
    sections.append(("bm25_search (filter-early retrieval)", p, [
        ("query-term IN filter present pre-agg",
         "term#" in p and " IN " in p),
        ("corpus scalars + df broadcast",
         p.count("BroadcastExchange") >= 2),
        ("top-k is TakeOrderedAndProject", "TakeOrderedAndProject" in p),
        ("no per-row Python execution stage",
         all(m not in p for m in ("BatchEvalPython", "ArrowEvalPython",
                                  "MapInPandas", "FlatMapGroupsInPandas"))),
    ]))

    # 25. strip_host_boilerplate: partial-agg line census (no window over
    #     the line hash), anti-join of the flagged set, no Python
    from fortissimo_spark.textstats import strip_host_boilerplate
    hb_in = docs_tbl.select(
        "doc_id", (F.col("doc_id") % 16).cast("string").alias("host"),
        F.col("text"))
    p = plan_of(strip_host_boilerplate(hb_in))
    sections.append(("strip_host_boilerplate (host-template line strip)", p, [
        ("line census partial-aggregates before its exchange",
         "partial_count" in p or "partial count" in p
         or re.search(r"HashAggregate.*keys=\[host", p) is not None),
        ("flagged lines rejoin as an ANTI join (no row-level window)",
         "LeftAnti" in p),
        ("no window function over the line hash",
         re.search(r"Window .*_k#", p) is None),
        ("no per-row Python execution stage",
         all(m not in p for m in ("BatchEvalPython", "ArrowEvalPython",
                                  "MapInPandas", "FlatMapGroupsInPandas"))),
    ]))

    # 26. best_snippet standalone: a pure map — ZERO exchanges, all JVM
    from fortissimo_spark.textstats import best_snippet
    p = plan_of(best_snippet(docs_tbl, ["spark", "merge", "window"]))
    sections.append(("best_snippet (highlight window argmax)", p, [
        ("no shuffle at all (pure map over docs)", "Exchange" not in p),
        ("no per-row Python execution stage",
         all(m not in p for m in ("BatchEvalPython", "ArrowEvalPython",
                                  "MapInPandas", "FlatMapGroupsInPandas"))),
    ]))

    # 27. label_propagation (1 sweep, no lineage cut so the plan is whole):
    #     votes partial-aggregate on (node,label); winner is a bounded
    #     row_number window; no cartesian/nested-loop join
    from fortissimo_spark.graph import label_propagation
    lp_edges = docs_tbl.select((F.col("doc_id") % 16).alias("src"),
                               ((F.col("doc_id") * 7 + 1) % 16).alias("dst"))
    lp_nodes = spark.range(16).select("id")
    p = plan_of(label_propagation(lp_edges, lp_nodes, num_iters=1,
                                  checkpoint=False))
    sections.append(("label_propagation (1 sweep, uncut lineage)", p, [
        ("vote aggregation is a hash aggregate (map-side partial combine)",
         "HashAggregate" in p),
        ("winner pick is a row_number window", "row_number" in p),
        ("no nested-loop/cartesian join",
         "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p),
        ("no per-row Python execution stage",
         all(m not in p for m in ("BatchEvalPython", "ArrowEvalPython",
                                  "MapInPandas", "FlatMapGroupsInPandas"))),
    ]))

    # 28. mine_dust_rules: support via EQUI-join (never nested-loop) and a
    #     partial-agg distinct count
    from fortissimo_spark.urls import mine_dust_rules
    crawl = docs_tbl.select(
        F.concat(F.lit("https://h"), (F.col("doc_id") % 16).cast("string"),
                 F.lit(".example/a/"), F.col("doc_id").cast("string"),
                 F.lit("?id=1&sid=s")).alias("url"),
        F.md5(F.col("text").cast("binary")).alias("content_hash"))
    p = plan_of(mine_dust_rules(crawl))
    sections.append(("mine_dust_rules (DUST param mining)", p, [
        ("support is an equi-join (no nested-loop over dup groups)",
         "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p),
        ("support count hash-aggregates", "HashAggregate" in p),
        ("no per-row Python execution stage",
         all(m not in p for m in ("BatchEvalPython", "ArrowEvalPython",
                                  "MapInPandas", "FlatMapGroupsInPandas"))),
    ]))

    # 29. Kneser-Ney scoring: all three count tables broadcast, one doc
    #     regroup, no Python
    from fortissimo_spark.lm import train_kn_lm, with_perplexity_kn
    kn = train_kn_lm(docs_tbl.limit(200))
    p = plan_of(with_perplexity_kn(docs_tbl, kn))
    sections.append(("with_perplexity_kn (Kneser-Ney scoring)", p, [
        ("three broadcast hash joins (bigram/context/continuation)",
         len(re.findall(r"\(\d+\) BroadcastHashJoin", p)) >= 3),
        ("no sort-merge join anywhere in scoring",
         re.search(r"\(\d+\) SortMergeJoin", p) is None),
        ("no per-row Python execution stage",
         all(m not in p for m in ("BatchEvalPython", "ArrowEvalPython",
                                  "MapInPandas", "FlatMapGroupsInPandas"))),
    ]))

    # 30. importance_resample: pure map + bounded explode — zero exchanges
    from fortissimo_spark.corpus import importance_resample
    p = plan_of(importance_resample(
        docs_tbl.select("doc_id",
                        ((F.col("doc_id") % 25) / 10.0).alias("w")), "w"))
    sections.append(("importance_resample (mixture realization)", p, [
        ("no shuffle at all (map + explode)", "Exchange" not in p),
        ("explode generates the copies", "Generate" in p),
        ("no per-row Python execution stage",
         all(m not in p for m in ("BatchEvalPython", "ArrowEvalPython",
                                  "MapInPandas", "FlatMapGroupsInPandas"))),
    ]))

    # 31. extract_tables: one Arrow kernel over one scan, no shuffle
    from fortissimo_spark.kernel import extract_tables
    tbl_pages = docs_tbl.select(
        F.col("doc_id").cast("string").alias("url"),
        F.encode(F.concat(F.lit("<table><tr><td>"), F.col("text"),
                          F.lit("</table>")), "UTF-8").alias("html"))
    p = plan_of(extract_tables(tbl_pages))
    sections.append(("extract_tables (table-cell kernel)", p, [
        ("kernel runs via MapInPandas (Arrow batches)", "MapInPandas" in p),
        ("exactly one kernel invocation",
         len(re.findall(r"\(\d+\) MapInPandas", p)) == 1),
        ("no shuffle (pure map over pages)", "Exchange" not in p),
    ]))

    # 32. bm25f: both field filters pre-agg, scalars/dfs broadcast,
    #     top-k via ordered limit, no Python
    from fortissimo_spark.textstats import bm25f_search
    anch = docs_tbl.select("doc_id",
                           F.lit("spark merge guide").alias("anchor"))
    p = plan_of(bm25f_search(docs_tbl, anch, ["spark", "merge", "window"],
                             top_k=15))
    sections.append(("bm25f_search (fielded retrieval)", p, [
        ("query-term IN filters present pre-agg (both fields)",
         p.count(" IN ") >= 2),
        ("corpus scalars + per-term dfs broadcast",
         len(re.findall(r"\(\d+\) BroadcastHashJoin", p)) >= 1
         and "BroadcastExchange" in p),
        ("top-k is TakeOrderedAndProject", "TakeOrderedAndProject" in p),
        ("no per-row Python execution stage",
         all(m not in p for m in ("BatchEvalPython", "ArrowEvalPython",
                                  "MapInPandas", "FlatMapGroupsInPandas"))),
    ]))

    # 33. link_reciprocity: reversed-key EQUI join (semi), partial-agg
    #     degree counts, no nested-loop
    from fortissimo_spark.graph import link_reciprocity
    lr_edges = docs_tbl.select((F.col("doc_id") % 16).alias("src"),
                               ((F.col("doc_id") * 7 + 1) % 16).alias("dst"))
    lr_nodes = spark.range(16).select("id")
    p = plan_of(link_reciprocity(lr_edges, lr_nodes))
    sections.append(("link_reciprocity (mutual-link stats)", p, [
        ("reverse-edge check is a semi join", "LeftSemi" in p),
        ("no nested-loop/cartesian join",
         "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p),
        ("degree counts hash-aggregate", "HashAggregate" in p),
        ("no per-row Python execution stage",
         all(m not in p for m in ("BatchEvalPython", "ArrowEvalPython",
                                  "MapInPandas", "FlatMapGroupsInPandas"))),
    ]))

    # 34. sections + template kernels: one Arrow kernel, no shuffle
    from fortissimo_spark.kernel import extract_sections, template_fingerprints
    sec_pages = docs_tbl.select(
        F.col("doc_id").cast("string").alias("url"),
        F.encode(F.concat(F.lit("<body><h1>t</h1><p>"), F.col("text"),
                          F.lit("</p></body>")), "UTF-8").alias("html"))
    for title, frame in (("extract_sections (outline kernel)",
                          extract_sections(sec_pages)),
                         ("template_fingerprints (structural hash kernel)",
                          template_fingerprints(sec_pages))):
        p = plan_of(frame)
        sections.append((title, p, [
            ("exactly one Arrow kernel invocation",
             len(re.findall(r"\(\d+\) MapInPandas", p)) == 1),
            ("no shuffle (pure map over pages)", "Exchange" not in p),
        ]))

    checks_failed = 0
    with open(OUT, "w") as f:
        for title, plan, checks in sections:
            f.write(f"==== {title} ====\n{plan}\n")
            for desc, ok in checks:
                line = f"[{'PASS' if ok else 'FAIL'}] {desc}"
                print(line)
                f.write(line + "\n")
                checks_failed += 0 if ok else 1
            f.write("\n")
    print("wrote", OUT, "failed checks:", checks_failed)
    spark.stop()
    return 1 if checks_failed else 0


if __name__ == "__main__":
    sys.exit(main())
