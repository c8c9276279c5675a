"""URL normalization for crawl dedup keys (all JVM-side expressions).

Canonicalizing urls BEFORE the latest-crawl dedup window collapses
tracking-parameter and case/port variants of the same page into one dedup
key — at crawl scale the same article routinely appears under dozens of
``utm_*``-decorated urls. Rules (conservative, reversible-intent set):

* scheme and host lowercased;
* default ports stripped (``:80`` for http, ``:443`` for https), other
  explicit ports kept;
* fragment removed;
* tracking query parameters dropped case-insensitively (``utm_*``,
  ``fbclid``, ``gclid``, ``msclkid``, ``mc_eid``), remaining parameters
  kept in original order;
* an emptied query loses its ``?``;
* empty path becomes ``/`` (``http://h`` == ``http://h/``, the most common
  variant pair on the web);
* userinfo (``user@host``) is deliberately DROPPED from the canonical key —
  crawlers don't fetch credentialed variants separately; callers that must
  distinguish them should key on the raw url.

Unparseable urls yield NULL (``try_parse_url`` semantics); dedup callers
fall back to the raw url as the key (see
``pipeline.dedup_latest_crawl_canonical``).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["normalize_url", "TRACKING_PARAM_PREFIXES", "url_host",
           "host_suffixes", "filter_blocked_hosts", "cap_per_host",
           "mine_dust_rules", "apply_dust_rules",
           "allocate_crawl_budget"]


def _purl(col: Column, part: str) -> Column:
    # try_parse_url: NULL on malformed urls (plain parse_url THROWS under
    # Spark 4's ANSI default — one bad crawl url must not kill the job)
    return F.try_parse_url(col, F.lit(part))

TRACKING_PARAM_PREFIXES = ("utm_", "fbclid=", "gclid=", "msclkid=", "mc_eid=")


def _keep_param(p: Column) -> Column:
    lp = F.lower(p)  # tracking params match case-insensitively (UTM_Source=)
    keep = p != ""
    for pref in TRACKING_PARAM_PREFIXES:
        keep = keep & ~lp.startswith(pref)
        if pref.endswith("="):
            # also drop the bare no-value form ('...&fbclid&...')
            keep = keep & (lp != pref[:-1])
    return keep


def normalize_url(url) -> Column:
    """Normalized form of a url column (see module docstring for rules)."""
    col = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(_purl(col, "PROTOCOL"))
    host = F.lower(_purl(col, "HOST"))
    authority = _purl(col, "AUTHORITY")
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port = ((scheme == "http") & (port == "80")) | \
                   ((scheme == "https") & (port == "443"))
    port_part = F.when((port != "") & ~default_port,
                       F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    raw_path = F.coalesce(_purl(col, "PATH"), F.lit(""))
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    query = F.coalesce(_purl(col, "QUERY"), F.lit(""))
    kept = F.filter(F.split(query, "&"), _keep_param)
    q_part = F.when(F.size(kept) > 0,
                    F.concat(F.lit("?"), F.array_join(kept, "&"))) \
        .otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port_part, path, q_part)


# --- domain-level corpus controls (RefinedWeb / Dolma practice) ---------

def url_host(url) -> Column:
    """Lowercased host of a url column (NULL for unparseable urls)."""
    col = F.col(url) if isinstance(url, str) else url
    return F.lower(_purl(col, "HOST"))


def host_suffixes(host) -> Column:
    """Every domain suffix of a host: ``a.b.example.com`` ->
    ``[a.b.example.com, b.example.com, example.com, com]``. Bounded by the
    label count (<= ~10 on the real web), so exploding it turns
    subdomain-aware blocklist matching into an EQUALITY join — a broadcast
    hash join instead of the BroadcastNestedLoopJoin an ``endswith`` OR
    chain would force."""
    col = F.col(host) if isinstance(host, str) else host
    parts = F.split(col, r"\.")
    n = F.size(parts)
    return F.transform(F.sequence(F.lit(0), n - 1),
                       lambda i: F.concat_ws(".", F.slice(parts, i + 1, n)))


def filter_blocked_hosts(docs, blocklist, url_col: str = "url"):
    """Drop rows whose url host matches a blocklist entry exactly OR is a
    subdomain of one (RefinedWeb's URL-blocklist gate, arXiv:2306.01116).

    ``blocklist`` is a list[str] of domains (or a 1-column DataFrame).
    Shape: explode each row's host-suffix list (<= ~10 rows per doc, map
    side), broadcast LEFT ANTI hash-join against the (small) blocklist,
    then keep the rows whose id survived — expressed as a semi-join of the
    original rows against the surviving exploded rows so no column is
    lost. Rows with unparseable urls (NULL host) are kept."""
    spark = docs.sparkSession
    if isinstance(blocklist, (list, tuple)):
        bl = spark.createDataFrame([(b.lower(),) for b in blocklist],
                                   ["_blocked_host"])
    else:
        bl = blocklist.toDF("_blocked_host")
    suffixes = docs.select(
        F.col(url_col).alias("_u"),
        F.explode_outer(host_suffixes(url_host(F.col(url_col))))
        .alias("_sfx"))
    hit = (suffixes.join(F.broadcast(bl),
                         suffixes["_sfx"] == bl["_blocked_host"],
                         "left_semi")
           .select("_u").distinct())
    return docs.join(hit, docs[url_col] == hit["_u"], "left_anti")


def cap_per_host(docs, max_per_host: int, url_col: str = "url",
                 id_col: str = "doc_id", salt: str = ""):
    """Keep at most ``max_per_host`` documents per url host, chosen by a
    content-stable hash order (md5 of salt||id, id tiebreak) so the kept
    set is deterministic across partitioning, retries, and engines — the
    per-domain cap RefinedWeb/Dolma apply to stop mega-hosts dominating
    the corpus.

    Skew note: the rank is a ``row_number() <= N`` filter, which Spark
    3.5+ rewrites with WindowGroupLimit — every map task pre-prunes to N
    rows per host BEFORE the exchange, so a 10^9-page host ships
    N x #map-partitions rows, not 10^9, into the window task."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
        16, 10).cast("long")
    from pyspark.sql import Window
    w = (Window.partitionBy(url_host(F.col(url_col)))
         .orderBy(h.asc(), F.col(id_col).asc()))
    return (docs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_per_host).drop("_rn"))


def resolve_redirects(redirects, max_hops: int = 32,
                      src_col: str = "src", dst_col: str = "dst",
                      checkpoint: bool = True):
    """Resolve HTTP redirect chains — every crawl carries a large 3xx
    population whose content lives at the END of a chain, and dedup /
    canonicalization wants the terminal url per source.

    Input: one row per redirecting url (src -> dst). Output: one row
    per src with (final_url, hops, resolved) — ``resolved`` False when
    the chain exceeds ``max_hops`` or loops (cycles never terminate,
    so they surface as capped).

    Shape: POINTER DOUBLING, not step-by-step following — each round
    joins the state with ITSELF (state[u].next := state[state[u].next]
    .next, hops add), so a chain of length h settles in O(log h)
    self-joins instead of O(h) lookups: ceil(log2(max_hops)) shuffles
    total, each over (src, cur, hops) rows only. Lineage is cut per
    round. A src whose cur is not itself a redirect source is already
    terminal and passes through the round unchanged (left join).
    Hops saturate at max_hops + 1 as the not-resolved sentinel so
    cycle hop counts cannot grow unboundedly through doubling."""
    import math

    from pyspark.sql import functions as F

    cap = max_hops + 1
    state = redirects.select(F.col(src_col).alias("u"),
                             F.col(dst_col).alias("cur"),
                             F.lit(1).alias("hops"))
    rounds = max(1, math.ceil(math.log2(max_hops))) if max_hops > 1 else 1
    for _ in range(rounds):
        nxt = state.select(F.col("u").alias("u2"),
                           F.col("cur").alias("cur2"),
                           F.col("hops").alias("hops2"))
        state = (state.join(nxt, state["cur"] == nxt["u2"], "left")
                 .select("u",
                         F.coalesce("cur2", "cur").alias("cur"),
                         F.when(F.col("cur2").isNull(), F.col("hops"))
                         .otherwise(F.least(F.col("hops") + F.col("hops2"),
                                            F.lit(cap)))
                         .alias("hops")))
        if checkpoint:
            state = state.localCheckpoint(eager=False)
    # a cur still pointing at a redirect source after the doublings is
    # an unterminated (cyclic or over-cap) chain
    srcs = redirects.select(F.col(src_col).alias("cur")).distinct() \
        .withColumn("_is_src", F.lit(True))
    return (state.join(srcs, "cur", "left")
            .select(F.col("u").alias("url"),
                    F.col("cur").alias("final_url"),
                    F.least(F.col("hops"), F.lit(cap)).alias("hops"),
                    (F.col("_is_src").isNull()
                     & (F.col("hops") <= max_hops)).alias("resolved")))


# --- DUST: different urls, same text (Bar-Yossef et al., WWW 2007) ------

def _query_params(col: Column) -> Column:
    return F.filter(F.split(F.coalesce(_purl(col, "QUERY"), F.lit("")), "&"),
                    lambda p: p != "")


def _param_name(p: Column) -> Column:
    return F.split(p, "=", 2).getItem(0)


def _rejoin(base: Column, kept: Column) -> Column:
    return F.when(F.size(kept) > 0,
                  F.concat(base, F.lit("?"), F.array_join(kept, "&"))) \
        .otherwise(base)


def mine_dust_rules(pages, *, min_support: int = 2,
                    url_col: str = "url", hash_col: str = "content_hash"):
    """DUST rule mining ("Do Not Crawl in the DUST", Bar-Yossef et al.,
    WWW 2007), specialized to the dominant modern case: per-host query
    PARAMETERS whose removal maps a crawled url onto a DIFFERENT
    crawled url with identical content — session ids, tracking tokens,
    sort toggles. A (host, param) rule is supported by url u when
    dropping every ``param=...`` pair from u yields a distinct url u'
    that also appears in ``pages`` with the same content hash. Returns
    (host, param, support) for rules meeting ``min_support``; feed to
    :func:`apply_dust_rules` to canonicalize before crawl dedup.

    Scale shape — NO pairwise comparison inside duplicate groups (the
    naive DUST join is quadratic in the copy count of a hot error
    page): each url emits one candidate per DISTINCT param name it
    carries (O(#params), crawl urls carry a handful), and support is a
    single equi-join of candidates against the distinct url set on
    (host, stripped-url, hash) — AQE handles host skew — then one
    partial-agg count. Param identity is the name before ``=``; a rule
    drops all pairs of that name."""
    col = F.col(url_col)
    host = F.lower(_purl(col, "HOST"))
    d = (pages.select(col.alias("_url"),
                      F.col(hash_col).alias("_h"),
                      host.alias("_host"))
         .filter(F.col("_host").isNotNull()))
    base = F.split(F.col("_url"), r"\?", 2).getItem(0)
    withp = d.select("_url", "_h", "_host", base.alias("_base"),
                     _query_params(F.col("_url")).alias("_params"))
    names = F.array_distinct(F.transform(F.col("_params"), _param_name))
    cand = (withp.filter(F.size("_params") > 0)
            .select("_url", "_h", "_host", "_base", "_params",
                    F.explode(names).alias("param")))
    kept = F.filter(F.col("_params"),
                    lambda p: _param_name(p) != F.col("param"))
    cand = (cand.select("_host", "param", "_h",
                        F.col("_url").alias("_src"),
                        _rejoin(F.col("_base"), kept).alias("_stripped"))
            .filter(F.col("_stripped") != F.col("_src")))
    targets = d.select(F.col("_host").alias("_host"),
                       F.col("_url").alias("_stripped"), "_h").distinct()
    return (cand.join(targets, ["_host", "_stripped", "_h"])
            .groupBy(F.col("_host").alias("host"), "param")
            .agg(F.count_distinct("_src").alias("support"))
            .filter(F.col("support") >= min_support))


def apply_dust_rules(pages, rules, url_col: str = "url",
                     out_col: str = "url_canonical"):
    """Rewrite every url by dropping its host's mined DUST params.
    The rule set collapses to one (host, [params]) row each and
    BROADCASTS (bounded: hosts-with-rules x param names above the
    support floor — planning-scale, not data-scale), so the rewrite is
    a pure map: no shuffle of the page corpus. Urls with no rules (or
    unparseable) pass through unchanged."""
    per_host = rules.groupBy(F.col("host").alias("_rh")) \
        .agg(F.collect_set("param").alias("_drop"))
    col = F.col(url_col)
    host = F.lower(_purl(col, "HOST"))
    joined = pages.join(F.broadcast(per_host), host == F.col("_rh"), "left")
    base = F.split(col, r"\?", 2).getItem(0)
    kept = F.filter(_query_params(col),
                    lambda p: ~F.array_contains(F.col("_drop"),
                                                _param_name(p)))
    new = F.when(F.col("_drop").isNotNull(), _rejoin(base, kept)) \
        .otherwise(col)
    return joined.withColumn(out_col, F.coalesce(new, col)) \
        .drop("_rh", "_drop")


def allocate_crawl_budget(scores, total_budget: int,
                          id_col: str = "id", weight_col: str = "weight",
                          num_partitions: int | None = None):
    """(id, weight, slots) — apportion ``total_budget`` fetch slots
    across hosts proportional to a score column (PageRank, harmonic,
    quality) by Hamilton's largest-remainder method: slots_i =
    floor(B * w_i / W) plus one extra for the hosts with the largest
    fractional remainders (ties -> smaller id), so sum(slots) ==
    total_budget EXACTLY and the allocation is deterministic across
    engines and partitionings. Zero/negative/NULL weights get 0 slots.

    Scale shape — the only subtle step is ranking remainders without a
    global single-task window: rows range-partition by
    (-remainder, id) so the sort is parallel, per-partition counts
    prefix-sum on the driver (#partitions numbers, the pack_shards
    recipe), and each row's global rank is its partition offset + a
    per-partition row_number. The weight total is one 1-row agg."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = scores.select(F.col(id_col).alias("id"),
                      F.coalesce(F.col(weight_col).cast("double"),
                                 F.lit(0.0)).alias("weight"))
    d = d.withColumn("w", F.when(F.col("weight") > 0, F.col("weight"))
                     .otherwise(F.lit(0.0)))
    total = d.agg(F.sum("w").alias("tw")).collect()[0]["tw"] or 0.0
    if total <= 0 or total_budget <= 0:
        return d.select("id", "weight",
                        F.lit(0).cast("long").alias("slots"))
    raw = F.col("w") * float(total_budget) / float(total)
    base = d.withColumn("base", F.floor(raw).cast("long")) \
        .withColumn("rem", raw - F.floor(raw))
    base_sum = base.agg(F.sum("base").alias("s")).collect()[0]["s"] or 0
    leftover = int(total_budget - base_sum)
    if leftover <= 0:
        return base.select("id", "weight", F.col("base").alias("slots"))
    ranked = base.withColumn("_key", -F.col("rem"))
    if num_partitions:
        ranked = ranked.repartitionByRange(num_partitions, "_key", "id")
    else:
        ranked = ranked.repartitionByRange("_key", "id")
    ranked = ranked.withColumn("_pid", F.spark_partition_id())
    ranked = ranked.localCheckpoint(eager=True)  # pin the range layout
    partials = (ranked.groupBy("_pid").agg(F.count("*").alias("c"))
                .orderBy("_pid").collect())
    offsets, run = {}, 0
    for r in partials:
        offsets[r["_pid"]] = run
        run += r["c"]
    off = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("_pid")) if offsets else F.lit(0)
    w_rank = Window.partitionBy("_pid").orderBy("_key", "id")
    rank = F.row_number().over(w_rank) + off
    return (ranked.withColumn("_rank", rank)
            .select("id", "weight",
                    (F.col("base")
                     + F.when(F.col("_rank") <= leftover, 1)
                     .otherwise(0)).cast("long").alias("slots")))
