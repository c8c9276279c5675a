"""robots.txt rules engine (crawl-compliance leg; JVM-side throughout).

A Common-Crawl-style pipeline must be able to answer "was this page
allowed for our agent?" at corpus scale. This module parses raw
robots.txt bodies into per-agent rule groups and applies them to a pages
table with Google-REP matching semantics (the de-facto public standard,
RFC 9309):

* groups are delimited by ``User-agent`` lines; consecutive
  ``User-agent`` lines share one group; blank lines and comments are
  ignored (RFC 9309 §2.2);
* agent selection: if any group names the target agent exactly
  (case-insensitive token), only those groups apply; otherwise the
  ``*`` groups apply;
* ``Allow``/``Disallow`` patterns support ``*`` wildcards and a ``$``
  end anchor; the most specific (longest raw pattern) match wins and
  ``allow`` wins length ties (RFC 9309 §2.2.2);
* an empty ``Disallow:`` value imposes no restriction; a page matched
  by no rule is allowed.

Scale shape: robots bodies are one small row per host (bounded by the
host count, not the page count), so the parsed rules broadcast to the
pages side — the apply is ONE broadcast join + one per-url window over
the handful of matching rules, no all-pairs, no Python. The pattern →
RE2 translation is done with JVM ``regexp_replace`` expressions so the
whole plan stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["parse_robots_txt", "robots_rules_for_agent", "apply_robots",
           "robots_crawl_delays", "robots_sitemaps", "robots_pattern_regex"]


def _directive_lines(robots: DataFrame, host_col: str,
                     body_col: str) -> DataFrame:
    """(host, ln, key, value) for every ``key: value`` directive line,
    comments stripped, blank lines dropped, line order preserved."""
    lines = (robots
             .select(F.col(host_col).alias("host"),
                     F.posexplode(F.split(F.col(body_col), "\r?\n"))
                     .alias("ln", "line"))
             .withColumn("line", F.trim(F.regexp_replace("line", "#.*$", "")))
             .filter(F.col("line") != "")
             .filter(F.col("line").contains(":")))
    key = F.lower(F.trim(F.substring_index("line", ":", 1)))
    # value = everything after the FIRST colon (sitemap urls contain ':')
    value = F.trim(F.expr("substring(line, instr(line, ':') + 1)"))
    return lines.select("host", "ln", key.alias("key"), value.alias("value"))


def parse_robots_txt(robots: DataFrame, host_col: str = "host",
                     body_col: str = "body") -> DataFrame:
    """Parse robots.txt bodies into one row per (agent, rule) pair:
    ``(host, group_id, agent, rule, pattern)`` with rule in
    ('allow', 'disallow'). Group structure follows RFC 9309 §2.2:
    a ``User-agent`` run starts a group shared by all its agents."""
    d = _directive_lines(robots, host_col, body_col)
    w = Window.partitionBy("host").orderBy("ln")
    is_ua = (F.col("key") == "user-agent")
    starts = is_ua & ~F.coalesce(F.lag(is_ua.cast("int")).over(w) == 1,
                                 F.lit(False))
    d = d.withColumn("group_id",
                     F.sum(starts.cast("int")).over(w))
    agents = (d.filter(is_ua)
              .select("host", "group_id",
                      F.lower(F.col("value")).alias("agent")))
    rules = (d.filter(F.col("key").isin("allow", "disallow"))
             .filter(F.col("group_id").isNotNull())  # rules before any UA line are orphans
             .filter(F.col("value") != "")           # empty Disallow: = no rule
             .select("host", "group_id", F.col("key").alias("rule"),
                     F.col("value").alias("pattern")))
    return agents.join(rules, ["host", "group_id"]) \
        .select("host", "group_id", "agent", "rule", "pattern")


def robots_pattern_regex(pattern: Column) -> Column:
    """Translate a robots path pattern to an anchored RE2/Java regex:
    escape regex metacharacters, ``*`` -> ``.*``, trailing ``$`` -> end
    anchor (``$`` elsewhere is literal). Pure JVM expressions so both
    Spark and the DuckDB oracle can run the identical translation."""
    anchored = pattern.endswith("$")
    core = F.when(anchored,
                  F.substring(pattern, F.lit(1), F.length(pattern) - 1)) \
        .otherwise(pattern)
    esc = F.regexp_replace(core, r"[.^$+?(){}\[\]|\\]", r"\\$0")
    starred = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(F.lit("^"), starred,
                    F.when(anchored, F.lit("$")).otherwise(F.lit("")))


def robots_rules_for_agent(rules: DataFrame, agent: str) -> DataFrame:
    """Select the rule groups that bind ``agent`` per host (exact
    case-insensitive agent token if any group names it, else ``*``) and
    attach the compiled regex + specificity. Output is one small row per
    binding rule — broadcastable."""
    agent = agent.lower()
    cand = rules.filter(F.col("agent").isin(agent, "*"))
    picked = (cand
              .withColumn("_has_specific",
                          F.max((F.col("agent") == agent).cast("int"))
                          .over(Window.partitionBy("host")))
              .filter((F.col("agent") == agent)
                      == (F.col("_has_specific") == 1))
              .drop("_has_specific"))
    return (picked
            .withColumn("regex", robots_pattern_regex(F.col("pattern")))
            .withColumn("specificity", F.length("pattern"))
            .select("host", "rule", "pattern", "regex", "specificity")
            .distinct())


def apply_robots(pages: DataFrame, rules: DataFrame, agent: str,
                 url_col: str = "url") -> DataFrame:
    """Annotate every page with ``allowed`` / ``matched_rule`` /
    ``matched_pattern`` under ``agent``'s binding rules.

    Plan: broadcast the (tiny, per-host) rule set, left-join on host,
    keep regex-matching rules, pick the winner per url with ONE window
    (specificity desc, allow-first tie-break — RFC 9309 §2.2.2), then
    left-join winners back onto the full pages frame so rule-less pages
    stay allowed. Two broadcast joins + one window over matched rows
    only; no shuffle of the pages payload."""
    binding = robots_rules_for_agent(rules, agent)
    host = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    path = F.coalesce(F.try_parse_url(F.col(url_col), F.lit("PATH")),
                      F.lit("/"))
    keyed = pages.withColumn("_host", host).withColumn("_path", path)
    matched = (keyed.select(F.col(url_col).alias("_murl"), "_host", "_path")
               .join(F.broadcast(binding),
                     F.col("_host") == binding["host"], "inner")
               .filter(F.expr("rlike(_path, regex)")))
    w = (Window.partitionBy("_murl")
         .orderBy(F.col("specificity").desc(),
                  F.when(F.col("rule") == "allow", 0).otherwise(1),
                  "pattern"))
    winners = (matched
               .withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") == 1)
               .select(F.col("_murl"),
                       F.col("rule").alias("matched_rule"),
                       F.col("pattern").alias("matched_pattern")))
    out = (keyed.join(F.broadcast(winners),
                      keyed[url_col] == winners["_murl"], "left")
           .withColumn("allowed",
                       F.coalesce(F.col("matched_rule") == "allow",
                                  F.lit(True)))
           .drop("_murl", "_host", "_path"))
    return out


def robots_crawl_delays(robots: DataFrame, agent: str,
                        host_col: str = "host",
                        body_col: str = "body") -> DataFrame:
    """(host, crawl_delay_s) for the groups binding ``agent`` (same
    group-selection rule as the path rules; min across its groups)."""
    agent = agent.lower()
    d = _directive_lines(robots, host_col, body_col)
    w = Window.partitionBy("host").orderBy("ln")
    is_ua = (F.col("key") == "user-agent")
    starts = is_ua & ~F.coalesce(F.lag(is_ua.cast("int")).over(w) == 1,
                                 F.lit(False))
    d = d.withColumn("group_id", F.sum(starts.cast("int")).over(w))
    agents = (d.filter(is_ua)
              .select("host", "group_id",
                      F.lower(F.col("value")).alias("agent")))
    cand = agents.filter(F.col("agent").isin(agent, "*"))
    picked = (cand
              .withColumn("_has_specific",
                          F.max((F.col("agent") == agent).cast("int"))
                          .over(Window.partitionBy("host")))
              .filter((F.col("agent") == agent)
                      == (F.col("_has_specific") == 1))
              .select("host", "group_id").distinct())
    delays = (d.filter(F.col("key") == "crawl-delay")
              .select("host", "group_id",
                      F.col("value").cast("double").alias("crawl_delay_s")))
    return (delays.join(picked, ["host", "group_id"])
            .groupBy("host")
            .agg(F.min("crawl_delay_s").alias("crawl_delay_s")))


def robots_sitemaps(robots: DataFrame, host_col: str = "host",
                    body_col: str = "body") -> DataFrame:
    """(host, sitemap_url) rows — Sitemap directives are group-independent
    (RFC 9309 §2.4)."""
    d = _directive_lines(robots, host_col, body_col)
    return (d.filter(F.col("key") == "sitemap")
            .select("host", F.col("value").alias("sitemap_url"))
            .distinct())
