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

__all__ = ["normalize_url", "TRACKING_PARAM_PREFIXES"]


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
