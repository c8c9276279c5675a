"""URL normalization for crawl dedup keys (all JVM-side expressions).

Canonicalizing urls BEFORE the latest-crawl dedup window collapses
tracking-parameter and case/port variants of the same page into one dedup
key — at crawl scale the same article routinely appears under dozens of
``utm_*``-decorated urls. Rules (conservative, reversible-intent set):

* scheme and host lowercased;
* default ports stripped (``:80`` for http, ``:443`` for https), other
  explicit ports kept;
* fragment removed;
* tracking query parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``mc_eid``), remaining parameters kept in original order;
* an emptied query loses its ``?``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["normalize_url", "TRACKING_PARAM_PREFIXES"]

TRACKING_PARAM_PREFIXES = ("utm_", "fbclid=", "gclid=", "msclkid=", "mc_eid=")


def _keep_param(p: Column) -> Column:
    keep = p != ""
    for pref in TRACKING_PARAM_PREFIXES:
        keep = keep & ~p.startswith(pref)
        if pref.endswith("="):
            # also drop the bare no-value form ('...&fbclid&...')
            keep = keep & (p != pref[:-1])
    return keep


def normalize_url(url) -> Column:
    """Normalized form of a url column (see module docstring for rules)."""
    col = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.parse_url(col, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(col, F.lit("HOST")))
    authority = F.parse_url(col, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port = ((scheme == "http") & (port == "80")) | \
                   ((scheme == "https") & (port == "443"))
    port_part = F.when((port != "") & ~default_port,
                       F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    path = F.coalesce(F.parse_url(col, F.lit("PATH")), F.lit(""))
    query = F.coalesce(F.parse_url(col, F.lit("QUERY")), F.lit(""))
    kept = F.filter(F.split(query, "&"), _keep_param)
    q_part = F.when(F.size(kept) > 0,
                    F.concat(F.lit("?"), F.array_join(kept, "&"))) \
        .otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port_part, path, q_part)
