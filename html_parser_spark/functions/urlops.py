"""URL canonicalization — the FIRST dedup stage of a crawl pipeline.

At 100 TB the cheapest duplicate to drop is one you never fetch or parse:
the same page typically appears under many raw URL spellings (tracking
params, case-variant scheme/host, default ports, trailing slashes,
fragments, shuffled query order). Canonicalizing the URL collapses those
spellings to one key, making URL-level dedup a plain groupBy — a
shuffle-on-key with map-side combine, orders of magnitude cheaper than any
content-based near-dup pass downstream (reference analogue: the scalar URL
transforms at parse_walmart.py strip_query / parse_overstock.py prefix
joins, SURVEY.md §2.5 T9-T10, generalized to the crawl-scale surface).

Everything is ``pyspark.sql.functions`` (JVM parse_url + array ops —
whole-stage codegen, no Python), and every rule is replayed exactly by the
DuckDB twin in ``__spark_entry__.oracle_sql`` via regex part-splitting.

Canonical form (lossy on purpose — a *dedup key*, not a fetchable URL):
  - scheme and host lowercased; userinfo dropped
  - default ports dropped (``:443`` for https, ``:80`` for http)
  - path: trailing ``/`` runs stripped; empty path → ``/``
  - query: params split on ``&``, empties and tracking params dropped
    (``utm_*``, ``gclid``, ``fbclid``, ``msclkid``, ``mc_cid``,
    ``mc_eid``, ``ref``), remainder sorted bytewise and rejoined
  - fragment dropped
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["TRACKING_PARAM_RE", "canonicalize_url", "url_dedup"]

# Anchored per-param pattern; a param is dropped when its NAME matches.
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_cid|mc_eid|ref)="


def canonicalize_url(col: str | Column = "url") -> Column:
    """Canonical dedup key for a URL column (rules in the module doc).

    Built on ``parse_url`` (Hive/Java semantics: HOST excludes userinfo
    and port and preserves case; PATH is ``''`` when absent; QUERY is NULL
    when absent — all verified and mirrored by the SQL twin's regexes).
    """
    u = F.col(col) if isinstance(col, str) else col
    proto = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    auth = F.parse_url(u, F.lit("AUTHORITY"))
    port = F.regexp_extract(auth, r":(\d+)$", 1)        # '' when absent
    keep_port = (port != "") & ~(
        ((proto == "https") & (port == "443"))
        | ((proto == "http") & (port == "80")))
    path = F.regexp_replace(F.parse_url(u, F.lit("PATH")), r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.array_sort(F.filter(
        F.split(F.coalesce(F.parse_url(u, F.lit("QUERY")), F.lit("")), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE)))
    qs = F.concat_ws("&", params)
    return F.concat(
        proto, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")))


def url_dedup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-level dedup: one row per canonical URL with the variant count
    and the min raw spelling as the canonical fetch representative.

    groupBy on the canonical key — map-side combinable, no join; at crawl
    scale this runs BEFORE fetch/parse and is the highest-leverage dedup
    in the whole pipeline (it deletes work instead of output)."""
    return (df.groupBy(canonicalize_url(url_col).alias("canonical_url"))
            .agg(F.count(F.lit(1)).alias("n_variants"),
                 F.min(url_col).alias("representative_url")))
