"""Sitemap (sitemaps.org XML) seed expansion — the standard companion to
robots.txt for bootstrapping a crawl frontier.

Both halves are pure Catalyst:

- `synthesize_sitemaps` builds the per-domain XML with collect_list +
  array_sort + concat (deterministic bytes: records sort by URL, so the
  document is a pure function of the URL set — partitioning-independent).
- `sitemap_urls` extracts <loc> entries with Spark's built-in `xpath`
  expression (JVM-side XPath 1.0; `local-name()` matching so the
  sitemaps.org default namespace — which plain `//loc` would NOT match —
  and namespace-free documents both work).

Scale shape: one sitemap is one row; extraction is a per-row generator
expression (explode), no Python and no shuffle. A 10^10-URL frontier
bootstrap reads millions of sitemap blobs via binaryFile/text sources,
extracts in the scan stage, and feeds the URLs straight into the frontier's
canonicalize -> seen-filter path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SITEMAP_HEAD = ('<?xml version="1.0" encoding="UTF-8"?>'
                 '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">')


def synthesize_sitemaps(urls: DataFrame, url_col: str = "url",
                        domain_col: str = "domain") -> DataFrame:
    """(domain, url) rows -> one sitemap XML document per domain:
    (domain, xml string). URLs are assumed XML-safe (true for canonicalized
    crawl URLs, which percent-encode the five XML metacharacters' worst
    offenders; a general feed would escape &<> first)."""
    entries = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(url_col)),
            lambda u: F.concat(F.lit("<url><loc>"), u, F.lit("</loc></url>")),
        ),
        "",
    )
    return urls.groupBy(domain_col).agg(
        F.concat(F.lit(_SITEMAP_HEAD), entries, F.lit("</urlset>"))
        .alias("xml")
    )


# the robots.txt Sitemap: directive (sitemaps.org autodiscovery): key is
# case-insensitive, value is a URL, scope is global (not per user-agent).
# Pinned to the Java-regex/RE2 common subset (inline (?im), no lookaround)
# so Spark and DuckDB provably extract the same set.
ROBOTS_SITEMAP_RE = r"(?im)^[ \t]*sitemap:[ \t]*([^ \t\r\n]+)"


def robots_sitemaps(robots: DataFrame, domain_col: str = "domain",
                    body_col: str = "robots_txt") -> DataFrame:
    """Extract Sitemap: directives from robots.txt bodies: (domain,
    sitemap_url), one row per directive. regexp_extract_all + explode —
    runs in the scan stage next to the robots gate itself, so sitemap
    autodiscovery costs the crawl nothing extra."""
    return robots.select(
        F.col(domain_col).alias("domain"),
        F.explode(
            F.regexp_extract_all(F.col(body_col),
                                 F.lit(ROBOTS_SITEMAP_RE), 1)
        ).alias("sitemap_url"),
    )


def sitemap_urls(sitemaps: DataFrame, xml_col: str = "xml",
                 domain_col: str = "domain") -> DataFrame:
    """Extract every <loc> from sitemap XML: (domain, loc) one row per URL.
    xpath runs in the JVM inside the scan stage — zero Python, zero
    shuffle."""
    locs = F.expr(
        f"xpath({xml_col}, '//*[local-name()=\"loc\"]/text()')")
    return sitemaps.select(F.col(domain_col).alias("domain"),
                           F.explode(locs).alias("loc"))
