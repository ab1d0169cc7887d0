"""Sitemap XML parsing: URL discovery for the crawl frontier.

Sitemaps (sitemaps.org protocol, referenced by RFC 9309's Sitemap field)
are the crawl scheduler's second discovery channel next to outlink
harvest: a host publishes <urlset> documents (or <sitemapindex> documents
pointing at more sitemaps) listing canonical URLs with optional lastmod /
changefreq / priority hints — exactly the inputs freshness-driven recrawl
scheduling (operators/freshness.py) wants. The reference app has no
sitemap handling (it crawls two fixed sites); this extends the
beyond-reference crawl family (SURVEY §2.1 S11).

Parsing is pure codegen column work — `regexp_extract_all` over the XML
body, then explode — so it distributes over millions of sitemap bodies
with no Python in the hot path, and is ANSI-replayable for the
correctness gate (DuckDB has the same regexp_extract_all). This is a
deliberate regex-not-XML-parser design: the sitemap protocol pins the
element vocabulary, real crawlers (and this operator) must survive the
malformed XML the web actually serves, and a per-row XML DOM parse would
be a Python UDF in the hottest path. Elements may span lines; the regexes
use (?s) dotall groups bounded by the closing tag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_URL_BLOCK = r"(?s)<url>(.*?)</url>"
_SITEMAP_BLOCK = r"(?s)<sitemap>(.*?)</sitemap>"
_LOC = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"
_CHANGEFREQ = r"(?s)<changefreq>\s*(.*?)\s*</changefreq>"
_PRIORITY = r"(?s)<priority>\s*(.*?)\s*</priority>"


def parse_sitemap(
    sitemaps: DataFrame, xml_col: str = "sitemap_xml", host_col: str = "host"
) -> DataFrame:
    """Parse <urlset> bodies into one row per <url> entry.

    Output: (host, loc, lastmod timestamp, changefreq, priority double,
    entry_pos) — missing optional elements are null; entry_pos is the
    0-based position of the entry within its sitemap (document order is
    meaningful for some publishers and keeps downstream sorts
    deterministic)."""
    blocks = sitemaps.select(
        F.col(host_col).alias("host"),
        F.posexplode_outer(
            F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK), 1)
        ).alias("entry_pos", "block"),
    ).filter(F.col("block").isNotNull())
    nullif = lambda c: F.when(c == "", None).otherwise(c)  # noqa: E731
    return blocks.select(
        "host",
        nullif(F.regexp_extract("block", _LOC, 1)).alias("loc"),
        nullif(F.regexp_extract("block", _LASTMOD, 1)).cast("timestamp").alias("lastmod"),
        nullif(F.regexp_extract("block", _CHANGEFREQ, 1)).alias("changefreq"),
        nullif(F.regexp_extract("block", _PRIORITY, 1)).cast("double").alias("priority"),
        F.col("entry_pos").cast("long").alias("entry_pos"),
    ).filter(F.col("loc").isNotNull())


def parse_sitemap_index(
    sitemaps: DataFrame, xml_col: str = "sitemap_xml", host_col: str = "host"
) -> DataFrame:
    """Parse <sitemapindex> bodies into one row per child sitemap:
    (host, loc, lastmod). The caller fetches the children and feeds them
    back through parse_sitemap — index recursion is a frontier concern
    (a wave loop), not an operator concern, same as pagination S3."""
    blocks = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(F.regexp_extract_all(F.col(xml_col), F.lit(_SITEMAP_BLOCK), 1)).alias("block"),
    )
    nullif = lambda c: F.when(c == "", None).otherwise(c)  # noqa: E731
    return blocks.select(
        "host",
        nullif(F.regexp_extract("block", _LOC, 1)).alias("loc"),
        nullif(F.regexp_extract("block", _LASTMOD, 1)).cast("timestamp").alias("lastmod"),
    ).filter(F.col("loc").isNotNull())


def sitemap_frontier_candidates(
    entries: DataFrame, seen: DataFrame, default_priority: float = 0.5
) -> DataFrame:
    """Join parsed sitemap entries against the URL-seen set (left_anti,
    same contract as operators/seen.py) and emit frontier candidates
    ordered by (priority desc, lastmod desc) per host — the discovery-side
    complement of outlink expansion."""
    from pyspark.sql import Window

    cand = entries.join(
        seen.select(F.col("url").alias("loc")), "loc", "left_anti"
    ).select(
        "host",
        F.col("loc").alias("url"),
        F.coalesce("priority", F.lit(default_priority)).alias("priority"),
        "lastmod",
    )
    w = Window.partitionBy("host").orderBy(
        F.desc("priority"), F.desc_nulls_last("lastmod"), F.asc("url")
    )
    return cand.withColumn("host_rank", F.row_number().over(w))
