r"""URL template mining and spider-trap detection.

A frontier at 10^10-URL scale is dominated by a few thousand URL
TEMPLATES per site — `/news/article-{n}`, `/cal/{n}/{n}/{n}`,
`/s/{hex}` — and the classic crawler failure mode is a parameterized
template that generates unbounded URLs (calendar pages, session-id
paths, faceted-search combinatorics: the "spider trap" / "crawler trap"
of Heydon & Najork's Mercator, 1999). The reference app hardcodes its
two pagination templates by hand
(/root/reference/app/controllers/cars_controller.rb:31-43); at corpus
scale template discovery must be a set-oriented job, and the trap
signal feeds the same budget guard as url_filter (L35) and the
politeness scheduler.

Mechanism: collapse each URL's path to a template by masking long hex
runs (>= 8 chars of [0-9a-f] — session ids, content hashes) to '{hex}'
first, then any digit run to '{n}'; group by (host, template). A
template is flagged a trap when it has >= 2 masked slots AND its URL
count reaches `trap_min_urls` — multi-parameter templates are the
cartesian-explosion shape (a one-slot `/article-{n}` is a normal
listing; `/cal/{n}/{n}/{n}` at volume is a calendar trap).

Everything is codegen (two regexp_replace passes + one
map-side-combinable aggregate, no UDF, no join); `min(url)` is kept as
a deterministic example row. The DuckDB oracle replays the same two
regexes with the 'g' flag, so templates, counts, and trap verdicts
match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_RUN = "[0-9a-f]{8,}"
DIGIT_RUN = "[0-9]+"


def url_template(url: Column) -> Column:
    """Collapse a URL's path (query/fragment stripped) to its template."""
    path = F.regexp_extract(url, r"^[a-z]+://[^/?#]*(/[^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    masked = F.regexp_replace(F.lower(path), HEX_RUN, "{hex}")
    return F.regexp_replace(masked, DIGIT_RUN, "{n}")


def url_templates(
    df: DataFrame, url_col: str = "url", trap_min_urls: int = 100
) -> DataFrame:
    """Mine (host, template) groups from `url_col` with trap verdicts.

    Returns (host, template, n_urls, n_slots, example, is_trap) — one
    row per template, count descending semantics left to the caller
    (the driver query orders; the operator stays orderless so partial
    aggregation is free).
    """
    url = F.col(url_col)
    host = F.regexp_extract(url, r"^[a-z]+://([^/:?#]+)", 1)
    t = df.select(host.alias("host"), url_template(url).alias("template"), url.alias("_u"))
    agg = t.groupBy("host", "template").agg(
        F.count("*").alias("n_urls"), F.min("_u").alias("example")
    )
    n_slots = (
        F.length(F.col("template"))
        - F.length(F.regexp_replace(F.col("template"), r"\{", ""))
    ).cast("int")
    return agg.select(
        "host",
        "template",
        "n_urls",
        n_slots.alias("n_slots"),
        "example",
        ((F.col("n_urls") >= trap_min_urls) & (n_slots >= 2)).alias("is_trap"),
    )
