r"""RFC 9309 robots.txt parsing and longest-match Allow/Disallow decisions.

operators/robots.py enforces ALREADY-PARSED rule tables (ST6); this module
produces those tables from raw robots.txt text, at frontier scale, with the
real grammar: comment stripping, user-agent group selection (exact product
token beats '*'; multiple adjacent User-agent lines share one group; all
groups at the winning specificity merge), Allow/Disallow patterns with '*'
wildcards and '$' end anchors, and longest-pattern-wins precedence with
Allow winning ties. The reference app ignores robots entirely
(/root/reference/public/robots.txt:1 is a placeholder); north_rule adds
robots enforcement, and a 10^10-URL crawl parses millions of robots.txt
bodies — so parsing must be a distributed column job, not a driver loop.

Everything is native column ops (split/posexplode/regexp/window) — no
Python in the hot path — and every step is ANSI-SQL-replayable, so the
parser and the decision operator are both driven through the DuckDB
correctness gate, and the test suite cross-checks decisions against
CPython's urllib.robotparser on wildcard-free files (where the 1994
first-match and RFC 9309 longest-match semantics coincide).

Scale design:
- Parsing is embarrassingly parallel per (host, robots_txt) row; the only
  shuffle is the per-host window (tiny rows: one per meaningful line).
- The rules output is host-keyed and orders of magnitude smaller than the
  frontier; `robots_allowed` joins it broadcast (AQE sees the size) and
  evaluates longest-match with a per-URL window over the handful of
  matching rules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pattern_to_regex(pattern: Column) -> Column:
    """Translate an RFC 9309 path pattern ('*' wildcard, trailing '$'
    anchor) to an anchored regex, with identical string output to the
    DuckDB rendition in __spark_entry__ (same replace order)."""
    has_end = F.endswith(pattern, F.lit("$"))
    core = F.when(has_end, pattern.substr(F.lit(1), F.length(pattern) - 1)).otherwise(pattern)
    # escape regex metachars except '*' (handled below); NOTE: '$' inside
    # the pattern body is escaped — only a trailing '$' anchors.
    esc = F.regexp_replace(core, r"([.^$+?(){}\[\]\\|])", r"\\$1")
    body = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(F.lit("^"), body, F.when(has_end, F.lit("$")).otherwise(F.lit("")))


def parse_robots_txt(robots_files: DataFrame, user_agent: str = "webscraper") -> DataFrame:
    """Parse (host, robots_txt) into the rule rows governing `user_agent`.

    Output: (host, rule, pattern, pattern_len, regex) where rule is
    'allow' | 'disallow' | 'crawl-delay'. Only the group(s) with the best
    specificity for user_agent survive (2 = exact token match, 1 = '*');
    hosts whose file matches neither emit no rows (= allow everything).
    Empty Allow/Disallow values are dropped (RFC: an empty Disallow
    permits everything — it carries no pattern).
    """
    ua = user_agent.lower()
    lines = robots_files.select(
        "host",
        F.posexplode(F.split(F.col("robots_txt"), "\n")).alias("pos", "raw"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace(F.col("raw"), "#.*$", "")).alias("line"),
    )
    parsed = lines.select(
        "host",
        "pos",
        F.lower(F.trim(F.regexp_extract(F.col("line"), "^([^:]+):(.*)$", 1))).alias("field"),
        F.trim(F.regexp_extract(F.col("line"), "^([^:]+):(.*)$", 2)).alias("value"),
    ).filter(F.col("field").isin("user-agent", "allow", "disallow", "crawl-delay"))

    w = Window.partitionBy("host").orderBy("pos")
    grouped = parsed.withColumn(
        "is_ua", (F.col("field") == "user-agent").cast("int")
    ).withColumn(
        # a User-agent line starts a new group unless the previous
        # meaningful line was also a User-agent line (adjacent UA lines
        # share one group, RFC 9309 section 2.2.1)
        "group_start",
        (
            (F.col("is_ua") == 1)
            & (F.coalesce(F.lag("is_ua").over(w), F.lit(0)) == 0)
        ).cast("int"),
    ).withColumn("group_id", F.sum("group_start").over(w))

    spec = (
        grouped.filter(F.col("is_ua") == 1)
        .select(
            "host",
            "group_id",
            F.when(F.lower(F.col("value")) == ua, 2)
            .when(F.col("value") == "*", 1)
            .otherwise(0)
            .alias("s"),
        )
        .groupBy("host", "group_id")
        .agg(F.max("s").alias("group_spec"))
    )
    wh = Window.partitionBy("host")
    chosen = spec.withColumn("best", F.max("group_spec").over(wh)).filter(
        (F.col("group_spec") == F.col("best")) & (F.col("group_spec") > 0)
    )
    rules = (
        grouped.filter(F.col("is_ua") == 0)
        .join(chosen.select("host", "group_id"), ["host", "group_id"])
        .filter(F.col("value") != "")
        .select(
            "host",
            F.col("field").alias("rule"),
            F.col("value").alias("pattern"),
            F.length("value").cast("long").alias("pattern_len"),
        )
        .distinct()
    )
    return rules.withColumn(
        "regex",
        F.when(F.col("rule") == "crawl-delay", F.lit(None).cast("string")).otherwise(
            pattern_to_regex(F.col("pattern"))
        ),
    )


def robots_rules_from_txt(
    robots_files: DataFrame, user_agent: str = "webscraper"
) -> DataFrame:
    """Parse raw (host, robots_txt) into the pre-aggregated rule-table
    shape operators/robots.py consumes: (host, disallow_prefixes
    array<string>, crawl_delay_ms long). Crawl-delay is parsed as RFC
    seconds (decimal) and converted to ms. Hosts whose file yields no
    governing group emit (empty array, null delay)."""
    parsed = parse_robots_txt(robots_files, user_agent)
    agg = parsed.groupBy("host").agg(
        F.array_sort(
            F.collect_list(F.when(F.col("rule") == "disallow", F.col("pattern")))
        ).alias("disallow_prefixes"),
        F.max(
            F.when(
                F.col("rule") == "crawl-delay",
                F.round(F.col("pattern").cast("double") * 1000).cast("long"),
            )
        ).alias("crawl_delay_ms"),
    )
    return (
        robots_files.select("host")
        .distinct()
        .join(agg, "host", "left")
        .select(
            "host",
            F.coalesce("disallow_prefixes", F.array().cast("array<string>")).alias(
                "disallow_prefixes"
            ),
            "crawl_delay_ms",
        )
    )


def robots_allowed(urls: DataFrame, rules: DataFrame, url_col: str = "url") -> DataFrame:
    """Longest-match verdict per URL. Input urls must carry (url, host);
    rules is parse_robots_txt output. Output: (url, host, allowed,
    matched_rule, matched_pattern) — allowed=true when no rule matches
    (RFC default-allow), ties broken longest pattern first, then Allow
    over Disallow, then pattern text (full determinism)."""
    from webscraper_spark.functions.canon import url_path

    r = rules.filter(F.col("rule").isin("allow", "disallow")).select(
        F.col("host").alias("r_host"), "rule", "pattern", "pattern_len", "regex"
    )
    cand = (
        urls.select(url_col, "host", url_path(F.col(url_col)).alias("path"))
        .join(r, F.col("host") == F.col("r_host"), "left")
        .withColumn("hit", F.col("regex").isNotNull() & F.expr("path rlike regex"))
    )
    wu = Window.partitionBy(url_col).orderBy(
        F.desc("hit"),
        F.desc("pattern_len"),
        F.asc(F.col("rule")),  # 'allow' < 'disallow' -> allow wins ties
        F.asc("pattern"),
    )
    return (
        cand.withColumn("rk", F.row_number().over(wu))
        .filter(F.col("rk") == 1)
        .select(
            url_col,
            "host",
            F.when(F.col("hit"), F.col("rule") == "allow").otherwise(F.lit(True)).alias("allowed"),
            F.when(F.col("hit"), F.col("rule")).alias("matched_rule"),
            F.when(F.col("hit"), F.col("pattern")).alias("matched_pattern"),
        )
    )


# Sitemap discovery: the sitemaps.org cross-protocol extension that RFC
# 9309 §2.2.4 admits as an "other record". Directives live OUTSIDE
# user-agent groups, apply regardless of UA, and a file may carry any
# number of them — so extraction is a flat line harvest, not part of the
# group state machine above. Key is case-insensitive; a leading '#'
# comments the whole line out.
SITEMAP_LINE = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"


def robots_sitemaps(
    robots_files: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, sitemap_url) per Sitemap: directive in each robots.txt.

    One codegen regexp_extract_all + explode — no shuffle beyond the
    caller's; the result feeds the sitemap XML source (S11 in SURVEY §2)
    and the sitemap-vs-crawl coverage audit (J5). Sitemap URLs are
    absolute by spec and may legitimately live on a DIFFERENT host (CDN
    sitemaps) — the declaring host is kept alongside for exactly that
    reason. Inline trailing comments are excluded by the \\S+ capture
    (a URL never contains whitespace); full-line comments never match
    because '#' cannot precede the key."""
    tags = F.regexp_extract_all(F.col(txt_col), F.lit(SITEMAP_LINE), 1)
    return robots_files.select(
        F.col(host_col).alias("host"), F.explode(tags).alias("sitemap_url")
    )
