"""Robots.txt rule enforcement (ST6) and politeness-budget resolution (ST1).

The reference ignores robots entirely (its site served a placeholder,
/root/reference/public/robots.txt:1) and rate-limits with hard-coded sleeps
(car_dealers_controller.rb:156 `sleep(1)`); north_rule adds real robots
enforcement + per-host delays. Both are broadcast hash joins on `host` —
the rules tables are tiny relative to the frontier, so no shuffle of the
big side ever happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webscraper_spark.functions.canon import url_path


def apply_robots(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop candidates whose URL path matches any disallow prefix.

    candidates must carry `url` and `host`. Missing hosts in the rules table
    are allowed (no rules). Disallow '/' blocks the whole host.
    """
    r = robots.select(
        F.col("host").alias("r_host"),
        F.col("disallow_prefixes").alias("r_disallow"),
    )
    joined = candidates.join(F.broadcast(r), candidates["host"] == r["r_host"], "left")
    path = url_path(F.col("url"))
    blocked = F.exists(
        F.coalesce(F.col("r_disallow"), F.array().cast("array<string>")),
        lambda p: F.startswith(path, p),
    )
    return joined.filter(~blocked).drop("r_host", "r_disallow")


def resolve_budgets(hosts: DataFrame, robots: DataFrame, politeness: DataFrame) -> DataFrame:
    """Per-host effective (max_pages_per_wave, delay_ms).

    delay = max(politeness min_delay [host override else '*' default],
                robots crawl_delay); budget = host override else default.
    Output: (host, max_pages, delay_ms) — tiny table, broadcast later.

    The politeness '*' defaults are ALSO emitted as a literal host='*' row,
    so downstream consumers (schedule_ranked) can apply the same defaults to
    hosts discovered after this table was built — mid-crawl outlinks can
    surface hosts absent from `hosts`, and those must get the politeness
    defaults, not hardcoded fallbacks.
    """
    default_row = politeness.filter(F.col("host") == "*").select(
        F.col("max_pages_per_wave").alias("d_max"), F.col("min_delay_ms").alias("d_delay")
    )
    overrides = politeness.filter(F.col("host") != "*").select(
        F.col("host").alias("o_host"),
        F.col("max_pages_per_wave").alias("o_max"),
        F.col("min_delay_ms").alias("o_delay"),
    )
    rd = robots.select(F.col("host").alias("rb_host"), F.col("crawl_delay_ms"))
    out = (
        hosts.crossJoin(F.broadcast(default_row))
        .join(F.broadcast(overrides), hosts["host"] == overrides["o_host"], "left")
        .join(F.broadcast(rd), hosts["host"] == rd["rb_host"], "left")
        .select(
            "host",
            F.coalesce(F.col("o_max"), F.col("d_max")).alias("max_pages"),
            F.greatest(
                F.coalesce(F.col("o_delay"), F.col("d_delay")),
                F.coalesce(F.col("crawl_delay_ms"), F.lit(0)),
            ).alias("delay_ms"),
        )
    )
    star = default_row.select(
        F.lit("*").alias("host"),
        F.col("d_max").alias("max_pages"),
        F.greatest(F.col("d_delay"), F.lit(0)).alias("delay_ms"),
    )
    return out.filter(F.col("host") != "*").unionByName(star)
