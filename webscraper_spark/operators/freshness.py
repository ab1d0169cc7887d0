"""Recrawl scheduling — change-rate estimation and freshness-priority
ranking over a fetch-observation log.

The reference scraper (app/models/scraping*.rb) refetches every listing
page on every run; at a 10^10-URL frontier a crawler instead estimates
each page's change rate from its fetch history and spends the recrawl
budget where staleness accumulates fastest (Cho & Garcia-Molina,
"Effective Page Refresh Policies for Web Crawlers", TODS 2003 — the
proportional-to-rate baseline policy implemented here).

Input shape: an observation log (page_id, ts, event_type) where each row
is one fetch of the page and `change_types` marks fetches that observed
changed content. All arithmetic is over exact integer microseconds
(unix_micros) with one final double division per column, so the DuckDB
oracle (epoch_us) reproduces every value bit-for-bit.

Scale design: one hash-aggregate by page (map-side combinable — the
min/max/count partials combine before the exchange), then a window
ranked WITHIN each host shard. The rank window partitions by host, never
globally: a global order-by-priority would serialize the frontier
through one partition, which is exactly the skew the per-host crawl
scheduler (operators/schedule.py) exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000.0


def recrawl_priority(
    obs: DataFrame,
    page_col: str = "page_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    change_types: tuple[str, ...] = ("purchase", "error"),
    n_hosts: int = 10,
) -> DataFrame:
    """Per-page change-rate estimate + per-host freshness ranking.

    rate        = observed changes / observation span (days, floor 1.0)
    staleness   = days since the page's last fetch, at the corpus'
                  latest observation instant (deterministic "now" — no
                  wall clock, same rule as the wave manifest)
    priority    = rate * staleness  (proportional policy)
    host_rank   = row_number within the page's host shard, highest
                  priority first (ties broken by page id)
    """
    us = F.unix_micros(F.col(ts_col))
    per_page = (
        obs.groupBy(F.col(page_col).alias("page_id"))
        .agg(
            F.count("*").alias("n_obs"),
            F.sum(F.when(F.col(type_col).isin(*change_types), 1).otherwise(0))
            .alias("n_changes"),
            F.min(us).alias("first_us"),
            F.max(us).alias("last_us"),
        )
    )
    # deterministic "now": the max observation timestamp in the corpus
    now = obs.agg(F.max(us).alias("now_us"))
    span_days = F.greatest(
        (F.col("last_us") - F.col("first_us")) / F.lit(US_PER_DAY), F.lit(1.0)
    )
    staleness = (F.col("now_us") - F.col("last_us")) / F.lit(US_PER_DAY)
    scored = (
        per_page.crossJoin(F.broadcast(now))
        .withColumn("span_days", span_days)
        .withColumn("change_rate", F.col("n_changes") / F.col("span_days"))
        .withColumn("staleness_days", staleness)
        .withColumn("priority", F.col("change_rate") * F.col("staleness_days"))
        .withColumn("host", (F.col("page_id") % n_hosts).cast("long"))
    )
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("page_id")
    )
    return scored.select(
        "page_id", "host", "n_obs", "n_changes",
        "span_days", "change_rate", "staleness_days", "priority",
        F.row_number().over(w).alias("host_rank"),
    )
