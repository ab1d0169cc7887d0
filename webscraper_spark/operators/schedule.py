"""Priority scheduling: per-host FIFO rank, budget gating, simulated clock.

Re-expresses the reference's implicit crawl order — ads processed in DOM
order within a page, pages ascending, one host at a time
(/root/reference/app/controllers/cars_controller.rb:140-150) — as an explicit
deterministic window rank (SURVEY.md W1-W4). Politeness (ST1) becomes a
*simulated clock column*: sched_ms = wave_start + (rank-1) * delay_ms, so the
politeness invariant (no two fetches of a host closer than delay) is testable
without wall-clock sleeps; a real fetcher would replay this schedule.

Ordering key per host: (depth ASC, disc_wave ASC, disc_pos ASC, url ASC) —
total and deterministic, never partition-order dependent.

Scale note: the window sorts each host's candidates; per-host candidate
counts are bounded by discovery rate, and hot hosts are exactly the rows the
budget cap truncates, so the sort input per host stays modest even at 10^10
frontier scale. The frontier itself is never globally sorted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WAVE_EPOCH_MS = 10_000_000  # simulated ms between wave starts


def rank_candidates(cand: DataFrame) -> DataFrame:
    w = Window.partitionBy("host").orderBy(
        F.col("depth").asc(), F.col("disc_wave").asc(), F.col("disc_pos").asc(), F.col("url").asc()
    )
    return cand.withColumn("rank", F.row_number().over(w))


def schedule_ranked(cand: DataFrame, budgets: DataFrame, wave: int) -> DataFrame:
    """Rank + budget-gate + simulated clock in ONE relation: in_budget marks
    the fetch batch; over-budget rows keep their discovery metadata and stay
    in the frontier. One output -> one materialization per wave."""
    # Hosts absent from the budgets table (discovered mid-crawl, after
    # resolve_budgets ran) inherit the politeness '*' defaults, carried as
    # the budgets row with host='*'; the literal (40, 1000) fires only when
    # no '*' row exists at all (hand-built budgets in tests).
    # Collapse '*' to exactly one row defensively: resolve_budgets emits one,
    # but hand-built budgets tables could carry duplicates, and the star row
    # cross-joins every candidate (a dup would silently duplicate the batch).
    star = (
        budgets.filter(F.col("host") == "*")
        .groupBy()
        .agg(
            F.min("max_pages").alias("star_max"),
            F.min("delay_ms").alias("star_delay"),
        )
        .withColumn("_k", F.lit(1))
    )
    ranked = (
        rank_candidates(cand)
        .join(F.broadcast(budgets.filter(F.col("host") != "*")), "host", "left")
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(star), "_k", "left")
        .drop("_k")
    )
    ranked = ranked.withColumn(
        "max_pages", F.coalesce(F.col("max_pages"), F.col("star_max"), F.lit(40))
    ).withColumn(
        "delay_ms", F.coalesce(F.col("delay_ms"), F.col("star_delay"), F.lit(1000))
    ).drop("star_max", "star_delay")
    return ranked.withColumn("in_budget", F.col("rank") <= F.col("max_pages")).withColumn(
        "sched_ms",
        F.when(
            F.col("in_budget"),
            F.lit(wave).cast("long") * WAVE_EPOCH_MS + (F.col("rank") - 1).cast("long") * F.col("delay_ms"),
        ),
    )


def schedule_wave(cand: DataFrame, budgets: DataFrame, wave: int) -> tuple[DataFrame, DataFrame]:
    """(batch, deferred) split view over schedule_ranked."""
    ranked = schedule_ranked(cand, budgets, wave)
    batch = ranked.filter(F.col("in_budget"))
    deferred = ranked.filter(~F.col("in_budget")).select("url", "host", "depth", "disc_wave", "disc_pos")
    return batch, deferred
