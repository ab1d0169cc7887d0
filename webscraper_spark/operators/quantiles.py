r"""Exact per-group quantiles (rank-based, type-1 — no interpolation).

Corpus reports need distribution shape, not just sums: token-length
p50/p90/p99 per source decides packing budgets (operators/pack.py) and
truncation points; latency percentiles per host drive politeness tuning.
Spark's `percentile_approx` is a sketch (rank error up to n/accuracy)
and float-interpolating `percentile` is engine-dependent at ties, so
neither is auditable by the correctness gate. This operator computes the
classical type-1 (inverted-CDF) quantile — the value at rank
ceil(q * n), 1-indexed, over the ascending sort — which is an ELEMENT of
the data (integer in, integer out) and identical in any engine: A6 in
SURVEY §2.4. The reference has no distribution reporting at all (its
only aggregate is a row count — `cars_controller.rb:143`).

Scale notes: one shuffle, partitioned by the group keys; within each
partition the window sort ranks rows. n per group comes from the same
window (no second scan). The q-row filter collapses each group to
|qs| rows before anything downstream. Groups are independent, so skew
= the largest single group's sort — at 100 TB with pathological group
sizes, swap the window for `approx` first + exact-within-bracket, or
pre-aggregate equal values (`groupBy(keys, col).count()` then rank the
run-length-encoded relation — same answer, |distinct values| rows);
the RLE variant is `exact_group_quantiles(pre_aggregated=True)`.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_group_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    pre_aggregated: bool = False,
) -> DataFrame:
    """One row per (group, q): `q` (as an integer permille, so the output
    schema stays float-free) and `value`, the element at rank
    ceil(q * n) of the ascending sort of `col` within the group.

    pre_aggregated=True runs the run-length-encoded plan: aggregate to
    (keys, col, cnt) first and rank via cumulative counts — same result,
    shuffle size bounded by distinct values per group instead of rows.
    """
    keys = list(keys)

    def _target(pm: int):
        # ceil(q*n) in integer arithmetic: (pm*n + 999) div 1000 — SQL
        # `div`, the engine-wide integer-division idiom (Column has no //).
        return F.expr(f"({pm} * n + 999) div 1000")

    if not pre_aggregated:
        w = Window.partitionBy(*keys).orderBy(F.col(col).asc())
        ranked = df.select(*keys, col).withColumn(
            "rnk", F.row_number().over(w)
        ).withColumn("n", F.count("*").over(Window.partitionBy(*keys)))
        picked = None
        for q in qs:
            pm = int(round(q * 1000))
            sel = ranked.filter(F.col("rnk") == _target(pm)).select(
                *keys, F.lit(pm).alias("q_permille"), F.col(col).alias("value")
            )
            picked = sel if picked is None else picked.unionAll(sel)
        return picked
    # RLE plan: distinct-value counts + cumulative rank window.
    rle = df.groupBy(*keys, col).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy(*keys).orderBy(F.col(col).asc())
    cum = rle.withColumn("hi", F.sum("cnt").over(w)).withColumn(
        "lo", F.col("hi") - F.col("cnt") + 1
    ).withColumn("n", F.sum("cnt").over(Window.partitionBy(*keys)))
    picked = None
    for q in qs:
        pm = int(round(q * 1000))
        target = _target(pm)
        sel = cum.filter((F.col("lo") <= target) & (target <= F.col("hi"))).select(
            *keys, F.lit(pm).alias("q_permille"), F.col(col).alias("value")
        )
        picked = sel if picked is None else picked.unionAll(sel)
    return picked


def quantile_threshold_filter(
    df: DataFrame,
    keys: Sequence[str],
    score_col: str,
    q: float = 0.9,
) -> DataFrame:
    """Per-group dynamic thresholding (RefinedWeb-style "keep the top
    (1-q) of each language"): rows with `score_col` >= the group's exact
    type-1 q-quantile. A fixed global cutoff over-filters low-resource
    groups whose score distribution sits lower; a per-group quantile
    keeps the SAME FRACTION everywhere — the standard curation move.

    Appends `threshold` (the group's quantile, an element of the data)
    and `kept`. The threshold relation is |groups| rows — broadcast, so
    the only shuffle is the RLE quantile's own (bounded by distinct
    scores per group). Filtering on `kept` never reshuffles `df`.
    """
    thr = exact_group_quantiles(
        df, keys, score_col, (q,), pre_aggregated=True
    ).select(*keys, F.col("value").alias("threshold"))
    return df.join(F.broadcast(thr), list(keys)).withColumn(
        "kept", F.col(score_col) >= F.col("threshold")
    )
