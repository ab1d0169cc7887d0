"""Crawl snapshot delta: added / removed / changed / unchanged per URL.

A recurring crawl produces one snapshot per run; the incremental-corpus
question is the diff — which URLs appeared, vanished, or changed content
between run N and run N+1. Common Crawl publishes this per-crawl churn;
freshness policies (operators/freshness.py — Cho & Garcia-Molina) consume
per-URL change observations as their input signal; dedup wants only the
`added`+`changed` slice reprocessed. The reference has no snapshot memory
at all (re-running a dealer crawl rewrites a new timestamped CSV —
12 duplicate AH-SCHACHTSCHNEIDER files in `/root/reference/lib/data/`);
this is L33 in SURVEY §2.10.

Shape: one full-outer join of the two snapshots on the URL key, comparing
content fingerprints — the canonical "diff two tables" plan. At 100 TB
both sides are bucketed by the same url-hash key (the `pages` corpus
already is — sources/synth.py load_pages), making the join co-located and
shuffle-free; verdicts are a codegen CASE over the two fingerprint
columns. No Python, no window, no skew surface (url is unique per side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_delta(
    prev: DataFrame,
    curr: DataFrame,
    key: str = "url",
    fp_col: str = "fp",
) -> DataFrame:
    """(prev, curr) snapshots -> one row per URL seen in either, with
    `verdict` in {added, removed, changed, unchanged} and both
    fingerprints (null on the missing side)."""
    p = prev.select(F.col(key), F.col(fp_col).alias("fp_prev"))
    c = curr.select(F.col(key), F.col(fp_col).alias("fp_curr"))
    j = p.join(c, key, "full_outer")
    verdict = (
        F.when(F.col("fp_prev").isNull(), F.lit("added"))
        .when(F.col("fp_curr").isNull(), F.lit("removed"))
        .when(F.col("fp_prev") != F.col("fp_curr"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(key, "fp_prev", "fp_curr", verdict.alias("verdict"))


def delta_summary(delta: DataFrame, host_col=None) -> DataFrame:
    """Churn report over a snapshot_delta result: counts per verdict
    (optionally per host) — one map-side-combinable aggregation."""
    keys = ["verdict"] if host_col is None else [host_col, "verdict"]
    return delta.groupBy(*keys).agg(F.count("*").alias("n_urls"))
