"""Cross-host mirror detection: find host pairs serving the same content.

Web crawls waste budget on mirrors (cdn.example.com vs www.example.com,
country mirrors of package archives, scraped re-hosts). A crawl scheduler
that knows host A mirrors host B can crawl one and skip the other. The
reference app has no such stage (it crawls two fixed sites —
/root/reference/app/controllers/cars_controller.rb:36,
car_dealers_controller.rb:29); this is part of the beyond-reference
LLM-training-data / crawl-scheduling family (SURVEY 2.10).

Algorithm: fingerprint each page's content (h60 — auditable md5-prefix
hash, dedup.py:29), reduce to the distinct (host, fp) relation, and count
shared fingerprints per host pair via a fingerprint-bucketed self-join.
Overlap ratio = shared / min(|A|, |B|) (containment — catches a small
mirror of a large host).

Scale design (10^10-page corpus):
- The (host, fp) distinct is a map-side-combinable aggregate; its size is
  bounded by the page count but typically far smaller (duplicate pages
  within a host collapse).
- The self-join is keyed on fingerprint, so only co-occurring hosts ever
  meet — no host x host cartesian. The blowup risk is boilerplate content
  shared by thousands of hosts (empty pages, "403 Forbidden" bodies):
  `max_hosts_per_fp` drops fingerprints above that host-degree entirely
  (a deterministic FILTER, not a sample — same discipline as
  dedup.ngram_jaccard_pairs' max_df posting-list cap). A fingerprint on
  20 hosts contributes at most 190 pair rows; one on 10^5 hosts would
  contribute 5*10^9 and carries no mirror signal anyway.
- The host-pair count and per-host sizes are both map-side combinable;
  the sizes relation is host-cardinality (small) and broadcastable — left
  to AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webscraper_spark.operators.dedup import h60


def mirror_host_pairs(
    pages: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    min_shared: int = 3,
    max_hosts_per_fp: int = 20,
    persist_hf: bool = True,
) -> DataFrame:
    """Host pairs sharing >= min_shared content fingerprints.

    Output: (host_a, host_b, shared, n_a, n_b, overlap), host_a < host_b,
    overlap = shared / min(n_a, n_b) where n_* counts the host's distinct
    fingerprints that survived the degree cap (so overlap = 1.0 means
    "every non-boilerplate page of the smaller host exists on the other").

    The distinct (host, fp) relation feeds four plan branches (degree cap,
    per-host sizes, both self-join sides); without materialization Catalyst
    re-scans and re-hashes the corpus for each. `persist_hf` (default)
    caches the corpus-thin relation MEMORY_AND_DISK; the returned DataFrame
    carries it as `._hf_cache` so callers can unpersist (same contract as
    tfidf_topk's `._tf_cache`). Pass False at corpus scales where even the
    fingerprint relation outweighs extra scans.
    """
    hf = (
        pages.select(
            F.col(host_col).alias("host"),
            h60(F.concat(F.lit("mirror:"), F.col(text_col))).alias("fp"),
        )
        .distinct()
    )
    hf_cache = None
    if persist_hf:
        from pyspark import StorageLevel

        hf_cache = hf.persist(StorageLevel.MEMORY_AND_DISK)
        hf = hf_cache
    # Boilerplate cap: drop fingerprints seen on too many hosts (see module
    # docstring). Deterministic filter — every surviving fp is fully joined.
    fp_deg = hf.groupBy("fp").agg(F.count("*").alias("n_hosts"))
    hf = hf.join(
        fp_deg.filter(
            (F.col("n_hosts") >= 2) & (F.col("n_hosts") <= max_hosts_per_fp)
        ).select("fp"),
        "fp",
        "left_semi",
    )
    sizes = hf.groupBy("host").agg(F.count("*").alias("n"))
    a = hf.select(F.col("host").alias("host_a"), "fp")
    b = hf.select(F.col("host").alias("host_b"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    out = (
        shared.join(sizes.withColumnRenamed("host", "host_a").withColumnRenamed("n", "n_a"), "host_a")
        .join(sizes.withColumnRenamed("host", "host_b").withColumnRenamed("n", "n_b"), "host_b")
        .select(
            "host_a",
            "host_b",
            "shared",
            "n_a",
            "n_b",
            (F.col("shared").cast("double") / F.least("n_a", "n_b").cast("double")).alias("overlap"),
        )
    )
    if hf_cache is not None:
        out._hf_cache = hf_cache  # explicit unpersist handle (see docstring)
    return out
