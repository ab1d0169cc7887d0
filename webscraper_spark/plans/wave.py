"""Crawl-wave driver: frontier -> schedule -> fetch -> extract -> expand.

Each wave is one DataFrame job (north_rule: "each crawl wave is a DataFrame
job"), mirroring the reference's page-batch loop
(/root/reference/app/controllers/cars_controller.rb:140-337) as batch waves:

  wave w:
    1. candidates = frontier ANTI-JOIN seen            (J1, bloom-assisted)
    2. robots filter                                   (ST6)
    3. per-host rank + budget gate + simulated clock   (W1-W4, ST1)
    4. fetch = batch LEFT JOIN pages on canonical url  (S2 — sandbox fetch)
    5. extract fields/outlinks, quarantine errors      (P1/P2/P5, F1-F19)
    6. new frontier = outlinks canonicalized, deduped, minus seen  (S3-S5)
    7. checkpoint: frontier/seen-delta/order/metrics parquet + manifest
       -> any wave is resumable (ST3/ST5)

Every wave materializes its state to parquet: that is simultaneously the
checkpoint, the lineage truncation (iterative plans would otherwise grow
unboundedly), and at cluster scale the bucketed seen-table append.

Determinism: discovery position disc_pos = parent_rank * 1024 + link_pos,
ordering key (depth, disc_wave, disc_pos, url) — a total order, independent
of partitioning. Verified row-for-row against the pure-Python sequential
oracle (oracle/seq_oracle.py).
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webscraper_spark.functions.canon import canonicalize_url, url_hash, url_host
from webscraper_spark.functions.extract import extracted_text, listing_text, with_extraction
from webscraper_spark.operators.robots import apply_robots, resolve_budgets
from webscraper_spark.operators.schedule import schedule_wave
from webscraper_spark.operators.seen import anti_join_seen, build_bloom_table

MAX_LINKS_PER_PAGE = 1024

RESULT_COLS = [
    "url", "host", "wave", "rank", "sched_ms", "depth", "fetch_status",
    "x_title", "x_price_cell", "x_km_cell", "x_power_cell", "x_fuel",
    "x_category", "x_transmission", "x_ez", "x_consumption", "x_co2",
    "x_damage", "x_country", "x_attr_map", "x_features", "x_images",
    "x_dealer_name", "x_address_raw", "x_postal_code", "x_dealer_city",
    "x_dealer_street", "x_phone", "x_pubdate", "x_status", "extracted_text",
    "lang", "warc_ts",
]


@dataclass
class CrawlConfig:
    max_waves: int = 16
    use_bloom: bool = False
    n_buckets: int = 64


def _wave_dir(ckpt_dir: str, wave: int) -> str:
    return os.path.join(ckpt_dir, f"wave={wave}")


def _manifest_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "manifest.json")


def _write_manifest(ckpt_dir: str, completed: list[int]) -> None:
    tmp = _manifest_path(ckpt_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"completed_waves": completed}, f)
    os.replace(tmp, _manifest_path(ckpt_dir))


def read_manifest(ckpt_dir: str) -> list[int]:
    p = _manifest_path(ckpt_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)["completed_waves"]


def seeds_to_frontier(seeds: DataFrame) -> DataFrame:
    """Canonicalize + dedup seeds into wave-0 frontier rows."""
    s = seeds.select(canonicalize_url(F.col("url")).alias("url"))
    return (
        s.groupBy("url")
        .agg(F.count("*").alias("_n"))
        .select(
            "url",
            url_host(F.col("url")).alias("host"),
            F.lit(0).alias("depth"),
            F.lit(0).alias("disc_wave"),
            F.lit(0).cast("long").alias("disc_pos"),
        )
    )


def expand_outlinks(fetched: DataFrame, wave: int) -> DataFrame:
    """Outlinks of fetched pages -> new frontier candidates (dedup by url,
    keeping the minimal (depth, disc_wave, disc_pos) discovery record)."""
    links = (
        fetched.filter(F.col("x_outlinks").isNotNull() & (F.size("x_outlinks") > 0))
        .select(
            F.col("depth").alias("p_depth"),
            F.col("rank").alias("p_rank"),
            F.posexplode("x_outlinks").alias("link_pos", "raw_url"),
        )
        .select(
            canonicalize_url(F.col("raw_url")).alias("url"),
            (F.col("p_depth") + 1).cast("int").alias("depth"),
            F.lit(wave + 1).cast("int").alias("disc_wave"),
            (F.col("p_rank").cast("long") * MAX_LINKS_PER_PAGE
             + F.least(F.col("link_pos").cast("long"), F.lit(MAX_LINKS_PER_PAGE - 1))).alias("disc_pos"),
        )
    )
    dedup = (
        links.groupBy("url")
        .agg(F.min(F.struct("depth", "disc_wave", "disc_pos")).alias("m"))
        .select("url", F.col("m.depth").alias("depth"), F.col("m.disc_wave").alias("disc_wave"),
                F.col("m.disc_pos").alias("disc_pos"))
        .withColumn("host", url_host(F.col("url")))
        .select("url", "host", "depth", "disc_wave", "disc_pos")
    )
    return dedup


def merge_frontier(deferred: DataFrame, new_cand: DataFrame) -> DataFrame:
    both = deferred.unionByName(new_cand)
    return (
        both.groupBy("url")
        .agg(F.min(F.struct("depth", "disc_wave", "disc_pos")).alias("m"))
        .select("url", url_host(F.col("url")).alias("host"),
                F.col("m.depth").alias("depth"), F.col("m.disc_wave").alias("disc_wave"),
                F.col("m.disc_pos").alias("disc_pos"))
    )


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    robots: DataFrame,
    politeness: DataFrame,
    ckpt_dir: str,
    config: CrawlConfig | None = None,
    resume: bool = False,
) -> dict[str, str]:
    """Run the crawl to frontier exhaustion (or max_waves). Returns paths of
    the accumulated order/seen/results/metrics tables."""
    cfg = config or CrawlConfig()
    os.makedirs(ckpt_dir, exist_ok=True)

    completed = read_manifest(ckpt_dir) if resume else []
    if not resume and os.path.exists(_manifest_path(ckpt_dir)):
        # fresh run over an old dir: clear stale state
        shutil.rmtree(ckpt_dir)
        os.makedirs(ckpt_dir)

    if completed:
        start_wave = max(completed) + 1
        frontier = spark.read.parquet(os.path.join(_wave_dir(ckpt_dir, max(completed)), "frontier"))
        seen = spark.read.parquet(*[os.path.join(_wave_dir(ckpt_dir, w), "seen_delta") for w in completed])
    else:
        start_wave = 0
        frontier = seeds_to_frontier(seeds)
        seen = spark.createDataFrame([], "url_hash long, url string, wave int")

    hosts = pages.sparkSession.createDataFrame(
        [], "host string"
    )  # budgets resolved lazily from robots ∪ politeness hosts
    all_hosts = (
        robots.select("host").unionByName(politeness.filter(F.col("host") != "*").select("host")).distinct()
    )
    budgets = resolve_budgets(all_hosts, robots, politeness)
    budgets = budgets.cache()
    _ = hosts

    pages_slim = pages  # full table; Catalyst prunes columns per stage

    for wave in range(start_wave, cfg.max_waves):
        wdir = _wave_dir(ckpt_dir, wave)
        os.makedirs(wdir, exist_ok=True)

        # 1. candidates minus seen (bloom-assisted when configured)
        bloom = build_bloom_table(seen, cfg.n_buckets) if cfg.use_bloom else None
        cand = anti_join_seen(frontier, seen, bloom, cfg.n_buckets)

        # 2. robots
        cand = apply_robots(cand, robots)

        # 3. rank + budget + simulated politeness clock
        batch, deferred = schedule_wave(cand, budgets, wave)
        if batch.isEmpty():
            break

        # 4. fetch = left join against the pages corpus on canonical url
        fetched = batch.join(pages_slim, "url", "left")
        fetched = fetched.withColumn(
            "fetch_status", F.when(F.col("html").isNotNull(), F.lit("ok")).otherwise(F.lit("missing"))
        )

        # 5. extract (codegen regexp stage) + byte-exact text rebuild
        fetched = with_extraction(fetched)
        fetched = fetched.withColumn(
            "extracted_text",
            F.when(F.col("x_status") == "listing", listing_text())
            .when(F.col("x_status") == "ok", extracted_text())
            .otherwise(F.lit(None).cast("string")),
        ).withColumn("wave", F.lit(wave))

        # materialize the wave once; everything below reuses it
        fetched.write.mode("overwrite").parquet(os.path.join(wdir, "fetched"))
        fetched = spark.read.parquet(os.path.join(wdir, "fetched"))

        # 6. outlinks -> next frontier
        new_cand = expand_outlinks(fetched, wave)
        seen_delta = fetched.select(url_hash(F.col("url")).alias("url_hash"), "url", F.col("wave").cast("int"))
        seen_delta.write.mode("overwrite").parquet(os.path.join(wdir, "seen_delta"))
        seen_delta = spark.read.parquet(os.path.join(wdir, "seen_delta"))

        next_frontier = merge_frontier(deferred, new_cand).join(
            seen_delta.select("url").unionByName(seen.select("url")), "url", "left_anti"
        )
        next_frontier.write.mode("overwrite").parquet(os.path.join(wdir, "frontier"))

        # 7. order / results / metrics
        fetched.select("url", "host", "wave", F.col("rank").cast("int").alias("rank"), "sched_ms").write.mode(
            "overwrite"
        ).parquet(os.path.join(wdir, "order"))
        fetched.select(*RESULT_COLS).write.mode("overwrite").parquet(os.path.join(wdir, "results"))
        (
            fetched.groupBy("wave", "host")
            .agg(
                F.count("*").alias("urls_scheduled"),
                F.sum(F.when(F.col("x_status") == "ok", 1).otherwise(0)).alias("urls_ok"),
                F.sum(F.when(F.col("x_status") == "err", 1).otherwise(0)).alias("urls_err"),
                F.sum(F.coalesce(F.length("html").cast("long"), F.lit(0))).alias("bytes_fetched"),
                F.sum(F.coalesce(F.size("x_outlinks"), F.lit(0)).cast("long")).alias("outlinks"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(wdir, "metrics"))
        )

        completed.append(wave)
        _write_manifest(ckpt_dir, completed)

        frontier = spark.read.parquet(os.path.join(wdir, "frontier"))
        seen = seen.unionByName(seen_delta)

    budgets.unpersist()
    return {
        "ckpt_dir": ckpt_dir,
        "waves": json.dumps(completed),
        "order": os.path.join(ckpt_dir, "wave=*", "order"),
        "results": os.path.join(ckpt_dir, "wave=*", "results"),
        "seen": os.path.join(ckpt_dir, "wave=*", "seen_delta"),
        "metrics": os.path.join(ckpt_dir, "wave=*", "metrics"),
    }
