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
import sys
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webscraper_spark.functions.canon import canonicalize_url, url_hash, url_host
from webscraper_spark.functions.extract import extracted_text, listing_text
from webscraper_spark.functions.extract_pandas import with_extraction_arrow
from webscraper_spark.operators.robots import apply_robots, resolve_budgets
from webscraper_spark.operators.schedule import schedule_ranked
from webscraper_spark.operators.seen import anti_join_seen, build_bloom_table

MAX_LINKS_PER_PAGE = 1024

RESULT_COLS = [
    "url", "host", "wave", "rank", "sched_ms", "depth", "fetch_status",
    "x_title", "x_price_cell", "x_km_cell", "x_power_cell", "x_fuel",
    "x_category", "x_transmission", "x_ez", "x_consumption", "x_co2",
    "x_damage", "x_country", "x_attr_map", "x_features", "x_images",
    "x_dealer_name", "x_address_raw", "x_postal_code", "x_dealer_city",
    "x_dealer_street", "x_phone", "x_dealer_rating", "x_quantity_ratings",
    "x_pubdate", "x_status", "extracted_text",
    "lang", "warc_ts",
]


@dataclass
class CrawlConfig:
    max_waves: int = 16
    # Bloom-assisted seen filtering: per-bucket bitsets broadcast in ~MBs
    # where a raw 10^8+-row seen-set could not broadcast at all. OFF by
    # default — below ~10M seen rows the bucket shuffles + Python probe
    # stages cost more than the plain anti-join they replace (measured 5x at
    # sandbox scale); flip on when the seen set outgrows broadcast range.
    use_bloom: bool = False
    n_buckets: int = 64
    # Politeness-bounded batches (the normal crawl regime) broadcast: tiny
    # build, zero corpus movement. Above the threshold the driver-side
    # broadcast build becomes the serial bottleneck (it grows linearly with
    # the batch), so the join flips to a shuffled hash join — the sandbox
    # stand-in for the bucketed storage-partitioned join an Iceberg
    # deployment would use (bucket(url) on both sides; no corpus shuffle).
    # WS_BCAST_BATCH_MAX overrides (multi-executor A/B: a broadcast is built
    # serially on the driver AND deserialized once per executor, so its
    # break-even shrinks as executors multiply).
    broadcast_batch_threshold: int = int(os.environ.get("WS_BCAST_BATCH_MAX", 5_000_000))
    # Corpus loaded as a bucketed catalog table (sources.synth.load_pages):
    # a url-equi-join exchanges ONLY the thin batch side — the corpus reads
    # in place (the Iceberg bucket(N, url) layout's behavior). The broadcast
    # path's costs (serial driver build, one deserialize+hash-build per
    # executor) then buy nothing, so the flip to the shuffled-hash join
    # happens ~10x earlier (WS_BCAST_BATCH_MAX_BUCKETED overrides).
    corpus_bucketed: bool = False
    bucketed_broadcast_threshold: int = int(os.environ.get("WS_BCAST_BATCH_MAX_BUCKETED", 500_000))
    # URL-quality hygiene applied to each wave's candidates BEFORE ranking
    # (operators/urlfilter.py: blocklist / path-depth / param-count /
    # digit-slug, first-failing-rule). A dropped URL never occupies a
    # fetch slot, never enters the order table, and is dropped every wave
    # it reappears (its verdict is a pure function of the URL). OFF by
    # default: the crawl-order oracle (oracle/seq_oracle.py) models the
    # reference, which fetches every harvested href
    # (/root/reference/app/controllers/cars_controller.rb:137-142). The
    # heavier hygiene stages (redirect resolution, canonical collapse,
    # trap mining, backoff) run BETWEEN waves over crawl metadata via
    # plans/hygiene.py — in-loop they would re-pay their joins per wave
    # for inputs that only change per wave.
    url_hygiene: bool = False


def _parquet_rows(path: str) -> int:
    """Row count from parquet footers — zero Spark jobs. Footer reads are
    fanned out over a thread pool: with ~1 scan split per core the wave
    files number in the hundreds, and a serial driver loop over them was a
    measurable slice of the per-wave serial floor (round-3 verdict)."""
    import pyarrow.parquet as pq

    files = [os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")]
    if len(files) > 8:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(32, len(files))) as pool:
            return sum(pool.map(lambda p: pq.read_metadata(p).num_rows, files))
    return sum(pq.read_metadata(f).num_rows for f in files)


def tune_scan_splits(spark: SparkSession, source: DataFrame) -> dict[str, str] | None:
    """Size file-scan splits so the corpus scan parallelizes to the cluster.

    The default maxPartitionBytes=128MB / openCostInBytes=4MB bin-packs a
    small-file corpus into 1-2 input partitions, serializing the fetch-join +
    extraction stage (the CPU-heavy stage of every wave) regardless of core
    count. Target ~1 split per core (more splits amplify per-task overhead —
    Arrow stream setup + parquet writer open/close dominated 2-splits-per-core
    runs); clamp to [1MB, 128MB] so at real scale (100TB ≈ 800k default
    splits already ≫ cores) this converges to the stock default and is a
    no-op.
    """
    try:
        # Hadoop may return 'file:///p', 'file:/p' or a bare path — parse the
        # scheme robustly (a naive f[7:] mangled single-slash forms and
        # silently dropped them from the size total).
        from urllib.parse import urlparse

        files = [urlparse(f).path if f.startswith("file:") else f for f in source.inputFiles()]
        total = sum(os.path.getsize(f) for f in files if os.path.exists(f))
    except Exception:
        return
    if total <= 0:
        return
    cores = spark.sparkContext.defaultParallelism
    # Splits per core for the fetch+extract stage (scan→join→UDF→write is
    # one fused stage, so scan splits bound its task concurrency). Every
    # UDF task occupies TWO threads — a JVM side and a Python worker — so
    # <1.0 values deliberately under-subscribe the advertised core count
    # (WS_SPLITS_PER_CORE, default 2).
    spc = float(os.environ.get("WS_SPLITS_PER_CORE", "1"))
    mpb = min(max(int(total / max(cores * spc, 1)), 1 << 20), 128 << 20)
    # Return the prior values so the caller can restore them: these are
    # session-global confs sized to ONE corpus, and leaking 1MB splits into
    # later unrelated scans in the same session explodes their task counts.
    keys = ("spark.sql.files.maxPartitionBytes", "spark.sql.files.openCostInBytes")
    prev = {k: spark.conf.get(k) for k in keys}
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
    spark.conf.set("spark.sql.files.openCostInBytes", str(max(min(mpb // 8, 4 << 20), 64 << 10)))
    return prev


def _wave_dir(ckpt_dir: str, wave: int) -> str:
    return os.path.join(ckpt_dir, f"wave={wave}")


def _manifest_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "manifest.json")


MANIFEST_VERSION = 1


def _write_manifest(ckpt_dir: str, completed: list[int]) -> None:
    tmp = _manifest_path(ckpt_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": MANIFEST_VERSION, "completed_waves": completed}, f)
    os.replace(tmp, _manifest_path(ckpt_dir))


def _recover_completed(ckpt_dir: str) -> list[int]:
    """Rebuild the completed-wave list from the wave dirs themselves: a wave
    is complete iff its frontier table finished writing (frontier/_SUCCESS —
    the last per-wave write before the manifest). Only the contiguous prefix
    from wave 0 counts: a gap means later dirs are partial debris from a
    run that died mid-write, and resuming past a gap would drop its
    seen-set contribution."""
    done = set()
    for d in os.listdir(ckpt_dir):
        if d.startswith("wave=") and os.path.exists(os.path.join(ckpt_dir, d, "frontier", "_SUCCESS")):
            done.add(int(d.split("=", 1)[1]))
    completed = []
    w = 0
    while w in done:
        completed.append(w)
        w += 1
    return completed


def read_manifest(ckpt_dir: str) -> list[int]:
    """Completed waves from the manifest; a corrupt/truncated manifest file
    (external damage — writes themselves are atomic tmp+rename) falls back
    to recovery from the wave dirs' _SUCCESS markers, so resume survives it.
    A manifest from a NEWER format version is an error, not a guess."""
    p = _manifest_path(ckpt_dir)
    if not os.path.exists(p):
        return []
    try:
        with open(p) as f:
            data = json.load(f)
        waves = list(data["completed_waves"])
    except (json.JSONDecodeError, KeyError, TypeError, ValueError):
        return _recover_completed(ckpt_dir)
    if int(data.get("version", 1)) > MANIFEST_VERSION:
        raise RuntimeError(
            f"checkpoint manifest {p} has version {data.get('version')} > "
            f"supported {MANIFEST_VERSION}; refusing to resume with an older engine"
        )
    return waves


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
        fetched.filter(F.col("x_outlinks_canon").isNotNull() & (F.size("x_outlinks_canon") > 0))
        .select(
            F.col("depth").alias("p_depth"),
            F.col("rank").alias("p_rank"),
            # canonical url + host were computed inside the extraction UDF
            # (one compiled-regex match per URL, zero extra Python stages —
            # a chained canon UDF here doubled the per-task Python worker
            # set and anti-scaled 3x at local[32])
            F.posexplode(F.arrays_zip("x_outlinks_canon", "x_outlink_hosts")).alias("link_pos", "lk"),
        )
        .select(
            F.col("lk.x_outlinks_canon").alias("url"),
            F.col("lk.x_outlink_hosts").alias("host"),
            (F.col("p_depth") + 1).cast("int").alias("depth"),
            F.lit(wave + 1).cast("int").alias("disc_wave"),
            (F.col("p_rank").cast("long") * MAX_LINKS_PER_PAGE
             + F.least(F.col("link_pos").cast("long"), F.lit(MAX_LINKS_PER_PAGE - 1))).alias("disc_pos"),
        )
    )
    dedup = (
        links.groupBy("url")
        .agg(F.min(F.struct("depth", "disc_wave", "disc_pos")).alias("m"), F.max("host").alias("host"))
        .select("url", "host", F.col("m.depth").alias("depth"), F.col("m.disc_wave").alias("disc_wave"),
                F.col("m.disc_pos").alias("disc_pos"))
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
        # frontier row count for free from the checkpoint's parquet footers
        n_frontier = _parquet_rows(os.path.join(_wave_dir(ckpt_dir, max(completed)), "frontier"))
        seen = spark.read.parquet(*[os.path.join(_wave_dir(ckpt_dir, w), "fetched") for w in completed]).select(
            url_hash(F.col("url")).alias("url_hash"), "url", F.col("wave").cast("int").alias("wave")
        )
    else:
        start_wave = 0
        frontier = seeds_to_frontier(seeds)
        n_frontier = frontier.count()  # seed-table-sized job, milliseconds
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
    prev_splits = tune_scan_splits(spark, pages)

    debug = os.environ.get("WS_DEBUG_TIMING", "0") == "1"

    # AQE partition coalescing inside the wave loop: round 1 disabled it
    # because the outlink-expansion shuffles were byte-small but
    # compute-dense (regex canonicalization ran post-shuffle) and collapsed
    # to 1-2 partitions. Canonicalization has since moved INTO the
    # extraction UDF (pre-shuffle), so the post-shuffle work is cheap and
    # coalescing now just removes hundreds of tiny-task dispatches per wave
    # (WS_WAVE_COALESCE=0 restores the round-1 behaviour for A/B).
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev_coalesce = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false" if os.environ.get("WS_WAVE_COALESCE", "1") == "0" else "true")

    def _tick(label: str, t0: float) -> float:
        t1 = time.time()
        if debug:
            print(f"    [wave timing] {label}: {t1 - t0:.2f}s", file=sys.stderr)
        return t1

    for wave in range(start_wave, cfg.max_waves):
        # Empty frontier = crawl done, known from parquet footers (or the
        # seed count) with ZERO Spark jobs — the former explicit
        # count-the-schedule job cost a full per-wave driver barrier.
        if n_frontier == 0:
            break
        wdir = _wave_dir(ckpt_dir, wave)
        os.makedirs(wdir, exist_ok=True)
        tw = time.time()

        # 1. candidates minus seen (bloom-assisted when configured)
        bloom = build_bloom_table(seen, cfg.n_buckets) if cfg.use_bloom else None
        cand = anti_join_seen(frontier, seen, bloom, cfg.n_buckets)

        # 2. robots
        cand = apply_robots(cand, robots)

        # 2b. optional URL hygiene (codegen-only; see CrawlConfig). The
        # frontier `depth` travels as a temporary rename around
        # url_filter's same-named path-depth feature column.
        if cfg.url_hygiene:
            from webscraper_spark.operators.urlfilter import url_filter

            cand = (
                url_filter(cand.withColumnRenamed("depth", "_fdepth"))
                .filter(F.col("verdict").startswith("keep"))
                .select("url", "host", F.col("_fdepth").alias("depth"), "disc_wave", "disc_pos")
            )

        # 3. rank + budget + simulated politeness clock.
        # Persist the ranked schedule ONCE (memory, spill-to-disk): the
        # schedule subtree (anti-join + robots + skewed per-host window)
        # would otherwise be re-executed by every consumer (broadcast build,
        # miss anti-join, frontier merge). In-memory persist, NOT a parquet
        # barrier — the schedule is recomputable from the frontier
        # checkpoint, so durability buys nothing.
        #
        # The count() materializes the cache BEFORE the fetch job is
        # submitted. It looks like a removable serial barrier (and a prior
        # iteration removed it), but without it the fetch job's concurrent
        # subtrees — the broadcast-build future for the batch side and the
        # miss anti-join's shuffle stage — both pull on the COLD cache at
        # once and duplicate/serialize the whole schedule computation:
        # measured 115.2s -> 61.9s for the sf0.4 crawl at local[8]
        # (same-window A/B, both probes healthy). The barrier job costs
        # ~1-2s/wave, which tiny corpora notice (sf0.1 headline pays ~3s)
        # but anything at scale earns back many times over — at 10^10 rows
        # a duplicated schedule recompute is catastrophic, a count job is
        # epsilon. WS_SCHED_BARRIER=0 restores the race for A/B.
        sched = schedule_ranked(cand, budgets, wave).persist()
        if os.environ.get("WS_SCHED_BARRIER", "1") == "1":
            sched.count()
        tw = _tick(f"w{wave} schedule+barrier", tw)
        batch = sched.filter(F.col("in_budget"))
        deferred = sched.filter(~F.col("in_budget")).select("url", "host", "depth", "disc_wave", "disc_pos")

        # 4. fetch = join against the pages corpus on canonical url.
        # The batch is ALWAYS the broadcast side — never let Catalyst
        # broadcast the corpus (at 10^10 rows the corpus is only ever
        # scanned; the batch hash table streams past it). Misses are
        # recovered with a cheap anti-join on the small batch.
        # Broadcastability is decided from the frontier row count (a free
        # upper bound on the batch — footers/seed count, no job): a frontier
        # too big to bound the batch flips to the shuffled-hash path, which
        # is the safe choice at that scale anyway.
        small_batch = n_frontier <= (
            cfg.bucketed_broadcast_threshold if cfg.corpus_bucketed else cfg.broadcast_batch_threshold
        )
        batch_side = F.broadcast(batch) if small_batch else batch.hint("SHUFFLE_HASH")
        hits = pages_slim.join(batch_side, "url", "inner").withColumn("fetch_status", F.lit("ok"))
        misses = (
            batch.join(pages_slim.select("url") if small_batch else pages_slim.select("url").hint("SHUFFLE_HASH"),
                       "url", "left_anti")
            .withColumn("warc_ts", F.lit(None).cast("timestamp"))
            .withColumn("html", F.lit(None).cast("binary"))
            .withColumn("text", F.lit(None).cast("string"))
            .withColumn("lang", F.lit(None).cast("string"))
            .withColumn("fetch_status", F.lit("missing"))
        )
        fetched = hits.unionByName(misses.select(*hits.columns))

        # 5. extract (Arrow pandas-UDF engine — one Python evaluation per
        # row; byte-identical to the native-expression engine by test)
        fetched = with_extraction_arrow(fetched)
        fetched = (
            fetched.withColumn(
                "extracted_text",
                F.when(F.col("x_status") == "listing", listing_text())
                .when(F.col("x_status") == "ok", extracted_text())
                .otherwise(F.lit(None).cast("string")),
            )
            .withColumn("wave", F.lit(wave))
            .withColumn("fetch_bytes", F.coalesce(F.length("html").cast("long"), F.lit(0)))
            # html/text are fully consumed by extraction — dropping them cuts
            # the per-wave checkpoint from ~3KB/row to ~100B/row (at corpus
            # scale the checkpoint must never re-store page bodies)
            .drop("html", "text")
        )

        # materialize the wave once; everything below reuses it.
        # (Deliberately NOT repartitioned before the write: rows carry
        # ~3KB of array columns, and a round-robin repartition pays
        # sort-before-repartition + a full shuffle of those bytes — measured
        # 564 task-seconds for 529MB at sf0.4. Scan-split-count output files
        # are the cheaper evil; finalize reads them once.)
        fetched.write.mode("overwrite").parquet(os.path.join(wdir, "fetched"))
        tw = _tick(f'w{wave} fetch+extract+write', tw)
        # Batch size read back from the write's parquet footers (zero jobs):
        # 0 means every frontier row was seen/robots-filtered — crawl done.
        if _parquet_rows(os.path.join(wdir, "fetched")) == 0:
            sched.unpersist()
            shutil.rmtree(wdir, ignore_errors=True)
            break
        fetched = spark.read.parquet(os.path.join(wdir, "fetched"))
        tw = _tick(f'w{wave} fetched-footers+reread', tw)

        # 6. outlinks -> next frontier. seen/order/results/metrics are all
        # projections of the materialized `fetched` — no extra per-wave
        # writes (finalized ONCE after the loop; at 10^10 scale these are
        # metadata-only views over the wave files).
        new_cand = expand_outlinks(fetched, wave)
        seen_delta = fetched.select(url_hash(F.col("url")).alias("url_hash"), "url", F.col("wave").cast("int").alias("wave"))

        # No seen anti-join here: already-fetched urls are eliminated by the
        # next wave's bloom-assisted anti-join anyway, and filtering now
        # would broadcast/shuffle the whole seen set once more per wave.
        # (The frontier checkpoint may therefore carry some seen urls — the
        # crawl order/seen-set semantics are unchanged; oracle-verified.)
        next_frontier = merge_frontier(deferred, new_cand)
        next_frontier.write.mode("overwrite").parquet(os.path.join(wdir, "frontier"))
        sched.unpersist()
        tw = _tick(f'w{wave} frontier-merge+write', tw)

        completed.append(wave)
        _write_manifest(ckpt_dir, completed)

        frontier = spark.read.parquet(os.path.join(wdir, "frontier"))
        n_frontier = _parquet_rows(os.path.join(wdir, "frontier"))
        seen = seen.unionByName(seen_delta)
        tw = _tick(f'w{wave} manifest+frontier-footers', tw)

    budgets.unpersist()
    spark.conf.set(coalesce_key, prev_coalesce)

    # finalize: derived views over all waves' fetched files.
    # `results` is served ZERO-COPY as a glob path over the wave files —
    # re-writing the full extraction output would double the job's bytes
    # (measured: the copy was ~50% of total wall at sf2.5). At cluster scale
    # this is the Iceberg metadata-only view over the wave partitions; the
    # glob is its sandbox equivalent. The wave files carry a superset of
    # RESULT_COLS; parquet is columnar, so unread extras cost nothing.
    paths = {
        "ckpt_dir": ckpt_dir,
        "waves": json.dumps(completed),
        "order": os.path.join(ckpt_dir, "order"),
        "results": os.path.join(ckpt_dir, "wave=*", "fetched"),
        "seen": os.path.join(ckpt_dir, "seen"),
        "metrics": os.path.join(ckpt_dir, "metrics"),
    }
    if completed:
        # three small projections re-scan the wave files; a persist() here is
        # a trap (columnar-cache build of the array columns cost 410s of GC
        # at sf0.4 — parquet re-reads are far cheaper than caching fat rows).
        # The writes are independent jobs over disjoint output paths —
        # submitted from separate threads so they share the executor pool
        # concurrently instead of serializing scan+write barriers.
        from concurrent.futures import ThreadPoolExecutor

        all_fetched = spark.read.parquet(*[os.path.join(_wave_dir(ckpt_dir, w), "fetched") for w in completed])

        def _w_order() -> None:
            all_fetched.select(
                "url", "host", "wave", F.col("rank").cast("int").alias("rank"), "sched_ms"
            ).write.mode("overwrite").parquet(paths["order"])

        def _w_seen() -> None:
            all_fetched.select(
                url_hash(F.col("url")).alias("url_hash"), "url", F.col("wave").cast("int").alias("wave")
            ).write.mode("overwrite").parquet(paths["seen"])

        def _w_metrics() -> None:
            (
                all_fetched.groupBy("wave", "host")
                .agg(
                    F.count("*").alias("urls_scheduled"),
                    F.sum(F.when(F.col("x_status") == "ok", 1).otherwise(0)).alias("urls_ok"),
                    F.sum(F.when(F.col("x_status") == "err", 1).otherwise(0)).alias("urls_err"),
                    F.sum("fetch_bytes").alias("bytes_fetched"),
                    F.sum(F.coalesce(F.size("x_outlinks"), F.lit(0)).cast("long")).alias("outlinks"),
                )
                .write.mode("overwrite")
                .parquet(paths["metrics"])
            )

        with ThreadPoolExecutor(max_workers=3) as pool:
            futures = [pool.submit(f) for f in (_w_order, _w_seen, _w_metrics)]
            for fut in futures:
                fut.result()
    # Restore scan-split confs only now: the finalize scans above still read
    # this corpus's wave files and want the tuned splits; anything after
    # run_crawl is unrelated work that must not inherit them.
    for k, v in (prev_splits or {}).items():
        spark.conf.set(k, v)
    return paths
