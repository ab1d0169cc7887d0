"""Engine-vs-oracle crawl parity: order, seen set, schedule, politeness
invariant, byte-identical per-url extraction, and checkpoint resume (ST5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscraper_spark.oracle.seq_oracle import crawl_oracle
from webscraper_spark.plans.wave import CrawlConfig, run_crawl

MAX_WAVES = 6


@pytest.fixture(scope="module")
def inputs(spark, corpus_dir):
    pages = spark.read.parquet(corpus_dir["pages"])
    seeds = spark.read.parquet(corpus_dir["seeds"])
    robots = spark.read.parquet(corpus_dir["robots"])
    politeness = spark.read.parquet(corpus_dir["politeness"])
    return pages, seeds, robots, politeness


@pytest.fixture(scope="module")
def oracle_result(inputs):
    pages, seeds, robots, politeness = inputs
    pages_d = {r.url: (bytes(r.html).decode("utf-8") if r.html is not None else None) for r in
               pages.select("url", "html").collect()}
    seeds_l = [r.url for r in seeds.select("url").collect()]
    robots_d = {r.host: (list(r.disallow_prefixes), int(r.crawl_delay_ms)) for r in robots.collect()}
    pol_d = {r.host: (int(r.max_pages_per_wave), int(r.min_delay_ms)) for r in politeness.collect()}
    return crawl_oracle(pages_d, seeds_l, robots_d, pol_d, max_waves=MAX_WAVES)


@pytest.fixture(scope="module")
def engine_result(spark, inputs, tmp_path_factory):
    pages, seeds, robots, politeness = inputs
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    paths = run_crawl(spark, pages, seeds, robots, politeness, ckpt,
                      CrawlConfig(max_waves=MAX_WAVES, use_bloom=False))
    return spark, paths


def test_crawl_order_matches_oracle(engine_result, oracle_result):
    spark, paths = engine_result
    order_df = spark.read.parquet(paths["order"])
    got = {(r.url, r.host, r.wave, r.rank) for r in order_df.collect()}
    want = set(oracle_result[0])
    assert got == want
    assert len(got) == order_df.count()  # no dup fetches


def test_seen_set_matches_oracle(engine_result, oracle_result):
    spark, paths = engine_result
    seen_df = spark.read.parquet(paths["seen"])
    got = {r.url: r.wave for r in seen_df.collect()}
    assert got == oracle_result[1]


def test_schedule_matches_oracle(engine_result, oracle_result):
    spark, paths = engine_result
    order_df = spark.read.parquet(paths["order"])
    got = {r.url: r.sched_ms for r in order_df.collect()}
    assert got == oracle_result[2]


def test_politeness_invariant(engine_result, inputs):
    """No two fetches of one host within a wave closer than its delay."""
    spark, paths = engine_result
    _, _, robots, politeness = inputs
    order = spark.read.parquet(paths["order"])
    from webscraper_spark.operators.robots import resolve_budgets

    budgets = resolve_budgets(robots.select("host"), robots, politeness)
    from pyspark.sql import Window

    w = Window.partitionBy("host", "wave").orderBy("sched_ms")
    gaps = (
        order.join(budgets, "host")
        .withColumn("prev", F.lag("sched_ms").over(w))
        .filter(F.col("prev").isNotNull())
        .filter((F.col("sched_ms") - F.col("prev")) < F.col("delay_ms"))
    )
    assert gaps.count() == 0


def test_budget_respected(engine_result, inputs):
    spark, paths = engine_result
    _, _, robots, politeness = inputs
    from webscraper_spark.operators.robots import resolve_budgets

    budgets = resolve_budgets(robots.select("host"), robots, politeness)
    per = spark.read.parquet(paths["order"]).groupBy("host", "wave").count()
    over = per.join(budgets, "host").filter(F.col("count") > F.col("max_pages"))
    assert over.count() == 0


def test_robots_never_fetched(engine_result, inputs):
    spark, paths = engine_result
    _, _, robots, _ = inputs
    order = spark.read.parquet(paths["order"])
    blocked_hosts = robots.filter(F.array_contains("disallow_prefixes", "/")).select("host")
    assert order.join(blocked_hosts, "host").count() == 0
    private = order.filter(F.col("url").contains("/ad/private/")).join(
        robots.filter(F.array_contains("disallow_prefixes", "/ad/private/")).select("host"), "host"
    )
    assert private.count() == 0


def test_extracted_text_byte_identical_per_url(engine_result, inputs):
    """input_hint invariant over the crawled set: results.extracted_text ==
    pages.text for every fetched page with ground truth."""
    spark, paths = engine_result
    pages = inputs[0]
    res = spark.read.parquet(paths["results"]).filter(F.col("fetch_status") == "ok")
    joined = res.select("url", "extracted_text").join(pages.select("url", "text"), "url")
    bad = joined.filter(~F.col("extracted_text").eqNullSafe(F.col("text")))
    assert bad.count() == 0


def test_resume_identical_to_straight_run(spark, inputs, oracle_result, tmp_path_factory):
    """Kill after wave 2, resume -> identical final order + seen (ST5)."""
    pages, seeds, robots, politeness = inputs
    ckpt = str(tmp_path_factory.mktemp("ckpt_resume"))
    run_crawl(spark, pages, seeds, robots, politeness, ckpt, CrawlConfig(max_waves=3))
    paths = run_crawl(spark, pages, seeds, robots, politeness, ckpt,
                      CrawlConfig(max_waves=MAX_WAVES), resume=True)
    got_order = {(r.url, r.host, r.wave, r.rank) for r in spark.read.parquet(paths["order"]).collect()}
    assert got_order == set(oracle_result[0])
    got_seen = {r.url: r.wave for r in spark.read.parquet(paths["seen"]).collect()}
    assert got_seen == oracle_result[1]


def test_resume_recovers_from_corrupt_manifest(spark, inputs, oracle_result, tmp_path_factory):
    """Truncate the manifest after wave 2 -> resume still completes
    identically: read_manifest falls back to the wave dirs' frontier
    _SUCCESS markers (the last per-wave write before the manifest), so the
    resume contract survives manifest damage/format evolution (ST3/ST5)."""
    import json
    import os

    from webscraper_spark.plans.wave import read_manifest

    pages, seeds, robots, politeness = inputs
    ckpt = str(tmp_path_factory.mktemp("ckpt_corrupt"))
    run_crawl(spark, pages, seeds, robots, politeness, ckpt, CrawlConfig(max_waves=3))
    good = read_manifest(ckpt)
    mpath = os.path.join(ckpt, "manifest.json")
    raw = open(mpath).read()
    with open(mpath, "w") as f:
        f.write(raw[: len(raw) // 2])  # truncated mid-JSON
    assert read_manifest(ckpt) == good  # recovered from _SUCCESS markers
    paths = run_crawl(spark, pages, seeds, robots, politeness, ckpt,
                      CrawlConfig(max_waves=MAX_WAVES), resume=True)
    got_order = {(r.url, r.host, r.wave, r.rank) for r in spark.read.parquet(paths["order"]).collect()}
    assert got_order == set(oracle_result[0])

    # a manifest from a NEWER format version refuses loudly instead of guessing
    with open(mpath, "w") as f:
        json.dump({"version": 99, "completed_waves": good}, f)
    with pytest.raises(RuntimeError, match="version 99"):
        read_manifest(ckpt)


def test_bloom_path_identical(spark, inputs, oracle_result, tmp_path_factory):
    pages, seeds, robots, politeness = inputs
    ckpt = str(tmp_path_factory.mktemp("ckpt_bloom"))
    paths = run_crawl(spark, pages, seeds, robots, politeness, ckpt,
                      CrawlConfig(max_waves=MAX_WAVES, use_bloom=True, n_buckets=16))
    got = {(r.url, r.host, r.wave, r.rank) for r in spark.read.parquet(paths["order"]).collect()}
    assert got == set(oracle_result[0])


def test_unknown_host_gets_politeness_defaults(spark):
    """Hosts discovered mid-crawl (absent from the budgets table) inherit the
    politeness '*' row, not hardcoded literals (resolve_budgets emits the
    star row; schedule_ranked coalesces through it)."""
    from webscraper_spark.operators.robots import resolve_budgets
    from webscraper_spark.operators.schedule import schedule_ranked

    robots = spark.createDataFrame(
        [("known.example", [], 0)],
        "host string, disallow_prefixes array<string>, crawl_delay_ms long",
    )
    politeness = spark.createDataFrame(
        [("*", 7, 350), ("known.example", 2, 100)],
        "host string, max_pages_per_wave long, min_delay_ms long",
    )
    budgets = resolve_budgets(robots.select("host"), robots, politeness)
    star = {r.host: (r.max_pages, r.delay_ms) for r in budgets.collect()}
    assert star["*"] == (7, 350)
    cand = spark.createDataFrame(
        [(f"https://surprise.example/p{i}", "surprise.example", 1, 1, i) for i in range(10)]
        + [(f"https://known.example/p{i}", "known.example", 1, 1, i) for i in range(4)],
        "url string, host string, depth int, disc_wave int, disc_pos long",
    )
    sched = schedule_ranked(cand, budgets, wave=0).collect()
    surprise = [r for r in sched if r.host == "surprise.example"]
    known = [r for r in sched if r.host == "known.example"]
    # unknown host: '*' defaults (7 pages, 350ms), NOT the (40, 1000) literals
    assert sum(r.in_budget for r in surprise) == 7
    assert all(r.delay_ms == 350 for r in surprise)
    # known host keeps its override
    assert sum(r.in_budget for r in known) == 2
    assert all(r.delay_ms == 100 for r in known)


def test_bucketed_corpus_join_identical(spark, corpus_dir, inputs, oracle_result, tmp_path_factory):
    """The bucketed-corpus fetch path (pages as a bucketed catalog table,
    bucketed_broadcast_threshold=0 so EVERY wave takes the bucket-aligned
    shuffled-hash join instead of the batch broadcast) produces the identical
    crawl order + seen set — and its physical plan really is exchange-free on
    the corpus side (the Iceberg bucket(N, url) behavior this layout stands
    in for)."""
    from webscraper_spark.sources.synth import load_pages

    pages_b, bucketed = load_pages(spark, corpus_dir["pages"])
    assert bucketed, "conftest corpus should be materialized bucketed"

    # plan shape: url-equi-join against the bucketed table exchanges only
    # the other side
    probe = pages_b.join(pages_b.select("url").hint("SHUFFLE_HASH"), "url", "left_anti")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan

    _, seeds, robots, politeness = inputs
    ckpt = str(tmp_path_factory.mktemp("ckpt_bucketed"))
    paths = run_crawl(
        spark, pages_b, seeds, robots, politeness, ckpt,
        CrawlConfig(max_waves=MAX_WAVES, corpus_bucketed=True, bucketed_broadcast_threshold=0),
    )
    got_order = {(r.url, r.host, r.wave, r.rank) for r in spark.read.parquet(paths["order"]).collect()}
    assert got_order == set(oracle_result[0])
    got_seen = {r.url: r.wave for r in spark.read.parquet(paths["seen"]).collect()}
    assert got_seen == oracle_result[1]


def test_url_hygiene_drops_before_scheduling(spark, inputs, oracle_result, tmp_path_factory):
    """CrawlConfig(url_hygiene=True): drop-verdict URLs never occupy a
    fetch slot or an order row. The corpus itself contains URLs the
    digit-slug rule targets (auto-generated numeric /ad/NNNN slugs), so
    the hygienic crawl is a strict SUB-crawl of the reference order:
    every fetched URL passes the filter, no URL outside
    oracle ∪ polluted-seeds ever appears (dropping pages only removes
    discovery paths), and the drop-verdict seeds never reach the order
    while the keep:strip_tracking one does."""
    from webscraper_spark.operators.urlfilter import url_filter

    pages, seeds, robots, politeness = inputs
    keep_url = "https://bad.ex/landing?utm_source=mail"
    bad = spark.createDataFrame(
        [
            ("https://bad.ex/casino/promo",),                  # drop:blocklist
            ("https://bad.ex/a/b/c/d/e/f/g/h/i/leaf",),        # drop:depth (10)
            (keep_url,),                                       # keep:strip_tracking
        ],
        "url string",
    )
    ckpt = str(tmp_path_factory.mktemp("ckpt_hygiene"))
    paths = run_crawl(
        spark, pages, seeds.select("url").unionByName(bad), robots, politeness, ckpt,
        CrawlConfig(max_waves=MAX_WAVES, url_hygiene=True),
    )
    order = spark.read.parquet(paths["order"])
    got = {(r.url, r.host, r.wave, r.rank) for r in order.collect()}
    assert len(got) > 0
    # every fetched URL passes the filter — zero drop verdicts slipped in
    fetched_verdicts = url_filter(order.select("url")).select("verdict").distinct().collect()
    assert all(r.verdict.startswith("keep") for r in fetched_verdicts)
    # sub-crawl: nothing outside the reference-reachable set + kept seed
    oracle_urls = {u for (u, _h, _w, _r) in oracle_result[0]}
    assert {u for (u, _h, _w, _r) in got} <= oracle_urls | {keep_url}
    # the corpus really exercises the rule (some reference URLs dropped)
    assert {u for (u, _h, _w, _r) in got} < oracle_urls | {keep_url}
    # kept tracking seed is the sole bad.ex candidate: wave-0 rank 1
    assert (keep_url, "bad.ex", 0, 1) in got
    seen = {r.url for r in spark.read.parquet(paths["seen"]).collect()}
    assert "https://bad.ex/casino/promo" not in seen
    assert "https://bad.ex/a/b/c/d/e/f/g/h/i/leaf" not in seen
