"""End-to-end test of the frontier-hygiene pipeline (plans/hygiene.py):
redirect resolution -> canonical collapse -> dedup -> URL filter -> trap
masking -> backoff-fed scheduling, exercised as ONE pass the way a wave
would run it."""

from __future__ import annotations

from pyspark.sql import functions as F

from webscraper_spark.plans.hygiene import hygiene_frontier


def _cand(rows):
    return [(u, u.split("/")[2], d, w, p) for (u, d, w, p) in rows]


def test_hygiene_frontier_end_to_end(spark):
    art = "https://a.ex/article-one"
    cand = spark.createDataFrame(
        _cand([
            (art, 1, 1, 10),                               # canonical target
            ("https://a.ex/r/1", 1, 1, 11),                # 2-hop redirect -> art
            (art + "?ref=feed", 1, 1, 12),                 # declared canonical -> art
            ("https://a.ex/casino/x", 1, 1, 13),           # blocklisted
            ("https://a.ex/loop/a", 1, 1, 14),             # redirect cycle
            ("https://slow.ex/page-one", 1, 1, 15),        # throttling host
            ("https://a.ex/other-page", 0, 1, 16),         # depth 0 ranks first
        ]),
        "url string, host string, depth int, disc_wave int, disc_pos long",
    )
    edges = spark.createDataFrame(
        [
            ("https://a.ex/r/1", "https://a.ex/r/2"),
            ("https://a.ex/r/2", art),
            ("https://a.ex/loop/a", "https://a.ex/loop/b"),
            ("https://a.ex/loop/b", "https://a.ex/loop/a"),
        ],
        "src string, dst string",
    )
    cmap = spark.createDataFrame([(art + "?ref=feed", art)], "url string, canonical string")
    # slow.ex throttled in its latest 2 waves -> streak 2 -> 100 << 2 = 400
    outcomes = spark.createDataFrame(
        [("slow.ex", 0, "ok"), ("slow.ex", 1, "ok"),
         ("slow.ex", 2, "429"), ("slow.ex", 3, "429"),
         ("a.ex", 0, "ok"), ("a.ex", 1, "ok"), ("a.ex", 2, "ok"), ("a.ex", 3, "ok")],
        "host string, wave long, status string",
    )
    out = hygiene_frontier(
        cand, redirect_edges=edges, canonical_map=cmap, outcomes=outcomes,
        wave=1, base_delay_ms=100, trap_min_urls=100,
    )
    rows = {r["url"]: r for r in out.collect()}
    out._redir_cache.unpersist()

    # redirect alias + canonical variant merged into art, minimal disc_pos kept
    assert set(rows) == {art, "https://slow.ex/page-one", "https://a.ex/other-page"}
    assert rows[art]["disc_pos"] == 10
    # cycle and blocklisted rows are gone entirely
    # (asserted by the set above); verdicts carried through
    assert rows[art]["verdict"] == "keep"
    # per-host FIFO: depth-0 page ranks before the depth-1 article on a.ex
    assert rows["https://a.ex/other-page"]["rank"] == 1
    assert rows[art]["rank"] == 2
    # backoff-fed delays: escalated on the throttling host, base elsewhere
    assert rows["https://slow.ex/page-one"]["delay_ms"] == 400
    assert rows[art]["delay_ms"] == 100
    # simulated clock replays schedule.py's formula with the fed delay
    assert rows[art]["sched_ms"] == 10_000_000 + (2 - 1) * 100
    assert rows["https://slow.ex/page-one"]["sched_ms"] == 10_000_000


def test_hygiene_trap_masking_and_tracking_flag(spark):
    # 12 calendar URLs on one host (template /cal/{n}/{n}, 2 slots) plus
    # one normal page; trap_min_urls=10 masks the calendar family only.
    rows = [(f"https://t.ex/cal/2024/{i}", "t.ex", 1, 1, i) for i in range(12)]
    rows.append(("https://t.ex/about-us?utm_source=mail", "t.ex", 1, 1, 99))
    cand = spark.createDataFrame(
        rows, "url string, host string, depth int, disc_wave int, disc_pos long"
    )
    out = hygiene_frontier(cand, trap_min_urls=10).collect()
    assert len(out) == 1
    r = out[0]
    # tracking params stripped during canonicalization (default)
    assert r["url"] == "https://t.ex/about-us"
    assert r["verdict"] == "keep"
    assert r["rank"] == 1 and r["delay_ms"] == 100
    # with stripping off the URL survives verbatim, flagged for later
    out2 = hygiene_frontier(cand, trap_min_urls=10, strip_tracking=False).collect()
    keep2 = [r for r in out2 if r["host"] == "t.ex" and "about-us" in r["url"]]
    assert len(keep2) == 1
    assert keep2[0]["url"] == "https://t.ex/about-us?utm_source=mail"
    assert keep2[0]["verdict"] == "keep:strip_tracking"


def test_hygiene_without_optional_inputs_is_filter_plus_schedule(spark):
    cand = spark.createDataFrame(
        [("https://x.ex/alpha", "x.ex", 1, 1, 1), ("https://x.ex/beta", "x.ex", 1, 1, 2)],
        "url string, host string, depth int, disc_wave int, disc_pos long",
    )
    out = hygiene_frontier(cand).orderBy("rank").collect()
    assert [r["url"] for r in out] == ["https://x.ex/alpha", "https://x.ex/beta"]
    assert [r["sched_ms"] for r in out] == [10_000_000, 10_000_100]
    assert not hasattr(out, "_redir_cache")


def test_hygiene_plan_small_tables_broadcast(spark):
    """The trap table and delay table joins must be broadcast — the only
    frontier-sized shuffles are the dedup agg and the rank window."""
    cand = spark.createDataFrame(
        [(f"https://h{i % 3}.ex/p-{i}", f"h{i % 3}.ex", 1, 1, i) for i in range(30)],
        "url string, host string, depth int, disc_wave int, disc_pos long",
    )
    outcomes = spark.createDataFrame(
        [(f"h{i % 3}.ex", i % 2, "ok") for i in range(12)],
        "host string, wave long, status string",
    )
    plan = hygiene_frontier(cand, outcomes=outcomes)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan  # whole pipeline codegen, no Python


def test_hygiene_empty_optional_inputs(spark):
    """Empty (schema-only) redirect/canonical/outcome tables must behave
    exactly like omitted ones — no crash, no dropped candidates, base
    delays (the wave driver hands over whatever metadata exists, which
    on wave 0 is nothing)."""
    cand = spark.createDataFrame(
        [("https://x.ex/alpha", "x.ex", 1, 1, 1)],
        "url string, host string, depth int, disc_wave int, disc_pos long",
    )
    edges = spark.createDataFrame([], "src string, dst string")
    cmap = spark.createDataFrame([], "url string, canonical string")
    outcomes = spark.createDataFrame([], "host string, wave long, status string")
    out = hygiene_frontier(
        cand, redirect_edges=edges, canonical_map=cmap, outcomes=outcomes
    )
    rows = out.collect()
    out._redir_cache.unpersist()
    assert [(r["url"], r["rank"], r["delay_ms"], r["sched_ms"]) for r in rows] == [
        ("https://x.ex/alpha", 1, 100, 10_000_000)
    ]


def test_hygiene_empty_candidates(spark):
    cand = spark.createDataFrame(
        [], "url string, host string, depth int, disc_wave int, disc_pos long"
    )
    assert hygiene_frontier(cand).count() == 0
