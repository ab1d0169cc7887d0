"""Physical-plan regression tests for the round-4 operator batch.

The scale claims in the operator docstrings ("pure codegen", "no
shuffle", "WindowGroupLimit collapses the super-node map-side",
"broadcast weight table") are properties of the PLAN, not of small-scale
output — so they get asserted here directly, the same way correctness is
asserted by oracles. A regression that silently introduces a Python eval
node or an extra Exchange into these operators would pass every value
test and still be 100x slower at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from webscraper_spark.operators.graph import anchor_profile, cap_degree
from webscraper_spark.operators.mime import route_by_mime
from webscraper_spark.operators.urlfilter import url_filter


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _urls(spark, n=64):
    return spark.createDataFrame(
        [(i, f"https://h{i % 5}.example.com/cat/item-{i}?page={i % 9}") for i in range(n)],
        "doc_id long, url string",
    )


def test_url_filter_is_pure_codegen(spark):
    plan = _plan(url_filter(_urls(spark)))
    assert "EvalPython" not in plan          # no Python UDF of any kind
    assert "Exchange" not in plan            # narrow projection, no shuffle


def test_mime_route_is_pure_codegen(spark):
    df = spark.createDataFrame([(i, b"%PDF-x") for i in range(8)], "i long, payload binary")
    plan = _plan(route_by_mime(df))
    assert "EvalPython" not in plan
    assert "Exchange" not in plan


def test_cap_degree_uses_window_group_limit(spark):
    edges = spark.createDataFrame([(i, i % 3) for i in range(64)], "src long, dst long")
    plan = _plan(cap_degree(edges, k=4))
    # rank<=k rewritten to WindowGroupLimit: per-map-task top-k BEFORE the
    # shuffle — the property that absorbs 10^7-inlink super-nodes.
    assert "WindowGroupLimit" in plan
    assert "EvalPython" not in plan


def test_anchor_profile_topk_uses_window_group_limit(spark):
    edges = spark.createDataFrame(
        [(i, i % 3, ["a", "b"][i % 2]) for i in range(64)], "src long, dst long, anchor string"
    )
    plan = _plan(anchor_profile(edges, k=2))
    assert "WindowGroupLimit" in plan


def test_dsir_weight_table_is_broadcast(spark):
    from webscraper_spark.operators.dsir import importance_weights

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over dog %d" % i) for i in range(32)],
        "doc_id long, text string",
    )
    plan = _plan(importance_weights(docs, F.lit(True), n_buckets=32))
    # grams join weights must be broadcast (B-row weight table), never a
    # sort-merge shuffle of the gram stream against it.
    assert "BroadcastHashJoin" in plan


def test_quantile_threshold_join_is_broadcast(spark):
    from webscraper_spark.operators.quantiles import quantile_threshold_filter

    df = spark.createDataFrame(
        [("en", i, i % 10) for i in range(64)], "lang string, doc_id long, score long"
    )
    plan = _plan(quantile_threshold_filter(df, ["lang"], "score", 0.9))
    assert "BroadcastHashJoin" in plan


def test_clean_text_is_codegen_nfc_is_arrow(spark):
    from webscraper_spark.functions.normalize import clean_text, normalize_text

    df = spark.createDataFrame([("some text",)], "t string")
    assert "EvalPython" not in _plan(df.select(clean_text("t")))
    full = _plan(df.select(normalize_text("t")))
    assert "ArrowEvalPython" in full          # NFC is the Arrow path...
    assert "BatchEvalPython" not in full      # ...never row-at-a-time Python


def test_pivot_explicit_values_single_pass(spark):
    # lang_pivot (SURVEY A8): pivot with an EXPLICIT value list must not
    # run a distinct-values collect job — the plan is a (source, lang)
    # pre-aggregate feeding a pivotfirst aggregate, BOTH with map-side
    # partials, and no Expand node.
    df = spark.createDataFrame(
        [(f"s{i % 4}", ["de", "en", "es"][i % 3], i) for i in range(60)],
        "source string, lang string, n_chars long",
    )
    p = (
        df.groupBy("source")
        .pivot("lang", ["de", "en", "es"])
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars"))
    )
    plan = _plan(p)
    assert plan.count("Exchange") == 2       # pre-agg + pivotfirst, nothing more
    assert "partial_pivotfirst" in plan      # pivot itself combines map-side
    assert "Expand" not in plan
    assert "EvalPython" not in plan


def test_template_mining_is_codegen_single_agg(spark):
    from webscraper_spark.operators.templates import url_templates

    plan = _plan(url_templates(_urls(spark)))
    assert "EvalPython" not in plan          # regex masking is codegen
    assert plan.count("Exchange") == 1       # one shuffle: the group-by


def test_cms_sketch_partial_aggregates(spark):
    from webscraper_spark.operators.sketch import cms_topk

    df = spark.createDataFrame([(f"h{i % 9}",) for i in range(50)], "item string")
    plan = _plan(cms_topk(df, F.col("item"), d=4, w=64, k=5))
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan       # d*w sketch broadcast into point query


def test_cms_topk_with_candidates_skips_stream_distinct(spark):
    """`candidates=None` falls back to a full distinct of the stream —
    the shuffle the sketch exists to avoid. With an explicit candidate
    list the stream contributes ONLY the fixed d*w sketch aggregate: one
    fewer aggregate pair in the plan, and the broadcast point-query."""
    from webscraper_spark.operators.sketch import cms_topk

    df = spark.createDataFrame([(f"h{i % 9}",) for i in range(50)], "item string")
    cand = spark.createDataFrame([(f"h{i}",) for i in range(9)], "item string")
    p_default = _plan(cms_topk(df, F.col("item"), d=4, w=64, k=5))
    p_cand = _plan(cms_topk(df, F.col("item"), candidates=cand, d=4, w=64, k=5))
    assert "BroadcastHashJoin" in p_cand
    assert "EvalPython" not in p_cand
    # sketch agg + estimate agg only; the default plan carries the extra
    # stream-distinct aggregate on top
    assert p_cand.count("HashAggregate") < p_default.count("HashAggregate")


def test_chunking_is_codegen_no_shuffle(spark):
    from webscraper_spark.operators.chunk import chunk_documents

    df = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(80))) for i in range(8)],
        "doc_id long, text string",
    )
    plan = _plan(chunk_documents(df, max_tokens=32, stride=16))
    assert "EvalPython" not in plan
    assert "Exchange" not in plan            # pure per-row explode, no shuffle


def test_charset_and_backoff_are_codegen(spark):
    from webscraper_spark.operators.backoff import adaptive_backoff
    from webscraper_spark.operators.charset import charset_report

    pages = spark.createDataFrame(
        [(f"https://h{i%3}.ex/{i}", '<meta charset="utf-8">') for i in range(12)],
        "url string, html string",
    )
    p1 = _plan(charset_report(pages))
    assert "EvalPython" not in p1 and p1.count("Exchange") == 1

    oc = spark.createDataFrame(
        [(f"h{i%3}", i % 4, "ok") for i in range(24)], "host string, wave long, status string"
    )
    p2 = _plan(adaptive_backoff(oc))
    assert "EvalPython" not in p2
    assert p2.count("Exchange") == 2         # per-(host,wave) agg, then per-host
