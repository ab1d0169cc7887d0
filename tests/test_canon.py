"""URL canonicalization: engine (JVM expressions) vs oracle (pure Python),
plus idempotence over every URL in the corpus (SURVEY.md §5.2 property 4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from webscraper_spark.functions.canon import canonicalize_url, url_host
from webscraper_spark.oracle.seq_oracle import canonicalize, host_of

CASES = [
    "https://dealer1.example/ad/42",
    "HTTPS://DEALER9.EXAMPLE:443/inventory?sort=date&page=0#ses",
    "http://Host.Example:80",
    "http://host.example:8080/x",   # non-default port kept
    "https://a.example/p?b=2&a=1&a=0#frag",
    "https://a.example/p?",
    "https://a.example",
    "not a url at all",
    "",
    "ftp://Files.Example:21/pub",
]


def test_engine_matches_oracle_on_cases(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "url string")
    got = [r.c for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    want = [canonicalize(c) for c in CASES]
    assert got == want


def test_host_matches_oracle(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "url string")
    got = [r.h for r in df.select(url_host(F.col("url")).alias("h")).collect()]
    want = [host_of(c) for c in CASES]
    assert got == want


def test_idempotent_on_corpus(spark, corpus_dir):
    pages = spark.read.parquet(corpus_dir["pages"])
    once = pages.select(canonicalize_url(F.col("url")).alias("c1"))
    twice = once.select(F.col("c1"), canonicalize_url(F.col("c1")).alias("c2"))
    assert twice.filter(F.col("c1") != F.col("c2")).count() == 0


def test_corpus_urls_already_canonical(spark, corpus_dir):
    pages = spark.read.parquet(corpus_dir["pages"])
    assert pages.filter(canonicalize_url(F.col("url")) != F.col("url")).count() == 0


def test_arrow_engine_matches_native(spark, corpus_dir):
    """canon_host_arrow must equal canonicalize_url/url_host on every outlink
    in the corpus plus the edge cases."""
    from pyspark.sql import functions as F

    from webscraper_spark.functions.canon import canon_host_arrow
    from webscraper_spark.functions.extract import with_extraction

    pages = spark.read.parquet(corpus_dir["pages"])
    links = with_extraction(pages).select(F.explode("x_outlinks").alias("raw"))
    edge = spark.createDataFrame([(c,) for c in CASES], "raw string")
    both = links.unionByName(edge).select(
        "raw",
        canonicalize_url(F.col("raw")).alias("n_url"),
        url_host(canonicalize_url(F.col("raw"))).alias("n_host"),
        canon_host_arrow(F.col("raw")).alias("a"),
    )
    bad = both.filter(
        ~F.col("n_url").eqNullSafe(F.col("a.url")) | ~F.col("n_host").eqNullSafe(F.col("a.host"))
    )
    assert bad.count() == 0, bad.take(5)


# --- registered-domain extraction (functions/canon.py, SURVEY 2.10 L49) ---

def test_registered_domain_psl_rules(spark):
    from webscraper_spark.functions.canon import registered_domain
    from pyspark.sql import functions as F

    cases = [
        ("www.shop.example.co.uk", "example.co.uk"),   # two-level suffix
        ("a.b.example.com", "example.com"),
        ("example.com", "example.com"),
        ("s1.news.example.com.au", "example.com.au"),
        ("CO.UK", "CO.UK"),                            # bare suffix: no extra label
        ("localhost", "localhost"),                    # single label passthrough
        ("example.de", "example.de"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [r["d"] for r in df.select(registered_domain(F.col("host")).alias("d")).collect()]
    assert got == [want for _, want in cases]


def test_strip_tracking_params(spark):
    from webscraper_spark.functions.canon import strip_tracking_params

    cases = [
        ("https://a.ex/p", "https://a.ex/p"),                            # no query
        ("https://a.ex/p?utm_source=x", "https://a.ex/p"),               # '?' disappears
        ("https://a.ex/p?utm_source=x&utm_medium=y", "https://a.ex/p"),
        ("https://a.ex/p?id=7&utm_campaign=z", "https://a.ex/p?id=7"),
        ("https://a.ex/p?utm_content=a&page=2&gclid=q", "https://a.ex/p?page=2"),
        ("https://a.ex/p?a=1&b=2", "https://a.ex/p?a=1&b=2"),            # untouched
        ("https://a.ex/p?fbclid=1#sec", "https://a.ex/p#sec"),           # fragment kept
        ("https://a.ex/p?ref=feed&a=1", "https://a.ex/p?a=1"),
        # param NAMED like a prefix of a tracking key must survive
        ("https://a.ex/p?utms=1", "https://a.ex/p?utms=1"),
        ("https://a.ex/p?refresh=1", "https://a.ex/p?refresh=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r["url"]: r["s"] for r in df.select("url", strip_tracking_params(F.col("url")).alias("s")).collect()}
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)
    # pure JVM expression: no Python eval anywhere in the plan
    plan = df.select(strip_tracking_params(F.col("url"))).\
        _jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
