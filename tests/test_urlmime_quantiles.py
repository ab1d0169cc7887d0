"""Tests for URL-quality filtering (operators/urlfilter.py, SURVEY 2.10
L35), MIME sniffing/routing (operators/mime.py, 2.1 S14), and exact
group quantiles (operators/quantiles.py, 2.4 A6)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from webscraper_spark.operators.mime import route_by_mime, sniff_mime
from webscraper_spark.operators.quantiles import exact_group_quantiles
from webscraper_spark.operators.urlfilter import url_filter


# ---------------------------------------------------------------- urlfilter

URL_CASES = [
    ("https://ok.example.com/cat/item-5?page=3", "keep"),
    ("https://ok.example.com/go-casino-now", "drop:blocklist"),
    ("https://ok.example.com" + "/s" * 9 + "/leaf", "drop:depth"),  # depth 10
    ("https://ok.example.com/p?a=1&b=2&c=3&d=4&e=5&f=6&g=7", "drop:params"),
    ("https://ok.example.com/p/123456", "drop:digits"),
    ("https://ok.example.com/p/ab1", "keep"),  # slug under 4 chars exempt
    ("https://ok.example.com/item?id=9&utm_campaign=x", "keep:strip_tracking"),
    ("https://ok.example.com/", "keep"),
    # blocklist beats depth: keyword inside a too-deep path
    ("https://ok.example.com/a/b/c/d/e/f/g/h/i/viagra", "drop:blocklist"),
]


def test_url_filter_verdicts(spark):
    df = spark.createDataFrame([(u,) for u, _ in URL_CASES], "url string")
    got = {r["url"]: r["verdict"] for r in url_filter(df).collect()}
    for u, want in URL_CASES:
        assert got[u] == want, (u, got[u], want)


def test_url_filter_features(spark):
    df = spark.createDataFrame(
        [("https://h.example.com/a/b/item-77?x=1&y=2&utm_source=z",)], "url string"
    )
    r = url_filter(df).collect()[0]
    assert r["depth"] == 3
    assert r["n_params"] == 3
    assert r["slug_len"] == 7 and r["slug_digits"] == 2
    assert r["has_tracking"] and not r["blocked_kw"]
    assert r["verdict"] == "keep:strip_tracking"


# ---------------------------------------------------------------- mime

MIME_CASES = [
    (b"\xff\xd8\xff\xe0JFIF....", "image/jpeg", "multimodal"),
    (b"\x89PNG\r\n\x1a\n....", "image/png", "multimodal"),
    (b"GIF89a....", "image/gif", "multimodal"),
    (b"%PDF-1.7 blah", "application/pdf", "archive"),
    (b"PK\x03\x04zipzip", "application/zip", "archive"),
    (b"\x1f\x8b\x08gz", "application/gzip", "archive"),
    (b"<!doctype html><p>x</p>", "text/html", "extract"),
    (b"   \t\n<html><body>y", "text/html", "extract"),
    (b"just some text", "application/octet-stream", "quarantine"),
    (b"", "application/octet-stream", "quarantine"),
    # invalid UTF-8 must not throw (ANSI decode is why sniffing is hex-only)
    (b"\xfe\xfd\x80garbage", "application/octet-stream", "quarantine"),
]


def test_sniff_and_route(spark):
    df = spark.createDataFrame(
        [(i, p) for i, (p, _, _) in enumerate(MIME_CASES)], "i long, payload binary"
    )
    got = {r["i"]: (r["mime"], r["lane"]) for r in route_by_mime(df).collect()}
    for i, (_, mime, lane) in enumerate(MIME_CASES):
        assert got[i] == (mime, lane), (i, got[i], (mime, lane))


def test_sniff_mime_is_prefix_only(spark):
    # magic bytes later in the payload must not trigger
    df = spark.createDataFrame([(b"text with \xff\xd8\xff inside",)], "payload binary")
    assert df.select(sniff_mime("payload").alias("m")).collect()[0]["m"] == (
        "application/octet-stream"
    )


# ---------------------------------------------------------------- quantiles


def _py_type1(vals, q):
    s = sorted(vals)
    return s[math.ceil(q * len(s)) - 1]


def test_exact_group_quantiles_both_plans_match_python(spark):
    rows = []
    for g in ("a", "b"):
        for i in range(1, 138 if g == "a" else 61):
            rows.append((g, (i * 7919) % 97))  # ties guaranteed (mod 97)
    df = spark.createDataFrame(rows, "grp string, v long")
    by_group = {"a": [v for g, v in rows if g == "a"], "b": [v for g, v in rows if g == "b"]}
    for pre in (False, True):
        out = exact_group_quantiles(df, ["grp"], "v", (0.5, 0.9, 0.99), pre_aggregated=pre)
        got = {(r["grp"], r["q_permille"]): r["value"] for r in out.collect()}
        for g, vals in by_group.items():
            for q, pm in ((0.5, 500), (0.9, 900), (0.99, 990)):
                assert got[(g, pm)] == _py_type1(vals, q), (pre, g, q)


def test_exact_group_quantiles_single_row_group(spark):
    df = spark.createDataFrame([("g", 42)], "grp string, v long")
    out = exact_group_quantiles(df, ["grp"], "v", (0.5, 0.99)).collect()
    assert {(r["q_permille"], r["value"]) for r in out} == {(500, 42), (990, 42)}


def test_quantile_threshold_filter_matches_python(spark):
    from webscraper_spark.operators.quantiles import quantile_threshold_filter

    rows = []
    for g, n in (("en", 97), ("de", 41)):
        for i in range(n):
            rows.append((g, i, ((i * 7919) % 50)))  # heavy ties
    df = spark.createDataFrame(rows, "lang string, doc_id long, score long")
    out = quantile_threshold_filter(df, ["lang"], "score", 0.9).collect()
    by_g = {}
    for g, _, s in rows:
        by_g.setdefault(g, []).append(s)
    thr = {g: _py_type1(v, 0.9) for g, v in by_g.items()}
    assert len(out) == len(rows)  # every row kept, flagged
    for r in out:
        assert r["threshold"] == thr[r["lang"]]
        assert r["kept"] == (r["score"] >= thr[r["lang"]])


# ---------------------------------------------------------------- normalize


def test_normalize_text(spark):
    from webscraper_spark.functions.normalize import nfc, normalize_text

    cases = [
        ("cafe\u0301", "caf\u00e9"),            # NFC composes e + U+0301
        ("caf\u00e9", "caf\u00e9"),             # already composed: identity
        ("a\x07b\x00c", "abc"),                 # control strip
        ("  a\t\tb \n c  ", "a b c"),           # ws collapse + trim
        ("\x1f x\u0301 ", "x\u0301"),           # combining mark survives cleanup
        (None, None),
        ("", ""),
    ]
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(cases)], "i long, t string")
    got = {r["i"]: r["o"] for r in df.select("i", normalize_text("t").alias("o")).collect()}
    for i, (inp, want) in enumerate(cases):
        assert got[i] == want, (i, inp, got[i], want)

    # NFKC is opt-in: the fi-ligature folds under NFKC, not NFC
    df2 = spark.createDataFrame([("\ufb01sh",)], "t string")
    assert df2.select(nfc("t").alias("o")).collect()[0]["o"] == "\ufb01sh"
    assert df2.select(nfc("t", form="NFKC").alias("o")).collect()[0]["o"] == "fish"


# --- URL template mining / trap detection (operators/templates.py, L42) ---

def test_url_templates_masking_and_traps(spark):
    from webscraper_spark.operators.templates import url_templates

    urls = (
        [f"https://a.example.com/cal/2026/{m}/{d}" for m in range(1, 6) for d in range(1, 5)]
        + [f"https://a.example.com/news/article-{i}" for i in range(8)]
        + ["https://a.example.com/s/deadbeefcafe1234", "https://a.example.com/s/0123456789abcdef"]
        + ["https://b.example.com/about", "https://b.example.com/about"]
    )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        (r["host"], r["template"]): (r["n_urls"], r["n_slots"], r["is_trap"], r["example"])
        for r in url_templates(df, trap_min_urls=10).collect()
    }
    assert got[("a.example.com", "/cal/{n}/{n}/{n}")] == (
        20, 3, True, "https://a.example.com/cal/2026/1/1")
    assert got[("a.example.com", "/news/article-{n}")][0:3] == (8, 1, False)
    assert got[("a.example.com", "/s/{hex}")][0:3] == (2, 1, False)  # hex masked before digits
    assert got[("b.example.com", "/about")] == (2, 0, False, "https://b.example.com/about")


def test_url_templates_root_and_query_stripping(spark):
    from webscraper_spark.operators.templates import url_templates

    df = spark.createDataFrame(
        [("https://c.example.com",), ("https://c.example.com/p?page=9",)], "url string"
    )
    got = {r["template"]: r["n_urls"] for r in url_templates(df).collect()}
    assert got == {"/": 1, "/p": 1}  # bare host -> '/', query params stripped
