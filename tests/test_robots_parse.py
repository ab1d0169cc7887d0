"""Tests for RFC 9309 robots.txt parsing/decisions (operators/robots_parse.py):
grammar edge cases plus cross-validation against CPython's urllib.robotparser
on wildcard-free, allow-first files (the regime where the 1994 first-match
semantics urllib implements coincide with RFC 9309 longest-match)."""

from __future__ import annotations

import urllib.robotparser

from pyspark.sql import functions as F

from webscraper_spark.operators.robots_parse import parse_robots_txt, robots_allowed


def _files(spark, rows):
    return spark.createDataFrame(rows, "host string, robots_txt string")


def _urls(spark, rows):
    return spark.createDataFrame(rows, "url string, host string")


def _verdicts(spark, files, urls, ua="webscraper"):
    out = robots_allowed(_urls(spark, urls), parse_robots_txt(_files(spark, files), ua))
    return {r["url"]: r["allowed"] for r in out.collect()}


def test_specific_group_overrides_star(spark):
    txt = "User-agent: *\nDisallow: /\n\nUser-agent: webscraper\nDisallow: /priv\n"
    v = _verdicts(spark, [("a.com", txt)],
                  [("https://a.com/ok", "a.com"), ("https://a.com/priv/x", "a.com")])
    assert v == {"https://a.com/ok": True, "https://a.com/priv/x": False}


def test_adjacent_ua_lines_share_group(spark):
    txt = "User-agent: otherbot\nUser-agent: webscraper\nDisallow: /x\n"
    v = _verdicts(spark, [("a.com", txt)],
                  [("https://a.com/x/1", "a.com"), ("https://a.com/y", "a.com")])
    assert v == {"https://a.com/x/1": False, "https://a.com/y": True}


def test_wildcard_and_end_anchor(spark):
    txt = "User-agent: *\nDisallow: /t*p.pdf$\n"
    v = _verdicts(spark, [("a.com", txt)], [
        ("https://a.com/tmp.pdf", "a.com"),
        ("https://a.com/t/deep/p.pdf", "a.com"),
        ("https://a.com/tmp.pdfx", "a.com"),  # '$' anchor: no match
    ])
    assert v["https://a.com/tmp.pdf"] is False
    assert v["https://a.com/t/deep/p.pdf"] is False
    assert v["https://a.com/tmp.pdfx"] is True


def test_allow_wins_length_tie_and_longest_wins(spark):
    txt = "User-agent: *\nAllow: /p\nDisallow: /p\nDisallow: /p/deep\n"
    v = _verdicts(spark, [("a.com", txt)], [
        ("https://a.com/p/x", "a.com"),       # tie /p vs /p -> allow
        ("https://a.com/p/deep/x", "a.com"),  # /p/deep longer -> disallow
    ])
    assert v == {"https://a.com/p/x": True, "https://a.com/p/deep/x": False}


def test_comments_defaults_and_no_match(spark):
    txt = "# top comment\nUser-agent: googlebot\nDisallow: /\n"
    v = _verdicts(spark, [("a.com", txt)], [("https://a.com/any", "a.com")])
    assert v == {"https://a.com/any": True}  # no matching group -> allow all


def test_robots_txt_roundtrip_matches_rule_table(spark, params):
    """gen_robots_txt -> robots_rules_from_txt reproduces gen_robots
    exactly, and apply_robots filters identically from either — the raw
    robots.txt ingestion path is equivalent to the pre-parsed table."""
    from webscraper_spark.operators.robots import apply_robots
    from webscraper_spark.operators.robots_parse import robots_rules_from_txt
    from webscraper_spark.sources.synth import gen_robots, gen_robots_txt

    direct = gen_robots(spark, params)
    parsed = robots_rules_from_txt(gen_robots_txt(spark, params), "webscraper")
    a = {(r["host"], tuple(r["disallow_prefixes"]), r["crawl_delay_ms"])
         for r in direct.collect()}
    b = {(r["host"], tuple(r["disallow_prefixes"]), r["crawl_delay_ms"])
         for r in parsed.collect()}
    assert a == b

    hosts = [r["host"] for r in direct.limit(40).collect()]
    cand = spark.createDataFrame(
        [(f"https://{h}{p}", h) for h in hosts
         for p in ("/ad/private/1", "/ad/public/1", "/x")],
        "url string, host string",
    )
    kept_direct = {r["url"] for r in apply_robots(cand, direct).collect()}
    kept_parsed = {r["url"] for r in apply_robots(cand, parsed).collect()}
    assert kept_direct == kept_parsed


def _h(i: int) -> int:
    # tiny deterministic LCG so the corpus is reproducible without RNG state
    return (i * 1103515245 + 12345) % (1 << 31)


def test_cross_validated_against_urllib(spark):
    files, urls, expected = [], [], {}
    for s in range(12):
        host = f"h{s}.com"
        k = 2 + _h(s) % 3
        body = ["User-agent: *"]
        # allow-first ordering keeps urllib's first-match == RFC longest-match
        for j in range(k):
            if _h(s * 31 + j) % 2 == 0:
                body.append(f"Allow: /d{j}/ok")
        for j in range(k):
            body.append(f"Disallow: /d{j}")
        txt = "\n".join(body) + "\n"
        files.append((host, txt))
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(txt.splitlines())
        for j in range(k + 1):
            for path in (f"/d{j}/page", f"/d{j}/ok/x", f"/free{j}"):
                url = f"https://{host}{path}"
                urls.append((url, host))
                expected[url] = rp.can_fetch("webscraper", url)
    got = _verdicts(spark, files, urls)
    assert got == expected


def test_robots_sitemap_directives(spark):
    """Sitemap: directives are harvested case-insensitively from anywhere
    in the file (they live outside UA groups), commented lines are
    skipped, and cross-host (CDN) sitemap URLs keep the declaring host."""
    from webscraper_spark.operators.robots_parse import robots_sitemaps

    files = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /x\nSitemap: https://a.com/s.xml\n"),
            ("b.com", "sitemap: https://b.com/1.xml\nUser-agent: *\nAllow: /\nSITEMAP: https://cdn.ex/b.xml\n"),
            ("c.com", "# Sitemap: https://c.com/commented.xml\nUser-agent: *\nDisallow:\n"),
            ("d.com", "  Sitemap:\thttps://d.com/pad.xml # inline comment\n"),
        ],
        "host string, robots_txt string",
    )
    got = {(r["host"], r["sitemap_url"]) for r in robots_sitemaps(files).collect()}
    assert got == {
        ("a.com", "https://a.com/s.xml"),
        ("b.com", "https://b.com/1.xml"),
        ("b.com", "https://cdn.ex/b.xml"),
        ("d.com", "https://d.com/pad.xml"),
    }
