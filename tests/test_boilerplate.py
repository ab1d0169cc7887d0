"""Tests for jusText-style boilerplate removal (operators/boilerplate.py)
— SURVEY §2.10 L31."""

from __future__ import annotations

from webscraper_spark.operators.boilerplate import html_blocks, strip_boilerplate

NAV = '<div class="nav"><a href="/">Home</a> <a href="/a">About us page</a></div>'
AD = "<div><a>Buy now cheap deals</a> <a>click here now</a></div>"
FOOTER = "<footer>Copyright 2026 <a>terms</a></footer>"
CONTENT = "real content with many interesting words here"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, html string")


def test_strips_nav_ads_footer_keeps_content(spark):
    d = _df(spark, [(0, f"{NAV}<p>{CONTENT}</p>{AD}{FOOTER}")])
    r = strip_boilerplate(d).collect()[0]
    assert r["main_text"] == CONTENT
    assert r["n_kept"] == 1 and r["n_blocks"] == 4


def test_short_blocks_dropped_order_preserved(spark):
    d = _df(spark, [(0, "<p>first kept paragraph with enough words</p><p>tiny</p>"
                        "<p>second kept paragraph also has enough words</p>")])
    r = strip_boilerplate(d).collect()[0]
    assert r["main_text"] == ("first kept paragraph with enough words "
                              "second kept paragraph also has enough words")


def test_link_density_integer_threshold(spark):
    # exactly AT the 2/5 threshold is kept (<=), just above is dropped
    at = "<p>aa bb cc dd <a>onetwo3456</a>uvwxyzabcdefghi</p>"  # 10/25? construct below
    d = _df(spark, [
        (0, "<p>w1 w2 w3 w4 <a>1234567890</a> abcdefghijklm</p>"),   # text 30 chars
        (1, "<p>w1 w2 w3 w4 <a>123456789012345678</a> abcde</p>"),   # link-heavy
    ])
    rows = {r["doc_id"]: r for r in html_blocks(d).collect()}
    r0, r1 = rows[0], rows[1]
    assert r0["link_chars"] * 5 <= r0["text_chars"] * 2
    assert r1["link_chars"] * 5 > r1["text_chars"] * 2
    out = {r["doc_id"]: r["n_kept"] for r in strip_boilerplate(d).collect()}
    assert out == {0: 1, 1: 0}


def test_nested_inline_tags_in_anchor(spark):
    d = _df(spark, [(0, "<p>kept words here for content <a><b>bold link</b></a></p>")])
    b = html_blocks(d).collect()[0]
    assert b["link_chars"] == len("bold link")
    assert "bold link" in b["text"]


def test_all_boilerplate_doc_yields_empty(spark):
    d = _df(spark, [(0, f"{NAV}{AD}")])
    r = strip_boilerplate(d).collect()[0]
    assert r["n_kept"] == 0 and r["main_text"] == ""
