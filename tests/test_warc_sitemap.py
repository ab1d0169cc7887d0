"""Tests for the WARC source (sources/warc.py) and sitemap parsing
(operators/sitemap.py) — SURVEY §2.1 S11/S12."""

from __future__ import annotations

from pyspark.sql import functions as F

from webscraper_spark.operators.sitemap import (
    parse_sitemap,
    parse_sitemap_index,
    sitemap_frontier_candidates,
)
from webscraper_spark.sources.warc import build_warc, parse_warc_records, read_warc


def _record(url: str, payload: bytes, date: str = "2026-01-01T00:00:00Z") -> bytes:
    return (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " + url.encode()
        + b"\r\nWARC-Date: " + date.encode()
        + b"\r\nContent-Length: " + str(len(payload)).encode()
        + b"\r\n\r\n" + payload + b"\r\n\r\n"
    )


def test_parse_warc_records_content_length_framing():
    decoy = b"<html>\r\n\r\nWARC/1.0 this is page text, not a record</html>"
    blob = _record("https://a/1", decoy) + _record("https://a/2", b"plain")
    recs = parse_warc_records(blob)
    assert [(r[2], r[4]) for r in recs] == [("https://a/1", decoy), ("https://a/2", b"plain")]
    # truncated final record is dropped, earlier ones kept
    recs2 = parse_warc_records(blob + b"WARC/1.0\r\nContent-Length: 100\r\n\r\nshort")
    assert len(recs2) == 2
    # garbage between records stops the walk (archive-reader behavior)
    assert parse_warc_records(b"not a warc") == []


def test_warc_roundtrip_spark(spark):
    rows = [
        (f"https://h{i % 3}.example/p{i}", "2026-01-01T00:00:00Z",
         (f"payload {i}\r\n\r\nWARC/1.0 decoy").encode(), i % 3)
        for i in range(30)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_date string, payload binary, fid long"
    )
    blobs = build_warc(pages, file_key=F.col("fid"))
    assert blobs.count() == 3
    back = read_warc(blobs)
    got = {(r["url"], bytes(r["payload"]), r["warc_file_id"]) for r in back.collect()}
    want = {(u, p, f) for u, _, p, f in rows}
    assert got == want
    # rec_pos follows url order within each file (build_warc sorts)
    per_file = back.filter("warc_file_id = 0").orderBy("rec_pos").collect()
    assert [r["url"] for r in per_file] == sorted(r["url"] for r in per_file)


def test_parse_sitemap_optional_fields_and_malformed(spark):
    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://a/1</loc><lastmod>2026-02-03</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>"
        "<url><loc>\n  https://a/2  \n</loc></url>"
        "<url><priority>0.1</priority></url>"  # no loc -> dropped
        "</urlset>"
    )
    out = parse_sitemap(
        spark.createDataFrame([("a", xml)], "host string, sitemap_xml string")
    ).orderBy("entry_pos").collect()
    assert len(out) == 2
    assert out[0]["loc"] == "https://a/1"
    assert str(out[0]["lastmod"]).startswith("2026-02-03")
    assert out[0]["changefreq"] == "daily" and out[0]["priority"] == 0.8
    assert out[1]["loc"] == "https://a/2"
    assert out[1]["lastmod"] is None and out[1]["priority"] is None


def test_parse_sitemap_index(spark):
    xml = (
        "<sitemapindex><sitemap><loc>https://a/s1.xml</loc>"
        "<lastmod>2026-01-01</lastmod></sitemap>"
        "<sitemap><loc>https://a/s2.xml</loc></sitemap></sitemapindex>"
    )
    out = parse_sitemap_index(
        spark.createDataFrame([("a", xml)], "host string, sitemap_xml string")
    ).orderBy("loc").collect()
    assert [r["loc"] for r in out] == ["https://a/s1.xml", "https://a/s2.xml"]


def test_sitemap_frontier_candidates_antijoin_and_rank(spark):
    entries = spark.createDataFrame(
        [("a", "https://a/1", None, None, 0.9, 0),
         ("a", "https://a/2", None, None, 0.1, 1),
         ("a", "https://a/seen", None, None, 1.0, 2)],
        "host string, loc string, lastmod timestamp, changefreq string, priority double, entry_pos long",
    )
    seen = spark.createDataFrame([("https://a/seen",)], "url string")
    out = sitemap_frontier_candidates(entries, seen).orderBy("host_rank").collect()
    assert [r["url"] for r in out] == ["https://a/1", "https://a/2"]
    assert [r["host_rank"] for r in out] == [1, 2]


# ---------------------------------------------------------------- feeds


RSS_XML = """<?xml version="1.0"?><rss><channel><title>Chan</title>
<item><title>First</title><link>https://a.example/1</link><guid isPermaLink="false">g1</guid>
<pubDate>Mon, 05 Jan 2026 08:00:00 GMT</pubDate></item>
<item><title>Second
spans lines</title><link> https://a.example/2 </link></item>
<item><title>no link, dropped</title></item>
</channel></rss>"""

ATOM_XML = """<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">
<entry><title>E1</title><link rel="alternate" href="https://b.example/x"/>
<id>tag:b,2026:x</id><updated>2026-01-05T08:00:00Z</updated></entry>
<entry><title>E2</title><link href="https://b.example/y"/><id>tag:b,2026:y</id></entry>
</feed>"""


def test_parse_feed_rss_and_atom(spark):
    from webscraper_spark.operators.feed import parse_feed

    df = spark.createDataFrame(
        [("a.example", RSS_XML), ("b.example", ATOM_XML)], "host string, feed_xml string"
    )
    rows = parse_feed(df).collect()
    rss = sorted([r for r in rows if r["dialect"] == "rss"], key=lambda r: r["entry_pos"])
    atom = sorted([r for r in rows if r["dialect"] == "atom"], key=lambda r: r["entry_pos"])
    assert len(rss) == 2  # third item has no link -> dropped
    assert rss[0]["link"] == "https://a.example/1"
    assert rss[0]["guid"] == "g1"
    assert rss[0]["published"] == "Mon, 05 Jan 2026 08:00:00 GMT"
    assert rss[1]["link"] == "https://a.example/2"  # whitespace trimmed
    assert rss[1]["title"] == "Second\nspans lines"
    assert rss[1]["published"] is None
    assert [a["link"] for a in atom] == ["https://b.example/x", "https://b.example/y"]
    assert atom[0]["guid"] == "tag:b,2026:x"
    assert atom[0]["published"] == "2026-01-05T08:00:00Z"
    assert atom[1]["published"] is None


def test_parse_feed_malformed_yields_no_rows(spark):
    from webscraper_spark.operators.feed import parse_feed

    df = spark.createDataFrame(
        [("c.example", "<html>not a feed</html>"), ("d.example", "")],
        "host string, feed_xml string",
    )
    assert parse_feed(df).count() == 0


def test_sitemap_refetch_states(spark):
    """Publisher-hint recrawl classification: lastmod evidence beats
    changefreq, uncrawled beats everything, intervals are integer-exact."""
    from webscraper_spark.operators.sitemap import sitemap_refetch

    entries = spark.createDataFrame(
        [
            ("h.ex", "https://h.ex/stale", "2026-03-10 00:00:00", None, 0.9),
            ("h.ex", "https://h.ex/old-mod", "2026-03-01 00:00:00", "daily", None),
            ("h.ex", "https://h.ex/due", None, "daily", None),
            ("h.ex", "https://h.ex/not-due", None, "yearly", None),
            ("h.ex", "https://h.ex/no-hints", None, None, None),
            ("h.ex", "https://h.ex/gap", None, "hourly", None),
            ("h.ex", "https://h.ex/always", None, "always", None),
            ("h.ex", "https://h.ex/never", None, "never", None),
        ],
        "host string, loc string, lastmod string, changefreq string, priority double",
    ).withColumn("lastmod", F.col("lastmod").cast("timestamp"))
    crawled = spark.createDataFrame(
        [(u, "2026-03-05 00:00:00") for u in
         ("https://h.ex/stale", "https://h.ex/old-mod", "https://h.ex/due",
          "https://h.ex/not-due", "https://h.ex/no-hints", "https://h.ex/always",
          "https://h.ex/never")],
        "url string, fetched_ts string",
    ).withColumn("fetched_ts", F.col("fetched_ts").cast("timestamp"))
    got = {r["loc"]: (r["state"], r["priority"]) for r in
           sitemap_refetch(entries, crawled, as_of="2026-03-20 00:00:00").collect()}
    assert got["https://h.ex/stale"] == ("stale", 0.9)
    # lastmod BEFORE the fetch: hard freshness evidence beats the elapsed
    # daily interval (first-match-wins is deliberate)
    assert got["https://h.ex/old-mod"] == ("fresh", 0.5)
    assert got["https://h.ex/due"] == ("due", 0.5)
    assert got["https://h.ex/not-due"] == ("fresh", 0.5)
    assert got["https://h.ex/no-hints"] == ("fresh", 0.5)
    assert got["https://h.ex/gap"] == ("uncrawled", 0.5)
    assert got["https://h.ex/always"] == ("due", 0.5)
    assert got["https://h.ex/never"] == ("fresh", 0.5)
