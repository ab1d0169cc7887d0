"""Byte-identical extraction invariant (BASELINE.json input_hint) and
field-level extraction checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from webscraper_spark.functions.extract import (
    extracted_text,
    listing_text,
    with_extraction,
)


def _extracted(spark, corpus_dir):
    pages = spark.read.parquet(corpus_dir["pages"])
    return with_extraction(pages)


def test_detail_text_byte_identical(spark, corpus_dir):
    ex = _extracted(spark, corpus_dir).filter(F.col("x_status") == "ok")
    bad = ex.withColumn("rb", extracted_text()).filter(
        (F.col("rb") != F.col("text")) | F.col("rb").isNull() | F.col("text").isNull()
    )
    assert bad.count() == 0


def test_listing_text_byte_identical(spark, corpus_dir):
    ex = _extracted(spark, corpus_dir).filter(F.col("x_status") == "listing")
    bad = ex.withColumn("rb", listing_text()).filter(F.col("rb") != F.col("text"))
    assert bad.count() == 0


def test_malformed_pages_quarantined(spark, corpus_dir):
    ex = _extracted(spark, corpus_dir)
    # every err row has null ground-truth text (they are the malformed ones)
    assert ex.filter((F.col("x_status") == "err") & F.col("text").isNotNull()).count() == 0
    assert ex.filter((F.col("x_status") != "err") & F.col("text").isNull()).count() == 0
    # ~2% of details malformed
    n_err = ex.filter(F.col("x_status") == "err").count()
    n_det = ex.filter(F.col("x_status") != "listing").count()
    assert 0 < n_err < 0.05 * n_det


def test_nullable_fields_present_and_absent(spark, corpus_dir):
    ex = _extracted(spark, corpus_dir).filter(F.col("x_status") == "ok")
    for col in ["x_ez", "x_consumption", "x_co2", "x_damage", "x_country"]:
        n_null = ex.filter(F.col(col).isNull()).count()
        n_tot = ex.count()
        assert 0 < n_null < 0.2 * n_tot, f"{col}: {n_null}/{n_tot}"


def test_dealer_rating_extraction(spark, corpus_dir):
    """Rating block is host-level: both fields null together (~25% of hosts,
    the reference's has_css? guard) and rating parses as 3.0-4.9."""
    ex = _extracted(spark, corpus_dir).filter(F.col("x_status") == "ok")
    n_tot = ex.count()
    n_null = ex.filter(F.col("x_dealer_rating").isNull()).count()
    assert 0 < n_null < n_tot
    assert ex.filter(
        F.col("x_dealer_rating").isNull() != F.col("x_quantity_ratings").isNull()
    ).count() == 0
    vals = ex.filter(F.col("x_dealer_rating").isNotNull()).select(
        F.col("x_dealer_rating").cast("double").alias("r"), "x_quantity_ratings"
    )
    assert vals.filter((F.col("r") < 3.0) | (F.col("r") > 4.9)).count() == 0
    assert vals.filter(~F.col("x_quantity_ratings").rlike(r"^\(\d+\)$")).count() == 0


def test_reference_regex_semantics(spark):
    """Spot-check Ruby regex reproductions against hand-derived values
    (reference car_dealers_controller.rb:166-172, cars_controller.rb:239-242)."""
    html = (
        '<html><body><div id="des"><h3 class="ad-title">BMW 320d</h3>'
        '<div class="vehicleMainInfo"><strong class="category">SUV</strong>'
        '<span class="attributes">12.345 km, 110 kW (150 PS), Diesel, EZ 03/2019, Automatik</span>'
        '<strong class="price">21.990 € Brutto</strong></div>'
        '<address><strong>Autohaus X</strong><div class="addressData">Hauptstrasse 7, 30159 Hannover</div></address>'
        '<span class="phone">Tel.: +49 511 12345</span>'
        "</body></html>"
    )
    df = spark.createDataFrame([(html.encode(),)], "html binary")
    row = with_extraction(df).collect()[0]
    assert row.x_km_cell == "12.345 km"
    assert row.x_power_cell == "110 kW (150 PS)"
    assert row.x_fuel == "Diesel"
    assert row.x_ez == "03/2019"
    assert row.x_price_cell == "21.990 €"
    assert row.x_transmission == "Automatik"
    assert row.x_postal_code == "30159"
    assert row.x_dealer_city == "Hannover"
    assert row.x_phone == "+49 511 12345"
    assert row.x_category == "SUV"


def test_outlinks_in_document_order(spark):
    html = b'<a href="https://h.example/b">x</a><a href="https://h.example/a">y</a>'
    df = spark.createDataFrame([(html,)], "html binary")
    row = with_extraction(df).collect()[0]
    assert row.x_outlinks == ["https://h.example/b", "https://h.example/a"]


def test_extract_engines_agree(spark, corpus_dir):
    """The Arrow pandas-UDF engine must agree with the native-expression
    engine on every column for every page (maps compared as sorted entries)."""
    from webscraper_spark.functions.extract_pandas import with_extraction_arrow

    pages = spark.read.parquet(corpus_dir["pages"])
    def norm(df):
        return df.withColumn(
            "x_attr_map", F.to_json(F.map_entries(F.col("x_attr_map")))
        ).select(*sorted(df.columns))

    na = norm(with_extraction(pages))
    ar = norm(with_extraction_arrow(pages))
    assert na.exceptAll(ar).count() == 0
    assert ar.exceptAll(na).count() == 0


def test_extract_engines_agree_on_null_html(spark):
    from webscraper_spark.functions.extract_pandas import with_extraction_arrow

    df = spark.createDataFrame([("u1", None), ("u2", b"<html><body>x</body></html>")], "url string, html binary")
    def norm(d):
        return d.withColumn("x_attr_map", F.to_json(F.map_entries(F.col("x_attr_map")))).select(*sorted(d.columns))
    a = norm(with_extraction(df)).collect()
    b = norm(with_extraction_arrow(df)).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


# --- rel=canonical collapse (operators/canonical.py, SURVEY 2.10 L45) ---

def test_canonical_clusters_collapse_and_flags(spark):
    from webscraper_spark.operators.canonical import canonical_clusters

    rows = [
        # canonical target with explicit self-link
        ("https://a.ex/p/1", '<html><link rel="canonical" href="https://a.ex/p/1"><body>'),
        # query-string variants pointing at it
        ("https://a.ex/p/1?ref=x", '<link rel="canonical" href="https://a.ex/p/1">'),
        ("https://a.ex/p/1?utm=y", '<link href="/p/1" rel="canonical"/>'),  # attr order flipped, ROOT-RELATIVE
        # no annotation -> self-canonical
        ("https://a.ex/p/2", "<html><body>plain</body></html>"),
        # empty href -> self-canonical
        ("https://a.ex/p/3", '<link rel="canonical" href="">'),
        # cross-host canonical
        ("https://b.ex/mirror/1", '<link rel="canonical" href="https://a.ex/p/1">'),
        # same relative href on a DIFFERENT host must NOT merge with a.ex's
        # /p/1 cluster nor flag cross-host
        ("https://c.ex/p/1", '<link rel="canonical" href="/p/1">'),
        # dot-relative href: conservative self-canonical fallback
        ("https://a.ex/p/4", '<link rel="canonical" href="../p/4">'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {r["canonical"]: (r["n_members"], r["representative"], r["n_cross_host"])
           for r in canonical_clusters(df).collect()}
    assert got["https://a.ex/p/1"] == (4, "https://a.ex/p/1", 1)  # 3 on-host + 1 mirror
    assert got["https://a.ex/p/2"] == (1, "https://a.ex/p/2", 0)
    assert got["https://a.ex/p/3"] == (1, "https://a.ex/p/3", 0)
    assert got["https://c.ex/p/1"] == (1, "https://c.ex/p/1", 0)  # resolved per-origin
    assert got["https://a.ex/p/4"] == (1, "https://a.ex/p/4", 0)  # dot-relative -> self
    assert len(got) == 5


def test_canonical_case_and_quote_styles(spark):
    """Uppercase / single-quoted / unquoted-rel annotations must declare
    the same canonical as the plain form; href case is preserved."""
    from webscraper_spark.operators.canonical import canonical_clusters

    tgt = "https://a.ex/Mixed/Case"
    rows = [
        ("https://a.ex/v0", f'<link rel="canonical" href="{tgt}">'),
        ("https://a.ex/v1", f"<link rel='canonical' href='{tgt}'>"),
        ("https://a.ex/v2", f'<LINK REL="CANONICAL" HREF="{tgt}"/>'),
        ("https://a.ex/v3", f'<link rel=canonical href="{tgt}">'),
        # rel="canonical-x" must NOT match (\b guard is not a prefix match)
        ("https://a.ex/v4", f'<link rel="canonicalish" href="{tgt}">'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {r["canonical"]: r["n_members"] for r in canonical_clusters(df).collect()}
    assert got[tgt] == 4
    assert got["https://a.ex/v4"] == 1  # self-canonical fallback


# --- hreflang clustering (operators/hreflang.py, SURVEY 2.10 L50) ---

def _hl(lang, href):
    return f'<link rel="alternate" hreflang="{lang}" href="{href}"/>'


def test_hreflang_edges_and_reciprocity(spark):
    from webscraper_spark.operators.hreflang import hreflang_clusters, hreflang_edges

    en, de, fr = "https://a.ex/en/p", "https://a.ex/de/p", "https://a.ex/fr/p"
    rows = [
        # full reciprocal trio; en page also declares x-default -> en (the
        # standard pattern: one URL under two hreflang values must stay
        # all_reciprocal, not undercount)
        (en, _hl("en", en) + _hl("de", de) + _hl("fr", fr) + _hl("x-default", en)),
        (de, _hl("en", en) + _hl("de", de) + _hl("fr", fr)),
        (fr, _hl("en", en) + _hl("de", de) + _hl("fr", fr)),
        # one-way annotation: claims the en page as alternate, no back-edge
        ("https://rogue.ex/p", _hl("EN", en)),
        # no annotations at all
        ("https://a.ex/plain", "<html><body>x</body></html>"),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    edges = hreflang_edges(df).collect()
    assert {(r["url"], r["lang"], r["alt_url"]) for r in edges if r["url"] == "https://rogue.ex/p"} \
        == {("https://rogue.ex/p", "en", en)}  # lang lowercased
    got = {r["url"]: (r["n_alternates"], r["n_langs"], r["n_reciprocal"], r["all_reciprocal"])
           for r in hreflang_clusters(df).collect()}
    assert got[en] == (4, 4, 4, True)  # x-default row reciprocal too
    for u in (de, fr):
        assert got[u] == (3, 3, 3, True)
    assert got["https://rogue.ex/p"] == (1, 1, 0, False)  # one-way claim flagged
    assert "https://a.ex/plain" not in got


def test_hreflang_attribute_order_case_quotes(spark):
    """Real pages emit every attribute order / case / quote style; all
    variants must yield the same edge as the plain double-quoted form."""
    from webscraper_spark.operators.hreflang import hreflang_edges

    alt = "https://a.ex/De/p"  # mixed-case path: href case must be PRESERVED
    rows = [
        ("https://v.ex/0", f'<link rel="alternate" hreflang="de" href="{alt}"/>'),
        # swapped order, single quotes
        ("https://v.ex/1", f"<link href='{alt}' rel='alternate' hreflang='de'>"),
        # uppercase tag + attribute names + rel/lang values
        ("https://v.ex/2", f'<LINK REL="ALTERNATE" HREFLANG="DE" HREF="{alt}"/>'),
        # href between rel and hreflang, unquoted rel
        ("https://v.ex/3", f'<link rel=alternate href="{alt}" hreflang="de"/>'),
        # alternate-stylesheet link (no hreflang) must yield NO edge
        ("https://v.ex/4", '<link rel="alternate stylesheet" href="/s.css"/>'),
        # hreflang but no rel=alternate at all -> tag regex never fires
        ("https://v.ex/5", f'<link hreflang="de" href="{alt}"/>'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {(r["url"], r["lang"], r["alt_url"]) for r in hreflang_edges(df).collect()}
    assert got == {(f"https://v.ex/{i}", "de", alt) for i in range(4)}
