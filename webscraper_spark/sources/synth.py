"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-4).

Generates the `pages(url, warc_ts, html, text, lang)` table mandated by
BASELINE.json input_hint, plus `seeds`, `robots` and `politeness_budget`.
Everything is a pure function of (seed, sf): all randomness is
xxhash64-derived (stable under any partitioning — no rand()), all generation
is Spark-native (spark.range + JVM column expressions; zero driver loops), so
the same code generates 2k pages or 10^10 rows.

Corpus shape (mirrors the reference crawl graph,
/root/reference/app/controllers/cars_controller.rb:140-150 — paginated
listing pages linking ~10 detail ads each, chained next-page links):

  host k  ->  /inventory?page=0&sort=date  (seed, listing)
                |-- 10 x /ad/{id}          (detail pages)
                |-- next listing page
  detail  ->  0-3 related /ad/{id} links on the same host

Host sizes are Zipf-skewed (u^3 transform) so host-level skew is real.
~10% of details drop an optional field (exercises nullable extraction, P2);
~2% are malformed (exercises quarantine, P5/ST4). `text` is the byte-exact
extraction ground truth the engine must reproduce from `html` alone.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

EPOCH_2020_08_06 = 1596672000  # deterministic time base, no wall clock

BRANDS = ["BMW", "Audi", "Mercedes-Benz", "Volkswagen", "Skoda", "Citroën", "Opel", "Ford"]
MODELS = ["320d", "A4", "C 200", "Golf", "Octavia", "C3", "Astra", "Focus"]
TRIMS = ["Sport+Line", "Style/Plus", "(Comfort)", "Edition,One", "'Active'", "Base_X", "Pure&Co", "Eco;Drive"]
FUELS = ["Benzin", "Diesel", "Elektro", "Erdgas"]
CATEGORIES = ["SUV", "Kleinwagen", "Kombi", "Sportwagen", "Limousine", "Cabrio"]
COLORS = ["Schwarz", "Weiß", "Rot", "Blau", "Grün", "Silber", "Grau", "Braun"]
CITIES = ["Berlin", "Hamburg", "München", "Köln", "Hannover", "Bad-Homburg", "Frankfurt", "Stuttgart"]
FEATURES = [
    "Klimaanlage", "Sitzheizung", "Navigationssystem", "Einparkhilfe",
    "Tempomat", "Bluetooth", "Ledersitze", "Panoramadach",
    "Anhängerkupplung", "Standheizung", "Xenonscheinwerfer", "Allradantrieb",
]


@dataclass(frozen=True)
class CorpusParams:
    sf: float
    n_hosts: int
    n_details: int
    ads_per_listing: int = 10


def corpus_params(sf: float) -> CorpusParams:
    """sf0.001 ≈ 2k pages / 20 hosts; sf0.01 ≈ 20k / 60; sf0.1 ≈ 200k / 200."""
    n_details = max(200, int(1_800_000 * sf))
    n_hosts = max(8, int(round(200 * (10 * sf) ** 0.5)))
    return CorpusParams(sf=sf, n_hosts=n_hosts, n_details=n_details)


def _u(col, salt: str):
    """Deterministic uniform [0,1) from any column — xxhash64, not rand()."""
    return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(1000003)).cast("double") / 1000003.0


def _hmod(col, salt: str, m: int):
    """Deterministic integer in [0, m)."""
    return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(m))


def _fmt_de(col):
    """German thousands formatting: 21990 -> '21.990'."""
    return F.regexp_replace(F.format_number(col.cast("long"), 0), ",", ".")


def _pick(arr: list[str], idx_col):
    return F.element_at(F.array(*[F.lit(x) for x in arr]), (idx_col + 1).cast("int"))


def _details_base(spark: SparkSession, p: CorpusParams) -> DataFrame:
    """One row per detail ad with every synthesized field (pre-HTML)."""
    df = spark.range(p.n_details).withColumnRenamed("id", "did")
    c = F.col("did")
    # Zipf-ish host assignment: u^3 concentrates mass on low host ids.
    df = df.withColumn("host_id", F.floor(F.lit(p.n_hosts) * F.pow(_u(c, "host"), F.lit(3.0))).cast("int"))
    df = df.withColumn("host", F.concat(F.lit("dealer"), F.col("host_id"), F.lit(".example")))
    # ~5% of ads on disallow-private hosts live under /ad/private/ (robots test).
    df = df.withColumn(
        "is_private",
        (F.pmod(F.col("host_id"), F.lit(10)) == 1) & (_u(c, "priv") < 0.05),
    )
    df = df.withColumn(
        "url",
        F.concat(
            F.lit("https://"), F.col("host"),
            F.when(F.col("is_private"), F.lit("/ad/private/")).otherwise(F.lit("/ad/")),
            F.col("did"),
        ),
    )
    w = Window.partitionBy("host_id").orderBy("did")
    df = df.withColumn("host_rank", F.row_number().over(w))
    df = df.withColumn("warc_ts", F.timestamp_seconds(
        F.lit(EPOCH_2020_08_06) + F.col("host_id").cast("long") * 86400 + F.col("host_rank").cast("long") * 60))
    df = df.withColumn("pubdate", F.date_format("warc_ts", "dd.MM.yyyy"))

    # Numeric facts — ranges chosen to straddle the eligibility predicate
    # (reference car_dealers_controller.rb:183-185).
    df = (
        df.withColumn("price_eur", (F.lit(3000) + _hmod(c, "price", 47000)).cast("long"))
        .withColumn("km", (F.lit(500) + _hmod(c, "km", 119500)).cast("long"))
        .withColumn("kw", (F.lit(40) + _hmod(c, "kw", 220)).cast("long"))
        .withColumn("ps", F.floor(F.col("kw") * 1.36).cast("long"))
        .withColumn("hubraum", (F.lit(900) + _hmod(c, "hub", 2600)).cast("long"))
        .withColumn("co2", (F.lit(80) + _hmod(c, "co2", 120)).cast("long"))
        .withColumn("doors", (F.lit(3) + _hmod(c, "doors", 3)).cast("long"))
        .withColumn("seats", (F.lit(2) + _hmod(c, "seats", 5)).cast("long"))
        .withColumn("owners", (F.lit(1) + _hmod(c, "owners", 4)).cast("long"))
    )
    uf = _u(c, "fuel")
    df = df.withColumn(
        "fuel",
        F.when(uf < 0.40, "Benzin").when(uf < 0.80, "Diesel").when(uf < 0.90, "Elektro").otherwise("Erdgas"),
    )
    df = df.withColumn("category", _pick(CATEGORIES, _hmod(c, "cat", len(CATEGORIES))))
    df = df.withColumn("transmission", F.when(_hmod(c, "tr", 2) == 0, "Automatik").otherwise("Schaltgetriebe"))
    df = df.withColumn("color", _pick(COLORS, _hmod(c, "col", len(COLORS))))
    df = df.withColumn("brand_i", _hmod(c, "brand", len(BRANDS)))
    df = df.withColumn(
        "title",
        F.concat_ws(" ", _pick(BRANDS, F.col("brand_i")), _pick(MODELS, F.col("brand_i")),
                    _pick(TRIMS, _hmod(c, "trim", len(TRIMS)))),
    )
    df = df.withColumn(
        "ez",
        F.format_string("%02d/%d", (F.lit(1) + _hmod(c, "ezm", 12)).cast("int"),
                        (F.lit(2005) + _hmod(c, "ezy", 16)).cast("int")),
    )
    cons_i = F.lit(40) + _hmod(c, "cons", 60)
    df = df.withColumn(
        "consumption",
        F.format_string("%d,%d l/100km (komb.)", (cons_i / 10).cast("int"), F.pmod(cons_i, F.lit(10)).cast("int")),
    )
    df = df.withColumn("co2_str", F.format_string("%d g/km (komb.)", F.col("co2").cast("int")))
    # features: deterministic contiguous slice of the fixed list
    df = df.withColumn(
        "features",
        F.slice(F.array(*[F.lit(x) for x in FEATURES]),
                (F.lit(1) + _hmod(c, "fstart", 4)).cast("int"),
                _hmod(c, "fcount", 9).cast("int")),
    )
    df = df.withColumn("n_images", _hmod(c, "nimg", 24).cast("int"))

    # Dealer facts are a pure function of host_id (consistent per host).
    h = F.col("host_id").cast("long")
    df = (
        df.withColumn("dealer_name", F.concat(F.lit("Autohaus Nr. "), F.col("host_id")))
        .withColumn("street", F.concat(F.lit("Hauptstrasse "), (F.lit(1) + F.pmod(h * 31, F.lit(199)))))
        .withColumn("plz", F.format_string("%05d", (F.lit(10000) + F.pmod(h * 523, F.lit(89999))).cast("int")))
        .withColumn("city", _pick(CITIES, F.pmod(h, F.lit(len(CITIES)))))
        .withColumn("phone", F.concat(F.lit("+49 30 "), (F.lit(1000000) + h * 97)))
        # Dealer rating block (reference cars_controller.rb:243-245 reads the
        # star-span's data-rating attr + the amount-of-ratings text behind a
        # has_css? guard) — ~25% of hosts have no ratings at all (nullable).
        .withColumn("has_rating", F.pmod(h, F.lit(4)) != 3)
        .withColumn(
            "rating",
            F.format_string("%d.%d", (F.lit(3) + F.pmod(h * 7, F.lit(2))).cast("int"),
                            F.pmod(h * 13, F.lit(10)).cast("int")),
        )
        .withColumn("n_ratings", (F.lit(3) + F.pmod(h * 41, F.lit(480))).cast("long"))
    )

    # Nullable-field variants (~10% each) and malformed pages (~2%).
    for flag, salt in [
        ("miss_damage", "m1"), ("miss_country", "m2"), ("miss_cons", "m3"),
        ("miss_co2", "m4"), ("miss_ez", "m5"), ("miss_color", "m6"),
    ]:
        df = df.withColumn(flag, _u(c, salt) < 0.10)
    df = df.withColumn("malformed", _u(c, "bad") < 0.02)
    df = df.withColumn("lang", F.when(_u(c, "lang") < 0.95, "de").otherwise("en"))

    # Related-ad outlinks: window neighbours on the same host (deterministic).
    df = df.withColumn("rel1", F.lead("url", 1).over(w))
    df = df.withColumn("rel2", F.lag("url", 1).over(w))
    df = df.withColumn("rel3", F.lead("url", 2).over(w))
    df = df.withColumn("rel_count", _hmod(c, "rel", 4))
    # ~30% of rel1 links carry a fragment (canonicalization exercise).
    df = df.withColumn(
        "rel1_link",
        F.when(_u(c, "frag") < 0.3, F.concat(F.col("rel1"), F.lit("#pos1"))).otherwise(F.col("rel1")),
    )
    return df


# Cell layout of the ground-truth `text` (24 pipe-joined cells). The engine's
# extractor must rebuild these bytes from `html` alone (input_hint invariant).
def _detail_text(df: DataFrame):
    z = F.lit("")
    return F.concat_ws(
        "|",
        F.col("title"),
        F.concat(_fmt_de(F.col("price_eur")), F.lit(" €")),
        F.concat(_fmt_de(F.col("km")), F.lit(" km")),
        F.col("kw").cast("string"),
        F.col("ps").cast("string"),
        F.col("fuel"),
        F.col("category"),
        F.when(F.col("miss_ez"), z).otherwise(F.col("ez")),
        F.col("transmission"),
        F.when(F.col("miss_cons"), z).otherwise(F.col("consumption")),
        F.when(F.col("miss_co2"), z).otherwise(F.col("co2_str")),
        F.concat(_fmt_de(F.col("hubraum")), F.lit(" cm³")),
        F.col("doors").cast("string"),
        F.col("seats").cast("string"),
        F.col("owners").cast("string"),
        F.when(F.col("miss_color"), z).otherwise(F.col("color")),
        F.col("dealer_name"),
        F.concat_ws(", ", F.col("street"), F.concat_ws(" ", F.col("plz"), F.col("city"))),
        F.col("phone"),
        F.col("pubdate"),
        F.array_join(F.col("features"), ";"),
        F.col("n_images").cast("string"),
        F.when(F.col("has_rating"), F.col("rating")).otherwise(z),
        F.when(F.col("has_rating"), F.format_string("(%d)", F.col("n_ratings").cast("int"))).otherwise(z),
    )


def _detail_html(df: DataFrame):
    """Render detail-page HTML embedding the reference's field structure."""
    opt = lambda flag, piece: F.when(F.col(flag), F.lit("")).otherwise(piece)  # noqa: E731
    # NB: F.sequence(1, 0) yields a DESCENDING [1,0] — guard the empty case.
    images = F.when(F.col("n_images") < 1, F.lit("")).otherwise(
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.col("n_images")),
                lambda i: F.format_string('<img data-lazy="//img.%s/%s/%s/$_27.jpg">', F.col("host"), F.col("did"), i),
            ),
            "",
        )
    )
    feats = F.array_join(F.transform(F.col("features"), lambda x: F.concat(F.lit("<li>"), x, F.lit("</li>"))), "")
    rel = F.concat(
        F.when((F.col("rel_count") >= 1) & F.col("rel1").isNotNull(),
               F.format_string('<a href="%s">related</a>', F.col("rel1_link"))).otherwise(F.lit("")),
        F.when((F.col("rel_count") >= 2) & F.col("rel2").isNotNull(),
               F.format_string('<a href="%s">related</a>', F.col("rel2"))).otherwise(F.lit("")),
        F.when((F.col("rel_count") >= 3) & F.col("rel3").isNotNull(),
               F.format_string('<a href="%s">related</a>', F.col("rel3"))).otherwise(F.lit("")),
    )
    body = F.concat(
        F.lit("<html><head><title>"), F.col("title"), F.lit("</title></head><body>"),
        F.lit('<div id="des"><h3 class="ad-title">'), F.col("title"), F.lit("</h3>"),
        F.lit('<div class="vehicleMainInfo"><strong class="category">'), F.col("category"), F.lit("</strong>"),
        F.lit('<span class="attributes">'),
        _fmt_de(F.col("km")), F.lit(" km, "),
        F.col("kw"), F.lit(" kW ("), F.col("ps"), F.lit(" PS), "),
        F.col("fuel"),
        F.when(F.col("miss_ez"), F.lit("")).otherwise(F.concat(F.lit(", EZ "), F.col("ez"))),
        F.lit(", "), F.col("transmission"),
        F.lit("</span>"),
        opt("miss_damage", F.lit('<span class="damaged">Unfallfrei</span>')),
        opt("miss_country", F.lit('<span class="countryVersion">Deutsche Ausführung</span>')),
        F.lit('<strong class="price">'), _fmt_de(F.col("price_eur")), F.lit(" € Brutto</strong></div>"),
        F.lit('<dl class="fuelConsumption">'),
        opt("miss_cons", F.concat(F.lit('<dd class="consumption">'), F.col("consumption"), F.lit("</dd>"))),
        opt("miss_co2", F.concat(F.lit('<dd class="emission">'), F.col("co2_str"), F.lit("</dd>"))),
        F.lit("</dl>"),
        F.lit('<dl class="additionalAttributes">'),
        F.lit("<dt>Hubraum</dt><dd>"), _fmt_de(F.col("hubraum")), F.lit(" cm³</dd>"),
        F.lit("<dt>Anzahl der Türen</dt><dd>"), F.col("doors"), F.lit("</dd>"),
        F.lit("<dt>Anzahl Sitzplätze</dt><dd>"), F.col("seats"), F.lit("</dd>"),
        F.lit("<dt>Anzahl der Fahrzeughalter</dt><dd>"), F.col("owners"), F.lit("</dd>"),
        opt("miss_color", F.concat(F.lit("<dt>Farbe</dt><dd>"), F.col("color"), F.lit("</dd>"))),
        F.lit("</dl>"),
        F.lit('<div class="vehicleFeatures"><ul>'), feats, F.lit("</ul></div>"),
        F.lit('<div class="gallery">'), images, F.lit("</div>"),
        F.lit("<address><strong>"), F.col("dealer_name"), F.lit('</strong><div class="addressData">'),
        F.col("street"), F.lit(", "), F.col("plz"), F.lit(" "), F.col("city"), F.lit("</div></address>"),
        F.lit('<span class="phone">Tel.: '), F.col("phone"), F.lit("</span>"),
        F.when(
            F.col("has_rating"),
            F.format_string(
                '<span class="star-rating" data-rating="%s"></span>'
                '<span class="amount-of-ratings">(%s)</span>',
                F.col("rating"), F.col("n_ratings"),
            ),
        ).otherwise(F.lit("")),
        F.lit('<span class="onlineSince">Online seit '), F.col("pubdate"), F.lit("</span>"),
        F.lit('<ul class="related">'), rel, F.lit("</ul>"),
        F.lit("</body></html>"),
    )
    return F.when(
        F.col("malformed"),
        F.concat(F.lit("<html><body>glitch "), F.col("did"), F.lit(" &&& no fields here</body></html>")),
    ).otherwise(body)


def gen_detail_pages(spark: SparkSession, p: CorpusParams) -> DataFrame:
    df = _details_base(spark, p)
    return df.select(
        "url",
        "warc_ts",
        _detail_html(df).cast("binary").alias("html"),
        F.when(F.col("malformed"), F.lit(None).cast("string")).otherwise(_detail_text(df)).alias("text"),
        "lang",
    )


def _listing_url(host_col, page_col):
    return F.format_string("https://%s/inventory?page=%s&sort=date", host_col, page_col.cast("string"))


def gen_listing_pages(spark: SparkSession, p: CorpusParams) -> DataFrame:
    """Listing pages: groups of `ads_per_listing` details + a next-page link."""
    d = _details_base(spark, p)
    k = p.ads_per_listing
    d = d.withColumn("page_no", F.floor((F.col("host_rank") - 1) / k).cast("int"))
    # ~5% of result links are non-canonical variants (upper host, :443).
    link = F.when(
        _u(F.col("did"), "ucase") < 0.05,
        F.concat(F.lit("HTTPS://"), F.upper(F.col("host")), F.lit(":443"),
                 F.regexp_replace(F.col("url"), "^https://[^/]+", "")),
    ).otherwise(F.col("url"))
    li = F.format_string(
        '<li><a class="result-item" href="%s"><span class="onlineSince">%s</span></a></li>', link, F.col("pubdate")
    )
    grp = (
        d.groupBy("host_id", "host", "page_no")
        .agg(
            F.array_sort(F.collect_list(F.struct(F.col("host_rank").alias("r"), li.alias("li")))).alias("lis"),
            F.count("*").alias("n_links"),
            F.min("warc_ts").alias("warc_ts"),
        )
    )
    wmax = Window.partitionBy("host_id")
    grp = grp.withColumn("max_page", F.max("page_no").over(wmax))
    nxt = F.when(
        F.col("page_no") < F.col("max_page"),
        F.format_string('<a class="pagination" href="%s">next</a>',
                        _listing_url(F.col("host"), F.col("page_no") + 1)),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<html><body><ul class="resultList">'),
        F.array_join(F.transform(F.col("lis"), lambda x: x["li"]), ""),
        F.lit("</ul>"),
        nxt,
        F.lit("</body></html>"),
    )
    text = F.concat_ws("|", F.lit("LISTING"), F.col("host"), F.col("page_no").cast("string"),
                       (F.col("n_links") + F.when(F.col("page_no") < F.col("max_page"), 1).otherwise(0)).cast("string"))
    return grp.select(
        _listing_url(F.col("host"), F.col("page_no")).alias("url"),
        F.col("warc_ts"),
        html.cast("binary").alias("html"),
        text.alias("text"),
        F.lit("de").alias("lang"),
    )


def gen_pages(spark: SparkSession, p: CorpusParams) -> DataFrame:
    return gen_detail_pages(spark, p).unionByName(gen_listing_pages(spark, p))


def gen_seeds(spark: SparkSession, p: CorpusParams) -> DataFrame:
    """One canonical seed per host (listing page 0) + dup/non-canonical noise."""
    hosts = spark.range(p.n_hosts).select(
        F.col("id").cast("int").alias("host_id"),
        F.concat(F.lit("dealer"), F.col("id"), F.lit(".example")).alias("host"),
    )
    base = hosts.select(_listing_url(F.col("host"), F.lit(0)).alias("url"), F.col("host_id"))
    dups = base.filter(F.pmod(F.col("host_id"), F.lit(20)) == 4)  # exact duplicates
    variants = hosts.filter(F.pmod(F.col("host_id"), F.lit(20)) == 9).select(
        F.concat(F.lit("HTTPS://"), F.upper(F.col("host")), F.lit(":443/inventory?sort=date&page=0#ses")).alias("url"),
        F.col("host_id"),
    )
    return (
        base.unionByName(dups).unionByName(variants)
        .select(F.col("url"), F.lit(0).alias("depth"), F.lit(1.0).alias("priority"))
    )


def gen_robots(spark: SparkSession, p: CorpusParams) -> DataFrame:
    hosts = spark.range(p.n_hosts).select(
        F.col("id").cast("int").alias("host_id"),
        F.concat(F.lit("dealer"), F.col("id"), F.lit(".example")).alias("host"),
    )
    disallow = (
        F.when(F.pmod(F.col("host_id"), F.lit(37)) == 3, F.array(F.lit("/")))
        .when(F.pmod(F.col("host_id"), F.lit(10)) == 1, F.array(F.lit("/ad/private/")))
        .otherwise(F.array().cast("array<string>"))
    )
    h = F.col("host_id").cast("long")
    delay = F.when(
        F.col("host_id") < p.n_hosts / 4, F.lit(100) + F.pmod(h * 13, F.lit(400))
    ).otherwise(F.lit(1000) + F.pmod(h * 97, F.lit(2000)))
    return hosts.select(F.col("host"), disallow.alias("disallow_prefixes"), delay.cast("long").alias("crawl_delay_ms"))


def gen_robots_txt(spark: SparkSession, p: CorpusParams) -> DataFrame:
    """Raw robots.txt rendition of gen_robots: (host, robots_txt).

    The text-ingestion path: operators/robots_parse.robots_rules_from_txt
    parses these bodies back into exactly gen_robots' rule-table shape
    (round-trip pytest), so the crawl pipeline can start from raw
    Common-Crawl-style robots bodies instead of pre-parsed tables.
    Crawl-delay is rendered in RFC seconds (decimal) from the ms column."""
    r = gen_robots(spark, p)
    dis_lines = F.aggregate(
        F.col("disallow_prefixes"),
        F.lit(""),
        lambda acc, x: F.concat(acc, F.lit("Disallow: "), x, F.lit("\n")),
    )
    txt = F.concat(
        F.lit("# synthetic corpus robots\nUser-agent: *\n"),
        dis_lines,
        F.lit("Crawl-delay: "),
        (F.col("crawl_delay_ms") / 1000.0).cast("string"),
        F.lit("\n"),
    )
    return r.select("host", txt.alias("robots_txt"))


def gen_politeness(spark: SparkSession, p: CorpusParams) -> DataFrame:
    hosts = spark.range(p.n_hosts).select(
        F.col("id").cast("int").alias("host_id"),
        F.concat(F.lit("dealer"), F.col("id"), F.lit(".example")).alias("host"),
    )
    overrides = hosts.filter(F.pmod(F.col("host_id"), F.lit(7)) == 2).select(
        F.col("host"), F.lit(20).cast("long").alias("max_pages_per_wave"), F.lit(1500).cast("long").alias("min_delay_ms")
    )
    default = hosts.sparkSession.createDataFrame(
        [("*", 40, 1000)], "host string, max_pages_per_wave long, min_delay_ms long"
    )
    return default.unionByName(overrides)


PAGES_BUCKETS = 64
_BUCKET_MARKER = "_BUCKETED"


def _write_bucketed_pages(spark: SparkSession, df: DataFrame, path: str) -> None:
    """Write pages as a Spark-bucketed parquet table: bucket(url) on disk is
    the sandbox stand-in for the Iceberg `bucket(N, url)` partition spec the
    north rule's frontier table would carry. A join on url against this
    layout shuffles ONLY the other (thin, frontier-batch) side — the corpus
    is read in place, which at 10^10 rows is the difference between a usable
    fetch-join and shuffling 100TB of html per wave. 32MB row groups keep
    non-bucketed readers' split granularity (bucket files are fat)."""
    import os
    import uuid

    tbl = f"ws_pages_mat_{uuid.uuid4().hex[:8]}"
    (
        df.repartition(PAGES_BUCKETS, F.col("url"))  # 1 bucket file per task
        .write.mode("overwrite")
        .option("path", path)
        .option("parquet.block.size", str(32 << 20))
        .bucketBy(PAGES_BUCKETS, "url")
        .saveAsTable(tbl)
    )
    spark.sql(f"DROP TABLE `{tbl}`")  # external (explicit path): files remain
    with open(os.path.join(path, _BUCKET_MARKER), "w") as f:
        f.write(str(PAGES_BUCKETS))


def load_pages(spark: SparkSession, pages_path: str) -> tuple[DataFrame, bool]:
    """Load the pages corpus, exploiting the bucketed layout when present.

    Returns (pages, bucketed). A bucketed layout (written by
    `materialize_corpus`, detected via its in-dir marker — never assumed,
    since registering a bucket spec over non-bucketed files would silently
    drop join rows) is registered as an external bucketed catalog table so
    Catalyst plans url-equi-joins against it without exchanging the corpus
    side. Plain directories fall back to a normal parquet read."""
    import hashlib
    import os

    marker = os.path.join(pages_path, _BUCKET_MARKER)
    if not os.path.exists(marker):
        return spark.read.parquet(pages_path), False
    with open(marker) as f:
        n_buckets = int(f.read().strip())
    name = "ws_pages_b_" + hashlib.md5(os.path.abspath(pages_path).encode()).hexdigest()[:10]
    if not spark.catalog.tableExists(name):
        spark.sql(
            f"CREATE TABLE `{name}` (url STRING, warc_ts TIMESTAMP, html BINARY, "
            f"text STRING, lang STRING) USING parquet CLUSTERED BY (url) "
            f"INTO {n_buckets} BUCKETS LOCATION '{os.path.abspath(pages_path)}'"
        )
    return spark.table(name), True


def materialize_corpus(
    spark: SparkSession, sf: float, out_dir: str, force: bool = False, bucketed: bool = True
) -> dict[str, str]:
    """Write the four tables as parquet once; reuse across runs/benchmarks."""
    import os

    p = corpus_params(sf)
    paths = {name: os.path.join(out_dir, name) for name in ("pages", "seeds", "robots", "politeness")}
    marker = os.path.join(out_dir, "_COMPLETE")
    if not force and os.path.exists(marker):
        return paths
    if bucketed:
        _write_bucketed_pages(spark, gen_pages(spark, p), paths["pages"])
    else:
        # Fine-grained files (1 row group each): scan-split granularity is
        # capped at row-group count, and a corpus written as cores×1 files
        # makes every downstream scan exactly 1 task/core — straggler-bound
        # with no pipelining. 256 files gives ~8 tasks/core at local[32].
        n_files = 64 if p.n_details < 50_000 else 256
        gen_pages(spark, p).repartition(n_files).write.mode("overwrite").parquet(paths["pages"])
    gen_seeds(spark, p).coalesce(1).write.mode("overwrite").parquet(paths["seeds"])
    gen_robots(spark, p).coalesce(1).write.mode("overwrite").parquet(paths["robots"])
    gen_politeness(spark, p).coalesce(1).write.mode("overwrite").parquet(paths["politeness"])
    with open(marker, "w") as f:
        f.write(f"sf={sf}\n")
    return paths
