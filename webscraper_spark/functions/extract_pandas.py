r"""Arrow-vectorized pandas-UDF extraction engine (the input_hint path:
"extract links/text from fetched HTML using vectorized pandas/Arrow UDFs
with no per-row Python").

Semantics are byte-identical to the native-expression engine in extract.py
(enforced by test_extract_engines_agree); this one exists because ~15
distinct full-document Java-regex passes cost ~2.5s each over a 200k-page
corpus, while compiled-once Python regexes over an Arrow batch do all
fields in a single pass per pattern at a fraction of the cost. The UDF is
evaluated exactly once per row (Catalyst pulls Python UDFs into a single
ArrowEvalPython node), then fields star-expand from the returned struct.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from webscraper_spark.functions.canon import _canon_host_py

_S = lambda: T.StringType()  # noqa: E731
X_STRUCT = T.StructType(
    [
        T.StructField("x_title", _S()),
        T.StructField("x_attrs_line", _S()),
        T.StructField("x_category", _S()),
        T.StructField("x_price_cell", _S()),
        T.StructField("x_km_cell", _S()),
        T.StructField("x_power_cell", _S()),
        T.StructField("x_fuel", _S()),
        T.StructField("x_transmission", _S()),
        T.StructField("x_ez", _S()),
        T.StructField("x_consumption", _S()),
        T.StructField("x_co2", _S()),
        T.StructField("x_damage", _S()),
        T.StructField("x_country", _S()),
        T.StructField("x_attr_map", T.MapType(_S(), _S())),
        T.StructField("x_features", T.ArrayType(_S())),
        T.StructField("x_images", T.ArrayType(_S())),
        T.StructField("x_dealer_name", _S()),
        T.StructField("x_address_raw", _S()),
        T.StructField("x_postal_code", _S()),
        T.StructField("x_dealer_city", _S()),
        T.StructField("x_dealer_street", _S()),
        T.StructField("x_phone", _S()),
        T.StructField("x_dealer_rating", _S()),
        T.StructField("x_quantity_ratings", _S()),
        T.StructField("x_pubdate", _S()),
        T.StructField("x_outlinks", T.ArrayType(_S())),
        # canonical form + host per outlink, computed IN the same UDF pass:
        # chaining a second pandas UDF behind this one doubles the Python
        # worker set per task and was measured to anti-scale 3x at local[32]
        T.StructField("x_outlinks_canon", T.ArrayType(_S())),
        T.StructField("x_outlink_hosts", T.ArrayType(_S())),
        T.StructField("x_is_listing", T.BooleanType()),
    ]
)

# compiled once per executor; identical patterns to extract.py
_P = {
    "title": re.compile(r'<h3 class="ad-title">([^<]*)</h3>'),
    "category": re.compile(r'<strong class="category">([^<]*)</strong>'),
    "attrs": re.compile(r'<span class="attributes">([^<]*)</span>'),
    "price": re.compile(r'<strong class="price">([^<]*)</strong>'),
    "km": re.compile(r"((?:\d*[.]\d{3}|\d*) km)"),
    "power": re.compile(r"(\d*\skW\s.\d*\sPS.)"),
    "fuel": re.compile(r"(Benzin|Diesel|Elektro|Erdgas)"),
    "trans": re.compile(r"(Automatik|Schaltgetriebe)"),
    "ez": re.compile(r"(\d{2}.\d{4})"),
    "cons": re.compile(r'<dd class="consumption">([^<]*)</dd>'),
    "co2": re.compile(r'<dd class="emission">([^<]*)</dd>'),
    "damage": re.compile(r'<span class="damaged">([^<]*)</span>'),
    "country": re.compile(r'<span class="countryVersion">([^<]*)</span>'),
    "dt": re.compile(r"<dt>([^<]*)</dt>"),
    "dd": re.compile(r"<dd>([^<]*)</dd>"),
    "li": re.compile(r"<li>([^<]*)</li>"),
    "img": re.compile(r'data-lazy="([^"]+)"'),
    "dealer": re.compile(r"<address><strong>([^<]*)</strong>"),
    "addr": re.compile(r'<div class="addressData">([^<]*)</div>'),
    "plz": re.compile(r"(\d{5})"),
    "city": re.compile(r"([a-zA-Z]+-?\D+$)"),
    "street": re.compile(r"(^\D*\d*\w(?:-|,)?\w*)"),
    "phone": re.compile(r'<span class="phone">([^<]*)</span>'),
    "phone_strip": re.compile(r"^Tel\.: "),
    "rating": re.compile(r'data-rating="([^"]+)"'),
    "n_ratings": re.compile(r'<span class="amount-of-ratings">([^<]*)</span>'),
    "pubdate": re.compile(r"Online seit (\d{2}.\d{2}.\d{4})"),
    "href": re.compile(r'href="([^"]+)"'),
}


def _x1(series: pd.Series, pat: re.Pattern) -> pd.Series:
    """First-group extract with ''/no-match -> None (mirrors nullif)."""
    out = series.str.extract(pat, expand=False)
    return out.where(out.notna() & (out != ""), None)


@F.pandas_udf(X_STRUCT)
def extract_all_udf(html_s: pd.Series) -> pd.DataFrame:
    h = html_s
    attrs = _x1(h, _P["attrs"])
    addr = _x1(h, _P["addr"])
    price_raw = _x1(h, _P["price"])
    phone_raw = _x1(h, _P["phone"])

    def findall(series: pd.Series, pat: re.Pattern):
        return [pat.findall(s) if isinstance(s, str) else None for s in series]

    dts = findall(h, _P["dt"])
    dds = findall(h, _P["dd"])
    attr_map = [dict(zip(a, b)) if a is not None else None for a, b in zip(dts, dds)]
    imgs = [["https:" + u for u in lst] if lst is not None else None for lst in findall(h, _P["img"])]
    outlinks = findall(h, _P["href"])
    canon_pairs = [
        [(_canon_host_py(u)) for u in lst] if lst is not None else None for lst in outlinks
    ]
    canon_urls = [[p[0] for p in lst] if lst is not None else None for lst in canon_pairs]
    canon_hosts = [[p[1] for p in lst] if lst is not None else None for lst in canon_pairs]

    out = pd.DataFrame(
        {
            "x_title": _x1(h, _P["title"]),
            "x_attrs_line": attrs,
            "x_category": _x1(h, _P["category"]),
            "x_price_cell": price_raw.str.replace(" Brutto", "", regex=False),
            "x_km_cell": _x1(attrs, _P["km"]),
            "x_power_cell": _x1(attrs, _P["power"]),
            "x_fuel": _x1(attrs, _P["fuel"]),
            "x_transmission": _x1(attrs, _P["trans"]),
            "x_ez": _x1(attrs, _P["ez"]),
            "x_consumption": _x1(h, _P["cons"]),
            "x_co2": _x1(h, _P["co2"]),
            "x_damage": _x1(h, _P["damage"]),
            "x_country": _x1(h, _P["country"]),
            "x_attr_map": attr_map,
            "x_features": findall(h, _P["li"]),
            "x_images": imgs,
            "x_dealer_name": _x1(h, _P["dealer"]),
            "x_address_raw": addr,
            "x_postal_code": _x1(addr, _P["plz"]),
            "x_dealer_city": _x1(addr, _P["city"]),
            "x_dealer_street": _x1(addr, _P["street"]),
            # Ruby sub: FIRST occurrence only (cars_controller.rb:242)
            "x_phone": phone_raw.str.replace(_P["phone_strip"], "", regex=True),
            "x_dealer_rating": _x1(h, _P["rating"]),
            "x_quantity_ratings": _x1(h, _P["n_ratings"]),
            "x_pubdate": _x1(h, _P["pubdate"]),
            "x_outlinks": outlinks,
            "x_outlinks_canon": canon_urls,
            "x_outlink_hosts": canon_hosts,
            "x_is_listing": h.str.contains('<ul class="resultList">', regex=False).astype(object).where(h.notna(), None),
        }
    )
    return out


def with_extraction_arrow(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Arrow-engine variant of extract.with_extraction: same output columns,
    one Python evaluation per row."""
    out = df.withColumn("_x", extract_all_udf(F.col(html_col).cast("string")))
    for f in X_STRUCT.fields:
        out = out.withColumn(f.name, F.col("_x")[f.name])
    out = out.drop("_x")
    status: Column = (
        F.when(F.col("x_is_listing"), F.lit("listing"))
        .when(F.col("x_title").isNotNull() & F.col("x_price_cell").isNotNull() & F.col("x_km_cell").isNotNull(), "ok")
        .otherwise("err")
    )
    return out.withColumn("x_status", status)
