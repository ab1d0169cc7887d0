"""Shopify import-sheet layout (dealer pipeline) — the reference's actual
product: a 93-column CSV whose first 4 columns are dealer bookkeeping and the
rest the Shopify product-import schema.

Faithful re-expression of /root/reference/app/controllers/
car_dealers_controller.rb:43-119 (header), :200-218 (image hash), :415-516
(master + 40 variant rows per car). Reference quirks reproduced on purpose:

- hi-res rewrite: every image URL gets the literal substitution
  '$_27.jpg' -> '$_57.jpg' (gsub!, :205);
- the master row emits Bild_1..Bild_21 — Bild_0 (the FIRST gallery image)
  is never written, and only 21 of the header's 22 'Image Src'/'Image
  Position' pairs can ever be populated (:445-487 vs :58-101);
- 'Image Position' j is written only when image j exists (:213-217), so
  positions are the 1-based gallery indexes, not a dense 1..n renumbering;
- variant rows carry only reselling/handle/option-value/price cells; all
  other cells are nil (:498-516);
- the trailing Shopify columns (Gift Card .. Cost per item) exist in the
  header but are never assigned for any row (:102).

Spark-first shape: the sheet is a single DataFrame with unique snake_case
column names positionally aligned to SHOPIFY_HEADER (a CSV header may repeat
'Image Src'; a DataFrame cannot) — the CSV sink re-labels on write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_IMAGE_PAIRS = 22  # header pairs (car_dealers_controller.rb:58-101)
N_IMAGE_EMITTED = 21  # row cells Bild_1..Bild_21 (:445-487)

# Exact CSV header (:44-102). Duplicate 'Image Src'/'Image Position' labels
# are intentional — that is what the reference writes.
SHOPIFY_HEADER: list[str] = (
    [
        "Dealer name", "Dealer adress", "Purchase price", "Reselling price",
        "Handle", "Title", "Body (HTML)", "Vendor", "Type", "Tags", "Published",
        "Option1 Name", "Option1 Value", "Option2 Name", "Option2 Value",
        "Option3 Name", "Option3 Value", "Variant SKU", "Variant Grams",
        "Variant Inventory Tracker", "Variant Inventory Qty",
        "Variant Inventory Policy", "Variant Fulfillment Service",
        "Variant Price", "Variant Compare At Price",
        "Variant Requires Shipping", "Variant Taxable", "Variant Barcode",
    ]
    + ["Image Src", "Image Position"] * N_IMAGE_PAIRS
    + [
        "Image Alt Text", "Gift Card", "SEO Title", "SEO Description",
        "Google Shopping / Google Product Category", "Google Shopping / Gender",
        "Google Shopping / Age Group", "Google Shopping / MPN",
        "Google Shopping / AdWords Grouping", "Google Shopping / AdWords Labels",
        "Google Shopping / Condition", "Google Shopping / Custom Product",
        "Google Shopping / Custom Label 0", "Google Shopping / Custom Label 1",
        "Google Shopping / Custom Label 2", "Google Shopping / Custom Label 3",
        "Google Shopping / Custom Label 4", "Variant Image",
        "Variant Weight Unit", "Variant Tax Code", "Cost per item",
    ]
)

# Unique DataFrame column names, positionally aligned to SHOPIFY_HEADER.
SHOPIFY_COLUMNS: list[str] = (
    [
        "dealer_name", "dealer_address", "purchase_price", "reselling_price",
        "handle", "title", "body_html", "vendor", "type", "tags", "published",
        "option1_name", "option1_value", "option2_name", "option2_value",
        "option3_name", "option3_value", "variant_sku", "variant_grams",
        "variant_inventory_tracker", "variant_inventory_qty",
        "variant_inventory_policy", "variant_fulfillment_service",
        "variant_price", "variant_compare_at_price",
        "variant_requires_shipping", "variant_taxable", "variant_barcode",
    ]
    + [f"image_{kind}_{i}" for i in range(1, N_IMAGE_PAIRS + 1) for kind in ("src", "position")]
    + [
        "image_alt_text", "gift_card", "seo_title", "seo_description",
        "google_product_category", "google_gender", "google_age_group",
        "google_mpn", "google_adwords_grouping", "google_adwords_labels",
        "google_condition", "google_custom_product", "google_custom_label_0",
        "google_custom_label_1", "google_custom_label_2",
        "google_custom_label_3", "google_custom_label_4", "variant_image",
        "variant_weight_unit", "variant_tax_code", "cost_per_item",
    ]
)

assert len(SHOPIFY_HEADER) == len(SHOPIFY_COLUMNS)


def hires_images(images: Column) -> Column:
    """Literal '$_27.jpg' -> '$_57.jpg' on every gallery URL (gsub!, :205)."""
    return F.transform(images, lambda u: F.replace(u, F.lit("$_27.jpg"), F.lit("$_57.jpg")))


def shopify_sheet(v: DataFrame, keys: tuple[str, ...] = ()) -> DataFrame:
    """The full import sheet from enriched variant rows.

    Input: `variant_rows(price_matrix(...))` output carrying the car-level
    columns x_dealer_name, x_address_raw, price_i, handle, title_clean,
    body_html, vendor, tags, x_images (see __spark_entry__.entry).
    Output: one row per (car, duration, package) kept row — 41 per car —
    with the 93 positional sheet columns, preceded by any passthrough
    `keys` columns (row identity for tests/oracles; not part of the sheet).
    """
    is_master = F.col("row_kind") == "master"
    mast = lambda c: F.when(is_master, c)  # noqa: E731  (nil on variant rows)
    ns = F.lit(None).cast("string")

    imgs = hires_images(F.col("x_images"))
    cols: list[Column] = [
        mast(F.col("x_dealer_name")).alias("dealer_name"),
        mast(F.col("x_address_raw")).alias("dealer_address"),
        mast(F.col("price_i")).alias("purchase_price"),
        F.col("reselling").alias("reselling_price"),
        F.col("handle").alias("handle"),
        mast(F.col("title_clean")).alias("title"),
        mast(F.col("body_html")).alias("body_html"),
        mast(F.col("vendor")).alias("vendor"),
        ns.alias("type"),
        mast(F.col("tags")).alias("tags"),
        mast(F.lit("WAHR")).alias("published"),
        mast(F.lit("Deine Abo Dauer")).alias("option1_name"),
        F.col("option_duration").alias("option1_value"),
        mast(F.lit("Dein monatliches Kilometerpaket")).alias("option2_name"),
        F.col("option_km").alias("option2_value"),
        ns.alias("option3_name"),
        ns.alias("option3_value"),
        F.lit("ADA").alias("variant_sku"),
        F.lit("0").alias("variant_grams"),
        ns.alias("variant_inventory_tracker"),
        F.lit("0").alias("variant_inventory_qty"),
        F.lit("deny").alias("variant_inventory_policy"),
        F.lit("manual").alias("variant_fulfillment_service"),
        F.col("preis").alias("variant_price"),
        F.lit(None).cast("long").alias("variant_compare_at_price"),
        F.lit("FALSCH").alias("variant_requires_shipping"),
        F.lit("WAHR").alias("variant_taxable"),
        ns.alias("variant_barcode"),
    ]
    # Bild_j = img[j] 0-indexed (i counts from 0 at :201-207); the row
    # starts at Bild_1, silently dropping the first gallery image (:445).
    # Position j emitted only when the image exists (:213-217). Pair 22 is
    # header-only. F.get = 0-based, NULL out-of-bounds (ANSI-safe).
    for j in range(1, N_IMAGE_PAIRS + 1):
        if j <= N_IMAGE_EMITTED:
            img_j = mast(F.get(imgs, j))
            cols.append(img_j.alias(f"image_src_{j}"))
            cols.append(F.when(img_j.isNotNull(), F.lit(j)).alias(f"image_position_{j}"))
        else:
            cols.append(ns.alias(f"image_src_{j}"))
            cols.append(F.lit(None).cast("int").alias(f"image_position_{j}"))
    for name in SHOPIFY_COLUMNS[28 + 2 * N_IMAGE_PAIRS:]:
        cols.append(ns.alias(name))
    return v.select(*[F.col(k) for k in keys], *cols)


# ---------------------------------------------------------------------------
# Search sheet (the cars pipeline's flat CSV — cars_controller.rb:40-90,263-315)
# ---------------------------------------------------------------------------

SEARCH_HEADER: list[str] = [
    "ad_link", "title", "price", "damage_condition", "category",
    "country_version", "consumption", "mileage", "cubic_capacity", "power",
    "fuel", "emission", "num_owners", "num_seats", "door_count",
    "transmission", "emission_class", "emssion_sticker",  # typo is reference's (:57)
    "first_registration", "hu", "climatisation", "construction_year",
    "park_assist", "airbag", "manufacturer_color_name", "color", "interior",
    "image_1", "image_2", "image_3", "image_4", "image_5", "image_6",
    "image_7", "image_8", "image_9", "image_10", "image_11", "image_12",
    "features", "dealer_name", "dealer_postal_code", "dealer_city",
    "dealer_address", "dealer_phone", "dealer_rating",
    "dealer_quantity_ratings", "publishing_date",
]

# The row's image cells (:293-304): image_8 is written TWICE — into both the
# image_8 and image_9 header slots — and the captured image_9 is never
# emitted. Reproduced as-is.
_SEARCH_IMG_SLOTS = [1, 2, 3, 4, 5, 6, 7, 8, 8, 10, 11, 12]


def search_sheet(results: DataFrame) -> DataFrame:
    """One flat row per fetched detail page, positionally matching
    SEARCH_HEADER. Fields the reference scraped from DOM nodes absent in the
    corpus model (hu, park_assist, ...) resolve through x_attr_map and come
    out NULL exactly where the reference's has_css? guard left the hash key
    unset. Gallery images are 1-based x_images indexes (the reference's
    `until e >= (s-2)` bound subtracts slick-carousel clone nodes, a DOM
    artifact with no data equivalent); no hi-res rewrite here — only the
    dealer pipeline does that."""
    m = F.col("x_attr_map")
    cols = [
        F.col("url").alias("ad_link"),
        F.col("x_title").alias("title"),
        F.col("x_price_cell").alias("price"),
        F.col("x_damage").alias("damage_condition"),
        F.col("x_category").alias("category"),
        F.col("x_country").alias("country_version"),
        F.col("x_consumption").alias("consumption"),
        F.col("x_km_cell").alias("mileage"),
        m["Hubraum"].alias("cubic_capacity"),
        F.col("x_power_cell").alias("power"),
        F.col("x_fuel").alias("fuel"),
        F.col("x_co2").alias("emission"),
        m["Anzahl der Fahrzeughalter"].alias("num_owners"),
        m["Anzahl Sitzplätze"].alias("num_seats"),
        m["Anzahl der Türen"].alias("door_count"),
        F.col("x_transmission").alias("transmission"),
        m["Schadstoffklasse"].alias("emission_class"),
        m["Umweltplakette"].alias("emssion_sticker"),
        F.col("x_ez").alias("first_registration"),
        m["HU"].alias("hu"),
        m["Klimatisierung"].alias("climatisation"),
        m["Baujahr"].alias("construction_year"),
        m["Einparkhilfe"].alias("park_assist"),
        m["Airbag"].alias("airbag"),
        m["Farbe (Hersteller)"].alias("manufacturer_color_name"),
        m["Farbe"].alias("color"),
        m["Innenausstattung"].alias("interior"),
    ]
    for slot, e in zip(range(1, 13), _SEARCH_IMG_SLOTS):
        cols.append(F.get(F.col("x_images"), e - 1).alias(f"image_{slot}"))
    cols += [
        F.array_join(F.col("x_features"), "\n").alias("features"),
        F.col("x_dealer_name").alias("dealer_name"),
        F.col("x_postal_code").alias("dealer_postal_code"),
        F.col("x_dealer_city").alias("dealer_city"),
        F.col("x_dealer_street").alias("dealer_address"),
        F.col("x_phone").alias("dealer_phone"),
        # star-span data-rating attr + amount-of-ratings text; NULL where the
        # page has no rating block (reference has_css? guard, :243-245)
        F.col("x_dealer_rating").alias("dealer_rating"),
        F.col("x_quantity_ratings").alias("dealer_quantity_ratings"),
        F.col("x_pubdate").alias("publishing_date"),
    ]
    return results.select(*cols)
