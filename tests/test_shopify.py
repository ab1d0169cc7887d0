"""Shopify sheet layout, image quirks, hi-res rewrite, CSV sink (S6, F17,
ref: car_dealers_controller.rb:43-119,200-218,415-516; cars_controller.rb:
39-90,263-315)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from webscraper_spark.functions.pricing import price_dims, price_matrix, variant_rows, with_car_pricing_inputs
from webscraper_spark.functions.shopify import (
    N_IMAGE_PAIRS,
    SEARCH_HEADER,
    SHOPIFY_COLUMNS,
    SHOPIFY_HEADER,
    hires_images,
    search_sheet,
    shopify_sheet,
)
from webscraper_spark.sources.sinks import export_single_csv, write_csv


@pytest.fixture(scope="module")
def sheet(spark):
    cars = spark.createDataFrame(
        [
            # car 1: 6 gallery images -> Bild_1..5 populated, Bild_0 dropped
            (1, 12000, 110, 1600, "Benzin", 120, True, 6),
            # car 2: 1 image -> every Bild cell NULL (only gallery[0] exists)
            (2, 20000, 150, 2000, "Diesel", 140, True, 1),
        ],
        "car_key long, price_i long, ps_i long, hub_i long, x_fuel string, co2_i long, co2_present boolean, n_img int",
    )
    gallery = F.when(
        F.col("n_img") >= 1,
        F.transform(
            F.sequence(F.lit(1), F.col("n_img")),
            lambda i: F.format_string("https://img.t/%d/%d/$_27.jpg", F.col("car_key"), i),
        ),
    ).otherwise(F.array().cast("array<string>"))
    cars = (
        with_car_pricing_inputs(cars)
        .withColumn("x_images", gallery)
        .withColumn("x_dealer_name", F.concat(F.lit("D"), F.col("car_key").cast("string")))
        .withColumn("x_address_raw", F.lit("Addr 1"))
        .withColumn("title_clean", F.concat(F.lit("Car "), F.col("car_key").cast("string")))
        .withColumn("handle", F.regexp_replace(F.col("title_clean"), r"\s", "-"))
        .withColumn("vendor", F.lit("Car"))
        .withColumn("tags", F.lit("Marke_Car"))
        .withColumn("body_html", F.lit("<p>b</p>"))
    )
    v = variant_rows(price_matrix(cars, price_dims(spark)))
    return shopify_sheet(v, keys=("car_key", "duration", "package")).cache()


def test_sheet_header_alignment():
    assert len(SHOPIFY_HEADER) == len(SHOPIFY_COLUMNS) == 28 + 2 * N_IMAGE_PAIRS + 21
    assert SHOPIFY_HEADER.count("Image Src") == 22  # duplicated labels kept
    assert SHOPIFY_HEADER[6] == "Body (HTML)" and SHOPIFY_COLUMNS[6] == "body_html"


def test_sheet_shape_and_master_variant_nils(sheet):
    assert sheet.count() == 2 * 41
    masters = sheet.filter(F.col("title").isNotNull())
    assert masters.count() == 2  # car-level fields only on the master row
    m = masters.filter(F.col("car_key") == 1).first()
    assert m["dealer_name"] == "D1" and m["body_html"] == "<p>b</p>"
    assert m["published"] == "WAHR" and m["option1_value"] == "3 Monate"
    assert m["option2_value"] == "500 km" and m["purchase_price"] == 12000
    v = sheet.filter((F.col("car_key") == 1) & F.col("title").isNull()).first()
    assert v["dealer_name"] is None and v["tags"] is None and v["published"] is None
    assert v["handle"] == "Car-1" and v["variant_sku"] == "ADA"
    assert v["variant_price"] is not None and v["reselling_price"] is not None


def test_image_offbyone_and_positions(sheet):
    m = sheet.filter((F.col("car_key") == 1) & F.col("title").isNotNull()).first()
    # 6 images at 0-based 0..5 (urls i=1..6); Bild_j = gallery[j] -> urls i=2..6
    for j, expected_i in [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]:
        assert m[f"image_src_{j}"] == f"https://img.t/1/{expected_i}/$_57.jpg"
        assert m[f"image_position_{j}"] == j
    assert m["image_src_6"] is None and m["image_position_6"] is None
    # the FIRST gallery image (i=1) appears nowhere in the sheet
    assert not any(m[f"image_src_{j}"] == "https://img.t/1/1/$_57.jpg" for j in range(1, 22))
    # car 2: single image = gallery[0] -> dropped entirely
    m2 = sheet.filter((F.col("car_key") == 2) & F.col("title").isNotNull()).first()
    assert all(m2[f"image_src_{j}"] is None for j in range(1, 23))


def test_hires_rewrite_literal(spark):
    df = spark.createDataFrame(
        [(["https://a/$_27.jpg", "https://b/X_27.jpg", "https://c/$_27.jpgx$_27.jpg"],)], "imgs array<string>"
    )
    out = df.select(hires_images(F.col("imgs")).alias("r")).first()["r"]
    assert out[0] == "https://a/$_57.jpg"
    assert out[1] == "https://b/X_27.jpg"  # literal match only, no regex dot
    assert out[2] == "https://c/$_57.jpgx$_57.jpg"  # gsub: every occurrence


def test_search_sheet_image8_twice(spark):
    imgs = [f"https://img.t/9/{i}/$_27.jpg" for i in range(1, 13)]
    df = spark.createDataFrame(
        [("u1", "T", imgs)], "url string, x_title string, x_images array<string>"
    )
    for c in ("x_price_cell x_damage x_category x_country x_consumption x_km_cell x_power_cell "
              "x_fuel x_co2 x_transmission x_ez x_dealer_name x_postal_code x_dealer_city "
              "x_dealer_street x_phone x_dealer_rating x_quantity_ratings x_pubdate").split():
        df = df.withColumn(c, F.lit(None).cast("string"))
    df = df.withColumn("x_attr_map", F.lit(None).cast("map<string,string>"))
    df = df.withColumn("x_features", F.lit(None).cast("array<string>"))
    row = search_sheet(df).first()
    assert list(search_sheet(df).columns) == SEARCH_HEADER
    assert row["image_8"] == imgs[7]
    assert row["image_9"] == imgs[7]  # image_8 written twice (ref :300-301)
    assert row["image_10"] == imgs[9]  # captured image_9 (imgs[8]) never emitted
    assert row["ad_link"] == "u1" and row["title"] == "T"


def test_csv_sink_roundtrip(sheet, tmp_path):
    out_dir = str(tmp_path / "sheet_csv")
    data = sheet.drop("car_key", "duration", "package")
    write_csv(data, out_dir, header_labels=SHOPIFY_HEADER)
    single = str(tmp_path / "sheet.csv")
    export_single_csv(out_dir, single)
    import csv as csvmod

    with open(single, newline="", encoding="utf-8") as f:
        rows = list(csvmod.reader(f))
    assert rows[0] == SHOPIFY_HEADER  # duplicate labels preserved verbatim
    assert len(rows) - 1 == sheet.count()
    assert all(len(r) == len(SHOPIFY_HEADER) for r in rows)
    # spot-check a master row made it through with its price cell intact
    masters = [r for r in rows[1:] if r[SHOPIFY_HEADER.index("Title")] != ""]
    assert len(masters) == 2


def test_csv_sink_label_arity(spark, tmp_path):
    df = spark.range(1).select(F.lit("x").alias("a"))
    with pytest.raises(ValueError):
        write_csv(df, str(tmp_path / "bad"), header_labels=["a", "b"])
