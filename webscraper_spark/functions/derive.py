r"""Typed coercions, eligibility filter, tag derivations, Shopify body HTML.

Faithful re-expression of the dealer pipeline's derivation layer
(/root/reference/app/controllers/car_dealers_controller.rb:177-411) as pure
Spark column expressions (whole-stage codegen; no UDFs). Reference quirks are
reproduced deliberately, not fixed (SURVEY.md §7 "reference bugs to
reproduce-or-document"):

- km tag bins compare the *leading digit group* of '12.345 km' (-> 12)
  against Ruby float literals 20.000==20.0 etc. (:354-365) — so the bins are
  effectively thousands-of-km;
- power tags have gaps at exactly 70/100/150 PS (:369-379);
- the eligibility power bound is on kW (match(/^\d*/) of '110 kW (150 PS)')
  while tags/pricing use PS (:178 vs :368);
- insurance is undefined at kW ∈ {66, 99, 130} exactly and the car is
  dropped (TypeError rescue :522) — see pricing.py;
- typ_tag uses a character-class regex, not alternation (:339).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RUN_DATE = dt.date(2020, 9, 1)  # deterministic "today" (reference used Date.today, :341)

# character class of Ruby /^[SUV|Kleinwagen|Kombi|Sportwagen|Limousine]*/ (:339)
_TYP_CLASS = "".join(sorted(set("SUV|Kleinwagen|Kombi|Sportwagen|Limousine"))).replace("|", "\\|")


def digits_long(col: Column) -> Column:
    """Ruby gsub(/[^\\d]/,'').to_i (reference :177-179): strip non-digits,
    empty -> 0 (Ruby ''.to_i == 0)."""
    stripped = F.regexp_replace(col, "[^0-9]", "")
    return F.when(stripped == "", F.lit(0)).otherwise(stripped.cast("long"))


def with_typed(df: DataFrame) -> DataFrame:
    """Typed columns from the extracted string cells (reference :177-179,368,393-395)."""
    return (
        df.withColumn("km_i", digits_long(F.col("x_km_cell")))
        .withColumn("kw_i", F.coalesce(F.regexp_extract(F.col("x_power_cell"), r"^(\d*)", 1).cast("long"), F.lit(0)))
        .withColumn("ps_i", F.coalesce(F.regexp_extract(F.col("x_power_cell"), r"(\d*) PS", 1).cast("long"), F.lit(0)))
        .withColumn("price_i", digits_long(F.col("x_price_cell")))
        .withColumn("hub_i", digits_long(F.col("x_attr_map")["Hubraum"]))
        .withColumn("co2_present", F.col("x_co2").isNotNull())
        .withColumn("co2_i", digits_long(F.coalesce(F.col("x_co2"), F.lit(""))))
    )


def eligibility() -> Column:
    """The flagship predicate (P3, reference :183-185): km in (1000,60000),
    price<30000, kW<210, fuel Diesel|Benzin, category in the five classes."""
    return (
        (F.col("km_i") > 1000)
        & (F.col("km_i") < 60000)
        & (F.col("price_i") < 30000)
        & (F.col("kw_i") < 210)
        & F.col("x_fuel").rlike("(Diesel|Benzin)")
        & F.col("x_category").rlike("(SUV|Kleinwagen|Kombi|Sportwagen|Limousine)")
    )


def with_identity(df: DataFrame) -> DataFrame:
    """Vendor/Title/Handle/Link (reference :275-280). The hard-coded dealer
    name in Link is a reference quirk, reproduced as-is (:275)."""
    return (
        df.withColumn("vendor", F.regexp_extract(F.col("x_title"), r"^([A-Za-z\-ë]*)", 1))
        .withColumn("title_clean", F.regexp_replace(F.col("x_title"), r"[+&/*;,()'_]", " "))
        .withColumn("handle", F.regexp_replace(F.col("title_clean"), r"\s", "-"))
        .withColumn(
            "link",
            F.concat(F.lit("https://home.mobile.de/AH-SCHACHTSCHNEIDER#des_"),
                     F.regexp_extract(F.col("url"), r"(\d+)$", 1)),
        )
    )


def with_tags(df: DataFrame, run_date: dt.date = RUN_DATE) -> DataFrame:
    """All Shopify tag derivations (reference :336-411)."""
    out = df.withColumn("marke_tag", F.concat(F.lit("Marke_"), F.col("vendor")))
    out = out.withColumn(
        "typ_tag",
        F.concat(F.lit("Typ_"), F.regexp_extract(F.col("x_category"), f"^([{_TYP_CLASS}]*)", 1)),
    )

    # age tags (:340-351): EZ 'MM/YYYY' -> first of month; Rational day
    # arithmetic means ==2y exactly falls through to Alle.
    ez_date = F.to_date(F.concat(F.lit("01/"), F.col("x_ez")), "dd/MM/yyyy")
    age_days = F.datediff(F.lit(run_date), ez_date)
    out = out.withColumn(
        "alter_tag",
        F.when(F.col("x_ez").isNull() | ez_date.isNull(), F.array(F.lit("Alter_Alle")))
        .when(age_days < 730, F.array(F.lit("Alter_maximal 2 Jahre"), F.lit("Alter_maximal 5 Jahre"), F.lit("Alter_Alle")))
        .when((age_days > 730) & (age_days < 1825), F.array(F.lit("Alter_maximal 5 Jahre"), F.lit("Alter_Alle")))
        .otherwise(F.array(F.lit("Alter_Alle"))),
    )

    # km tags (:353-365): leading digit group vs float literals 20.000==20.0
    km_lead = F.coalesce(F.regexp_extract(F.col("x_km_cell"), r"^([0-9]*)", 1).cast("long"), F.lit(0))
    t = lambda s: F.lit(f"Kilometerstand_maximal {s} km")  # noqa: E731
    out = out.withColumn(
        "km_tag",
        F.when(km_lead < 20, F.array(t("20.000"), t("50.000"), t("80.000"), t("100.000")))
        .when(km_lead < 50, F.array(t("50.000"), t("80.000"), t("100.000")))
        .when(km_lead < 80, F.array(t("80.000"), t("100.000")))
        .when(km_lead < 100, F.array(t("100.000")))
        .otherwise(F.array(F.lit("Kilometerstand_Alle"))),
    )

    # power tags (:367-379): gaps at exactly 70/100/150; >=200 -> Alle only
    ps = F.col("ps_i")
    out = out.withColumn(
        "leistung_tag",
        F.when(ps < 70, F.array(F.lit("Leistung_bis 70 PS"), F.lit("Leistung_Alle")))
        .when((ps > 70) & (ps < 100), F.array(F.lit("Leistung_70 bis 100 PS"), F.lit("Leistung_Alle")))
        .when((ps > 100) & (ps < 150), F.array(F.lit("Leistung_100 bis 150 PS"), F.lit("Leistung_Alle")))
        .when((ps > 150) & (ps < 200), F.array(F.lit("Leistung_150 bis 200 PS"), F.lit("Leistung_Alle")))
        .otherwise(F.array(F.lit("Leistung_Alle"))),
    )

    out = out.withColumn("getriebe_tag", F.concat(F.lit("Schaltung_"), F.coalesce(F.col("x_transmission"), F.lit(""))))
    farbe = F.col("x_attr_map")["Farbe"]
    out = out.withColumn(
        "farbe_tag",
        F.when(farbe.isNull(), F.lit("Farbe_Alle")).otherwise(
            F.concat(F.lit("Farbe_"), F.regexp_extract(farbe, r"^([A-Za-zäöüß]*)", 1))
        ),
    )
    out = out.withColumn("kraftstoff_tag", F.concat(F.lit("Kraftstoff_"), F.col("x_fuel")))
    out = out.withColumn("zustand_tag", F.lit("Zustand_Gebraucht"))
    return out


def preis_tag(preis_12_s: Column) -> Column:
    """Price tier from the computed 12-month/s price (:398-405)."""
    return (
        F.when(preis_12_s <= 200, "Preis_Günstig (bis 200 €)")
        .when((preis_12_s > 200) & (preis_12_s <= 400), "Preis_Mittel (200 bis 400 €)")
        .when(preis_12_s > 400, "Preis_Premium (ab 400 €)")
    )


def tags_string() -> Column:
    """Tag concatenation (:411): outer join ', ', inner arrays joined ','."""
    return F.concat_ws(
        ", ",
        F.col("marke_tag"),
        F.col("typ_tag"),
        F.array_join(F.col("alter_tag"), ","),
        F.array_join(F.col("km_tag"), ","),
        F.array_join(F.col("leistung_tag"), ","),
        F.col("getriebe_tag"),
        F.col("farbe_tag"),
        F.col("kraftstoff_tag"),
        F.col("zustand_tag"),
        F.col("preis_tag"),
    )


def shopify_body() -> Column:
    """Byte-exact Body (HTML) template (reference :286-334). Missing fields
    interpolate as '' (Ruby nil interpolation). Verbrauch gets ')<br>'
    substitution (gsub, all occurrences — :241)."""
    m = F.col("x_attr_map")
    g = lambda c: F.coalesce(c, F.lit(""))  # noqa: E731
    verbrauch = g(F.regexp_replace(F.col("x_consumption"), r"\)", ")<br>"))
    parts = [
        ("Abholadresse", g(F.col("x_address_raw")), "<br>"),
        ("Fahrzeugzustand", g(F.col("x_damage")), "<br>"),
        ("Kategorie", g(F.col("x_category")), "<br>"),
        ("Herkunft", g(F.col("x_country")), "<br>"),
        ("Kilometerstand", g(F.col("x_km_cell")), "<br>"),
        ("Hubraum", g(m["Hubraum"]), "<br>"),
        ("Leistung", g(F.col("x_power_cell")), "<br>"),
        ("Kraftstoffart", g(F.col("x_fuel")), "<br>"),
    ]
    pieces: list[Column] = [F.lit("<p>\n")]
    for label, col, br in parts:
        pieces += [F.lit(f"<strong>{label}</strong>\n"), col, F.lit(f"{br}\n")]
    # Verbrauch block has its own layout in the template (:304-305)
    pieces += [F.lit("<strong>Verbrauch</strong><br>\n"), verbrauch, F.lit("\n")]
    rest = [
        ("CO2-Emission", g(F.col("x_co2"))),
        ("Anzahl der Türen", g(m["Anzahl der Türen"])),
        ("Anzahl Sitzplätze", g(m["Anzahl Sitzplätze"])),
        ("Getriebe", g(F.col("x_transmission"))),
        ("Schadstoffklasse", g(m["Schadstoffklasse"])),
        ("Umweltplakette", g(m["Umweltplakette"])),
        ("Erstzulassung", g(F.col("x_ez"))),
        ("Anzahl der Fahrzeughalter", g(m["Anzahl der Fahrzeughalter"])),
        ("HU", g(m["HU"])),
        ("Klimatisierung", g(m["Klimatisierung"])),
        ("Farbe (Hersteller)", g(m["Farbe (Hersteller)"])),
        ("Farbe", g(m["Farbe"])),
        ("Innenausstattung", g(m["Innenausstattung"])),
    ]
    for label, col in rest:
        pieces += [F.lit(f"<strong>{label}</strong>\n"), col, F.lit("<br>\n")]
    pieces += [
        F.lit("<strong>Weitere Eigenschaften</strong><br>\n"),
        g(F.array_join(F.col("x_features"), ", ")),
        F.lit("\n</p>"),
    ]
    return F.concat(*pieces)
