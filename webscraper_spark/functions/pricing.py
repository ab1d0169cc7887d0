"""Subscription pricing + reselling matrices (F25-F30) and the 41-row
variant explosion (J4) — pure column arithmetic over a broadcast
cross-joined dimension table.

Faithful transcription of the reference formulas
(/root/reference/app/controllers/car_dealers_controller.rb:534-677),
including two latent behaviours reproduced on purpose:

1. maintenance-fee latch (:562-618): `maintenance_fee` is initialized once
   per car and set — never reset — when the condition first fires at
   (duration=6, package='xxl') in iteration order (duration 3..12 outer,
   package [s,m,l,xl,xxl] inner). Every later cell keeps the fee, so
   effectively: fee applies iff duration>6 or (duration==6 and pkg=='xxl').
2. insurance bands undefined at kW ∈ {66,99,130} and ≥210 (:579-588): Ruby
   leaves insurance_month nil -> TypeError -> the car is silently dropped
   (:522). We mark such rows priceable=false. (kW = PS/1.36 with integer PS
   never lands exactly on a band edge, so in practice only ≥210 fires, and
   the eligibility filter already excludes those.)

Missing CO2 likewise raised NoMethodError at the call site (:395) -> car
dropped; `priceable` requires co2_present.

Rounding: Ruby Float#round = half-away-from-zero == Spark F.round (HALF_UP).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

VAT = 0.16
MARGIN = 0.10
PACKAGES = ["s", "m", "l", "xl", "xxl"]
DEPRECIATION_PCT = {"s": 12.0, "m": 14.0, "l": 16.0, "xl": 18.0, "xxl": 20.0}
PACKAGE_KM = {"s": "500 km", "m": "1000 km", "l": "1500 km", "xl": "2000 km", "xxl": "2500 km"}
DURATIONS = list(range(3, 13))

# scalar constants (:541-576)
EMIS_TAX_MONTH = 2.0 / 12
TOLERANCE_EMIS = 95.0
DIESEL_TAX_MONTH = 9.5 / 12
BENZIN_TAX_MONTH = 2.0 / 12
GEZ_MONTH = 5.38 / (1 + VAT)
ADA_SETUP = 100.0
REGISTRATION = 100.0 / (1 + VAT)
MAINTENANCE = 100.0 / (1 + VAT)
GEN_INSPECTION = 100.0 / 12 / (1 + VAT)
LOAN_INTEREST_YEAR = 5.0 / 100
WARRANTY_MONTH = 170.0 / 12 / (1 + VAT)
TRANSACTION_FEE = 0.06 / (1 + VAT)
SOLVENCY_FEE = 0.45 / (1 + VAT)
PAYMENT_SHARE = 3.0 / 1000


def price_dims(spark: SparkSession) -> DataFrame:
    """(duration, package, dep_pct, pkg_km, maint_applies) — 50 literal rows,
    always broadcast."""
    rows = [
        (d, p, DEPRECIATION_PCT[p], PACKAGE_KM[p], bool(d > 6 or (d == 6 and p == "xxl")))
        for d in DURATIONS
        for p in PACKAGES
    ]
    return spark.createDataFrame(
        rows, "duration int, package string, dep_pct double, pkg_km string, maint_applies boolean"
    )


def insurance_month(kw: Column) -> Column:
    """Insurance bands (:579-588). NULL where the reference leaves the local
    nil (band edges, >=210)."""
    return (
        F.when(kw < 66, 87.5)
        .when((kw > 66) & (kw < 99), 98.8)
        .when((kw > 99) & (kw < 130), 111.30)
        .when((kw > 130) & (kw < 210), 134.00)
    )


def car_tax_month(fuel: Column, cubic: Column, emission: Column) -> Column:
    """Car tax (:591-599). NB no max(0, ...): emission below 95 g *reduces*
    the tax — reference behaviour, reproduced."""
    base = (
        F.when(fuel == "Diesel", cubic.cast("double") / 100 * DIESEL_TAX_MONTH)
        .when(fuel == "Benzin", cubic.cast("double") / 100 * BENZIN_TAX_MONTH)
        .when(fuel.isin("Elektro", "Erdgas"), F.lit(0.0))
    )
    return base + (emission.cast("double") - TOLERANCE_EMIS) * EMIS_TAX_MONTH


def with_car_pricing_inputs(df: DataFrame) -> DataFrame:
    """Per-car scalar pricing inputs. Expects typed columns from
    derive.with_typed: price_i (gross), ps_i, hub_i, co2_i, co2_present,
    x_fuel. PS feeds power_kw = PS/1.36 (:579, called with leistung at :393)."""
    gross = F.col("price_i").cast("double")
    power_kw = F.col("ps_i").cast("double") / 1.36
    ins = insurance_month(power_kw)
    tax = car_tax_month(F.col("x_fuel"), F.col("hub_i"), F.col("co2_i"))
    return (
        df.withColumn("selling_net", gross / (1.0 + VAT))
        .withColumn("loan_cost_month", F.lit(LOAN_INTEREST_YEAR) * gross / 12)
        .withColumn("insurance_month", ins)
        .withColumn("car_tax_month", tax)
        .withColumn("priceable", ins.isNotNull() & tax.isNotNull() & F.col("co2_present"))
    )


def fee_expr() -> Column:
    """preis_{duration}_{package} (:613-632) as one vectorized expression over
    (car x dim) rows."""
    dep_month = F.col("dep_pct") / 100 * F.col("selling_net") / 12
    maint_fee = F.when(F.col("maint_applies"), F.lit(MAINTENANCE)).otherwise(F.lit(0.0))
    base = (
        (F.lit(ADA_SETUP) + F.lit(REGISTRATION) + maint_fee + F.lit(SOLVENCY_FEE)) / F.col("duration")
        + F.lit(WARRANTY_MONTH)
        + F.col("car_tax_month")
        + F.col("insurance_month")
        + F.lit(GEZ_MONTH)
        + F.lit(TRANSACTION_FEE)
        + F.lit(GEN_INSPECTION)
        + dep_month
        + F.col("loan_cost_month")
    )
    payment_share_cost = F.lit(PAYMENT_SHARE) * base * (1 + MARGIN) * (1 + VAT)
    return F.round((base + payment_share_cost) * (1 + MARGIN) * (1 + VAT)).cast("long")


def reselling_expr() -> Column:
    """reselling_{duration}_{package} (:664-673)."""
    dep_month = F.col("dep_pct") / 100 * F.col("selling_net") / 12
    return F.round(
        F.col("price_i").cast("double")
        - (F.lit(REGISTRATION) + (dep_month + F.lit(GEN_INSPECTION) + F.lit(WARRANTY_MONTH)) * F.col("duration"))
        * (1 + VAT)
    ).cast("long")


def preis_12_s_expr() -> Column:
    """The (12,'s') cell computed inline per car for the price tag (:399).
    duration=12 > 6 -> maintenance latched on."""
    dep_month = F.lit(DEPRECIATION_PCT["s"]) / 100 * F.col("selling_net") / 12
    base = (
        (F.lit(ADA_SETUP) + F.lit(REGISTRATION) + F.lit(MAINTENANCE) + F.lit(SOLVENCY_FEE)) / 12
        + F.lit(WARRANTY_MONTH)
        + F.col("car_tax_month")
        + F.col("insurance_month")
        + F.lit(GEZ_MONTH)
        + F.lit(TRANSACTION_FEE)
        + F.lit(GEN_INSPECTION)
        + dep_month
        + F.col("loan_cost_month")
    )
    payment_share_cost = F.lit(PAYMENT_SHARE) * base * (1 + MARGIN) * (1 + VAT)
    return F.round((base + payment_share_cost) * (1 + MARGIN) * (1 + VAT)).cast("long")


def price_matrix(cars: DataFrame, dims: DataFrame) -> DataFrame:
    """Full 50-cell matrix per priceable car: crossJoin(broadcast dims) +
    vectorized arithmetic. Catalyst folds every literal subexpression."""
    return (
        cars.filter(F.col("priceable"))
        .crossJoin(F.broadcast(dims))
        .withColumn("preis", fee_expr())
        .withColumn("reselling", reselling_expr())
    )


def variant_rows(matrix: DataFrame) -> DataFrame:
    """Shopify import layout (:415-516): per car 1 master row (3,'s') + 4
    rows (3, m..xxl) + 36 rows (4..12 x m..xxl) = 41. The (d>=4, 's') cells
    are computed but never emitted — reference behaviour."""
    keep = matrix.filter(~((F.col("duration") >= 4) & (F.col("package") == "s")))
    return (
        keep.withColumn("row_kind", F.when((F.col("duration") == 3) & (F.col("package") == "s"), "master").otherwise("variant"))
        .withColumn("option_duration", F.concat(F.col("duration").cast("string"), F.lit(" Monate")))
        .withColumn("option_km", F.col("pkg_km"))
    )
