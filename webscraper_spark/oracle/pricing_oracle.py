"""Pure-Python transcription of the reference pricing/reselling methods
(/root/reference/app/controllers/car_dealers_controller.rb:534-677), executed
with the same statement order as the Ruby — including the maintenance_fee
latch — so the Spark expressions in functions/pricing.py can be verified
against genuinely independent arithmetic."""

from __future__ import annotations

import math


def _round_half_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def pricing(selling_price_gross: int, power_ps: int, cubic_cap: int, fuel_type: str, emission: int):
    """Returns dict 'preis_{d}_{p}' -> int, or None where Ruby would raise
    (insurance band edge / unknown fuel -> TypeError -> car dropped)."""
    margin = 10.0 / 100
    vat = 16.0 / 100
    emis_tax_month = 2.0 / 12
    tolerance_emis = 95.0
    diesel_tax_month = 9.5 / 12
    benzin_tax_month = 2.0 / 12
    gez_month = 5.38 / (1 + vat)
    selling_price = selling_price_gross / (1.0 + vat)
    ada_setup_cost = 100.0
    registration = 100.0 / (1 + vat)
    maintenance = 100.0 / (1 + vat)
    maintenance_fee = 0.0
    gen_inspection = 100.0 / 12 / (1 + vat)
    loan_interest_year = 5.0 / 100
    loan_cost_month = loan_interest_year * selling_price_gross / 12
    warranty_month = 170.0 / 12 / (1 + vat)
    transaction_fee = 0.06 / (1 + vat)
    solvency_fee = 0.45 / (1 + vat)
    payment_share = 3.0 / 1000

    power_kw = power_ps / 1.36
    if power_kw < 66:
        insurance_month = 87.5
    elif 66 < power_kw < 99:
        insurance_month = 98.8
    elif 99 < power_kw < 130:
        insurance_month = 111.30
    elif 130 < power_kw < 210:
        insurance_month = 134.00
    else:
        return None  # Ruby: nil -> TypeError -> dropped

    if fuel_type == "Diesel":
        car_tax_month = cubic_cap / 100 * diesel_tax_month
    elif fuel_type == "Benzin":
        car_tax_month = cubic_cap / 100 * benzin_tax_month
    elif fuel_type in ("Elektro", "Erdgas"):
        car_tax_month = 0.0
    else:
        return None
    car_tax_month += (emission - tolerance_emis) * emis_tax_month

    depreciation_month = {
        "s": 12.0 / 100 * selling_price / 12,
        "m": 14.0 / 100 * selling_price / 12,
        "l": 16.0 / 100 * selling_price / 12,
        "xl": 18.0 / 100 * selling_price / 12,
        "xxl": 20.0 / 100 * selling_price / 12,
    }

    fees: dict[str, int] = {}
    duration = 3
    while duration <= 12:
        for package in ["s", "m", "l", "xl", "xxl"]:
            if (package == "xxl" and duration >= 6) or (package == "xl" and duration >= 8) or (
                package == "l" and duration >= 10
            ):
                maintenance_fee = maintenance  # latches — never reset (reference bug)
            base = (
                (ada_setup_cost + registration + maintenance_fee + solvency_fee) / duration
                + warranty_month + car_tax_month + insurance_month + gez_month
                + transaction_fee + gen_inspection + depreciation_month[package] + loan_cost_month
            )
            payment_share_cost = payment_share * base * (1 + margin) * (1 + vat)
            fees[f"preis_{duration}_{package}"] = _round_half_away((base + payment_share_cost) * (1 + margin) * (1 + vat))
        duration += 1
    return fees


def reselling_prices(selling_price_gross: int):
    vat = 16.0 / 100
    registration = 100.0 / (1 + vat)
    gen_inspection_month = 100.0 / 12 / (1 + vat)
    warranty_month = 170.0 / 12 / (1 + vat)
    selling_price = selling_price_gross / (1 + vat)
    depreciation_month = {
        "s": 12.0 / 100 * selling_price / 12,
        "m": 14.0 / 100 * selling_price / 12,
        "l": 16.0 / 100 * selling_price / 12,
        "xl": 18.0 / 100 * selling_price / 12,
        "xxl": 20.0 / 100 * selling_price / 12,
    }
    out: dict[str, int] = {}
    for duration in range(3, 13):
        for package in ["s", "m", "l", "xl", "xxl"]:
            out[f"{duration}_{package}"] = _round_half_away(
                selling_price_gross
                - (registration + (depreciation_month[package] + gen_inspection_month + warranty_month) * duration)
                * (1 + vat)
            )
    return out
