"""Tests for largest-remainder crawl-budget apportionment
(operators/budget.py) — SURVEY §2.6 W5."""

from __future__ import annotations

from webscraper_spark.operators.budget import apportion_budget


def _py_apportion(weights: dict[str, int], budget: int) -> dict[str, int]:
    total = sum(weights.values())
    base = {h: budget * w // total for h, w in weights.items()}
    rem = {h: budget * w % total for h, w in weights.items()}
    leftover = budget - sum(base.values())
    for h in sorted(weights, key=lambda h: (-rem[h], h))[:leftover]:
        base[h] += 1
    return base


def test_apportion_matches_python_and_sums_exactly(spark):
    weights = {"a": 17, "b": 5, "c": 0, "d": 31, "e": 8, "f": 8}
    df = spark.createDataFrame(list(weights.items()), "host string, weight long")
    out = {r["host"]: r["quota"] for r in apportion_budget(df, budget=101).collect()}
    assert out == _py_apportion(weights, 101)
    assert sum(out.values()) == 101
    assert out["c"] == 0  # zero weight never receives an extra seat


def test_apportion_all_zero_weights(spark):
    df = spark.createDataFrame([("a", 0), ("b", 0)], "host string, weight long")
    out = apportion_budget(df, budget=10).collect()
    assert all(r["quota"] == 0 for r in out)  # guarded: no division by zero


def test_apportion_budget_larger_than_weights(spark):
    # budget >> weights: quotas stay proportional, exact sum preserved
    df = spark.createDataFrame([("a", 1), ("b", 2)], "host string, weight long")
    out = {r["host"]: r["quota"] for r in apportion_budget(df, budget=1000001).collect()}
    assert sum(out.values()) == 1000001
    assert out["b"] - 2 * out["a"] in (-2, -1, 0, 1, 2)
