"""Temperature-scaled data mixing: rate math, keep-smallest-intact
normalization, alpha edge cases, determinism, and proportion bounds."""

from __future__ import annotations

from collections import Counter

import pytest

from linkgraph.sampling import mixing_rates, temperature_mix


def _docs(spark, sizes):
    rows = []
    i = 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((i, g))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


SIZES = {"en": 1200, "de": 300, "fi": 60}


def test_rates(spark):
    rates = {
        r["lang"]: (r["n"], r["rate"])
        for r in mixing_rates(_docs(spark, SIZES), "lang", alpha=0.5).collect()
    }
    assert rates["fi"] == (60, 1.0)
    assert rates["de"][1] == pytest.approx((300 / 60) ** -0.5)
    assert rates["en"][1] == pytest.approx((1200 / 60) ** -0.5)


def test_alpha_one_keeps_everything(spark):
    df = _docs(spark, SIZES)
    assert temperature_mix(df, "lang", "doc_id", alpha=1.0).count() == df.count()


def test_alpha_zero_equalizes(spark):
    """alpha=0: expected kept size == n_min for every group (hash noise
    allowed; deterministic given the fixed ids)."""
    kept = temperature_mix(
        _docs(spark, SIZES), "lang", "doc_id", alpha=0.0, portable=True
    ).collect()
    by = Counter(r["lang"] for r in kept)
    assert by["fi"] == 60  # rate exactly 1.0
    for g in ("en", "de"):
        assert abs(by[g] - 60) < 30  # ~N(60, <8) at these sizes


def test_proportions_follow_power_law(spark):
    kept = temperature_mix(
        _docs(spark, SIZES), "lang", "doc_id", alpha=0.5, portable=True
    ).collect()
    by = Counter(r["lang"] for r in kept)
    # expected: n_g^0.5 * sqrt(n_min) -> en ~268, de ~134, fi = 60
    assert by["fi"] == 60
    assert abs(by["de"] - (300 * 60) ** 0.5) < 35
    assert abs(by["en"] - (1200 * 60) ** 0.5) < 45
    # dominance damped: en/fi raw ratio 20x -> kept ratio ~4.5x
    assert by["en"] / by["fi"] < 8


def test_deterministic_and_subset(spark):
    df = _docs(spark, SIZES)
    a = {r["doc_id"] for r in temperature_mix(df, "lang", "doc_id", 0.5).collect()}
    b = {r["doc_id"] for r in temperature_mix(df, "lang", "doc_id", 0.5).collect()}
    assert a == b
    assert a <= {r["doc_id"] for r in df.collect()}


def test_alpha_validation(spark):
    with pytest.raises(ValueError):
        mixing_rates(_docs(spark, {"en": 3}), "lang", alpha=1.5)
