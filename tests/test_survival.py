"""Semantic unit tests for plans/survival.py (Kaplan-Meier)."""

from __future__ import annotations

import pytest


def test_km_textbook_example(spark):
    """The classic small KM example: durations 1,2+,3,4+,5 (``+`` =
    censored). S(1)=4/5, S(3)=4/5*2/3, S(5)=4/5*2/3*0 = 0."""
    from dbt_fusion_spark.plans.survival import kaplan_meier

    rows = [(1, 1), (2, 0), (3, 1), (4, 0), (5, 1)]
    df = spark.createDataFrame(rows, "dur int, ev int")
    out = {r.dur: r for r in kaplan_meier(df, "dur", "ev").collect()}
    assert out[1].n_risk == 5 and out[1].survival == pytest.approx(0.8)
    assert out[2].survival == pytest.approx(0.8)      # censor: no drop
    assert out[3].n_risk == 3
    assert out[3].survival == pytest.approx(0.8 * 2 / 3, abs=1e-6)
    assert out[4].survival == pytest.approx(0.8 * 2 / 3, abs=1e-6)
    # last subject dies at 5: d == n_risk → S exactly 0
    assert out[5].n_risk == 1 and out[5].survival == 0.0


def test_km_no_censoring_matches_ecdf(spark):
    """With zero censoring, KM reduces to 1 - ECDF."""
    from dbt_fusion_spark.plans.survival import kaplan_meier

    rows = [(d, 1) for d in [1, 1, 2, 3, 3, 3, 4, 5, 5, 6]]
    df = spark.createDataFrame(rows, "dur int, ev int")
    out = {r.dur: r.survival for r in
           kaplan_meier(df, "dur", "ev").collect()}
    n = len(rows)
    seen = 0
    for d in sorted({r[0] for r in rows}):
        seen += sum(1 for r in rows if r[0] == d)
        expect = (n - seen) / n
        assert out[d] == pytest.approx(expect, abs=1e-6)


def test_km_all_censored_flat_one(spark):
    from dbt_fusion_spark.plans.survival import kaplan_meier

    rows = [(d, 0) for d in range(1, 6)]
    df = spark.createDataFrame(rows, "dur int, ev int")
    out = kaplan_meier(df, "dur", "ev").collect()
    assert all(r.survival == 1.0 for r in out)
    assert all(r.hazard == 0.0 for r in out)
