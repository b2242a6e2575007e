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


def test_logrank_identical_curves_insignificant(spark):
    from dbt_fusion_spark.plans.survival import logrank_test

    rows = []
    for g in (0, 1):
        for d, e in [(1, 1), (2, 0), (3, 1), (4, 0), (5, 1)] * 10:
            rows.append((g, d, e))
    df = spark.createDataFrame(rows, "grp int, dur int, ev int")
    r = logrank_test(df, "grp", "dur", "ev", 0, 1).collect()[0]
    # identical samples: O_a == E_a exactly → chi2 == 0
    assert r.chi2 == pytest.approx(0.0, abs=1e-6)
    assert bool(r.significant_95) is False
    assert r.n_a == r.n_b == 50


def test_logrank_flags_separated_curves(spark):
    from dbt_fusion_spark.plans.survival import logrank_test

    # group 0 dies early (1-3), group 1 late (7-9) — strongly separated
    rows = [(0, 1 + i % 3, 1) for i in range(60)] \
        + [(1, 7 + i % 3, 1) for i in range(60)]
    df = spark.createDataFrame(rows, "grp int, dur int, ev int")
    r = logrank_test(df, "grp", "dur", "ev", 0, 1).collect()[0]
    assert r.chi2 > 50.0
    assert bool(r.significant_95) is True


def test_logrank_censoring_only_reduces_risk(spark):
    from dbt_fusion_spark.plans.survival import logrank_test

    # all group-1 subjects censored: zero group-1 events, still valid
    rows = [(0, d, 1) for d in (1, 2, 3)] + [(1, d, 0) for d in (1, 2, 3)]
    df = spark.createDataFrame(rows, "grp int, dur int, ev int")
    r = logrank_test(df, "grp", "dur", "ev", 0, 1).collect()[0]
    assert r.events_b == 0 and r.events_a == 3
    assert r.chi2 is not None


def test_nelson_aalen_hand_computed(spark):
    """NA cumulative hazard on a hand-walked table: (1,event),
    (2,event), (2,censor), (3,event)."""
    import math

    from dbt_fusion_spark.plans.survival import nelson_aalen

    rows = [(1, 1), (2, 1), (2, 0), (3, 1)]
    out = {r.t: r for r in
           nelson_aalen(
               spark.createDataFrame(rows, "t int, e int"),
               "t", "e").collect()}
    assert out[1].n_risk == 4 and out[1].n_events == 1
    assert out[1].cum_hazard == pytest.approx(0.25, abs=1e-6)
    assert out[2].n_risk == 3
    assert out[2].cum_hazard == pytest.approx(0.25 + 1 / 3, abs=1e-6)
    assert out[2].se == pytest.approx(
        math.sqrt(1 / 16 + 1 / 9), abs=1e-6)
    assert out[3].n_risk == 1
    assert out[3].cum_hazard == pytest.approx(0.25 + 1 / 3 + 1, abs=1e-6)
    assert out[3].survival_fh == pytest.approx(
        math.exp(-(0.25 + 1 / 3 + 1)), abs=1e-6)


def test_nelson_aalen_dominates_km(spark):
    """exp(-H) >= KM survival everywhere (textbook inequality)."""
    from dbt_fusion_spark.plans.survival import kaplan_meier, nelson_aalen

    rows = [(t % 7 + 1, 1 if t % 3 else 0) for t in range(60)]
    df = spark.createDataFrame(rows, "t int, e int")
    km = {r.t: r.survival for r in kaplan_meier(df, "t", "e").collect()}
    na = {r.t: r.survival_fh for r in nelson_aalen(df, "t", "e").collect()}
    assert set(km) == set(na)
    for t in km:
        assert na[t] >= km[t] - 1e-9
