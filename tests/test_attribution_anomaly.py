"""Unit tests for multi-touch attribution and volume-anomaly detection."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dbt_fusion_spark.plans.anomaly import volume_anomalies
from dbt_fusion_spark.plans.attribution import attribute_conversions


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def touch_conv(spark):
    touches = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 101, "view"),
         (1, _ts("2024-01-01 10:00:00"), 102, "click"),
         (1, _ts("2024-01-01 11:00:00"), 103, "view"),
         (1, _ts("2024-01-05 09:00:00"), 104, "view"),   # after conv A
         (2, _ts("2024-01-01 09:00:00"), 201, "view"),   # lone touch
         (3, _ts("2023-12-01 09:00:00"), 301, "view")],  # outside lookback
        "user_id int, ts timestamp, touch_id int, channel string")
    convs = spark.createDataFrame(
        [(1, _ts("2024-01-01 12:00:00"), 9001, 100.0),
         (2, _ts("2024-01-02 09:00:00"), 9002, 50.0),
         (3, _ts("2024-01-02 09:00:00"), 9003, 70.0)],  # no touch in window
        "user_id int, ts timestamp, conv_id int, value double")
    return touches, convs


def test_attribution_models(spark, touch_conv):
    touches, convs = touch_conv
    out = attribute_conversions(
        touches, convs, "user_id", "ts", "touch_id", "conv_id", "value",
        lookback="7 days")
    rows = {(r["conv_id"], r["touch_id"]): r for r in out.collect()}
    # conv 9001: touches 101,102,103 qualify (104 is later); n=3
    assert {k for k in rows} == {(9001, 101), (9001, 102), (9001, 103),
                                 (9002, 201)}
    a, b, c = rows[(9001, 101)], rows[(9001, 102)], rows[(9001, 103)]
    assert (a["credit_first_touch"], b["credit_first_touch"],
            c["credit_first_touch"]) == (100.0, 0.0, 0.0)
    assert (a["credit_last_touch"], b["credit_last_touch"],
            c["credit_last_touch"]) == (0.0, 0.0, 100.0)
    for r in (a, b, c):
        assert r["credit_linear"] == pytest.approx(100.0 / 3)
        assert r["n_touches"] == 3
    # U-shape: 40 / 20 / 40
    assert (a["credit_position_based"], b["credit_position_based"],
            c["credit_position_based"]) == (
        pytest.approx(40.0), pytest.approx(20.0), pytest.approx(40.0))
    # lone touch takes everything under every model
    lone = rows[(9002, 201)]
    for m in ("first_touch", "last_touch", "linear", "position_based"):
        assert lone[f"credit_{m}"] == pytest.approx(50.0)


def test_attribution_credit_conservation(spark, touch_conv):
    touches, convs = touch_conv
    out = attribute_conversions(
        touches, convs, "user_id", "ts", "touch_id", "conv_id", "value",
        lookback="7 days")
    per_conv = out.groupBy("conv_id").agg(
        *[F.sum(f"credit_{m}").alias(m)
          for m in ("first_touch", "last_touch", "linear",
                    "position_based", "time_decay")],
        F.first("value").alias("value")).collect()
    assert per_conv  # attributed conversions exist
    for r in per_conv:
        for m in ("first_touch", "last_touch", "linear",
                  "position_based", "time_decay"):
            assert r[m] == pytest.approx(r["value"]), (r["conv_id"], m)


def test_volume_anomaly_flags_spike_and_gap(spark):
    # 14 quiet days of 10 events, then a missing day (gap-filled to 0),
    # then a 100-event spike — both must flag.
    rows = []
    eid = 0
    for day in range(1, 15):
        for _ in range(10):
            rows.append((eid, _ts(f"2024-01-{day:02d} 12:00:00"), "a"))
            eid += 1
    # skip Jan 15 entirely; Jan 16 spikes; Jan 17 back to normal
    for _ in range(100):
        rows.append((eid, _ts("2024-01-16 12:00:00"), "a"))
        eid += 1
    for _ in range(10):
        rows.append((eid, _ts("2024-01-17 12:00:00"), "a"))
        eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, k string")
    out = {r["bucket"].day: r for r in
           volume_anomalies(df, "k", "ts", window=7, min_periods=3,
                            z_thresh=3.0).collect()}
    assert len(out) == 17
    # gap after a CONSTANT baseline: z undefined (stddev 0) but the
    # flat-break rule flags it
    assert out[15]["n_rows"] == 0 and out[15]["is_anomaly"]
    assert out[15]["z"] is None
    # spike vs the (now noisy) baseline: classic z flag
    assert out[16]["is_anomaly"] and out[16]["z"] > 3
    # quiet early days: zero-variance baseline ON the mean -> no flag
    assert out[10]["z"] is None and not out[10]["is_anomaly"]


def test_volume_anomaly_baseline_excludes_current(spark):
    # constant 5/day then one 50 spike: the spike's own bucket must not
    # contaminate its baseline mean (which stays 5.0)
    rows = []
    eid = 0
    for day in range(1, 9):
        n = 50 if day == 8 else 5
        for i in range(n):
            rows.append((eid, _ts(f"2024-02-{day:02d} 0{i % 9}:00:00"), "a"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, k string")
    out = {r["bucket"].day: r for r in
           volume_anomalies(df, "k", "ts", window=7, min_periods=3)
           .collect()}
    assert out[8]["baseline_mean"] == 5.0


def test_pagerank_dangling_mass_conserved(spark):
    from dbt_fusion_spark.plans.pagerank import pagerank

    # c is dangling (no out-edges): its mass must redistribute, total
    # rank must stay 1, and c (two in-edges) must outrank b (one).
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "src string, dst string")
    out = {r["node"]: r["rank"]
           for r in pagerank(edges, "src", "dst", n_iter=8).collect()}
    assert set(out) == {"a", "b", "c"}
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-9)
    assert out["c"] > out["b"] > 0
    assert out["a"] > 0


def test_pagerank_weighted_prefers_heavy_edge(spark):
    from dbt_fusion_spark.plans.pagerank import pagerank

    # symmetric star with one heavy spoke: the heavy neighbor outranks
    # the light ones
    rows = [("hub", "x", 10.0), ("x", "hub", 10.0),
            ("hub", "y", 1.0), ("y", "hub", 1.0),
            ("hub", "z", 1.0), ("z", "hub", 1.0)]
    edges = spark.createDataFrame(rows, "src string, dst string, w double")
    out = {r["node"]: r["rank"]
           for r in pagerank(edges, "src", "dst", weight_col="w",
                             n_iter=10).collect()}
    assert out["x"] > out["y"] == pytest.approx(out["z"])
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-9)


def test_rolling_active_users_exact(spark):
    from dbt_fusion_spark.plans.activity import rolling_active_users

    # u1 active day 1 and 10; u2 active day 3; window 7:
    #   day 1-7: u1; day 3-9: u2; day 10+: u1 again
    rows = [(1, _ts("2024-03-01 01:00:00")),
            (1, _ts("2024-03-01 02:00:00")),   # same day dup
            (1, _ts("2024-03-10 01:00:00")),
            (2, _ts("2024-03-03 01:00:00"))]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = {r["day"].day: r["n_active"]
           for r in rolling_active_users(df, "user_id", "ts",
                                         window_days=7).collect()}
    expect = {1: 1, 2: 1, 3: 2, 4: 2, 5: 2, 6: 2, 7: 2,
              8: 1, 9: 1, 10: 1}
    assert out == expect


def test_rolling_active_users_chained_coverage(spark):
    from dbt_fusion_spark.plans.activity import rolling_active_users

    # u1 active every other day: coverage chains with no double count
    rows = [(1, _ts(f"2024-03-{d:02d} 01:00:00")) for d in (1, 3, 5)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = {r["day"].day: r["n_active"]
           for r in rolling_active_users(df, "user_id", "ts",
                                         window_days=2).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_attribution_time_decay_prefers_recent(spark, touch_conv):
    touches, convs = touch_conv
    out = attribute_conversions(
        touches, convs, "user_id", "ts", "touch_id", "conv_id", "value",
        lookback="7 days", decay_half_life_s=3600.0)
    rows = {(r["conv_id"], r["touch_id"]): r["credit_time_decay"]
            for r in out.collect()}
    # touch 103 (1h before conv) must out-credit 102 (2h) and 101 (3h)
    assert rows[(9001, 103)] > rows[(9001, 102)] > rows[(9001, 101)]
    # halving per hour: each step is exactly 2x the previous weight
    assert rows[(9001, 103)] == pytest.approx(2 * rows[(9001, 102)])


def test_twap_holds_last_value_to_bucket_end(spark):
    from dbt_fusion_spark.plans.timeseries import time_weighted_average

    # 1.0 held 00:00->12:00 (12h), 3.0 held 12:00->24:00 (12h) => 2.0;
    # second key samples only at 18:00 => twap = its own value
    rows = [(1, _ts("2024-04-01 00:00:00"), 1.0),
            (1, _ts("2024-04-01 12:00:00"), 3.0),
            (2, _ts("2024-04-01 18:00:00"), 7.5)]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    out = {r["k"]: r for r in
           time_weighted_average(df, "k", "ts", "v", "day").collect()}
    assert out[1]["twap"] == pytest.approx(2.0)
    assert out[1]["n_samples"] == 2
    assert out[2]["twap"] == pytest.approx(7.5)


def test_robust_anomaly_resists_baseline_spike(spark):
    # constant 10/day with ONE prior 100-spike in the baseline, then a
    # 40 burst: plain z is masked by the inflated stddev, robust
    # (median/MAD) still flags the burst
    rows = []
    eid = 0
    for day in range(1, 11):
        n = 100 if day == 5 else 10
        for _ in range(n):
            rows.append((eid, _ts(f"2024-05-{day:02d} 12:00:00"), "a"))
            eid += 1
    for _ in range(40):
        rows.append((eid, _ts("2024-05-11 12:00:00"), "a"))
        eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, k string")
    plain = {r["bucket"].day: r for r in
             volume_anomalies(df, "k", "ts", window=7, min_periods=3,
                              method="z").collect()}
    robust = {r["bucket"].day: r for r in
              volume_anomalies(df, "k", "ts", window=7, min_periods=3,
                               method="robust").collect()}
    assert not plain[11]["is_anomaly"]          # masked by the spike
    assert robust[11]["is_anomaly"]             # MAD baseline holds
    assert robust[11]["baseline_mean"] == 10.0  # median ignores spike
    # and the original spike day flags under both
    assert plain[5]["is_anomaly"] or plain[5]["z"] is None
    assert robust[5]["is_anomaly"]


def test_generic_volume_anomaly_schema_test(spark):
    # the schema-test twin of volume_anomalies: same spike corpus as
    # the operator test, driven through run_generic_test
    from dbt_fusion_spark.adapter import SparkAdapter
    from dbt_fusion_spark.materializations.executors import (
        run_generic_test)

    rows = []
    eid = 0
    for day in range(1, 15):
        n = 100 if day == 14 else 10
        for _ in range(n):
            rows.append((eid, _ts(f"2024-06-{day:02d} 12:00:00"), "a"))
            eid += 1
    spark.createDataFrame(rows, "event_id long, ts timestamp, k string") \
        .createOrReplaceTempView("va_events")
    adapter = SparkAdapter(spark, default_schema="default")
    res = run_generic_test(adapter, "volume_anomaly", "va_events",
                           "ts", {"window": 7, "min_periods": 3})
    assert res.failures == 1 and res.should_error  # the day-14 spike
    # a quiet table passes
    spark.createDataFrame(rows[:140], "event_id long, ts timestamp, k string") \
        .createOrReplaceTempView("va_quiet")
    res2 = run_generic_test(adapter, "volume_anomaly", "va_quiet",
                            "ts", {})
    assert res2.failures == 0 and not res2.should_error


def test_markov_transitions_rows_normalize(spark):
    from dbt_fusion_spark.demo import QUERIES

    rows = QUERIES["events_markov_transitions"](
        spark, "/root/testdata/sf0.001").collect()
    assert rows, "transition matrix must be non-empty"
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r["prob"])
        assert r["n_transitions"] >= 1
    for probs in by_from.values():
        assert abs(sum(probs) - 1.0) < 1e-9   # each row is a distribution


def test_rfm_scores_exact_quintiles(spark):
    from datetime import datetime
    from dbt_fusion_spark.plans.activity import rfm_scores

    # 5 users, one purchase each on consecutive days with rising value:
    # recency inverts (latest buyer scores 5), frequency all-equal
    # (everyone lands in the same cume bucket -> score 5), monetary
    # rises with user id.
    rows = [(u, datetime(2024, 1, u), float(u) * 10.0)
            for u in range(1, 6)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r["user_id"]: r for r in
           rfm_scores(df, "user_id", "ts", "value").collect()}
    assert [out[u]["r_score"] for u in range(1, 6)] == [1, 2, 3, 4, 5]
    assert all(out[u]["f_score"] == 5 for u in range(1, 6))
    assert [out[u]["m_score"] for u in range(1, 6)] == [1, 2, 3, 4, 5]
    assert out[5]["rfm"] == 555
    assert out[1]["monetary_cents"] == 1000
    assert out[1]["recency_days"] == 4 and out[5]["recency_days"] == 0


def test_funnel_conversion_ordered_semantics(spark):
    """Sequential funnel: a click BEFORE the first view must not
    count; rates derive from the surviving counts."""
    from dbt_fusion_spark.plans.activity import funnel_conversion

    rows = [
        # u1 completes view -> click -> purchase in order
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-02 10:00:00"),
        (1, "purchase", "2024-01-03 10:00:00"),
        # u2: click precedes the view -> stops at view
        (2, "click", "2024-01-01 09:00:00"),
        (2, "view", "2024-01-01 10:00:00"),
        # u3: view + click, purchase precedes the click -> stops at 2
        (3, "view", "2024-01-01 08:00:00"),
        (3, "purchase", "2024-01-01 09:00:00"),
        (3, "click", "2024-01-01 10:00:00"),
        # u4: never views
        (4, "click", "2024-01-01 10:00:00"),
        (4, "purchase", "2024-01-02 10:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_type string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.step: r for r in funnel_conversion(
        df, "user_id", "event_type", "ts",
        ["view", "click", "purchase"]).collect()}
    assert out[1].n_users == 3            # u1 u2 u3
    assert out[2].n_users == 2            # u1 u3 (u2's click too early)
    assert out[3].n_users == 1            # u1 only
    assert out[1].conversion_from_prev == 1.0
    assert out[2].conversion_from_prev == pytest.approx(2 / 3, abs=1e-6)
    assert out[3].conversion_from_first == pytest.approx(1 / 3,
                                                         abs=1e-6)
    with pytest.raises(ValueError):
        funnel_conversion(df, "user_id", "event_type", "ts", ["view"])
    with pytest.raises(ValueError):
        funnel_conversion(df, "user_id", "event_type", "ts",
                          ["view", "view"])


def test_cohort_retention_hand_computed(spark):
    """Two Monday-week cohorts; retention cells counted by hand."""
    from dbt_fusion_spark.plans.activity import cohort_retention

    rows = [
        # cohort of 2024-01-01 (Mon): u1 active weeks 0,1; u2 week 0
        (1, "2024-01-02 10:00:00"), (1, "2024-01-09 10:00:00"),
        (2, "2024-01-03 10:00:00"),
        # cohort of 2024-01-08: u3 active weeks 0 and 2
        (3, "2024-01-08 10:00:00"), (3, "2024-01-22 11:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = {(str(r.cohort_week), r.week_offset): r
           for r in cohort_retention(df, "user_id", "ts").collect()}
    a0 = out[("2024-01-01", 0)]
    assert (a0.n_active, a0.cohort_size, a0.retention) == (2, 2, 1.0)
    a1 = out[("2024-01-01", 1)]
    assert (a1.n_active, a1.retention) == (1, 0.5)
    b0 = out[("2024-01-08", 0)]
    assert (b0.n_active, b0.cohort_size) == (1, 1)
    assert ("2024-01-08", 2) in out and ("2024-01-08", 1) not in out


def test_seasonal_naive_backtest_hand_computed(spark):
    """Lag-2 backtest on a hand series: day volumes [3,1,4,1] ->
    forecasts for days 3,4 are 3,1 -> errors |4-3|=1, |1-1|=0."""
    from dbt_fusion_spark.plans.timeseries import seasonal_naive_backtest

    rows = []
    vols = {1: 3, 2: 1, 3: 4, 4: 1}
    for day, v in vols.items():
        rows += [("g", f"2024-01-0{day} 10:00:0{s}") for s in range(v)]
    df = spark.createDataFrame(rows, "g string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    r = seasonal_naive_backtest(df, "g", "ts",
                                period_days=2).collect()[0]
    assert (r.n_days, r.n_forecasts) == (4, 2)
    assert r.mae == pytest.approx(0.5, abs=1e-9)
    assert r.rmse == pytest.approx((0.5) ** 0.5, abs=1e-6)
    # smape terms: 1/((4+3)/2) and 0 -> mean = (2/7)/2
    assert r.smape == pytest.approx((2 / 7) / 2, abs=1e-6)
