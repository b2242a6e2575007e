"""Semantic unit tests for plans/encode.py + embedding centroids."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_fusion_spark.plans.encode import target_encode_loo, top_paths


def test_target_encode_loo_hand_values(spark):
    # cat 'a': y = [1, 1, 0] (n=3, sum=2); cat 'b': y = [0] (n=1)
    # prior = 3/4 wait -> 2+0 = 2 of 4 = 0.5; m = 2
    rows = [(1, "a", 1), (2, "a", 1), (3, "a", 0), (4, "b", 0)]
    df = spark.createDataFrame(rows, "id int, cat string, y int")
    out = {r.id: r.te for r in
           target_encode_loo(df, ["id"], "cat", "y", m=2.0).collect()}
    prior = 0.5
    # row 1 (a, y=1): (2-1 + 2*0.5)/(3-1+2) = 2/4 = 0.5
    assert out[1] == pytest.approx((2 - 1 + 2 * prior) / (3 - 1 + 2))
    # row 3 (a, y=0): (2-0 + 1)/(4) = 0.75
    assert out[3] == pytest.approx((2 - 0 + 2 * prior) / (3 - 1 + 2))
    # row 4 (b, y=0, n=1): (0-0 + 1)/(0+2) = 0.5 — pure prior shrinkage
    assert out[4] == pytest.approx((0 - 0 + 2 * prior) / (1 - 1 + 2))


def test_target_encode_loo_never_uses_own_label(spark):
    # two identical rows except labels: their encodings must differ by
    # exactly 1/(n-1+m) (the swapped own-label contribution)
    rows = [(1, "a", 1), (2, "a", 0)] + [(i, "a", 1) for i in range(3, 8)]
    df = spark.createDataFrame(rows, "id int, cat string, y int")
    out = {r.id: r.te for r in
           target_encode_loo(df, ["id"], "cat", "y", m=0.0).collect()}
    assert out[2] - out[1] == pytest.approx(1 / 6, abs=1e-6)


def test_top_paths_counts_and_rank(spark):
    import datetime
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: a b c a b c → paths a>b>c x2, b>c>a x1, c>a>b x1
    for i, e in enumerate(["a", "b", "c", "a", "b", "c"]):
        rows.append((1, t0 + datetime.timedelta(minutes=i), e, i))
    # user 2: a b c → a>b>c x1
    for i, e in enumerate(["a", "b", "c"]):
        rows.append((2, t0 + datetime.timedelta(minutes=i), e, 10 + i))
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string, event_id int")
    out = top_paths(df, "user_id", "ts", "event_type", "event_id",
                    n=3, k=10).collect()
    assert out[0].rank == 1 and out[0].path == "a>b>c" \
        and out[0].n_occurrences == 3
    got = {r.path: r.n_occurrences for r in out}
    assert got == {"a>b>c": 3, "b>c>a": 1, "c>a>b": 1}
    # ties (1-count paths) rank by path ascending
    assert [r.path for r in out[1:]] == ["b>c>a", "c>a>b"]


def test_top_paths_never_crosses_users(spark):
    import datetime
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(u, t0 + datetime.timedelta(minutes=i), e, u * 10 + i)
            for u, seq in [(1, ["a", "b"]), (2, ["c", "d"])]
            for i, e in enumerate(seq)]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string, event_id int")
    out = top_paths(df, "user_id", "ts", "event_type", "event_id",
                    n=2, k=10).collect()
    assert {r.path for r in out} == {"a>b", "c>d"}  # no b>c bridge


def test_label_centroids_known_values(spark):
    from dbt_fusion_spark.llm.similarity import label_centroids

    rows = [(0, [1.0, 2.0]), (0, [3.0, 4.0]), (1, [10.0, 10.0])]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    out = {(r.label, r.dim): r for r in
           label_centroids(df, "label", "embedding").collect()}
    assert out[(0, 0)].mean == 2.0 and out[(0, 1)].mean == 3.0
    assert out[(0, 0)].var == 2.0   # var([1,3]) sample = 2
    assert out[(0, 0)].n_vecs == 2
    assert out[(1, 0)].mean == 10.0


def test_label_centroids_single_vector_var_undefined(spark):
    from dbt_fusion_spark.llm.similarity import label_centroids

    df = spark.createDataFrame([(1, [5.0])],
                               "label int, embedding array<float>")
    r = label_centroids(df, "label", "embedding").collect()[0]
    # (q - s*s/1)/0 → NULL or NaN — must not be a finite number
    assert r.var is None or r.var != r.var


def test_exact_quantile_grid_known(spark):
    from dbt_fusion_spark.plans.encode import exact_quantile_grid

    rows = [("g", float(i)) for i in range(1, 101)]  # 1..100
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.percent: r.value for r in
           exact_quantile_grid(df, "g", "v", [1, 50, 99]).collect()}
    # lower convention: smallest v with cum*100 >= p*total
    assert out[1] == 1.0 and out[50] == 50.0 and out[99] == 99.0


def test_winsorize_clip_bounds_and_flags(spark):
    from dbt_fusion_spark.plans.encode import winsorize_clip

    rows = [(i, "g", float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id int, g string, v double")
    out = {r.id: r for r in
           winsorize_clip(df, ["id"], "g", "v", 5, 95).collect()}
    assert out[1].clipped == 5.0 and out[1].clip_side == "lo"
    assert out[100].clipped == 95.0 and out[100].clip_side == "hi"
    assert out[50].clipped == 50.0 and out[50].clip_side == "none"


def test_standardize_zscore_unit_variance(spark):
    from dbt_fusion_spark.plans.encode import standardize_zscore

    rows = [(i, "g", float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id int, g string, v double")
    out = standardize_zscore(df, ["id"], "g", "v").collect()
    zs = [r.z for r in out]
    n = len(zs)
    assert sum(zs) / n == pytest.approx(0.0, abs=1e-6)
    assert sum(z * z for z in zs) / (n - 1) == pytest.approx(1.0, abs=1e-4)
    # constant group: NULL z
    const = spark.createDataFrame([(1, "c", 5.0), (2, "c", 5.0)],
                                  "id int, g string, v double")
    out = standardize_zscore(const, ["id"], "g", "v").collect()
    assert all(r.z is None for r in out)


def test_functional_dependency_audit(spark):
    from dbt_fusion_spark.plans.profile import functional_dependency

    rows = [(1, "a"), (1, "a"), (2, "a"), (2, "b"), (3, "c")]
    df = spark.createDataFrame(rows, "k int, d string")
    out = {r.k: r for r in functional_dependency(df, "k", "d").collect()}
    assert not out[1].is_violation and out[1].n_dep_values == 1
    assert out[2].is_violation and out[2].n_dep_values == 2
    assert out[1].n_rows == 2 and out[3].n_rows == 1


def test_metric_correlations_signs(spark):
    import datetime

    from dbt_fusion_spark.plans.stats import metric_correlations

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(20):
        ts = t0 + datetime.timedelta(days=d, hours=1)
        rows.append(("up", ts, float(d)))          # rises
        rows.append(("up2", ts, 2.0 * d + 5.0))    # rises with it
        rows.append(("down", ts, float(100 - d)))  # falls
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {(r.key_a, r.key_b): r.corr for r in
           metric_correlations(df, "k", "ts", "v").collect()}
    assert out[("up", "up2")] == pytest.approx(1.0, abs=1e-6)
    assert out[("down", "up")] == pytest.approx(-1.0, abs=1e-6)
    assert out[("down", "up2")] == pytest.approx(-1.0, abs=1e-6)


def test_top_paths_null_event_nullifies_gram(spark):
    """A NULL event value anywhere in a gram voids the whole path
    (|| semantics, r8 ADVICE) — concat_ws used to silently count
    'a>NULL>c' as the 2-hop path 'a>c'."""
    import datetime
    t0 = datetime.datetime(2024, 1, 1)
    seq = ["a", None, "c", "a", "b", "c"]
    rows = [(1, t0 + datetime.timedelta(minutes=i), e, i)
            for i, e in enumerate(seq)]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string, event_id int")
    got = {r.path: r.n_occurrences
           for r in top_paths(df, "user_id", "ts", "event_type",
                              "event_id", n=3, k=10).collect()}
    # grams touching the NULL slot vanish; only the clean tail counts
    assert got == {"c>a>b": 1, "a>b>c": 1}


def test_woe_iv_hand_computed_two_bins(spark):
    import math

    from dbt_fusion_spark.plans.encode import woe_iv_bins

    # values 0..9: low half mostly bad, high half mostly good, one
    # cross-over each way so no bin has a zero cell
    rows = [(float(v), 1 if v >= 5 else 0) for v in range(10)] \
        + [(6.0, 0), (2.0, 1)]
    df = spark.createDataFrame(rows, "x double, y int")
    out = {r.bin: r for r in
           woe_iv_bins(df, "y", "x", bins=2).collect()}
    lo, hi = out[0], out[1]
    G = lo.n_good + hi.n_good
    B = lo.n_bad + hi.n_bad
    woe_hi = math.log((hi.n_good / G) / (hi.n_bad / B))
    assert hi.woe == pytest.approx(woe_hi, abs=1e-6)
    iv = ((lo.n_good / G - lo.n_bad / B) * lo.woe
          + (hi.n_good / G - hi.n_bad / B) * woe_hi)
    assert lo.iv == pytest.approx(iv, abs=1e-5)
    assert lo.iv == hi.iv
    # zero-cell bin: all-good feature range -> NULL woe, iv excludes it
    rows2 = [(0.0, 0), (0.5, 1), (9.0, 1), (8.0, 1)]
    out2 = {r.bin: r for r in woe_iv_bins(
        spark.createDataFrame(rows2, "x double, y int"),
        "y", "x", bins=2).collect()}
    assert out2[1].woe is None and out2[1].iv_term == 0.0
