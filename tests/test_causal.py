"""plans/causal: tabular logistic GD + inverse-propensity weighting."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dbt_fusion_spark.plans.causal import (ipw_ate, logistic_scores,
                                           train_logistic_tabular)


def _synthetic(n=1500, seed=3):
    """Deterministic confounded dataset: treatment leans on x, outcome
    = 2*t + 3*x + noise — naive gap is badly biased, IPW is not."""
    import numpy as np

    rng = np.random.RandomState(seed)
    x = rng.randn(n)
    pt = 1 / (1 + np.exp(-(0.8 * x - 0.2)))
    t = (rng.rand(n) < pt).astype(float)
    y = 2.0 * t + 3.0 * x + rng.randn(n) * 0.5
    return [(float(t[i]), float(y[i]), float(x[i])) for i in range(n)]


def test_logistic_tabular_recovers_coefficients(spark):
    rows = _synthetic()
    df = spark.createDataFrame(rows, "t double, y double, x double")
    w = train_logistic_tabular(df, "t", ["x"],
                               iters=8).collect()[0]
    assert w.b1 == pytest.approx(0.8, abs=0.15)
    assert w.b0 == pytest.approx(-0.2, abs=0.15)
    scored = logistic_scores(df, train_logistic_tabular(
        df, "t", ["x"], iters=8), ["x"])
    p = scored.agg(F.min("propensity"), F.max("propensity")).first()
    assert 0.0 < p[0] and p[1] < 1.0
    assert "x" in scored.columns and "propensity" in scored.columns


def test_ipw_ate_removes_confounding(spark):
    rows = _synthetic()
    df = spark.createDataFrame(rows, "t double, y double, x double")
    r = ipw_ate(df, "t", "y", ["x"], iters=8).collect()[0]
    # naive is badly biased upward (confounder coef 3 > effect 2)
    assert r.naive_diff > 3.0
    assert r.ate_ipw == pytest.approx(2.0, abs=0.35)
    assert r.n == 1500 and 0 < r.n_treated < 1500
    # overlap diagnostic: treated lean to higher propensity
    assert r.mean_propensity_treated > r.mean_propensity_control


def test_ipw_ate_null_effect_and_edge_cases(spark):
    # no real effect: y depends only on x -> ATE ~ 0, naive biased
    import numpy as np

    rng = np.random.RandomState(9)
    n = 1200
    x = rng.randn(n)
    pt = 1 / (1 + np.exp(-1.0 * x))
    t = (rng.rand(n) < pt).astype(float)
    y = 3.0 * x + rng.randn(n) * 0.5
    df = spark.createDataFrame(
        [(float(t[i]), float(y[i]), float(x[i])) for i in range(n)],
        "t double, y double, x double")
    r = ipw_ate(df, "t", "y", ["x"], iters=8).collect()[0]
    assert abs(r.naive_diff) > 1.0        # confounded gap
    assert r.ate_ipw == pytest.approx(0.0, abs=0.4)
    # degenerate: everyone treated -> NULL estimates, not a crash
    allt = df.withColumn("t", F.lit(1.0))
    rd = ipw_ate(allt, "t", "y", ["x"], iters=2).collect()[0]
    assert rd.ate_ipw is None and rd.naive_diff is None
    with pytest.raises(ValueError):
        train_logistic_tabular(df, "t", [], iters=2)


def test_logistic_eta_clip_keeps_probs_finite(spark):
    # absurd feature scale would overflow exp without the eta clip
    rows = [(float(i % 2), float((i % 2) * 1e6 - 5e5)) for i in
            range(40)]
    df = spark.createDataFrame(rows, "t double, x double")
    w = train_logistic_tabular(df, "t", ["x"], iters=3)
    s = logistic_scores(df, w, ["x"]).select("propensity").collect()
    assert all(r.propensity is not None
               and not math.isnan(r.propensity)
               and 0.0 <= r.propensity <= 1.0 for r in s)


def test_aipw_doubly_robust_recovery(spark):
    """AIPW recovers the true effect at least as well as IPW on the
    confounded synthetic, and stays consistent when the OUTCOME model
    is right even though the PROPENSITY model is deliberately starved
    (1 GD iteration -> near-uninformative e(x)) — the doubly-robust
    property in action."""
    from dbt_fusion_spark.plans.causal import aipw_ate

    rows = _synthetic(2000)
    df = spark.createDataFrame(rows, "t double, y double, x double")
    r = aipw_ate(df, "t", "y", ["x"], iters=8).collect()[0]
    assert r.ate_aipw == pytest.approx(2.0, abs=0.3)
    assert r.naive_diff > 3.0
    # starved propensity (0 Newton steps -> flat e = 0.5): IPW
    # collapses to the naive gap, AIPW's outcome model still corrects
    r1 = aipw_ate(df, "t", "y", ["x"], iters=0).collect()[0]
    assert abs(r1.ate_aipw - 2.0) + 0.15 < abs(r1.ate_ipw - 2.0)
    with pytest.raises(ValueError):
        aipw_ate(df, "t", "y", ["x", "x", "x"])


def test_poisson_newton_recovers_coefficients(spark):
    """Poisson IRLS (W = mu, ln-ybar start) must recover known rate
    coefficients and match an independent numpy IRLS; the p=3 wide
    path agrees too."""
    import numpy as np

    from dbt_fusion_spark.plans.causal import (poisson_rates,
                                               train_poisson_tabular)

    rng = np.random.RandomState(4)
    n = 1500
    x1 = (rng.rand(n) > 0.5).astype(float)
    x2 = rng.randn(n) * 0.5
    mu = np.exp(1.2 + 0.5 * x1 - 0.3 * x2)
    y = rng.poisson(mu).astype(float)
    df = spark.createDataFrame(
        [(float(y[i]), float(x1[i]), float(x2[i]))
         for i in range(n)],
        "y double, x1 double, x2 double")
    w = train_poisson_tabular(df, "y", ["x1", "x2"],
                              iters=8).collect()[0]
    X = np.column_stack([np.ones(n), x1, x2])
    b = np.array([np.log(y.mean()), 0.0, 0.0])
    for _ in range(25):
        m = np.exp(np.clip(X @ b, -20, 20))
        b = b + np.linalg.solve(X.T @ (m[:, None] * X),
                                X.T @ (y - m))
    assert w.b0 == pytest.approx(b[0], abs=5e-3)
    assert w.b1 == pytest.approx(b[1], abs=5e-3)
    assert w.b2 == pytest.approx(b[2], abs=5e-3)
    mus = poisson_rates(
        df, train_poisson_tabular(df, "y", ["x1", "x2"], iters=8),
        ["x1", "x2"]).select("mu").collect()
    assert all(r.mu > 0 for r in mus)
    # p=3 routes through the driver-side numpy solve
    df3 = df.withColumn("x3", F.col("x1") * F.col("x2"))
    w3 = train_poisson_tabular(df3, "y", ["x1", "x2", "x3"],
                               iters=8).collect()[0]
    assert w3.b1 == pytest.approx(b[1], abs=0.1)


def test_poisson_ill_conditioned_design_converges(spark):
    """The regression that motivated the ln-ybar start: a
    near-constant feature beside the intercept made zero-start Newton
    overshoot to b0 ~ -70; with the IRLS start the deviance must land
    BELOW the null deviance."""
    rows = [(float(3 + i % 9), 3.3 + 0.001 * (i % 7))
            for i in range(300)]
    df = spark.createDataFrame(rows, "y double, x double")
    from dbt_fusion_spark.plans.causal import (poisson_rates,
                                               train_poisson_tabular)
    from dbt_fusion_spark.plans.stats import _qterm

    w = train_poisson_tabular(df, "y", ["x"], iters=8)
    sc = poisson_rates(df, w, ["x"])
    got = sc.agg(F.avg("mu").alias("m"),
                 F.avg("y").alias("ybar")).first()
    assert got.m == pytest.approx(got.ybar, rel=0.05)
