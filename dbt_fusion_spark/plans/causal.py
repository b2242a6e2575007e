"""Causal inference on observational data: propensity scores + IPW.

The missing third leg next to the experiment readouts (ab_* tests) and
diff-in-diff: when treatment was NOT randomized, inverse-propensity
weighting recovers the average treatment effect under unconfoundedness
(Rosenbaum & Rubin 1983; Horvitz-Thompson / Hajek estimators).

Everything follows the module's GD-trainer determinism recipe
(plans/survival.cox_ph, llm/classifier trainers): floor grids only,
per-term round(9)->DECIMAL(38,9) sums (order-free), string-hop
decimal->double re-entry, transcendentals (exp) floor-quantized on the
coarse 1e-6 grid behind an eta clip — so the whole fit unrolls to
hash-exact SQL for the DuckDB oracle.

Scale (100 TB): the trainer is fixed-iteration full-batch GD — each
step is ONE data scan into a 1-row gradient reduce plus a broadcast
join against the 1-row beta frame; nothing data-sized ever sits on the
driver.  The IPW readout is one more scan with quantized weight sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dbt_fusion_spark.plans.stats import D389, _d2d, _qterm

ETA_CLIP = 30.0


def _f9(c):
    return F.floor(c * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)


def _f6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def _sigmoid(eta):
    """Quantized logistic link: eta clipped to +-ETA_CLIP (keeps the
    1e-6 exp grid exact — floor of an inexact giant double could
    differ by engine), exp floor-quantized at 1e-6."""
    ec = F.greatest(F.least(eta, F.lit(ETA_CLIP)), F.lit(-ETA_CLIP))
    return F.lit(1.0) / (F.lit(1.0) + _f6(F.exp(-ec)))


def _eta(feature_cols: list[str], prefix: str = "b",
         xprefix: str = "x") -> "F.Column":
    """b0 + sum_i f9(x_i * b_i) — the cox_ph eta convention (b0 is
    already on the 1e-9 grid from the update)."""
    eta = F.col(f"{prefix}0")
    for i in range(1, len(feature_cols) + 1):
        eta = eta + _f9(F.col(f"{xprefix}{i}") * F.col(f"{prefix}{i}"))
    return eta


def _cof3_cols(i11, i12, i13, i22, i23, i33):
    """3x3 symmetric cofactors + det, the plans/survival._cof3
    arithmetic order (mirrored verbatim by the SQL oracles)."""
    c11 = i22 * i33 - i23 * i23
    c12 = i13 * i23 - i12 * i33
    c13 = i12 * i23 - i22 * i13
    c22 = i11 * i33 - i13 * i13
    c23 = i12 * i13 - i11 * i23
    c33 = i11 * i22 - i12 * i12
    det = (i11 * (i22 * i33 - i23 * i23)
           - i12 * (i12 * i33 - i23 * i13)
           + i13 * (i12 * i23 - i22 * i13))
    return det, (c11, c12, c13, c22, c23, c33)


POISSON_ETA_CLIP = 20.0  # e^20 * 1e6 still exact under 2^53


def _poisson_mu(eta):
    """Quantized log-link mean: eta clipped so the 1e-6 exp grid
    stays exact (e^20 * 1e6 < 2^53; an unclipped exp would make the
    floor of an inexact giant double engine-dependent)."""
    ec = F.greatest(F.least(eta, F.lit(POISSON_ETA_CLIP)),
                    F.lit(-POISSON_ETA_CLIP))
    return _f6(F.exp(ec))


def train_logistic_tabular(df: DataFrame, label_col: str,
                           feature_cols: list[str],
                           iters: int = 8) -> DataFrame:
    """NEWTON (IRLS) logistic regression on TABULAR features (the
    text trainers hash grams; this one takes numeric columns directly
    — the propensity-model workhorse):

        b <- b + f9( (X'WX)^{-1} X'(y - sigma) ),  W = sigma(1-sigma)
        eta = b0 + sum f9(x_i b_i),  sigma quantized (1e-6 grid)

    Newton, NOT plain gradient descent: the information matrix makes
    the step scale-invariant, so an intercept of -40 next to a
    low-variance log feature (real propensity fits look like this)
    converges in a handful of iterations where GD never arrives.  For
    p <= 2 the (p+1)x(p+1) solve stays a closed-form 2x2/3x3 cofactor
    expression — fully declarative, hash-exact in SQL; p >= 3 solves
    driver-side with numpy on the collected 1-row (U, I) frame (the
    cox_ph wide contract).

    Returns ONE wide row (b0, b1..bp) — broadcastable straight into
    logistic_scores.  NULL-bearing rows drop (casewise deletion).

    Scale: per iteration one scan + 1-row moment reduce + broadcast
    beta join; beta localCheckpoints so plan depth stays constant.
    """
    return _train_glm_newton(df, label_col, feature_cols, iters,
                             family="logistic")


def train_poisson_tabular(df: DataFrame, label_col: str,
                          feature_cols: list[str],
                          iters: int = 8) -> DataFrame:
    """NEWTON (IRLS) POISSON regression with log link — the count-
    outcome GLM next to the logistic one (events per user, orders per
    account ~ covariates):

        b <- b + f9( (X'WX)^{-1} X'(y - mu) ),   W = mu = exp(eta)

    Same closed-form cofactor solve for p <= 2 / numpy for p >= 3,
    same quantization contract (exp on the 1e-6 grid behind a +-20
    eta clip).  Returns ONE wide row (b0, b1..bp); exp(b_i) is the
    per-unit rate ratio."""
    return _train_glm_newton(df, label_col, feature_cols, iters,
                             family="poisson")


def _train_glm_newton(df: DataFrame, label_col: str,
                      feature_cols: list[str], iters: int,
                      family: str) -> DataFrame:
    """r11 optimization (guide §2.4): beta lives driver-side as p+1
    quantized doubles for EVERY width — the former p <= 2 declarative
    loop paid a broadcast beta join, a broadcast (U, I) re-join and a
    weight-checkpoint job per iteration; now one iteration is exactly
    one cached scan into a 1-row moment collect.  The p <= 2 Newton
    step stays the closed-form 2x2/3x3 cofactor arithmetic, transcribed
    operand-for-operand into Python floats (IEEE doubles, same op
    order), so the trajectory — and the SQL-unrolled oracle hash — is
    bit-identical to the column-expression form."""
    import math

    p = len(feature_cols)
    if p < 1:
        raise ValueError("need at least one feature")
    spark = df.sparkSession
    xs = [F.col(c).cast("double").alias(f"x{i + 1}")
          for i, c in enumerate(feature_cols)]
    data = (df.select(F.col(label_col).cast("double").alias("y"), *xs)
            .na.drop()
            .persist())
    # moment names over z = (1, x1..xp): m[i][j], 1-indexed
    dims = p + 1
    pairs = [(i, j) for i in range(1, dims + 1)
             for j in range(i, dims + 1)]
    bvals = [0.0] * dims
    if family == "poisson":
        # Newton from b = 0 overshoots catastrophically along an
        # ill-conditioned (intercept, near-constant-feature) ridge
        # (observed: b0 -68 on step 1, ~30 steps to recover).  The
        # standard IRLS start b0 = ln(mean y) lands the first step
        # near the optimum; computed IN-PLAN (Spark's log, not libm —
        # an ulp there could flip the 1e-9 floor) and f9-quantized so
        # the SQL unroll mirrors it exactly; this setup reduce also
        # carries the emptiness guard.
        yb = (F.sum(_qterm(F.col("y"))).cast("string").cast("double")
              / F.count(F.lit(1)).cast("double"))
        r0 = data.agg(
            F.when(yb > 0, _f9(F.log(yb))).otherwise(F.lit(0.0))
            .alias("b0"),
            F.count(F.lit(1)).alias("__cnt")).collect()[0]
        if r0["__cnt"] == 0:
            raise ValueError("no complete rows to fit on")
        bvals[0] = r0["b0"]

    def _z(i):
        return F.lit(1.0) if i == 1 else F.col(f"x{i - 1}")

    def _eta_lit(bv):
        eta = F.lit(bv[0])
        for i in range(1, p + 1):
            eta = eta + _f9(F.col(f"x{i}") * F.lit(bv[i]))
        return eta

    def _moments(bv):
        if family == "logistic":
            pr = _sigmoid(_eta_lit(bv))
            w = pr * (F.lit(1.0) - pr)
            resid = F.col("y") - pr
        else:
            mu = _poisson_mu(_eta_lit(bv))
            w = mu
            resid = F.col("y") - mu
        aggs = [F.count(F.lit(1)).alias("__cnt")]
        for i in range(1, dims + 1):
            aggs.append(F.sum(_qterm(resid * _z(i))).alias(f"gd{i}"))
        for i, j in pairs:
            aggs.append(F.sum(_qterm(w * _z(i) * _z(j)))
                        .alias(f"md{i}{j}"))
        out = data.agg(*aggs)
        return out.select(
            "__cnt",
            *[_d2d(f"gd{i}").alias(f"u{i}")
              for i in range(1, dims + 1)],
            *[_d2d(f"md{i}{j}").alias(f"i{i}{j}") for i, j in pairs])

    def _pyf9(x: float) -> float:
        # mirror Spark floor(): NaN/inf pass through (math.floor raises)
        if math.isnan(x) or math.isinf(x):
            return x
        return math.floor(x * 1e9 + 0.5) / 1e9

    def _ok(det) -> bool:
        # mirror Spark/DuckDB comparison semantics where NaN sorts
        # greater than any value (when(det > 0, ...) fires on NaN)
        return math.isnan(det) or det > 0

    def _pydelta(r):
        """Closed-form (X'WX)^{-1} X'(y - mu) from the collected 1-row
        moment frame — the SAME operand order as the former column
        expressions and the unrolled SQL oracle.  None = guard failed
        (keep beta)."""
        u = [r[f"u{i}"] for i in range(1, dims + 1)]
        ii = {(i, j): r[f"i{i}{j}"] for i, j in pairs}
        if any(v is None for v in u) \
                or any(v is None for v in ii.values()):
            return None
        if p == 1:
            det = (ii[(1, 1)] * ii[(2, 2)]
                   - ii[(1, 2)] * ii[(1, 2)])
            if not _ok(det):
                return None
            return [(ii[(2, 2)] * u[0] - ii[(1, 2)] * u[1]) / det,
                    (ii[(1, 1)] * u[1] - ii[(1, 2)] * u[0]) / det]
        i11, i12, i13 = ii[(1, 1)], ii[(1, 2)], ii[(1, 3)]
        i22, i23, i33 = ii[(2, 2)], ii[(2, 3)], ii[(3, 3)]
        c11 = i22 * i33 - i23 * i23
        c12 = i13 * i23 - i12 * i33
        c13 = i12 * i23 - i22 * i13
        c22 = i11 * i33 - i13 * i13
        c23 = i12 * i13 - i11 * i23
        c33 = i11 * i22 - i12 * i12
        det = (i11 * (i22 * i33 - i23 * i23)
               - i12 * (i12 * i33 - i23 * i13)
               + i13 * (i12 * i23 - i22 * i13))
        if not _ok(det):
            return None
        u1, u2, u3 = u
        return [(c11 * u1 + c12 * u2 + c13 * u3) / det,
                (c12 * u1 + c22 * u2 + c23 * u3) / det,
                (c13 * u1 + c23 * u2 + c33 * u3) / det]

    if p <= 2:
        for k in range(iters):
            row = _moments(bvals).collect()[0]
            if k == 0 and family != "poisson" and row["__cnt"] == 0:
                raise ValueError("no complete rows to fit on")
            delta = _pydelta(row)
            if delta is not None:
                bvals = [_pyf9(b + d) for b, d in zip(bvals, delta)]
        data.unpersist()
        return spark.createDataFrame(
            [tuple(bvals)],
            ", ".join(f"b{i} double" for i in range(dims)))
    # wide path: numpy solve on the collected 1-row (U, I) frame
    import numpy as np

    empty_checked = family == "poisson"
    for _ in range(iters):
        row = _moments(bvals).collect()[0]
        if not empty_checked:
            if row["__cnt"] == 0:
                raise ValueError("no complete rows to fit on")
            empty_checked = True
        u = np.array([row[f"u{i}"] for i in range(1, dims + 1)])
        info = np.zeros((dims, dims))
        for i, j in pairs:
            info[i - 1, j - 1] = info[j - 1, i - 1] = row[f"i{i}{j}"]
        try:
            np.linalg.cholesky(info)
            delta = np.linalg.solve(info, u)
        except np.linalg.LinAlgError:
            break
        bvals = [math.floor((b + float(d)) * 1e9 + 0.5) / 1e9
                 for b, d in zip(bvals, delta)]
    data.unpersist()
    return spark.createDataFrame(
        [tuple(bvals)],
        ", ".join(f"b{i} double" for i in range(dims)))


def logistic_scores(df: DataFrame, weights: DataFrame,
                    feature_cols: list[str]) -> DataFrame:
    """Attach the fitted propensity sigma(eta) as column `propensity`
    (quantized exactly as in training, so served scores are
    bit-comparable).  One broadcast join against the 1-row weights."""
    # private __fx aliases: callers may legitimately name their own
    # features x1..xp (the demo does), which would collide
    xs = [F.col(c).cast("double").alias(f"__fx{i + 1}")
          for i, c in enumerate(feature_cols)]
    # opaque COMPUTED key (never a literal): a constant-foldable key
    # degrades the broadcast hash join to a BNLJ (the kappa bug)
    s = (df.select("*", *xs)
         .withColumn("__k", F.pmod(F.abs(F.coalesce(
             F.xxhash64("__fx1"), F.lit(1))), F.lit(1)))
         .join(F.broadcast(weights.withColumn(
             "__k", F.pmod(F.abs(F.xxhash64("b0")), F.lit(1)))),
             "__k"))
    out = s.withColumn(
        "propensity",
        _f6(_sigmoid(_eta(feature_cols, xprefix="__fx"))))
    drop = (["__k"]
            + [f"__fx{i}" for i in range(1, len(feature_cols) + 1)]
            + [f"b{i}" for i in range(len(feature_cols) + 1)])
    return out.drop(*drop)


def poisson_rates(df: DataFrame, weights: DataFrame,
                  feature_cols: list[str]) -> DataFrame:
    """Attach the fitted Poisson mean exp(eta) as column `mu`
    (quantized exactly as in training).  One broadcast join against
    the 1-row weights — the count-GLM twin of logistic_scores."""
    xs = [F.col(c).cast("double").alias(f"__fx{i + 1}")
          for i, c in enumerate(feature_cols)]
    s = (df.select("*", *xs)
         .withColumn("__k", F.pmod(F.abs(F.coalesce(
             F.xxhash64("__fx1"), F.lit(1))), F.lit(1)))
         .join(F.broadcast(weights.withColumn(
             "__k", F.pmod(F.abs(F.xxhash64("b0")), F.lit(1)))),
             "__k"))
    out = s.withColumn(
        "mu", _poisson_mu(_eta(feature_cols, xprefix="__fx")))
    drop = (["__k"]
            + [f"__fx{i}" for i in range(1, len(feature_cols) + 1)]
            + [f"b{i}" for i in range(len(feature_cols) + 1)])
    return out.drop(*drop)


def ipw_ate(df: DataFrame, treat_col: str, outcome_col: str,
            confounder_cols: list[str], iters: int = 8,
            clip: float = 0.01) -> DataFrame:
    """Average treatment effect by stabilized inverse-propensity
    weighting (the Hajek estimator):

        e(x)  = P(T=1 | x)            (train_logistic_tabular fit)
        ATE   = sum(T y / e) / sum(T / e)
              - sum((1-T) y / (1-e)) / sum((1-T) / (1-e))

    with e clipped to [clip, 1-clip] (standard positivity trimming —
    an unclipped e near 0/1 hands one row the whole estimate).

    Emits ONE row: n, n_treated, naive_diff (the confounded raw gap),
    ate_ipw, and mean_propensity_treated/control (the overlap
    diagnostic worth eyeballing before trusting the number).

    Scale: the trainer's fixed scans + ONE weighted-sum scan; weight
    terms ride round(9)->DECIMAL sums.
    """
    data = df.select(
        F.col(treat_col).cast("double").alias("t"),
        F.col(outcome_col).cast("double").alias("y"),
        *[F.col(c).cast("double").alias(c) for c in confounder_cols]) \
        .na.drop()
    w = train_logistic_tabular(data, "t", confounder_cols,
                               iters=iters)
    scored = logistic_scores(data, w, confounder_cols)
    e = F.greatest(F.least(F.col("propensity"),
                           F.lit(1.0 - clip)), F.lit(clip))
    t = F.col("t")
    y = F.col("y")
    agg = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(t).cast("bigint").alias("n_treated"),
        F.sum(_qterm(t / e)).alias("__w1"),
        F.sum(_qterm(t * y / e)).alias("__wy1"),
        F.sum(_qterm((1 - t) / (1 - e))).alias("__w0"),
        F.sum(_qterm((1 - t) * y / (1 - e))).alias("__wy0"),
        F.sum(_qterm(t * y)).alias("__sy1"),
        F.sum(_qterm((1 - t) * y)).alias("__sy0"),
        F.sum(_qterm(t * e)).alias("__se1"),
        F.sum(_qterm((1 - t) * e)).alias("__se0"))
    n1 = F.col("n_treated").cast("double")
    n0 = (F.col("n") - F.col("n_treated")).cast("double")
    ok = (F.col("n_treated") > 0) & (F.col("n") > F.col("n_treated"))
    naive = F.when(ok, _d2d("__sy1") / n1 - _d2d("__sy0") / n0)
    ate = F.when(ok, _d2d("__wy1") / _d2d("__w1")
                 - _d2d("__wy0") / _d2d("__w0"))
    return agg.select(
        "n", "n_treated",
        F.round(naive, 6).alias("naive_diff"),
        F.round(ate, 6).alias("ate_ipw"),
        F.round(F.when(ok, _d2d("__se1") / n1), 6)
         .alias("mean_propensity_treated"),
        F.round(F.when(ok, _d2d("__se0") / n0), 6)
         .alias("mean_propensity_control"))


def _ols3(side: DataFrame, confounder_cols: list[str],
          tag: str) -> DataFrame:
    """Closed-form OLS of y on (1, x1[, x2]) over `side`, as a 1-row
    coefficient frame ({tag}0..{tag}p) — the outcome model of the
    doubly-robust estimator.  p <= 2 keeps the normal-equation solve
    a 2x2 / 3x3 cofactor expression (the cox_ph p=3 pattern, same
    arithmetic order mirrored by the SQL oracle); wider outcome
    models belong to a driver-side fit.
    """
    p = len(confounder_cols)
    x1 = F.col("__fx1") if p >= 1 else None
    x2 = F.col("__fx2") if p >= 2 else None
    y = F.col("y")
    if p == 1:
        agg = side.agg(
            F.count(F.lit(1)).cast("double").alias("i11"),
            F.sum(_qterm(x1)).alias("__i12"),
            F.sum(_qterm(x1 * x1)).alias("__i22"),
            F.sum(_qterm(y)).alias("__u1"),
            F.sum(_qterm(x1 * y)).alias("__u2"))
        m = agg.select(
            "i11", _d2d("__i12").alias("i12"),
            _d2d("__i22").alias("i22"),
            _d2d("__u1").alias("u1"), _d2d("__u2").alias("u2"))
        det = F.col("i11") * F.col("i22") - F.col("i12") * F.col("i12")
        c0 = (F.col("i22") * F.col("u1")
              - F.col("i12") * F.col("u2")) / det
        c1 = (F.col("i11") * F.col("u2")
              - F.col("i12") * F.col("u1")) / det
        ok = det > 0
        return m.select(
            F.when(ok, _f9(c0)).alias(f"{tag}0"),
            F.when(ok, _f9(c1)).alias(f"{tag}1"))
    agg = side.agg(
        F.count(F.lit(1)).cast("double").alias("i11"),
        F.sum(_qterm(x1)).alias("__i12"),
        F.sum(_qterm(x2)).alias("__i13"),
        F.sum(_qterm(x1 * x1)).alias("__i22"),
        F.sum(_qterm(x1 * x2)).alias("__i23"),
        F.sum(_qterm(x2 * x2)).alias("__i33"),
        F.sum(_qterm(y)).alias("__u1"),
        F.sum(_qterm(x1 * y)).alias("__u2"),
        F.sum(_qterm(x2 * y)).alias("__u3"))
    m = agg.select(
        "i11", _d2d("__i12").alias("i12"), _d2d("__i13").alias("i13"),
        _d2d("__i22").alias("i22"), _d2d("__i23").alias("i23"),
        _d2d("__i33").alias("i33"),
        _d2d("__u1").alias("u1"), _d2d("__u2").alias("u2"),
        _d2d("__u3").alias("u3"))
    i11, i12, i13 = F.col("i11"), F.col("i12"), F.col("i13")
    i22, i23, i33 = F.col("i22"), F.col("i23"), F.col("i33")
    c11 = i22 * i33 - i23 * i23
    c12 = i13 * i23 - i12 * i33
    c13 = i12 * i23 - i22 * i13
    c22 = i11 * i33 - i13 * i13
    c23 = i12 * i13 - i11 * i23
    c33 = i11 * i22 - i12 * i12
    det = (i11 * (i22 * i33 - i23 * i23)
           - i12 * (i12 * i33 - i23 * i13)
           + i13 * (i12 * i23 - i22 * i13))
    u1, u2, u3 = F.col("u1"), F.col("u2"), F.col("u3")
    d1 = (c11 * u1 + c12 * u2 + c13 * u3) / det
    d2 = (c12 * u1 + c22 * u2 + c23 * u3) / det
    d3 = (c13 * u1 + c23 * u2 + c33 * u3) / det
    ok = det > 0
    return m.select(
        F.when(ok, _f9(d1)).alias(f"{tag}0"),
        F.when(ok, _f9(d2)).alias(f"{tag}1"),
        F.when(ok, _f9(d3)).alias(f"{tag}2"))


def aipw_ate(df: DataFrame, treat_col: str, outcome_col: str,
             confounder_cols: list[str], iters: int = 8,
             clip: float = 0.01) -> DataFrame:
    """DOUBLY-ROBUST average treatment effect (AIPW, Robins 1994):
    augment the IPW estimator with per-arm linear outcome models —
    consistent if EITHER the propensity model OR the outcome model is
    right (and more efficient than IPW when both are):

        psi = [T (y - m1(x))/e + m1(x)]
            - [(1-T)(y - m0(x))/(1-e) + m0(x)]
        ATE_aipw = mean(psi)

    m1/m0 = closed-form OLS of y on (1, x) over treated/control (p <=
    2 confounders; the normal-equation cofactor solve stays in-plan),
    e = the trained propensity, clipped to [clip, 1-clip].  Emits ONE
    row: n, n_treated, naive_diff, ate_ipw (stabilized Hajek, for
    comparison), ate_aipw.

    Scale: the GD trainer's fixed scans + two 1-row moment reduces +
    one psi scan — nothing data-sized leaves the engine.
    """
    p = len(confounder_cols)
    if p not in (1, 2):
        raise ValueError(
            f"aipw_ate supports 1 or 2 confounders (closed-form "
            f"outcome OLS); got {p}")
    data = df.select(
        F.col(treat_col).cast("double").alias("t"),
        F.col(outcome_col).cast("double").alias("y"),
        *[F.col(c).cast("double").alias(c) for c in confounder_cols]) \
        .na.drop()
    w = train_logistic_tabular(data, "t", confounder_cols,
                               iters=iters)
    scored = logistic_scores(data, w, confounder_cols) \
        .select("t", "y", "propensity",
                *[F.col(c).alias(f"__fx{i + 1}")
                  for i, c in enumerate(confounder_cols)]) \
        .persist()
    ct = _ols3(scored.filter(F.col("t") == 1), confounder_cols, "a")
    cc = _ols3(scored.filter(F.col("t") == 0), confounder_cols, "b")
    s = (scored
         .withColumn("__k", F.pmod(F.abs(F.coalesce(
             F.xxhash64("__fx1"), F.lit(1))), F.lit(1)))
         .join(F.broadcast(ct.withColumn(
             "__k", F.pmod(F.abs(F.coalesce(
                 F.xxhash64("a0"), F.lit(1))), F.lit(1)))), "__k")
         .join(F.broadcast(cc.withColumn(
             "__k", F.pmod(F.abs(F.coalesce(
                 F.xxhash64("b0"), F.lit(1))), F.lit(1)))), "__k"))

    def _pred(tag):
        out = F.col(f"{tag}0")
        for i in range(1, p + 1):
            out = out + _f9(F.col(f"__fx{i}") * F.col(f"{tag}{i}"))
        return out

    m1, m0 = _pred("a"), _pred("b")
    e = F.greatest(F.least(F.col("propensity"),
                           F.lit(1.0 - clip)), F.lit(clip))
    t, y = F.col("t"), F.col("y")
    psi = ((t * (y - m1) / e + m1)
           - ((1 - t) * (y - m0) / (1 - e) + m0))
    agg = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(t).cast("bigint").alias("n_treated"),
        F.sum(_qterm(psi)).alias("__psi"),
        F.sum(_qterm(t / e)).alias("__w1"),
        F.sum(_qterm(t * y / e)).alias("__wy1"),
        F.sum(_qterm((1 - t) / (1 - e))).alias("__w0"),
        F.sum(_qterm((1 - t) * y / (1 - e))).alias("__wy0"),
        F.sum(_qterm(t * y)).alias("__sy1"),
        F.sum(_qterm((1 - t) * y)).alias("__sy0"))
    scored.unpersist()
    n1 = F.col("n_treated").cast("double")
    n0 = (F.col("n") - F.col("n_treated")).cast("double")
    ok = (F.col("n_treated") > 0) & (F.col("n") > F.col("n_treated"))
    return agg.select(
        "n", "n_treated",
        F.round(F.when(ok, _d2d("__sy1") / n1 - _d2d("__sy0") / n0), 6)
         .alias("naive_diff"),
        F.round(F.when(ok, _d2d("__wy1") / _d2d("__w1")
                       - _d2d("__wy0") / _d2d("__w0")), 6)
         .alias("ate_ipw"),
        F.round(F.when(ok, _d2d("__psi")
                       / F.col("n").cast("double")), 6)
         .alias("ate_aipw"))
