"""Survival analysis: Kaplan-Meier product-limit estimation.

The retention-curve generalization every subscription / engagement
dashboard needs once censoring appears (users still active at the
observation cutoff carry information that naive churn rates throw
away).  Kaplan & Meier 1958.

Scale shape: subjects reduce to the distinct-duration grid (one
map-side-combined groupBy; durations are bounded by their resolution —
days, here); the at-risk walk and the product-limit both run as
windows over that bounded grid.  The survival product evaluates as
exp(cumsum(ln terms)) with the per-term round(9)->DECIMAL quantization
(plans/stats recipe), so the cumulative product is order-free and
engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dbt_fusion_spark.plans.stats import D389, _d2d, _grid, _qterm


def kaplan_meier(df: DataFrame, duration_col: str,
                 event_col: str) -> DataFrame:
    """Kaplan-Meier survival curve over (duration, event) subjects.

    `event_col` is 1 when the terminal event was observed at
    `duration_col`, 0 when the subject was censored there (still alive
    at last observation).  Returns one row per distinct duration with
    the at-risk count, events, censored, the hazard d/n, and the
    product-limit survival S(t) = prod_{t_j <= t} (1 - d_j / n_j).
    """
    ev = F.col(event_col).cast("bigint")
    # coalesce(1) (r12, guide §2.4): the global grid windows run in
    # the grid aggregate's own stage instead of paying a second
    # (SinglePartition) exchange — the grid is duration-bounded, and
    # the map-side partial aggregation stays parallel
    grid = (df.groupBy(F.col(duration_col).alias("t"))
              .agg(F.sum(ev).alias("d"),
                   F.sum(F.lit(1) - ev).alias("c"))
              .coalesce(1))
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    g = (grid.withColumn("total", F.sum(F.col("d") + F.col("c"))
                         .over(_grid()))
             .withColumn("seen", F.sum(F.col("d") + F.col("c"))
                         .over(wcum)))
    # at risk AT t = everyone not yet exited strictly before t
    g = g.withColumn("n_risk",
                     F.col("total") - F.col("seen")
                     + F.col("d") + F.col("c"))
    # product limit via exp(cumsum(ln)): terms quantized to DECIMAL so
    # the walk is order-free; d = n_risk (everyone exits) → S drops to
    # exactly 0 from there on (ln undefined — handled as a flag).
    dead_all = F.col("d") >= F.col("n_risk")
    term = F.when(F.col("d") > 0,
                  _qterm(F.log(F.lit(1.0)
                               - F.col("d").cast("double")
                               / F.col("n_risk")))) \
            .otherwise(F.lit(0).cast("decimal(38,9)"))
    g = (g.withColumn("__t", F.when(dead_all, F.lit(None)).otherwise(term))
          .withColumn("__anydead", F.max(dead_all.cast("int")).over(wcum))
          .withColumn("__cum", F.sum("__t").over(wcum)))
    surv = F.when(F.col("__anydead") == 1, F.lit(0.0)) \
            .otherwise(F.exp(_d2d("__cum")))
    return g.select(
        F.col("t").alias(duration_col),
        F.col("n_risk"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.round(F.col("d").cast("double") / F.col("n_risk"), 6)
         .alias("hazard"),
        F.round(surv, 6).alias("survival"))


def logrank_test(df: DataFrame, group_col: str, duration_col: str,
                 event_col: str, group_a, group_b) -> DataFrame:
    """Log-rank test: do two groups share a survival curve? (Mantel
    1966 — the hypothesis test that pairs with kaplan_meier.)

    At each event time t: with n_g at risk and d_g events per group,
    group A's expectation under H0 is d * n_a / n and the variance
    term is d (n_a/n)(n_b/n)(n-d)/(n-1).  The statistic
    chi2 = (O_a - E_a)^2 / V is 1-dof chi-square.  Returns ONE row:
    per-group subjects/events, expected_a, chi2.

    Scale: same bounded duration-grid walk as kaplan_meier, two
    at-risk windows; the O-E and V sums ride round(9)->DECIMAL terms.
    """
    ga = F.col(group_col) == group_a
    ev = F.col(event_col).cast("bigint")
    grid = (df.filter(F.col(group_col).isin(group_a, group_b))
              .groupBy(F.col(duration_col).alias("t"))
              .agg(F.sum(F.when(ga, ev).otherwise(0)).alias("da"),
                   F.sum(F.when(ga, 1).otherwise(0)).alias("xa"),
                   F.sum(F.when(~ga, ev).otherwise(0)).alias("db"),
                   F.sum(F.when(~ga, 1).otherwise(0)).alias("xb"))
              .coalesce(1))
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    g = (grid.withColumn("tot_a", F.sum("xa").over(_grid()))
             .withColumn("tot_b", F.sum("xb").over(_grid()))
             .withColumn("seen_a", F.sum("xa").over(wcum))
             .withColumn("seen_b", F.sum("xb").over(wcum)))
    na = F.col("tot_a") - F.col("seen_a") + F.col("xa")
    nb = F.col("tot_b") - F.col("seen_b") + F.col("xb")
    n = (na + nb).cast("double")
    d = (F.col("da") + F.col("db")).cast("double")
    e_term = F.when(F.col("da") + F.col("db") > 0,
                    _qterm(d * na.cast("double") / n)) \
              .otherwise(F.lit(0).cast(D389))
    v_term = F.when((F.col("da") + F.col("db") > 0) & (na + nb > 1),
                    _qterm(d * (na.cast("double") / n)
                           * (nb.cast("double") / n)
                           * (n - d) / (n - 1))) \
              .otherwise(F.lit(0).cast(D389))
    out = (g.withColumn("e", e_term).withColumn("v", v_term)
            .agg(F.max("tot_a").alias("n_a"), F.max("tot_b").alias("n_b"),
                 F.sum("da").alias("events_a"),
                 F.sum("db").alias("events_b"),
                 F.sum("e").alias("ea"), F.sum("v").alias("vv")))
    oa = F.col("events_a").cast("double")
    ea, vv = _d2d("ea"), _d2d("vv")
    chi2 = F.when(vv > 0, (oa - ea) * (oa - ea) / vv)
    return out.select(
        "n_a", "n_b", "events_a", "events_b",
        F.round(ea, 6).alias("expected_a"),
        F.round(chi2, 6).alias("chi2"),
        F.coalesce(chi2 > 3.841459, F.lit(False))
         .alias("significant_95"))


def nelson_aalen(df: DataFrame, duration_col: str,
                 event_col: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator — Kaplan-Meier's
    additive sibling: H(t) = sum_{t_j <= t} d_j / n_j, with the
    Aalen variance estimate sum d_j / n_j^2 and the derived
    Fleming-Harrington survival exp(-H(t)) (which dominates the KM
    curve and behaves better in small risk sets).  The cumulative
    hazard is the quantity hazard-ratio models (Cox) are built on, so
    this is the readout a churn analysis reaches for after the KM
    plot.

    Returns one row per distinct duration: at-risk count, events,
    censored, cumulative hazard, its standard error, and exp(-H).

    Scale: identical bounded duration-grid walk as kaplan_meier (one
    map-side-combined groupBy + grid windows); hazard and variance
    terms ride round(9)->DECIMAL sums so the walk is order-free.
    """
    ev = F.col(event_col).cast("bigint")
    grid = (df.groupBy(F.col(duration_col).alias("t"))
              .agg(F.sum(ev).alias("d"),
                   F.sum(F.lit(1) - ev).alias("c"))
              .coalesce(1))
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    g = (grid.withColumn("total", F.sum(F.col("d") + F.col("c"))
                         .over(_grid()))
             .withColumn("seen", F.sum(F.col("d") + F.col("c"))
                         .over(wcum)))
    g = g.withColumn("n_risk",
                     F.col("total") - F.col("seen")
                     + F.col("d") + F.col("c"))
    nr = F.col("n_risk").cast("double")
    dd = F.col("d").cast("double")
    h_term = F.when(F.col("d") > 0, _qterm(dd / nr)) \
        .otherwise(F.lit(0).cast(D389))
    v_term = F.when(F.col("d") > 0, _qterm(dd / (nr * nr))) \
        .otherwise(F.lit(0).cast(D389))
    g = (g.withColumn("__h", F.sum(h_term).over(wcum))
          .withColumn("__v", F.sum(v_term).over(wcum)))
    return g.select(
        F.col("t").alias(duration_col),
        F.col("n_risk"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.round(_d2d("__h"), 6).alias("cum_hazard"),
        F.round(F.sqrt(_d2d("__v")), 6).alias("se"),
        F.round(F.exp(-_d2d("__h")), 6).alias("survival_fh"))


def cox_ph(df: DataFrame, duration_col: str, event_col: str,
           covariate_cols: list[str], iters: int = 8,
           strata_col: str | None = None) -> DataFrame:
    """Cox proportional-hazards regression (Breslow ties), fit
    IN-ENGINE with fixed Newton-Raphson iterations on the partial
    likelihood — the hazard-ratio model that completes the survival
    family (Kaplan-Meier / Nelson-Aalen estimate the curve; Cox
    explains it with covariates).  Cox 1972; Breslow 1974 tie
    approximation (R's ``coxph(..., ties="breslow")``).

    At each distinct duration t with d_t events, risk set R_t =
    {j : t_j >= t} and weights w_j = exp(x_j' beta):

        U_i  = sum_t [ sx_{i,t} - d_t S1_i/S0 ]          (score)
        I_ij = sum_t d_t [ S2_ij/S0 - (S1_i/S0)(S1_j/S0) ]  (info)
        beta <- beta + I^{-1} U

    where S0/S1/S2 are risk-set sums of w, w x, w x x' — all SUFFIX
    sums over the bounded duration grid (one reverse cumulative
    window), never a per-subject risk-set join.  For p <= 3 covariates
    the information inverse is closed-form (scalar / 2x2 / 3x3
    cofactor), so the whole fit stays declarative — grid + broadcast
    only, no collect in the loop.  For p >= 4 the Newton step solves
    the p x p system DRIVER-SIDE with numpy on the collected 1-row
    (U, I) frame — bounded at p^2 doubles per iteration, the same
    driver-fit contract as the k-means/PCA centroid fits; everything
    data-sized stays in-engine.

    `strata_col` (r11): STRATIFIED Cox — each stratum keeps its own
    baseline hazard (risk sets form within the stratum: the duration
    grid, suffix window, and event join key on (stratum, t)) while
    beta stays shared; U and I simply sum over strata, so the Newton
    machinery is untouched.  The classic fix when a nuisance factor
    (site, cohort, device) violates proportional hazards: stratify on
    it instead of modeling it.  R: coxph(... + strata(s)).

    Emits one row per covariate: covariate, n, n_events, beta, se
    (sqrt of the inverse-information diagonal), z, hazard_ratio, and
    score_chi2 — the score test at beta = 0 (U' I^{-1} U from the
    FIRST iteration), which on tie-free data with one binary covariate
    equals the log-rank statistic exactly (the classic identity; see
    tests/test_survival.py).

    Determinism (the oracle contract, the GD-trainer recipe): floor
    grids only (never HALF_UP), per-term round(9) products summed as
    DECIMAL(38,9) (order-free), string-hop decimal->double re-entry,
    and the one transcendental (exp) floor-quantized on the COARSE
    1e-6 grid so a libm ulp cannot flip a boundary.  Rows with a NULL
    duration, event, or covariate are dropped (standard casewise
    deletion).

    Scale (100 TB): subjects persist once; each of the fixed `iters`
    steps is one opaque-key broadcast join vs the 1-row beta table,
    one duration-keyed partial agg onto the bounded grid, one grid
    suffix window, and one 1-row reduce; beta localCheckpoints per
    iteration (plan depth stays constant).  No collect in the loop.
    """
    p = len(covariate_cols)
    if p < 1:
        raise ValueError("cox_ph needs at least one covariate")
    if len(set(covariate_cols)) != p:
        raise ValueError(
            f"duplicate covariates make the information matrix "
            f"singular: {covariate_cols}")
    if p > 3:
        return _cox_ph_wide(df, duration_col, event_col,
                            covariate_cols, iters, strata_col)

    def _f9(c):
        return F.floor(c * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)

    def _f6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    def _dec(c):
        return _f9(c).cast(D389)

    # strata: risk sets form WITHIN each stratum (its own baseline
    # hazard) while beta stays shared — the duration grid, suffix
    # window, and evt join all key on (stratum, t); U and I sum over
    # strata, so everything downstream is unchanged.
    skey = ["st"] if strata_col else []
    scols = ([F.col(strata_col).alias("st")] if strata_col else [])
    xs = [F.col(c).cast("double").alias(f"x{i + 1}")
          for i, c in enumerate(covariate_cols)]
    subj = (df.select(*scols, F.col(duration_col).alias("t"),
                      F.col(event_col).cast("bigint").alias("e"), *xs)
            .na.drop()
            .persist())
    spark = df.sparkSession
    zero = F.lit(0).cast(D389)

    wsuf = Window.partitionBy(*skey).orderBy(F.col("t").desc()) \
        .rowsBetween(Window.unboundedPreceding, 0)
    moments = [(i, j) for i in range(1, p + 1)
               for j in range(i, p + 1)]

    def _ui(bvals, via_window: bool = False):
        """One Newton pass: the 1-row (U_i, I_ij) frame at beta
        `bvals` (plain Python floats, injected as double literals).

        r11 optimization (guide §2.4, remove work per pass): beta is
        held driver-side — p quantized doubles per iteration, the
        established bounded-driver-fit contract (_cox_ph_wide, k-means,
        PCA) — so a pass has NO broadcast beta join and no weight
        checkpoint job; and the beta-independent event sums (d, sx_i)
        plus the subject counts ride the SAME (stratum, t) grid
        aggregation as the weighted moments — no separately
        checkpointed evt/counts frames, no per-pass evt join.  The
        recomputed event sums are decimal (order-free) over the same
        term set, hence bit-identical to the former checkpointed
        frames; literal-vs-column beta feeds the identical IEEE
        multiply.  One pass = one grid shuffle + one suffix window +
        one 1-row reduce.
        """
        eta = _f9(F.col("x1") * F.lit(bvals[0]))
        for i in range(2, p + 1):
            eta = eta + _f9(F.col(f"x{i}") * F.lit(bvals[i - 1]))
        s = subj.withColumn("__w", _f6(F.exp(eta)))
        aggs = [F.sum(_dec(F.col("__w"))).alias("a0")]
        for i in range(1, p + 1):
            aggs.append(F.sum(_dec(F.col("__w") * F.col(f"x{i}")))
                        .alias(f"a{i}"))
        for i, j in moments:
            aggs.append(F.sum(_dec(F.col("__w") * F.col(f"x{i}")
                                   * F.col(f"x{j}")))
                        .alias(f"a{i}{j}"))
        # beta-independent event-side sums (the former evt frame) and
        # counts — same expressions, same groups
        aggs.append(F.sum("e").alias("d"))
        for i in range(1, p + 1):
            aggs.append(
                F.sum(F.when(F.col("e") == 1, _dec(F.col(f"x{i}")))
                      .otherwise(zero)).alias(f"sxd{i}"))
        aggs.append(F.count(F.lit(1)).alias("cnt"))
        # r12 (guide §2.4): coalesce the grid aggregate to ONE
        # partition so the suffix window (SinglePartition for the
        # global case, ClusteredDistribution(st) for the stratified
        # one — both satisfied) runs in the SAME stage instead of
        # paying its own exchange: one exchange per Newton pass, not
        # two.  Scale-safe: the map-side partial aggregation still
        # runs on every core; only the grid-bounded (stratum, t) rows
        # — thousands, data-size-independent — flow into the single
        # final-agg+window task, which is exactly the volume the
        # single-partition window already processed.
        a = s.groupBy(*skey, "t").agg(*aggs).coalesce(1)
        cols = (["a0"] + [f"a{i}" for i in range(1, p + 1)]
                + [f"a{i}{j}" for i, j in moments])
        suf = a.select(
            *skey, "t", "d", "cnt",
            *[_d2d(f"sxd{i}").alias(f"sx{i}") for i in range(1, p + 1)],
            *[F.sum(c).over(wsuf).cast("string").cast("double")
              .alias(f"s{c[1:]}") for c in cols])
        dd = F.col("d").cast("double")
        s0 = F.col("s0")
        sums = []
        for i in range(1, p + 1):
            sums.append((f"ud{i}",
                         _f9(F.col(f"sx{i}") - dd * F.col(f"s{i}") / s0)
                         .cast(D389), None))
        for i, j in moments:
            sums.append((f"id{i}{j}",
                         _f9(dd * (F.col(f"s{i}{j}") / s0
                                   - (F.col(f"s{i}") / s0)
                                   * (F.col(f"s{j}") / s0)))
                         .cast(D389), None))
        sums.append(("__n", F.col("cnt"), "bigint"))
        sums.append(("__ne", F.col("d"), "bigint"))
        if via_window and not skey:
            # the grid already sits in ONE partition for the suffix
            # window — take the 1-row totals as unbounded window sums
            # in the SAME window stage (same sort spec) instead of
            # paying another exchange for a global aggregate.  Decimal
            # sums are order-free, so totals are bit-identical; the
            # frame is EMPTY (not a NULL row) on empty input, which
            # the driver-side loop treats as "guard failed".
            wall = Window.orderBy(F.col("t").desc()).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing)
            wrow = Window.orderBy(F.col("t").desc())
            out = (suf.select(
                *[(F.sum(e).over(wall).cast(cast)
                   if cast else F.sum(e).over(wall)).alias(nm)
                  for nm, e, cast in sums],
                F.row_number().over(wrow).alias("__rn"))
                .filter(F.col("__rn") == 1))
        else:
            out = suf.agg(*[
                (F.sum(e).cast(cast) if cast else F.sum(e)).alias(nm)
                for nm, e, cast in sums])
        return out.select(
            *[_d2d(f"ud{i}").alias(f"u{i}") for i in range(1, p + 1)],
            *[_d2d(f"id{i}{j}").alias(f"i{i}{j}") for i, j in moments],
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n"),
            F.coalesce(F.col("__ne"), F.lit(0)).cast("bigint")
            .alias("n_events"))

    def _cof3():
        """3x3 symmetric cofactors + det, in a FIXED arithmetic order
        mirrored verbatim by the DuckDB oracle (demo/stats_demo.py
        _duck_cox_ctes) so IEEE doubles agree bit-for-bit."""
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
        return det, (c11, c12, c13, c22, c23, c33)

    import math

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
        """Closed-form I^{-1} U from the collected 1-row (U, I) frame
        — the SAME multiply/subtract/divide sequence (and operand
        order) as the oracle's unrolled SQL and the former column
        expressions, in IEEE doubles, so the Newton trajectory is
        bit-identical.  Returns None when the determinant guard fails
        (the column form's when(ok, ...).otherwise(keep-beta))."""
        u = [r[f"u{i}"] for i in range(1, p + 1)]
        ii = {(i, j): r[f"i{i}{j}"] for i, j in moments}
        if any(v is None for v in u) \
                or any(v is None for v in ii.values()):
            return None
        if p == 1:
            i11 = ii[(1, 1)]
            if not _ok(i11):
                return None
            return [u[0] / i11]
        if p == 2:
            i11, i12, i22 = ii[(1, 1)], ii[(1, 2)], ii[(2, 2)]
            det = i11 * i22 - i12 * i12
            if not _ok(det):
                return None
            return [(i22 * u[0] - i12 * u[1]) / det,
                    (i11 * u[1] - i12 * u[0]) / det]
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

    bvals = [0.0] * p
    score_py = None
    for k in range(iters):
        rows_k = _ui(bvals, via_window=True).collect()
        row = rows_k[0] if rows_k else None
        delta = _pydelta(row) if row is not None else None
        if k == 0 and delta is not None:
            # score test at beta = 0: U' I^{-1} U, same term order as
            # the oracle (u1*d1, then + u2*d2, ...)
            sc = row["u1"] * delta[0]
            for i in range(2, p + 1):
                sc = sc + row[f"u{i}"] * delta[i - 1]
            score_py = sc
        if delta is not None:
            bvals = [_pyf9(b + d) for b, d in zip(bvals, delta)]
    # final information at the fitted beta for the SEs.  The 1-row
    # readout is checkpointed BEFORE subj.unpersist so the returned
    # plan never recomputes the subject pipeline (the old p-way union
    # re-planned the final pass per covariate, post-unpersist); the
    # fitted beta and the k=0 score enter as double literals.
    ui = _ui(bvals)
    if p == 1:
        var = [F.lit(1.0) / F.col("i11")]
        okf = F.col("i11") > 0
    elif p == 2:
        det = (F.col("i11") * F.col("i22")
               - F.col("i12") * F.col("i12"))
        var = [F.col("i22") / det, F.col("i11") / det]
        okf = det > 0
    else:
        det, (c11, _c12, _c13, c22, _c23, c33) = _cof3()
        var = [c11 / det, c22 / det, c33 / det]
        okf = det > 0
    one = (ui.select(
        "*",
        *[F.lit(bvals[i - 1]).alias(f"b{i}") for i in range(1, p + 1)],
        F.lit(score_py).cast("double").alias("score_chi2"))
        .localCheckpoint(eager=True))
    subj.unpersist()
    # one row per covariate via a single explode — not a p-way union
    structs = []
    for i in range(1, p + 1):
        se = F.when(okf, F.sqrt(var[i - 1]))
        structs.append(F.struct(
            F.lit(covariate_cols[i - 1]).alias("covariate"),
            F.round(F.col(f"b{i}"), 6).alias("beta"),
            F.round(se, 6).alias("se"),
            F.round(F.col(f"b{i}") / se, 6).alias("z"),
            F.round(F.exp(F.col(f"b{i}")), 6).alias("hazard_ratio")))
    return (one.select("n", "n_events",
                       F.round(F.col("score_chi2"), 6)
                       .alias("score_chi2"),
                       F.explode(F.array(*structs)).alias("__r"))
            .select(F.col("__r.covariate").alias("covariate"),
                    "n", "n_events",
                    F.col("__r.beta").alias("beta"),
                    F.col("__r.se").alias("se"),
                    F.col("__r.z").alias("z"),
                    F.col("__r.hazard_ratio").alias("hazard_ratio"),
                    "score_chi2"))


def _cox_ph_wide(df: DataFrame, duration_col: str, event_col: str,
                 covariate_cols: list[str], iters: int,
                 strata_col: str | None = None) -> DataFrame:
    """Cox PH for p >= 4 covariates: the SAME Breslow suffix-sum grid
    machinery as cox_ph, but each Newton step collects the 1-row
    (U, I) frame — p + p(p+1)/2 doubles, data-size-independent — and
    solves the p x p system driver-side with numpy (Cholesky guard for
    positive-definiteness, mirroring the det > 0 guard of the
    declarative path).  Beta lives as plain Python floats quantized on
    the same 1e-9 floor grid, broadcast into the plan as literals, so
    no beta join is needed at all.

    Scale (100 TB): per iteration one duration-keyed partial agg onto
    the bounded grid + one grid suffix window + one 1-row collect;
    subjects persist once.  The driver holds O(p^2) doubles — the
    k-means/PCA driver-fit contract, never data-sized.
    """
    import math

    import numpy as np

    p = len(covariate_cols)

    def _f9(c):
        return F.floor(c * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)

    def _f6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    def _dec(c):
        return _f9(c).cast(D389)

    def _pyf9(x: float) -> float:
        return math.floor(x * 1e9 + 0.5) / 1e9

    skey = ["st"] if strata_col else []
    scols = ([F.col(strata_col).alias("st")] if strata_col else [])
    xs = [F.col(c).cast("double").alias(f"x{i + 1}")
          for i, c in enumerate(covariate_cols)]
    subj = (df.select(*scols, F.col(duration_col).alias("t"),
                      F.col(event_col).cast("bigint").alias("e"), *xs)
            .na.drop()
            .persist())
    zero = F.lit(0).cast(D389)
    evt_aggs = [F.sum("e").alias("d")]
    for i in range(1, p + 1):
        evt_aggs.append(
            F.sum(F.when(F.col("e") == 1, _dec(F.col(f"x{i}")))
                  .otherwise(zero)).alias(f"sxd{i}"))
    evt = subj.groupBy(*skey, "t").agg(*evt_aggs)
    evt = evt.select(
        *skey, "t", "d", *[_d2d(f"sxd{i}").alias(f"sx{i}")
                    for i in range(1, p + 1)]).localCheckpoint(eager=True)
    cnt = subj.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("e").cast("bigint").alias("n_events")).collect()[0]
    wsuf = Window.partitionBy(*skey).orderBy(F.col("t").desc()) \
        .rowsBetween(Window.unboundedPreceding, 0)
    moments = [(i, j) for i in range(1, p + 1)
               for j in range(i, p + 1)]

    def _ui_vals(bvals: list[float]):
        """One grid pass at beta = bvals -> (U vector, I matrix)."""
        eta = _f9(F.col("x1") * F.lit(bvals[0]))
        for i in range(2, p + 1):
            eta = eta + _f9(F.col(f"x{i}") * F.lit(bvals[i - 1]))
        s = subj.withColumn("__w", _f6(F.exp(eta)))
        aggs = [F.sum(_dec(F.col("__w"))).alias("a0")]
        for i in range(1, p + 1):
            aggs.append(F.sum(_dec(F.col("__w") * F.col(f"x{i}")))
                        .alias(f"a{i}"))
        for i, j in moments:
            aggs.append(F.sum(_dec(F.col("__w") * F.col(f"x{i}")
                                   * F.col(f"x{j}")))
                        .alias(f"a{i}{j}"))
        # coalesce(1): the suffix window shares the grid aggregate's
        # stage (see cox_ph._ui) — grid-bounded rows, map-side partial
        # aggregation still parallel
        a = s.groupBy(*skey, "t").agg(*aggs).coalesce(1)
        cols = (["a0"] + [f"a{i}" for i in range(1, p + 1)]
                + [f"a{i}{j}" for i, j in moments])
        suf = a.select(*skey, "t", *[
            F.sum(c).over(wsuf).cast("string").cast("double")
            .alias(f"s{c[1:]}") for c in cols])
        j2 = evt.join(suf, skey + ["t"])
        dd = F.col("d").cast("double")
        s0 = F.col("s0")
        terms = []
        for i in range(1, p + 1):
            terms.append(F.sum(
                _f9(F.col(f"sx{i}") - dd * F.col(f"s{i}") / s0)
                .cast(D389)).alias(f"ud{i}"))
        for i, j in moments:
            terms.append(F.sum(
                _f9(dd * (F.col(f"s{i}{j}") / s0
                          - (F.col(f"s{i}") / s0)
                          * (F.col(f"s{j}") / s0)))
                .cast(D389)).alias(f"id{i}{j}"))
        row = j2.agg(*terms).select(
            *[_d2d(f"ud{i}").alias(f"u{i}") for i in range(1, p + 1)],
            *[_d2d(f"id{i}{j}").alias(f"i{i}{j}")
              for i, j in moments]).collect()[0]
        u = np.array([row[f"u{i}"] for i in range(1, p + 1)])
        info = np.zeros((p, p))
        for i, j in moments:
            info[i - 1, j - 1] = info[j - 1, i - 1] = row[f"i{i}{j}"]
        return u, info

    def _solve(info: np.ndarray, u: np.ndarray):
        """Cholesky-guarded solve: None when I is not PD (the wide-
        model analogue of the det > 0 guard)."""
        try:
            ch = np.linalg.cholesky(info)
        except np.linalg.LinAlgError:
            return None
        y = np.linalg.solve(ch, u)
        return np.linalg.solve(ch.T, y)

    beta = [0.0] * p
    score_chi2 = None
    for k in range(iters):
        u, info = _ui_vals(beta)
        delta = _solve(info, u)
        if k == 0 and delta is not None:
            score_chi2 = round(float(u @ delta), 6)
        if delta is None:
            break
        beta = [_pyf9(b + float(d)) for b, d in zip(beta, delta)]
    _u, info = _ui_vals(beta)
    subj.unpersist()
    try:
        cov = np.linalg.inv(info)
        np.linalg.cholesky(info)  # PD gate for the SEs
        ses = [math.sqrt(cov[i, i]) for i in range(p)]
    except np.linalg.LinAlgError:
        ses = [None] * p
    rows = []
    for i, name in enumerate(covariate_cols):
        se = ses[i]
        rows.append((
            name, int(cnt["n"]), int(cnt["n_events"]),
            round(beta[i], 6),
            round(se, 6) if se is not None else None,
            round(beta[i] / se, 6) if se else None,
            round(math.exp(beta[i]), 6),
            score_chi2))
    return df.sparkSession.createDataFrame(
        rows, "covariate string, n bigint, n_events bigint, "
              "beta double, se double, z double, "
              "hazard_ratio double, score_chi2 double")


def rmst(df: DataFrame, duration_col: str, event_col: str,
         tau: float) -> DataFrame:
    """Restricted Mean Survival Time: the area under the Kaplan-Meier
    curve up to the horizon tau — "expected survival time within the
    first tau units", the model-free effect measure the survival
    literature recommends when proportional hazards fails (so it pairs
    with cox_ph exactly the way a robustness check should).

    RMST = integral_0^tau S(t) dt over the KM step function: segment
    sums S(t_i) * (min(t_{i+1}, tau) - min(t_i, tau)) plus the leading
    1.0 * min(t_1, tau) segment.  Returns ONE row: n, n_events, tau,
    rmst, and km_at_tau (the curve value at the horizon).

    Scale: the kaplan_meier bounded duration-grid walk + one lead()
    window + one grid reduce; segment terms ride round(9)->DECIMAL
    sums (order-free).
    """
    ev = F.col(event_col).cast("bigint")
    grid = (df.groupBy(F.col(duration_col).alias("t"))
              .agg(F.sum(ev).alias("d"),
                   F.sum(F.lit(1) - ev).alias("c"))
              .coalesce(1))
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    word = Window.orderBy("t")
    g = (grid.withColumn("total", F.sum(F.col("d") + F.col("c"))
                         .over(_grid()))
             .withColumn("seen", F.sum(F.col("d") + F.col("c"))
                         .over(wcum)))
    g = g.withColumn("n_risk",
                     F.col("total") - F.col("seen")
                     + F.col("d") + F.col("c"))
    dead_all = F.col("d") >= F.col("n_risk")
    term = F.when(F.col("d") > 0,
                  _qterm(F.log(F.lit(1.0)
                               - F.col("d").cast("double")
                               / F.col("n_risk")))) \
        .otherwise(F.lit(0).cast(D389))
    g = (g.withColumn("__t", F.when(dead_all, F.lit(None))
                      .otherwise(term))
          .withColumn("__anydead", F.max(dead_all.cast("int"))
                      .over(wcum))
          .withColumn("__cum", F.sum("__t").over(wcum)))
    surv = F.when(F.col("__anydead") == 1, F.lit(0.0)) \
        .otherwise(F.exp(_d2d("__cum")))
    tt = F.col("t").cast("double")
    nxt = F.lead(tt).over(word)
    # segment [t_i, t_{i+1}) carries S(t_i); the last grid row's
    # segment extends to tau (S is flat beyond the last observation)
    seg_end = F.least(F.coalesce(nxt, F.lit(float(tau))),
                      F.lit(float(tau)))
    seg = _qterm(surv * F.greatest(seg_end - F.least(tt,
                                                     F.lit(float(tau))),
                                   F.lit(0.0)))
    first_t = F.min(tt).over(_grid())
    head = _qterm(F.least(first_t, F.lit(float(tau))))
    km_tau = F.when(tt <= float(tau), F.round(surv, 6))
    agg = (g.withColumn("__seg", seg).withColumn("__head", head)
           .withColumn("__ktau", km_tau)
           .agg(F.sum(F.col("d") + F.col("c")).cast("bigint")
                .alias("n"),
                F.sum("d").cast("bigint").alias("n_events"),
                F.sum("__seg").alias("__area"),
                F.max("__head").alias("__h"),
                F.min("__ktau").alias("km_at_tau")))
    return agg.select(
        "n", "n_events", F.lit(float(tau)).alias("tau"),
        F.round(_d2d("__area") + _d2d("__h"), 6).alias("rmst"),
        F.coalesce("km_at_tau", F.lit(1.0)).alias("km_at_tau"))


def cox_schoenfeld_trend(df: DataFrame, duration_col: str,
                         event_col: str, covariate_col: str,
                         beta: float) -> DataFrame:
    """Proportional-hazards diagnostic for a fitted single-covariate
    Cox model: the Schoenfeld residual at each event time,

        r_t = sx_t - d_t * S1(t) / S0(t)     (at the FITTED beta),

    and its Pearson correlation with time — the Grambsch-Therneau
    cox.zph intuition (a PH-violating covariate's effect drifts, so
    its residuals trend in time; near-zero correlation = PH holds).
    Emits ONE row: n_event_times, corr (residual vs t), slope (OLS of
    residual on t), and mean_residual (should be ~0 at the MLE).

    Scale: one pass of the cox_ph iteration machinery at a FIXED beta
    (one broadcast-free projection — beta is a literal — one duration-
    grid aggregate, one suffix window, one grid reduce of the
    correlation moments via round(9)->DECIMAL terms).
    """

    def _f9(c):
        return F.floor(c * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)

    def _f6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    def _dec9(c):
        return _f9(c).cast(D389)

    subj = (df.select(F.col(duration_col).alias("t"),
                      F.col(event_col).cast("bigint").alias("e"),
                      F.col(covariate_col).cast("double").alias("x"))
            .na.drop())
    zero = F.lit(0).cast(D389)
    w = _f6(F.exp(_f9(F.col("x") * F.lit(float(beta)))))
    a = (subj.withColumn("__w", w)
         .groupBy("t")
         .agg(F.sum("e").alias("d"),
              F.sum(F.when(F.col("e") == 1, _dec9(F.col("x")))
                    .otherwise(zero)).alias("sxd"),
              F.sum(_dec9(F.col("__w"))).alias("a0"),
              F.sum(_dec9(F.col("__w") * F.col("x"))).alias("a1")))
    wsuf = Window.orderBy(F.col("t").desc()) \
        .rowsBetween(Window.unboundedPreceding, 0)
    s = a.select(
        "t", "d", _d2d("sxd").alias("sx"),
        F.sum("a0").over(wsuf).cast("string").cast("double")
        .alias("s0"),
        F.sum("a1").over(wsuf).cast("string").cast("double")
        .alias("s1"))
    ev = s.filter(F.col("d") > 0)
    r = F.col("sx") - F.col("d").cast("double") * F.col("s1") \
        / F.col("s0")
    tt = F.col("t").cast("double")
    m = ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(_dec9(r)).alias("sr"),
        F.sum(_dec9(tt)).alias("st"),
        F.sum(_dec9(r * tt)).alias("srt"),
        F.sum(_dec9(r * r)).alias("srr"),
        F.sum(_dec9(tt * tt)).alias("stt"))
    kk = F.col("k").cast("double")
    sr, st = _d2d("sr"), _d2d("st")
    srt, srr, stt = _d2d("srt"), _d2d("srr"), _d2d("stt")
    cov = srt - sr * st / kk
    vr = srr - sr * sr / kk
    vt = stt - st * st / kk
    corr = F.when((vr > 0) & (vt > 0), cov / F.sqrt(vr * vt))
    slope = F.when(vt > 0, cov / vt)
    return m.select(
        F.col("k").alias("n_event_times"),
        F.round(corr, 6).alias("corr"),
        F.round(slope, 6).alias("slope"),
        F.round(sr / kk, 6).alias("mean_residual"))


def competing_risks_cif(df: DataFrame, duration_col: str,
                        event_col: str) -> DataFrame:
    """Aalen-Johansen cumulative incidence functions under COMPETING
    RISKS — when a subject can exit for more than one reason (churn to
    competitor vs churn to inactivity; purchase vs account close), the
    per-cause 1 - KM curve OVERSTATES every cause (it treats the
    others as censoring); the CIF is the honest per-cause probability:

        CIF_k(t) = sum_{t_j <= t} S(t_j-) * d_kj / n_j

    with S the ALL-CAUSE Kaplan-Meier (so sum_k CIF_k = 1 - S).
    `event_col` is 0 for censored, else the cause label.  Returns one
    row per (duration, cause): n_risk, n_events, s_before (S(t-)),
    and the cif.

    Scale: the kaplan_meier bounded duration-grid walk (all-cause),
    one extra (duration, cause) grid for per-cause event counts, and
    per-cause cumulative windows of round(9)->DECIMAL terms.
    """
    ev = F.col(event_col)
    base = df.select(F.col(duration_col).alias("t"),
                     ev.alias("cause"))
    grid = (base.groupBy("t")
            .agg(F.sum(F.when(F.col("cause") != 0, 1).otherwise(0))
                 .alias("d"),
                 F.sum(F.when(F.col("cause") == 0, 1).otherwise(0))
                 .alias("c")))
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    g = (grid.withColumn("total", F.sum(F.col("d") + F.col("c"))
                         .over(_grid()))
             .withColumn("seen", F.sum(F.col("d") + F.col("c"))
                         .over(wcum)))
    g = g.withColumn("n_risk",
                     F.col("total") - F.col("seen")
                     + F.col("d") + F.col("c"))
    dead_all = F.col("d") >= F.col("n_risk")
    term = F.when(F.col("d") > 0,
                  _qterm(F.log(F.lit(1.0)
                               - F.col("d").cast("double")
                               / F.col("n_risk")))) \
        .otherwise(F.lit(0).cast(D389))
    g = (g.withColumn("__t", F.when(dead_all, F.lit(None))
                      .otherwise(term))
          .withColumn("__anydead", F.max(dead_all.cast("int"))
                      .over(wcum))
          .withColumn("__cum", F.sum("__t").over(wcum)))
    # S(t-): the product-limit BEFORE this row's events — lag of the
    # cumulative walk (1.0 at the first grid row)
    word = Window.orderBy("t")
    s_before = F.when(
        F.coalesce(F.lag("__anydead").over(word), F.lit(0)) == 1,
        F.lit(0.0)).otherwise(
        F.exp(F.coalesce(_d2d(F.lag("__cum").over(word)), F.lit(0.0))))
    g = g.withColumn("__sb", s_before)
    # per-cause event counts join the walk on the duration
    causes = (base.filter(F.col("cause") != 0)
              .groupBy("t", "cause")
              .agg(F.count(F.lit(1)).alias("dk")))
    j = causes.join(g.select("t", "n_risk", "__sb"), "t")
    cif_t = _qterm(F.col("__sb") * F.col("dk").cast("double")
                   / F.col("n_risk").cast("double"))
    wk = (Window.partitionBy("cause").orderBy("t")
          .rowsBetween(Window.unboundedPreceding, 0))
    j = j.withColumn("__cif", F.sum(cif_t).over(wk))
    return j.select(
        F.col("t").alias(duration_col), "cause",
        F.col("n_risk"),
        F.col("dk").cast("bigint").alias("n_events"),
        F.round(F.col("__sb"), 6).alias("s_before"),
        F.round(_d2d("__cif"), 6).alias("cif"))


def logrank_k_sample(df: DataFrame, group_col: str, duration_col: str,
                     event_col: str, groups: list) -> DataFrame:
    """k-SAMPLE log-rank test (the k-group generalization of
    logrank_test): do ALL k groups share one survival curve?  Full
    Mantel-Haenszel machinery — per event time the observed vs
    hypergeometric-expected event split and the (k-1)x(k-1) covariance

        V_gh = sum_t c_t [ delta_gh f_g - f_g f_h ],
        c_t  = d_t (n_t - d_t)/(n_t - 1),   f_g = n_gt / n_t

    with chi2 = u' V^{-1} u over the first k-1 groups (df = k-1) —
    NOT the O-E^2/E approximation.  k = 3 keeps the inverse a
    closed-form 2x2 (fully declarative, hash-exact oracle); k > 3
    solves the (k-1)x(k-1) system driver-side with numpy on the
    collected covariance (k^2 doubles — the cox wide-model contract).

    Emits one row per group: group, n_subjects, n_events, expected
    (round 6), with the table-wide chi2 / df / significant_95 on
    every row (the calibration-ece convention).

    Scale: one aggregate onto the (duration, group) grid, per-group
    cumulative windows for at-risk counts, one bounded t-keyed grid
    self-join for the covariance pairs — never a per-subject join.
    """
    k = len(groups)
    if k < 3:
        raise ValueError(
            "use logrank_test for 2 groups; k-sample needs k >= 3")
    if len(set(groups)) != k:
        raise ValueError(f"duplicate groups: {groups}")
    ev = F.col(event_col).cast("bigint")
    sparse = (df.filter(F.col(group_col).isin(*groups))
              .groupBy(F.col(duration_col).alias("t"),
                      F.col(group_col).alias("g"))
              .agg(F.sum(ev).alias("d"),
                   F.count(F.lit(1)).cast("bigint").alias("x")))
    # DENSE (t x group) spine: a group with no exits at t must still
    # contribute its at-risk count to n_t — the sparse grid would
    # silently drop it from the hypergeometric denominator (caught by
    # the python reference during r11 bring-up)
    ts = sparse.select("t").distinct()
    gs = sparse.select("g").distinct()
    # opaque-constant-key broadcast hash join, NEVER crossJoin: a raw
    # crossJoin(broadcast(gs)) plans a BroadcastNestedLoopJoin and
    # trips the blanket plan guard (coalesce keeps a NULL duration row
    # in the spine, matching crossJoin semantics)
    grid = (ts.withColumn(
        "__k", F.pmod(F.abs(F.coalesce(F.xxhash64("t"), F.lit(1))),
                      F.lit(1)))
            .join(F.broadcast(gs.withColumn(
                "__k", F.pmod(F.abs(F.coalesce(F.xxhash64("g"),
                                               F.lit(1))), F.lit(1)))),
                  "__k")
            .drop("__k")
            .join(sparse, ["t", "g"], "left")
            .fillna(0, ["d", "x"]))
    wg = Window.partitionBy("g")
    wcum = Window.partitionBy("g").orderBy("t") \
        .rowsBetween(Window.unboundedPreceding, 0)
    g2 = (grid.withColumn("tot", F.sum("x").over(wg))
              .withColumn("seen", F.sum("x").over(wcum)))
    nrisk = F.col("tot") - F.col("seen") + F.col("x")
    g2 = g2.select("t", "g", "d", "x", "tot", nrisk.alias("nr"))
    wt = Window.partitionBy("t")
    g3 = (g2.withColumn("nt", F.sum("nr").over(wt))
            .withColumn("dt", F.sum("d").over(wt)))
    nt = F.col("nt").cast("double")
    dt = F.col("dt").cast("double")
    frac = F.col("nr").cast("double") / nt
    ct = F.when((F.col("dt") > 0) & (F.col("nt") > 1),
                dt * (nt - dt) / (nt - 1.0)).otherwise(F.lit(0.0))
    g3 = g3.select("t", "g", "d", "x", "tot", "nr",
                   frac.alias("f"), ct.alias("c"))
    # per-group O / E
    e_term = F.when(F.col("dt2") > 0,
                    _qterm(F.col("dt2").cast("double") * F.col("f"))) \
        .otherwise(F.lit(0).cast(D389))
    g3e = g3.withColumn("dt2", F.sum("d").over(wt))
    oe = (g3e.withColumn("__e", e_term)
          .groupBy("g")
          .agg(F.max("tot").cast("bigint").alias("n_subjects"),
               F.sum("d").cast("bigint").alias("n_events"),
               F.sum("__e").alias("__ed")))
    oe = oe.select("g", "n_subjects", "n_events",
                   _d2d("__ed").alias("expected"))
    # covariance pairs on the t-keyed grid self-join
    a = g3.select("t", F.col("g").alias("ga"),
                  F.col("f").alias("fa"), "c")
    b = g3.select("t", F.col("g").alias("gb"), F.col("f").alias("fb"))
    vterm = F.when(
        F.col("ga") == F.col("gb"),
        _qterm(F.col("c") * (F.col("fa")
                             - F.col("fa") * F.col("fb")))) \
        .otherwise(_qterm(-(F.col("c") * F.col("fa") * F.col("fb"))))
    vv = (a.join(b, "t")
          .groupBy("ga", "gb")
          .agg(F.sum(vterm).alias("__v")))
    vv = vv.select("ga", "gb", _d2d("__v").alias("v"))
    ordered = sorted(groups, key=str)
    lead = ordered[:-1]  # first k-1 groups span the statistic

    def _pick(frame, gcol, vcol, cond):
        return F.max(F.when(cond, F.col(vcol)))

    if k == 3:
        g1, gx2 = lead
        one = vv.agg(
            _pick(vv, "ga", "v",
                  (F.col("ga") == g1) & (F.col("gb") == g1))
            .alias("v11"),
            _pick(vv, "ga", "v",
                  (F.col("ga") == g1) & (F.col("gb") == gx2))
            .alias("v12"),
            _pick(vv, "ga", "v",
                  (F.col("ga") == gx2) & (F.col("gb") == gx2))
            .alias("v22"))
        ue = oe.agg(
            F.max(F.when(F.col("g") == g1,
                         F.col("n_events").cast("double")
                         - F.col("expected"))).alias("u1"),
            F.max(F.when(F.col("g") == gx2,
                         F.col("n_events").cast("double")
                         - F.col("expected"))).alias("u2"))
        one = one.withColumn(
            "__k", F.pmod(F.abs(F.coalesce(F.xxhash64("v11"),
                                           F.lit(1))), F.lit(1))) \
            .join(F.broadcast(ue.withColumn(
                "__k", F.pmod(F.abs(F.coalesce(F.xxhash64("u1"),
                                               F.lit(1))),
                              F.lit(1)))), "__k")
        det = (F.col("v11") * F.col("v22")
               - F.col("v12") * F.col("v12"))
        u1, u2 = F.col("u1"), F.col("u2")
        chi2 = F.when(det > 0,
                      (F.col("v22") * u1 * u1
                       - F.lit(2.0) * F.col("v12") * u1 * u2
                       + F.col("v11") * u2 * u2) / det)
        stat = one.select(chi2.alias("chi2"))
    else:
        import numpy as np

        vmap = {(r.ga, r.gb): r.v for r in vv.collect()}
        uvec = {r.g: float(r.n_events) - r.expected
                for r in oe.collect()}
        m = len(lead)
        V = np.zeros((m, m))
        for i, gi in enumerate(lead):
            for j, gj in enumerate(lead):
                V[i, j] = vmap.get((gi, gj), 0.0)
        u = np.array([uvec[gi] for gi in lead])
        try:
            np.linalg.cholesky(V)
            c2 = float(u @ np.linalg.solve(V, u))
        except np.linalg.LinAlgError:
            c2 = None
        stat = df.sparkSession.createDataFrame(
            [(c2,)], "chi2 double")
    crit = {2: 5.991465, 3: 7.814728, 4: 9.487729,
            5: 11.070498, 6: 12.591587}.get(k - 1, 0.0)
    joined = (oe.withColumn(
        "__k", F.pmod(F.abs(F.coalesce(F.xxhash64("expected"),
                                       F.lit(1))), F.lit(1)))
        .join(F.broadcast(stat.withColumn(
            "__k", F.pmod(F.abs(F.coalesce(F.xxhash64("chi2"),
                                           F.lit(1))), F.lit(1)))),
            "__k"))
    return joined.select(
        F.col("g").alias(group_col), "n_subjects", "n_events",
        F.round(F.col("expected"), 6).alias("expected"),
        F.round(F.col("chi2"), 6).alias("chi2"),
        F.lit(k - 1).cast("bigint").alias("df"),
        F.coalesce(F.col("chi2") > crit, F.lit(False))
         .alias("significant_95"))
