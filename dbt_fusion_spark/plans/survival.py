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
    grid = (df.groupBy(F.col(duration_col).alias("t"))
              .agg(F.sum(ev).alias("d"),
                   F.sum(F.lit(1) - ev).alias("c")))
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
                   F.sum(F.when(~ga, 1).otherwise(0)).alias("xb")))
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
                   F.sum(F.lit(1) - ev).alias("c")))
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
