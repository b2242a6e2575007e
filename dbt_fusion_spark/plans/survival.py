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

from dbt_fusion_spark.plans.stats import _d2d, _grid, _qterm


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
