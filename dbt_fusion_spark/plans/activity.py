"""Rolling active users (DAU/WAU/MAU) without distinct-over-window.

The naive formulation — COUNT(DISTINCT user) OVER (RANGE 27 PRECEDING)
— is unavailable in Spark and quadratic anywhere (every user-day joins
into up to W window evaluations). This operator computes the exact
same numbers with a sweep line:

1. dedupe to (user, active_day) — one shuffle;
2. per user (one ordered window, key-partitioned), each active day `a`
   contributes the coverage interval [a, min(next_active, a+W) - 1]:
   consecutive-day coverage chains into disjoint, contiguous
   intervals, so no interval-merge loop is needed — a single lead();
3. intervals become +1/-1 deltas, aggregated per day (second shuffle,
   delta table is at most 2 rows per user-day);
4. a running sum over the *calendar spine* turns deltas into per-day
   active counts. That final window is global-ordered but runs over
   one row per DAY — thousands of rows after petabytes of input, the
   one place a single-partition window is genuinely bounded.

Exact, deterministic, and the per-user state never materializes a
window of users — the 100 TB shape for stickiness metrics
(DAU/MAU = two calls joined on day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rolling_active_users(df: DataFrame, user_col: str, time_col: str,
                         window_days: int = 28) -> DataFrame:
    """(day, n_active) for every calendar day in the data's span:
    n_active = exact count of users with >=1 event in the trailing
    `window_days` ending at that day (inclusive)."""
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    active = (df.select(F.col(user_col).alias("u"),
                        F.to_date(F.date_trunc("day", time_col))
                         .alias("d"))
                .distinct())
    w = Window.partitionBy("u").orderBy("d")
    nxt = F.lead("d").over(w)
    cover_end = F.least(
        F.coalesce(nxt, F.date_add(F.col("d"), window_days)),
        F.date_add(F.col("d"), window_days))
    ivals = active.select("d", cover_end.alias("e"))
    deltas = (ivals.select(F.col("d").alias("day"),
                           F.lit(1).alias("delta"))
              .unionByName(ivals.select(F.col("e").alias("day"),
                                        F.lit(-1).alias("delta")))
              .groupBy("day").agg(F.sum("delta").alias("delta")))
    bounds = active.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi",
                             F.expr("interval 1 day"))).alias("day"))
    run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (spine.join(deltas, "day", "left")
            .select("day", F.coalesce("delta", F.lit(0)).alias("delta"))
            .select("day",
                    F.sum("delta").over(run).cast("bigint")
                     .alias("n_active")))
