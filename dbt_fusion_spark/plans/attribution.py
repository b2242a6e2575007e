"""Multi-touch attribution — credit conversions to preceding touches.

Marketing/product analytics primitive the reference's warehouse users
build by hand (dbt attribution packages compile to exactly this SQL
shape; cf. the cross-db macro surface SURVEY §2.4 — this is the same
"macro compiles to one window-over-join" philosophy, Spark-native).

Given a stream of *touch* events (impressions, clicks) and a stream of
*conversion* events (purchases) for the same users, assign each
conversion's value to the touches that preceded it inside a lookback
window, under the standard models:

- ``first_touch`` / ``last_touch``: all value to the earliest/latest
  qualifying touch
- ``linear``: value split evenly across the n qualifying touches
- ``position_based`` (U-shaped 40/20/40): 40% to the first, 40% to the
  last, the remaining 20% split across the middle touches (n=1 takes
  100%, n=2 splits 50/50)

Scale shape (100 TB contract):
- ONE equi-join on the user key (both sides hash-partitioned on it);
  the time predicate is a post-join filter, so there is no range-join
  blowup and no cross product. Per-user touch x conversion fan-out is
  bounded by the lookback window.
- per-conversion ranks/counts are windows partitioned by
  (user, conversion id) — millions of small windows, never a global
  sort. Partitioning includes the user key so conversion ids only need
  to be unique *per user* (the common event-log shape where conv ids
  are per-user sequence numbers); globally unique ids work unchanged.
- deterministic: ties on touch time break on the touch id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MODELS = ("first_touch", "last_touch", "linear", "position_based",
          "time_decay")


def attribute_conversions(touches: DataFrame, conversions: DataFrame,
                          user_col: str, time_col: str,
                          touch_id_col: str, conv_id_col: str,
                          value_col: str,
                          lookback: str | None = "7 days",
                          decay_half_life_s: float = 86400.0) -> DataFrame:
    """One row per (conversion, qualifying touch) with a credit column
    for every model in MODELS (``credit_first_touch``, ...).

    ``time_decay``: credit proportional to 2^(-age/half_life) where age
    is the touch-to-conversion delay — recent touches dominate, with
    weights normalized per conversion so credit still sums to value.

    `touches` must carry (user_col, time_col, touch_id_col); extra
    columns pass through. `conversions` must carry (user_col, time_col,
    conv_id_col, value_col). Conversions with zero qualifying touches
    produce no rows (join is inner; count them upstream if needed).
    """
    t_ts, c_ts = "__touch_ts", "__conv_ts"
    t = touches.withColumnRenamed(time_col, t_ts)
    c = (conversions
         .select(user_col, F.col(time_col).alias(c_ts),
                 conv_id_col, value_col))
    cond = (t[user_col] == c[user_col]) & (F.col(t_ts) <= F.col(c_ts))
    if lookback is not None:
        cond = cond & (F.col(t_ts) > F.col(c_ts) - F.expr(f"interval {lookback}"))
    joined = t.join(c, cond, "inner").drop(c[user_col])

    # (user, conv_id) so per-user-unique conversion ids don't pool
    # touches from different users into one credit window
    w = Window.partitionBy(user_col, conv_id_col)
    wo = w.orderBy(t_ts, touch_id_col)
    n = F.count(F.lit(1)).over(w)
    rk = F.row_number().over(wo)
    v = F.col(value_col)
    first = F.when(rk == 1, v).otherwise(F.lit(0.0))
    last = F.when(rk == n, v).otherwise(F.lit(0.0))
    linear = v / n
    position = (
        F.when(n == 1, v)
        .when(n == 2, v * 0.5)
        .when(rk == 1, v * 0.4)
        .when(rk == n, v * 0.4)
        .otherwise(v * 0.2 / (n - 2))
    )
    # exponential decay on touch age; epoch-microsecond arithmetic so
    # the age is an exact integer on any engine
    age_s = ((F.unix_micros(F.col(c_ts).cast("timestamp"))
              - F.unix_micros(F.col(t_ts).cast("timestamp")))
             / F.lit(1e6))
    decay_w = F.pow(F.lit(2.0), -age_s / F.lit(float(decay_half_life_s)))
    decay = v * decay_w / F.sum(decay_w).over(w)
    return (joined
            .withColumn("n_touches", n)
            .withColumn("touch_rank", rk)
            .withColumn("credit_first_touch", first)
            .withColumn("credit_last_touch", last)
            .withColumn("credit_linear", linear)
            .withColumn("credit_position_based", position)
            .withColumn("credit_time_decay", decay)
            .withColumnRenamed(t_ts, time_col)
            .drop(c_ts))
