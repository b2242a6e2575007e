"""Time-series gap filling — the hypertable rollup primitive.

Timescale's `time_bucket_gapfill` / InfluxDB `fill()` have no Spark
equivalent: a grouped rollup silently OMITS empty buckets, so
downstream window math (moving averages, deltas, charts) sees an
irregular series. This operator completes each key's series over its
own [min, max] bucket span and fills the introduced nulls.

Scale shape (100 TB contract):
- the spine is generated per key from a 2-column bounds aggregate
  (min/max bucket) — sequence + explode is a Generate, never a
  driver-side loop or a cross join against a global calendar.
- the fill is a per-key ordered window (hash-partitioned on the key,
  running frame) — no global sort, no single-partition WindowExec.
- join back to observations is an equi-join on (key, bucket), both
  sides already partitioned by it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def gapfill(df: DataFrame, key_col: str, bucket_col: str, val_col: str,
            step: str = "1 day", method: str = "locf") -> DataFrame:
    """Complete each key's bucket series and fill missing values.

    `df` holds one row per (key, bucket) with possibly-missing buckets
    (the output of a rollup). Returns one row per (key, every bucket in
    the key's span) with:
      - `<val_col>`: observed value, or the filled value in gaps
      - `is_gap`: True where the bucket was absent from the input

    method: 'locf' (last observation carried forward; leading gaps stay
    NULL), 'zero' (fill 0), or 'null' (spine only, no fill).
    """
    key, bucket = F.col(key_col), F.col(bucket_col)
    bounds = df.groupBy(key_col).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi"))
    spine = bounds.select(
        key_col,
        F.explode(F.sequence("__lo", "__hi",
                             F.expr(f"interval {step}"))).alias(bucket_col),
    )
    joined = spine.join(df.select(key_col, bucket_col, val_col),
                        [key_col, bucket_col], "left")
    observed = F.col(val_col)
    if method == "locf":
        w = (Window.partitionBy(key_col).orderBy(bucket_col)
             .rowsBetween(Window.unboundedPreceding, 0))
        filled: Column = F.last(val_col, ignorenulls=True).over(w)
    elif method == "zero":
        filled = F.coalesce(observed, F.lit(0).cast("double"))
    elif method == "null":
        filled = observed
    else:
        raise ValueError(f"unknown gapfill method {method!r}")
    return joined.select(
        key_col, bucket_col,
        filled.alias(val_col),
        observed.isNull().alias("is_gap"),
    )


def time_weighted_average(df: DataFrame, key_col: str, time_col: str,
                          val_col: str, bucket: str = "day") -> DataFrame:
    """Time-weighted average per (key, bucket) over irregular samples —
    the TWAP primitive (each observation holds its value until the next
    one, the last until bucket end; the lead-in before the first sample
    carries no weight).

    twap = sum(value_i * dur_i) / sum(dur_i), dur_i in exact
    microseconds, so a value sampled for 23 hours dominates one sampled
    for a minute — a plain AVG over irregular ticks is wrong exactly
    when sampling is bursty.

    Scale shape: one (key, bucket)-partitioned lead() window + one
    aggregate on the same key — both ride a single hash exchange.
    Weighted sums go through exact integer-microsecond durations and
    DECIMAL accumulation, so results reproduce on any engine.
    """
    b = F.date_trunc(bucket, time_col)
    t_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    end_us = F.unix_micros(
        (b + F.expr(f"interval 1 {bucket}")).cast("timestamp"))
    out = (df.select(F.col(key_col), b.alias("bucket"),
                     F.col(val_col).alias("__v"),
                     t_us.alias("__t"), end_us.alias("__e")))
    w2 = Window.partitionBy(key_col, "bucket").orderBy("__t")
    nxt2 = F.lead("__t").over(w2)
    dur2 = F.coalesce(nxt2, F.col("__e")) - F.col("__t")
    return (out.withColumn("__dur", dur2)
            .groupBy(key_col, "bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_samples"),
                 F.round((F.sum((F.col("__v") * F.col("__dur"))
                                .cast("decimal(28,6)"))
                          / F.sum(F.col("__dur").cast("decimal(28,6)")))
                         .cast("double"), 6).alias("twap")))


def grouped_ols_trend(df: DataFrame, group_col: str, x_col,
                      y_col: str) -> DataFrame:
    """Per-group OLS line fit (slope / intercept / r2) — the zipf_fit
    moment algebra generalized to grouped trends (is this segment's
    daily value rising?). x may be any numeric column expression
    (e.g. a day number derived from a timestamp).

    Cross-engine floats: the five moments are aggregated from
    round(3)-quantized DECIMAL(38,3) terms (exact, order-independent).
    Scale 3, not the module's usual 9: the decimal->double cast is
    only correctly rounded while the SCALED mantissa fits 53 bits
    (measured r8: a DECIMAL(38,9) sxx of ~1.2e19 scaled units made
    DuckDB's cast drift 1 ulp and the intercept landed on a round-6
    midpoint — 1562.0067705 emitted as ...771 vs ...770). At scale 3
    every moment's scaled mantissa stays under 2^53, both engines
    derive bit-identical doubles, and the slope/intercept/r2
    arithmetic agrees exactly; emissions are round(6). Groups with
    < 2 points or zero x-variance emit NULL slope/r2.

    Scale shape: ONE group-keyed aggregate with map-side partials —
    the moments are the whole algorithm; no window, no iteration.
    """
    x = (F.col(x_col) if isinstance(x_col, str) else x_col) \
        .cast("double")
    y = F.col(y_col).cast("double")

    def dec(c):
        return F.round(c, 3).cast("decimal(38,3)")

    m = (df.groupBy(F.col(group_col).alias("grp"))
         .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
              F.sum(dec(x)).alias("sx"), F.sum(dec(y)).alias("sy"),
              F.sum(dec(x * x)).alias("sxx"),
              F.sum(dec(x * y)).alias("sxy"),
              F.sum(dec(y * y)).alias("syy")))
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    varx = sxx - sx * sx / n
    vary = syy - sy * sy / n
    cov = sxy - sx * sy / n
    slope = F.when((F.col("n") >= 2) & (varx > 0), cov / varx)
    intercept = (sy - slope * sx) / n
    r2 = F.when((F.col("n") >= 2) & (varx > 0) & (vary > 0),
                (cov * cov) / (varx * vary))
    return m.select(
        F.col("grp").alias(group_col),
        F.col("n").alias("n_points"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"))
