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
