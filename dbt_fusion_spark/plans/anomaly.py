"""Source-volume anomaly detection — the data-observability primitive.

The reference ships source *freshness* checks (MA adapters/freshness.sql
— implemented in adapter/spark_adapter.py collect_freshness); the
sibling check every observability tool layers on top (elementary,
re_data, Monte Carlo) is VOLUME: "did this source land a wildly
abnormal number of rows today?". This operator computes trailing
z-scores over a gap-filled per-key daily volume series and flags
buckets outside the band.

Scale shape (100 TB contract):
- the raw scan reduces to one row per (key, bucket) in a single
  map-side-combined groupBy before anything else happens — the window
  math runs on the tiny rollup, never on raw events.
- the spine completion reuses plans/timeseries.gapfill (per-key
  sequence+explode, no global calendar cross join); a missing day IS
  the anomaly you most want to catch, so zero-fill is the default.
- trailing stats are per-key bounded-frame windows (ROWS window-1
  PRECEDING .. 1 PRECEDING — the current bucket is excluded from its
  own baseline, the standard leakage guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dbt_fusion_spark.plans.timeseries import gapfill


def volume_anomalies(df: DataFrame, key_col: str, time_col: str,
                     step: str = "1 day", window: int = 28,
                     min_periods: int = 7,
                     z_thresh: float = 3.0,
                     method: str = "z") -> DataFrame:
    """Flag abnormal per-key event volumes.

    Returns one row per (key, bucket) with ``n_rows``, the trailing
    baseline ``mean``/``stddev`` over the previous `window` buckets
    (current excluded), ``z`` (NULL until `min_periods` baseline
    buckets exist or when stddev is 0), and ``is_anomaly``.

    method: 'z' (mean/stddev) or 'robust' (median/MAD with the 0.6745
    consistency factor — a prior spike in the baseline no longer masks
    today's anomaly, the weakness of plain z on bursty sources). Both
    keep the same output shape (baseline_mean/baseline_stddev carry
    median/MAD under 'robust').
    """
    counts = (df.groupBy(F.col(key_col),
                         F.date_trunc(_trunc_unit(step), time_col)
                          .alias("bucket"))
                .agg(F.count(F.lit(1)).cast("double").alias("n_rows")))
    filled = gapfill(counts, key_col, "bucket", "n_rows",
                     step=step, method="zero")
    w = (Window.partitionBy(key_col).orderBy("bucket")
         .rowsBetween(-window, -1))
    if method == "robust":
        return _robust(filled, key_col, w, min_periods, z_thresh)
    if method != "z":
        raise ValueError(f"unknown method {method!r}")
    mu = F.avg("n_rows").over(w)
    sd = F.stddev_samp("n_rows").over(w)
    nw = F.count(F.lit(1)).over(w)
    z = F.when((nw >= min_periods) & (sd > 0),
               (F.col("n_rows") - mu) / sd)
    # A constant baseline (stddev 0) leaves z undefined, but deviating
    # from a constant is the most clear-cut anomaly there is — flag it.
    flat_break = ((nw >= min_periods) & (sd == 0)
                  & (F.col("n_rows") != mu))
    return (filled.select(
        key_col, "bucket",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.round(mu, 6).alias("baseline_mean"),
        F.round(sd, 6).alias("baseline_stddev"),
        F.round(z, 6).alias("z"),
        (F.coalesce(F.abs(z) > z_thresh, F.lit(False))
         | F.coalesce(flat_break, F.lit(False))).alias("is_anomaly"),
    ))


def _robust(filled: DataFrame, key_col: str, w, min_periods: int,
            z_thresh: float) -> DataFrame:
    """Median/MAD variant. MAD needs the deviations from the WINDOW's
    own median, which no single window aggregate expresses — instead
    the trailing baseline is collected into a bounded array (<= window
    elements by the frame) and median/MAD computed with array HOFs:
    per-row work is O(window log window) on <=28 values, no extra
    shuffle, still whole-row vectorizable."""
    base = F.collect_list("n_rows").over(w)

    def arr_median(arr):
        s = F.array_sort(arr)
        n = F.size(arr)
        # greatest(...,1): keeps element_at's 1-based contract valid on
        # an EMPTY baseline (first buckets); the outer when() nulls it
        lo = F.element_at(
            s, F.greatest(((n + 1) / F.lit(2)).cast("int"), F.lit(1)))
        hi = F.element_at(s, (n / F.lit(2)).cast("int") + 1)
        return F.when(n == 0, F.lit(None).cast("double")) \
                .when(n % 2 == 1, lo).otherwise((lo + hi) / 2.0)

    dev = lambda m: F.transform(F.col("__base"),          # noqa: E731
                                lambda x: F.abs(x - m))
    out = (filled
           .withColumn("__base", base)
           .withColumn("__med", arr_median(F.col("__base"))))
    mad = arr_median(dev(F.col("__med")))
    out = out.withColumn("__mad", mad).withColumn(
        "__nw", F.size("__base"))
    rz = F.when((F.col("__nw") >= min_periods) & (F.col("__mad") > 0),
                F.lit(0.6745) * (F.col("n_rows") - F.col("__med"))
                / F.col("__mad"))
    flat_break = ((F.col("__nw") >= min_periods) & (F.col("__mad") == 0)
                  & (F.col("n_rows") != F.col("__med")))
    # NO engine-side rounding here, deliberately: unlike the z variant
    # (window sums whose accumulation order differs per engine), every
    # robust value derives from sorts and single divisions of identical
    # operands — the doubles are bit-identical cross-engine, and a
    # round() can only break that on exact .5e-6 ties (observed at
    # sf0.1: Spark HALF_UP vs DuckDB disagreeing on -0.2529375).
    return out.select(
        key_col, "bucket",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("__med").alias("baseline_mean"),
        F.col("__mad").alias("baseline_stddev"),
        rz.alias("z"),
        (F.coalesce(F.abs(rz) > z_thresh, F.lit(False))
         | F.coalesce(flat_break, F.lit(False))).alias("is_anomaly"),
    )


def _trunc_unit(step: str) -> str:
    unit = step.split()[-1].rstrip("s")
    if unit not in ("hour", "day", "week", "month"):
        raise ValueError(f"unsupported step {step!r}")
    return unit
