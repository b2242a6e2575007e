"""Feature-encoding operators for ML training pipelines.

The reference's surface ends at SQL/materializations; a training
pipeline built on it immediately needs the standard pre-model feature
transforms as relational operators.  This module holds the ones with
exact closed-form SQL semantics (so they gate against DuckDB): leave-
one-out target encoding with additive smoothing, and session-path
n-grams (plans/paths would be a one-function module; it lives here with
its fellow feature builders).

Scale shapes:
- target encoding: one groupBy onto the category grid (bounded by the
  category's cardinality), broadcast back; the global prior is a grid
  window. One scan + one broadcast join — no per-row shuffles.
- path n-grams: LEAD windows per user (no self-joins — a join on
  (user, rank) would reshuffle both sides; lead() stays inside the one
  per-user sort), then a groupBy onto the |event_types|^n-bounded path
  grid; the top-k rank is a window over that bounded grid.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from dbt_fusion_spark.plans.stats import _grid


def target_encode_loo(df: DataFrame, id_cols: Sequence[str],
                      cat_col: str, target, m: float = 10.0) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing.

    For a row in category c with binary target y:
    ``te = (sum_y(c) - y + m * prior) / (n(c) - 1 + m)`` where prior is
    the global target rate and `m` the smoothing pseudo-count — the
    standard leakage-safe mean encoding (the row's own label never
    feeds its feature; m shrinks rare categories toward the prior).

    Returns the id columns, the category, the target, and ``te``.

    Scale: category stats are one map-side-combined groupBy (grid
    bounded by category cardinality); the prior is a window over that
    grid; the join back broadcasts the grid. Counts stay integral so
    te doubles are exact-operand divisions.
    """
    y = (F.col(target) if isinstance(target, str) else target) \
        .cast("bigint")
    tagged = df.select(*id_cols, F.col(cat_col).alias("cat"),
                       y.alias("y"))
    cats = (tagged.groupBy("cat")
                  .agg(F.count(F.lit(1)).alias("n_c"),
                       F.sum("y").alias("sum_c"))
                  .withColumn("n_all", F.sum("n_c").over(_grid()))
                  .withColumn("sum_all", F.sum("sum_c").over(_grid())))
    prior = F.col("sum_all").cast("double") / F.col("n_all").cast("double")
    cats = cats.select("cat", "n_c", "sum_c", prior.alias("prior"))
    te = ((F.col("sum_c") - F.col("y")).cast("double")
          + F.lit(m) * F.col("prior")) \
        / ((F.col("n_c") - 1).cast("double") + F.lit(m))
    return (tagged.join(F.broadcast(cats), "cat")
            .select(*id_cols, F.col("cat").alias(cat_col), "y",
                    F.round(te, 6).alias("te")))


def top_paths(df: DataFrame, user_col: str, time_col: str,
              event_col: str, tiebreak_col: str, n: int = 3,
              k: int = 20) -> DataFrame:
    """Top-k length-`n` event-type paths (n-grams over each user's
    time-ordered event sequence) — the "what do users actually do"
    readout behind funnel design and Markov-model sanity checks.

    Returns k rows: rank, the path string ``a>b>c``, and its count.
    Ties rank by (count desc, path asc) — fully deterministic.

    Scale: one per-user window sort produces all LEAD offsets (no
    self-joins); paths aggregate onto the |event_types|^n-bounded
    grid; the final rank is a window over that bounded grid.
    """
    w = Window.partitionBy(user_col).orderBy(time_col, tiebreak_col)
    steps = [F.col(event_col)] + \
            [F.lead(event_col, i).over(w) for i in range(1, n)]
    # concat(), not concat_ws(): a NULL event value anywhere in the
    # gram must nullify the whole path (|| oracle semantics) — with
    # concat_ws a NULL mid-gram silently shortened 'a>NULL>c' to 'a>c'
    # and counted it as a valid 2-hop path.
    sep = F.lit(">")
    parts = [steps[0]] + [x for s in steps[1:] for x in (sep, s)]
    grams = (df.select(F.concat(*parts).alias("path"))
               .filter(F.col("path").isNotNull())
               .groupBy("path").agg(F.count(F.lit(1)).alias("n_occurrences")))
    wr = Window.orderBy(F.col("n_occurrences").desc(), F.col("path"))
    return (grams.withColumn("rank", F.row_number().over(wr))
                 .filter(F.col("rank") <= k)
                 .select("rank", "path", "n_occurrences"))


def exact_quantile_grid(df: DataFrame, group_col: str, value_col: str,
                        percents: Sequence[int]) -> DataFrame:
    """Exact per-group percentiles by the distribution-grid walk
    (plans/profile.weighted_median generalized to arbitrary integer
    percents): the percentile is the smallest value whose cumulative
    count satisfies the INTEGER comparison ``cum * 100 >= p * total``
    — no interpolation, no float compare, the result is a value from
    the data.

    Returns one row per (group, percent) with the value.

    Scale: one (group, value) aggregate; per-group bounded-grid
    cumulative window; one selection aggregate per percent.
    """
    grid = (df.groupBy(F.col(group_col).alias("grp"),
                       F.col(value_col).alias("val"))
              .agg(F.count(F.lit(1)).alias("n")))
    wg = Window.partitionBy("grp")
    wcum = (Window.partitionBy("grp").orderBy("val")
            .rowsBetween(Window.unboundedPreceding, 0))
    cum = (grid.withColumn("total", F.sum("n").over(wg))
               .withColumn("cum", F.sum("n").over(wcum)))
    picks = None
    for p in percents:
        hit = (cum.filter(F.col("cum") * 100 >= F.lit(int(p))
                          * F.col("total"))
                  .groupBy("grp")
                  .agg(F.min("val").alias("value"))
                  .withColumn("percent", F.lit(int(p))))
        picks = hit if picks is None else picks.unionByName(hit)
    return picks.select(F.col("grp").alias(group_col), "percent", "value")


def winsorize_clip(df: DataFrame, id_cols: Sequence[str], group_col: str,
                   value_col: str, p_lo: int = 1,
                   p_hi: int = 99) -> DataFrame:
    """Winsorization: clip a value to its group's exact [p_lo, p_hi]
    percentiles — the standard heavy-tail guard before any moment-based
    feature or model sees the column.

    Returns the id columns, group, raw value, clipped value, and a
    clip-direction flag.

    Scale: percentile bounds come from exact_quantile_grid (bounded
    grid walks) and broadcast back onto the rows — one scan + one
    broadcast join, no per-row shuffle.
    """
    qs = exact_quantile_grid(df, group_col, value_col, [p_lo, p_hi])
    bounds = (qs.groupBy(group_col)
                .agg(F.min(F.when(F.col("percent") == p_lo,
                                  F.col("value"))).alias("__lo"),
                     F.min(F.when(F.col("percent") == p_hi,
                                  F.col("value"))).alias("__hi")))
    v = F.col(value_col)
    clipped = F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    return (df.join(F.broadcast(bounds), group_col)
            .select(*id_cols, group_col, value_col,
                    clipped.alias("clipped"),
                    F.when(v < F.col("__lo"), F.lit("lo"))
                     .when(v > F.col("__hi"), F.lit("hi"))
                     .otherwise(F.lit("none")).alias("clip_side")))


def standardize_zscore(df: DataFrame, id_cols: Sequence[str],
                       group_col: str, value_col: str) -> DataFrame:
    """Per-group z-score standardization — the unit-variance feature
    transform. Group moments ride exact DECIMAL sums (broadcast back),
    so z doubles are partition-order-free.

    Scale: one grid aggregate + broadcast join; n=1 or constant groups
    emit NULL z (ANSI-safe, no zero divisor).
    """
    from dbt_fusion_spark.plans.stats import _d2d, _dec

    v = _dec(value_col)
    stats = (df.groupBy(F.col(group_col).alias("__g"))
               .agg(F.count(F.lit(1)).alias("__n"),
                    F.sum(v).alias("__s"), F.sum(v * v).alias("__q")))
    nn = F.col("__n").cast("double")
    s, q = _d2d("__s"), _d2d("__q")
    stats = stats.select(
        "__g", (s / nn).alias("__mu"),
        F.when(F.col("__n") > 1,
               F.sqrt((q - s * s / nn) / (nn - 1))).alias("__sd"))
    z = F.when(F.col("__sd") > 0,
               (F.col(value_col) - F.col("__mu")) / F.col("__sd"))
    return (df.join(F.broadcast(stats),
                    df[group_col] == F.col("__g"))
            .select(*id_cols, group_col, value_col,
                    F.round(F.col("__mu"), 6).alias("group_mean"),
                    F.round(F.col("__sd"), 6).alias("group_stddev"),
                    F.round(z, 6).alias("z")))


def woe_iv_bins(df: DataFrame, label_col: str, value_col: str,
                bins: int = 10) -> DataFrame:
    """Weight-of-Evidence / Information-Value feature audit — the
    classic pre-model screen for a numeric feature against a binary
    label (credit-scoring lineage): bin the feature, then per bin

        woe = ln( (good_i / G) / (bad_i / B) )
        iv  = sum_i (good_i / G - bad_i / B) * woe_i

    IV < 0.02 = useless, 0.1-0.3 = medium, > 0.5 = suspicious (leak).
    Bins are EQUAL-WIDTH over the observed [min, max] (deterministic —
    no rank ties to adjudicate); bin b = min(floor((x - lo) / w),
    bins - 1).  Bins where either class is absent emit NULL woe and
    contribute 0 to IV (the standard zero-cell convention, documented
    in every scorecard text).

    Returns one row per non-empty bin: bin, lo/hi edges, n_rows,
    n_good (label = 1), n_bad, woe, iv_term, and the table-wide iv on
    every row.

    Scale: one bounds aggregate (2 scalars, broadcast back via the
    opaque-key join), one bin-keyed count aggregate onto the
    bins-bounded grid, grid windows for totals — a single scan of the
    fact side.
    """
    from dbt_fusion_spark.plans.stats import _d2d, _grid, _qterm

    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    y = (F.col(label_col) if isinstance(label_col, str)
         else label_col).cast("bigint")
    x = F.col(value_col).cast("double")
    base = df.select(y.alias("__y"), x.alias("__x")).na.drop()
    bounds = base.agg(F.min("__x").alias("__lo"),
                      F.max("__x").alias("__hi"),
                      F.count(F.lit(1)).alias("__n"))
    b = (base.withColumn("__k", F.pmod(F.col("__y"), F.lit(1)))
         .join(F.broadcast(bounds.withColumn(
             "__k", F.pmod(F.col("__n"), F.lit(1)))), "__k"))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    bin_ = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)) \
        .otherwise(F.least(
            F.floor((F.col("__x") - F.col("__lo")) / width),
            F.lit(bins - 1))).cast("bigint")
    g = (b.withColumn("__b", bin_)
         .groupBy("__b")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
              F.sum("__y").cast("bigint").alias("n_good"),
              F.sum(F.lit(1) - F.col("__y")).cast("bigint")
               .alias("n_bad"),
              F.max("__lo").alias("__lo"), F.max("__hi").alias("__hi")))
    w = _grid()
    g = (g.withColumn("G", F.sum("n_good").over(w))
          .withColumn("B", F.sum("n_bad").over(w)))
    gp = F.col("n_good").cast("double") / F.col("G").cast("double")
    bp = F.col("n_bad").cast("double") / F.col("B").cast("double")
    ok = (F.col("n_good") > 0) & (F.col("n_bad") > 0) \
        & (F.col("G") > 0) & (F.col("B") > 0)
    woe = F.when(ok, F.log(gp / bp))
    iv_term = F.when(ok, _qterm((gp - bp) * F.log(gp / bp))) \
        .otherwise(F.lit(0).cast("decimal(38,9)"))
    g = g.withColumn("__ivt", iv_term)
    wd = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    return g.select(
        F.col("__b").alias("bin"),
        F.round(F.col("__lo") + wd * F.col("__b").cast("double"), 6)
         .alias("bin_lo"),
        F.round(F.when(F.col("__b") == bins - 1, F.col("__hi"))
                .otherwise(F.col("__lo")
                           + wd * (F.col("__b") + 1).cast("double")), 6)
         .alias("bin_hi"),
        "n_rows", "n_good", "n_bad",
        F.round(woe, 6).alias("woe"),
        F.round(_d2d("__ivt"), 6).alias("iv_term"),
        F.round(_d2d(F.sum("__ivt").over(w)), 6).alias("iv"))
