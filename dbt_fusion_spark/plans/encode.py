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
    grams = (df.select(F.concat_ws(">", *steps).alias("path"),
                       steps[-1].isNotNull().alias("complete"))
               .filter(F.col("complete"))
               .groupBy("path").agg(F.count(F.lit(1)).alias("n_occurrences")))
    wr = Window.orderBy(F.col("n_occurrences").desc(), F.col("path"))
    return (grams.withColumn("rank", F.row_number().over(wr))
                 .filter(F.col("rank") <= k)
                 .select("rank", "path", "n_occurrences"))
