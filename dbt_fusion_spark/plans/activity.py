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


def _grid_quintile(values: DataFrame, key_col: str, v_col: str,
                   out_col: str, invert: bool = False,
                   n: int | None = None) -> DataFrame:
    """Quintile score (1..5) of an INTEGER-grid metric, computed the
    scale-correct way: the cumulative walk runs over the (value ->
    count) DISTRIBUTION table — bounded by the value grid, never by
    the entity count — and the assignment is pure integer arithmetic
    ceil(5 * cume / n) = (5*cume + n - 1) DIV n, exact on every
    engine. invert=True flips to 6 - score (recency: smaller = better).
    `n` is the total row count; pass it when the caller already knows
    it (ADVICE r7: values.count() here re-ran the un-persisted
    upstream pipeline once per score).
    """
    from pyspark.sql import Window

    dist = values.groupBy(v_col).agg(F.count("*").alias("__c"))
    w = (Window.orderBy(v_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = dist.withColumn("__cum", F.sum("__c").over(w))
    if n is None:
        n = values.count()  # driver scalar: one job, one long
    score = F.expr(f"CAST((5 * __cum + {n} - 1) DIV {n} AS INT)")
    score = (F.lit(6) - score) if invert else score
    return (values.join(cum.select(v_col, "__cum"), v_col)
            .select(key_col, score.alias(out_col)))


def rfm_scores(df: DataFrame, user_col: str, ts_col: str,
               value_col: str,
               monetary_bucket_cents: int | None = None) -> DataFrame:
    """RFM quintile scoring (Hughes 1994, the retention-analytics
    staple): per user, recency (days since last event, vs the corpus
    max timestamp as 'now'), frequency (event count), monetary (exact
    decimal value sum floored to integer cents), each scored 1..5 by
    exact quintiles. Higher is better on every score (recency
    inverted). Returns (user, recency_days, frequency, monetary_cents,
    r_score, f_score, m_score, rfm) where rfm = 100r + 10f + m.

    Scale shape (100 TB): per-user aggregates are one user-keyed
    shuffle; 'now' rides a 1-row broadcast scalar join; the per-user
    frame is localCheckpointed ONCE and its count shared by all three
    quintiles (ADVICE r7: the unpersisted pipeline previously re-ran
    per score, three extra driver jobs); each quintile's cumulative
    walk windows over the bounded VALUE-GRID distribution table (days
    / counts), never over the user population — the
    calibrate_keep_threshold grid trick. CAVEAT: monetary CENTS are
    near-unique, so the monetary grid is effectively user-cardinality
    and its cumulative window is a single-reducer sort over ~n_users
    rows; at fleet scale pass `monetary_bucket_cents` (e.g. 100 =
    score on whole currency units) to bound that grid — scoring then
    quantizes ties to the bucket, so it is opt-in (the default keeps
    exact per-cent quintiles). All score arithmetic is integer-exact;
    the only floats (the decimal sum) are made exact by decimal
    aggregation + floor-to-cents (floor is midpoint-free, so no
    HALF_UP/HALF_EVEN divergence).
    """
    from dbt_fusion_spark.llm.corpus import _join_scalar

    per_user = (df.groupBy(F.col(user_col).alias("u"))
                .agg(F.max(ts_col).alias("__last"),
                     F.count("*").cast("bigint").alias("frequency"),
                     F.floor(F.sum(F.col(value_col).cast("decimal(18,6)"))
                             * 100).cast("bigint")
                     .alias("monetary_cents")))
    # the scalar-join key must be numeric (pmod); carry a count column
    now = df.agg(F.max(ts_col).alias("__now"),
                 F.count("*").alias("__nc"))
    base = _join_scalar(per_user, "frequency", now, "__nc")
    base = base.select(
        "u",
        F.datediff(F.to_date("__now"), F.to_date("__last"))
        .cast("bigint").alias("recency_days"),
        "frequency", "monetary_cents")
    # base feeds FOUR plan subtrees (r/f/m quintiles + the final join):
    # materialize once, share one count with every quintile.
    base = base.localCheckpoint(eager=True)
    n_users = base.count()
    m_val = (F.col("monetary_cents")
             if monetary_bucket_cents is None else
             (F.floor(F.col("monetary_cents")
                      / F.lit(int(monetary_bucket_cents)))
              * int(monetary_bucket_cents)).cast("bigint"))
    r = _grid_quintile(base.select("u", "recency_days"), "u",
                       "recency_days", "r_score", invert=True,
                       n=n_users)
    f = _grid_quintile(base.select("u", "frequency"), "u",
                       "frequency", "f_score", n=n_users)
    m = _grid_quintile(base.select("u", m_val.alias("monetary_cents")),
                       "u", "monetary_cents", "m_score", n=n_users)
    return (base.join(r, "u").join(f, "u").join(m, "u")
            .select(F.col("u").alias(user_col),
                    "recency_days", "frequency", "monetary_cents",
                    "r_score", "f_score", "m_score",
                    (F.col("r_score") * 100 + F.col("f_score") * 10
                     + F.col("m_score")).cast("int").alias("rfm")))


def funnel_conversion(df: DataFrame, user_col: str, type_col: str,
                      time_col: str, steps: list[str]) -> DataFrame:
    """Strictly-ORDERED conversion funnel (r11): a user counts at step
    k only if an event of type steps[k] happened AT OR AFTER their
    first qualifying time for step k-1 — the sequential semantics
    product analytics means by "funnel" (an unordered distinct-type
    count would credit a purchase that preceded the view).

    Emits one row per step: step (1-based), step_name, n_users,
    conversion_from_prev, conversion_from_first (both round(6);
    step 1 reads 1.0).

    Scale: step k is ONE user-keyed shuffle — filter to the step's
    type, inner-join the survivors frame (shrinking monotonically),
    keep events at/after the prior step time, min-aggregate.  k steps
    = k bounded shuffles over ever-smaller frames; the rate assembly
    is a window over the k-row step table.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"duplicate step types: {steps}")
    base = df.select(F.col(user_col).alias("u"),
                     F.col(type_col).alias("et"),
                     F.col(time_col).alias("ts")) \
        .filter(F.col("ts").isNotNull())
    cur = (base.filter(F.col("et") == steps[0])
           .groupBy("u").agg(F.min("ts").alias("t1")))
    counts = [cur.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
              .select(F.lit(1).alias("step"),
                      F.lit(steps[0]).alias("step_name"), "n")]
    for i, s in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}"
        cur = (base.filter(F.col("et") == s)
               .join(cur, "u")
               .filter(F.col("ts") >= F.col(prev))
               .groupBy("u").agg(F.min("ts").alias(f"t{i}")))
        counts.append(
            cur.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .select(F.lit(i).alias("step"),
                    F.lit(s).alias("step_name"), "n"))
    tbl = counts[0]
    for c in counts[1:]:
        tbl = tbl.unionByName(c)
    w = Window.orderBy("step").rowsBetween(
        Window.unboundedPreceding, 0)
    first_n = F.first("n").over(
        Window.orderBy("step").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing))
    prev_n = F.lag("n").over(Window.orderBy("step"))
    return tbl.select(
        "step", "step_name", F.col("n").alias("n_users"),
        F.round(F.when(prev_n.isNull(), F.lit(1.0))
                .when(prev_n > 0,
                      F.col("n").cast("double")
                      / prev_n.cast("double")), 6)
         .alias("conversion_from_prev"),
        F.round(F.when(first_n > 0,
                       F.col("n").cast("double")
                       / first_n.cast("double")), 6)
         .alias("conversion_from_first"))


def cohort_retention(df: DataFrame, user_col: str,
                     time_col: str) -> DataFrame:
    """Weekly cohort retention matrix (r11): users cohort by the
    Monday week of their FIRST event; cell (cohort, k) counts the
    cohort's users active in week k after signup — the triangle every
    growth dashboard opens with.

    Emits one row per non-empty (cohort_week, week_offset):
    cohort_week (date), week_offset, n_active, cohort_size, retention
    (round 6; offset 0 reads 1.0 whenever the cohort is non-empty,
    since week 0 contains the first event itself).

    Scale: one user-keyed aggregate for first times, one user-keyed
    join back (broadcast never assumed — users are data-sized), one
    distinct onto the (cohort, offset, user) grid, one grid count;
    the cohort-size join runs on the bounded cohort grid.
    """
    base = df.select(F.col(user_col).alias("u"),
                     F.col(time_col).alias("ts")) \
        .filter(F.col("ts").isNotNull())
    firsts = base.groupBy("u").agg(F.min("ts").alias("t0"))
    j = base.join(firsts, "u")
    cohort = F.date_trunc("week", F.col("t0")).cast("date")
    off = F.floor(F.datediff(F.col("ts").cast("date"),
                             F.col("t0").cast("date"))
                  / F.lit(7)).cast("bigint")
    cells = (j.select(cohort.alias("cohort_week"),
                      off.alias("week_offset"), "u")
             .groupBy("cohort_week", "week_offset")
             .agg(F.countDistinct("u").cast("bigint")
                  .alias("n_active")))
    sizes = (firsts.groupBy(F.date_trunc("week", F.col("t0"))
                            .cast("date").alias("cohort_week"))
             .agg(F.countDistinct("u").cast("bigint")
                  .alias("cohort_size")))
    return (cells.join(F.broadcast(sizes), "cohort_week")
            .select("cohort_week", "week_offset", "n_active",
                    "cohort_size",
                    F.round(F.col("n_active").cast("double")
                            / F.col("cohort_size").cast("double"), 6)
                     .alias("retention")))
