"""As-of join: match each left row to the latest right row at-or-before
its timestamp — the time-series join Spark's DataFrame API lacks.

The reference pushes model SQL to warehouses, several of which ship a
native ASOF JOIN (DuckDB `ASOF JOIN`, Snowflake `MATCH_CONDITION`);
this module is the Spark-side equivalent so models using the pattern
run here too.

Implementation is the scalable union-of-streams form, NOT an
inequality join:

    1. tag right rows (carrying payload) and left rows (payload NULL)
    2. union them and sort within each key partition by (ts, side)
       with right rows ordered before left rows at equal ts
    3. last(payload, ignorenulls) over a running window = "most recent
       right value seen so far" — exactly the as-of match
    4. keep the left rows

Cost: ONE shuffle of |L|+|R| rows on the join key and one sort — the
same shape as a regular sort-merge join. A naive
`L JOIN R ON key AND r_ts <= l_ts` + max-aggregation shuffles the
O(|L| * avg right rows per key) inequality-match blowup; at 100 TB the
union form is the only one that finishes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str | Sequence[str],
              left_ts: str, right_ts: str,
              payload: Sequence[str], how: str = "left",
              strict: bool = False,
              direction: str = "backward",
              tolerance: str | None = None) -> DataFrame:
    """As-of join: per key, the latest right row with r_ts <= l_ts
    (direction='backward', the default) or the EARLIEST right row with
    r_ts >= l_ts (direction='forward' — next-event semantics: next
    restock, next conversion). Forward is the same single merge sort
    with the time order reversed — still one shuffle, no range
    explosion.

    on        : equi-key column name(s), present in both sides
    left_ts   : event-time column of `left` (kept in the output)
    right_ts  : event-time column of `right` (the as-of ordering)
    payload   : right-side columns to bring over (NULL when no match)
    how       : 'left' keeps unmatched left rows; 'inner' drops them
    strict    : True matches strictly before/after only (exclusive)
    tolerance : optional SQL interval literal (e.g. "INTERVAL 30 DAYS"):
                a match older (backward) / farther ahead (forward) than
                the tolerance is treated as NO match — pandas
                merge_asof's `tolerance`, the shape 'last purchase
                within the attribution window' queries need. Applied as
                a post-match null-out, so it costs one projection, not
                a second join.

    Right-side duplicates at the same (key, right_ts) are resolved to
    ONE row deterministically (max over the payload struct) before the
    merge — asof output must never depend on physical row order.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join: how={how!r} (use 'left' or 'inner')")
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: direction={direction!r} "
                         "(use 'backward' or 'forward')")

    # Deterministic tie-break: one right row per (key, ts). The
    # matched timestamp rides FIRST in the payload struct (__mtol —
    # constant within the group, so the struct-max tie-break is
    # unchanged) so the tolerance null-out can compare it.
    r_uniq = (
        right.groupBy(*keys, F.col(right_ts).alias("__ts"))
        .agg(F.max(F.struct(F.col(right_ts).alias("__mtol"), *payload))
             .alias("__p"))
    )
    # side: right=0 sorts before left=1 at equal ts, so an exact-ts
    # match is visible to the left row (inclusive semantics); strict
    # flips the order so it is not.
    r_tagged = r_uniq.select(
        *keys, "__ts", F.lit(0 if not strict else 2).alias("__side"), "__p"
    )
    l_tagged = left.select(
        "*", F.col(left_ts).alias("__ts"), F.lit(1).alias("__side"),
        F.lit(None).cast(r_uniq.schema["__p"].dataType).alias("__p"),
    )
    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    ts_order = (F.col("__ts").asc() if direction == "backward"
                else F.col("__ts").desc())
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = merged.withColumn(
        "__match", F.last("__p", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)
    if tolerance is not None:
        mt = F.col("__match.__mtol")
        ok = (mt >= F.col("__ts") - F.expr(tolerance)
              if direction == "backward"
              else mt <= F.col("__ts") + F.expr(tolerance))
        matched = matched.withColumn(
            "__match", F.when(ok, F.col("__match")))
    if how == "inner":
        matched = matched.filter(F.col("__match").isNotNull())

    return matched.select(
        *[c for c in left.columns],
        *[F.col(f"__match.{p}").alias(p) for p in payload],
    )
