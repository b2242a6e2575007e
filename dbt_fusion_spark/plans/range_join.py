"""Range join: points-in-interval matching without an equi-key.

`L JOIN R ON l.ts >= r.start AND l.ts < r.end` has no hash key, so
Spark falls back to BroadcastNestedLoopJoin — O(|L| * |R|) comparisons,
fine when one side is tiny, catastrophic when both sides are large
(warehouses ship dedicated range-join optimizers for exactly this;
DuckDB's IEJoin is the oracle we check against).

`bucketed_range_join` restores a hash key by quantizing time into
fixed-width buckets:

    1. each interval explodes to the buckets it overlaps
       (ceil(len/width) rows — bound bucket_width near the typical
       interval length to keep the blow-up ~1-2x)
    2. each point maps to its single containing bucket
    3. equi-join on bucket (hash join, partial agg, AQE — everything
       a key join gets), then re-check the exact predicate
    4. matches are unique by construction: a point belongs to exactly
       one bucket, so an (interval, point) pair meets at most once —
       no dedup pass needed

Cost: one shuffle of |L| + |R|*expansion on the bucket key. Skewed
buckets (everything in one hour) behave like any skewed key join —
AQE skew split or plans.join_strategies.salted_join apply unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bucketed_range_join(points: DataFrame, intervals: DataFrame,
                        point_ts: str, start_ts: str, end_ts: str,
                        bucket_width_sec: int = 86400,
                        how: str = "inner") -> DataFrame:
    """Join each `points` row to every `intervals` row whose
    [start_ts, end_ts) half-open window contains point_ts.

    Output columns: intervals.* then points.* (names must not clash —
    alias beforehand). `how='inner'` only: outer range semantics are
    ambiguous under bucketing (an unmatched interval appears once per
    bucket); compose with a left anti-join for "unmatched" sets.
    """
    if how != "inner":
        raise ValueError("bucketed_range_join supports how='inner' only")
    w = F.lit(int(bucket_width_sec))
    p_bucket = (F.unix_timestamp(F.col(point_ts)) / w).cast("bigint")
    s_bucket = (F.unix_timestamp(F.col(start_ts)) / w).cast("bigint")
    # end is exclusive: the last covered bucket is the one holding
    # end - 1s (an interval ending exactly on a bucket boundary must
    # not explode into the next bucket)
    e_bucket = ((F.unix_timestamp(F.col(end_ts)) - 1) / w).cast("bigint")

    iv = intervals.withColumn(
        "__bucket", F.explode(F.sequence(s_bucket, e_bucket))
    )
    pt = points.withColumn("__bucket", p_bucket)
    return (
        iv.join(pt, "__bucket")
        .filter((F.col(point_ts) >= F.col(start_ts))
                & (F.col(point_ts) < F.col(end_ts)))
        .drop("__bucket")
    )
