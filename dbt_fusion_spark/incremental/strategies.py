"""Incremental strategies as pure DataFrame -> DataFrame algebra.

Re-expresses the reference's incremental-strategy macro semantics
(dbt_macro_assets/dbt-adapters/macros/materializations/models/
incremental/{strategies.sql,merge.sql}; Spark dialect overrides
dbt_macro_assets/dbt-spark/macros/materializations/incremental/
strategies.sql:1-91) as declarative Spark plans:

- append          strategies.sql:9-13 (get_insert_into_sql)
- merge           merge.sql:9-54 (default__get_merge_sql)
- delete+insert   merge.sql:62-92
- insert_overwrite merge.sql:95-124 / dbt-spark strategies.sql:1-15
- microbatch      dbt-spark strategies.sql:80-91 + model_config.rs:79-82

Each function returns the NEW target contents. Persistence (swap /
dynamic-partition overwrite) is the materialization layer's concern.

Scale design: every strategy is a key-partitioned shuffle join or a
metadata partition swap — the exact physical shapes a warehouse MERGE
compiles to. On 100 TB: `merge`/`delete_insert` shuffle both sides on
the unique key (AQE handles skew); `insert_overwrite` + microbatch
avoid the shuffle entirely by replacing whole time partitions, which is
why microbatch is the preferred backfill path at scale.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def _keys(unique_key: str | Sequence[str]) -> list[str]:
    return [unique_key] if isinstance(unique_key, str) else list(unique_key)


def _key_cond(left: DataFrame, right: DataFrame, keys: list[str]) -> Column:
    # NULL-safe equality, matching SQL MERGE `ON a.k = b.k` with dbt's
    # null-safe `equals` behavior flag (MA utils/equals.sql:9-18 -> `<=>`)
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(right[k])
        cond = c if cond is None else (cond & c)
    return cond


def append(target: DataFrame, source: DataFrame) -> DataFrame:
    """INSERT INTO ... SELECT — column order by name, like the
    reference's get_insert_into_sql (strategies.sql:93-103)."""
    return target.unionByName(source.select(*target.columns))


def merge(
    target: DataFrame,
    source: DataFrame,
    unique_key: str | Sequence[str],
    merge_update_columns: Sequence[str] | None = None,
    merge_exclude_columns: Sequence[str] | None = None,
    incremental_predicates: Sequence[str] | None = None,
) -> DataFrame:
    """MERGE INTO semantics (merge.sql:9-54): matched -> UPDATE (all
    columns, or merge_update_columns, or all-but-merge_exclude_columns),
    not-matched -> INSERT *.

    Rewrite: matched rows = target ⋈ source (update columns from
    source); unmatched target rows pass through (left-anti); unmatched
    source rows are inserts. `incremental_predicates` (strings over
    `DBT_INTERNAL_DEST.<col>`) narrow which target rows are eligible to
    match — exactly like extra ON conditions in the reference macro.
    """
    keys = _keys(unique_key)
    cols = target.columns
    if merge_update_columns:
        update_cols = [c for c in merge_update_columns if c not in keys]
    elif merge_exclude_columns:
        update_cols = [c for c in cols if c not in merge_exclude_columns and c not in keys]
    else:
        update_cols = [c for c in cols if c not in keys]

    t = target.alias("DBT_INTERNAL_DEST")
    s = source.alias("DBT_INTERNAL_SOURCE")
    cond = _key_cond(t, s, keys)
    for p in incremental_predicates or []:
        cond = cond & F.expr(p)

    # matched: source values for update columns, target values otherwise
    matched = t.join(s, cond, "inner").select(
        *[
            (s[c] if c in update_cols else t[c]).alias(c)
            for c in cols
        ]
    )
    unmatched_target = t.join(s, cond, "left_anti").select(*cols)
    unmatched_source = s.join(t, cond, "left_anti").select(*cols)
    return unmatched_target.unionByName(matched).unionByName(unmatched_source)


def delete_insert(
    target: DataFrame,
    source: DataFrame,
    unique_key: str | Sequence[str],
    incremental_predicates: Sequence[str] | None = None,
) -> DataFrame:
    """delete+insert (merge.sql:62-92): DELETE target rows whose key
    appears in source (optionally narrowed by predicates), then INSERT
    all source rows. Differs from merge when source has duplicate keys
    (all duplicates land) or target keys repeat (all deleted)."""
    keys = _keys(unique_key)
    cols = target.columns
    t = target.alias("DBT_INTERNAL_DEST")
    s = source.alias("DBT_INTERNAL_SOURCE")
    cond = _key_cond(t, s, keys)
    for p in incremental_predicates or []:
        cond = cond & F.expr(p)
    kept = t.join(s.select(*keys).dropDuplicates(), cond, "left_anti").select(*cols)
    return kept.unionByName(source.select(*cols))


def insert_overwrite(
    target: DataFrame,
    source: DataFrame,
    partition_by: str | Sequence[str],
) -> DataFrame:
    """insert_overwrite (dbt-spark strategies.sql:1-15): replace every
    target partition that appears in source. Logical form of Spark's
    dynamic-partition INSERT OVERWRITE — the materialization layer uses
    the real `INSERT OVERWRITE` (metadata-only swap); this pure form
    exists for plan composition and the correctness oracle."""
    parts = _keys(partition_by)
    kept = target.join(
        source.select(*parts).dropDuplicates(), on=parts, how="left_anti"
    ).select(*target.columns)
    return kept.unionByName(source.select(*target.columns))


def microbatch_windows(
    begin: _dt.datetime,
    end: _dt.datetime,
    batch_size: str = "day",
) -> list[tuple[_dt.datetime, _dt.datetime]]:
    """Split [begin, end) into event_time windows (DbtBatchSize
    Hour/Day/Month/Year, common.rs:523-528). The microbatch runner
    filters source rows per window and insert_overwrites the matching
    time partition (model_config.rs:79-82,155,209)."""
    def trunc(ts: _dt.datetime) -> _dt.datetime:
        if batch_size == "hour":
            return ts.replace(minute=0, second=0, microsecond=0)
        if batch_size == "day":
            return ts.replace(hour=0, minute=0, second=0, microsecond=0)
        if batch_size == "month":
            return ts.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        if batch_size == "year":
            return ts.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
        raise ValueError(f"unknown batch_size {batch_size!r}")

    def nxt(ts: _dt.datetime) -> _dt.datetime:
        if batch_size == "hour":
            return ts + _dt.timedelta(hours=1)
        if batch_size == "day":
            return ts + _dt.timedelta(days=1)
        if batch_size == "month":
            return (ts.replace(day=28) + _dt.timedelta(days=4)).replace(day=1)
        return ts.replace(year=ts.year + 1)

    out = []
    lo = trunc(begin)
    while lo < end:
        hi = nxt(lo)
        out.append((lo, hi))  # full batch windows, like dbt's microbatch
        lo = hi
    return out


def replace_where(
    target: DataFrame,
    source: DataFrame,
    predicates: str | Sequence[str],
) -> DataFrame:
    """replace_where (databricks, common.rs:566-568): atomically replace
    the predicate-scoped region — target rows NOT matching the
    predicate persist, source rows matching it land (out-of-scope
    source rows are dropped, the Delta replaceWhere contract). Pure
    form of the executor's tmp+swap rewrite (executors.py
    materialize_incremental 'replace_where')."""
    preds = [predicates] if isinstance(predicates, str) else list(predicates)
    cond = None
    for p in preds:
        c = F.expr(p)
        cond = c if cond is None else (cond & c)
    kept = target.filter(~cond | cond.isNull()).select(*target.columns)
    return kept.unionByName(source.filter(cond).select(*target.columns))
