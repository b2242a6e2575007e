"""Wide/long reshape operators: PIVOT and UNPIVOT as first-class,
deterministic DataFrame transforms.

Spark's `.pivot()` without an explicit value list runs a distinct scan
and produces a non-deterministic column ORDER contract across engines;
these operators take the value list explicitly (sorted by the caller)
so the output schema is a pure function of the call — the warehouse
PIVOT semantics (DuckDB/Snowflake PIVOT also require or sort the IN
list) and the reproducibility contract every oracle needs.

Scale: pivot is ONE groupBy with |values| conditional aggregates
(map-side combined, no second scan); unpivot is a `stack` Generate —
both fully codegen'd, no Python row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pivot_counts(df: DataFrame, row_col: str, pivot_col: str,
                 values: list[str]) -> DataFrame:
    """Wide count table: one row per row_col, one BIGINT column per
    pivot value (sanitized to a safe column name by the caller's
    list order — names ARE the values here).  Values absent from a
    row emit 0, rows whose pivot value is outside `values` are
    ignored (warehouse PIVOT IN-list semantics)."""
    if not values:
        raise ValueError("values must be non-empty")
    aggs = [F.sum(F.when(F.col(pivot_col) == v, 1).otherwise(0))
            .cast("bigint").alias(v) for v in values]
    return df.groupBy(row_col).agg(*aggs)


def unpivot_counts(df: DataFrame, row_col: str, value_cols: list[str],
                   key_name: str = "key",
                   value_name: str = "n") -> DataFrame:
    """Long form of a pivot_counts table: (row, key, n) via a stack
    Generate — the exact inverse when applied to pivot_counts output
    (roundtrip property-tested), with zero cells DROPPED (the sparse
    long form; keep them upstream if a dense long form is needed)."""
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    stacked = df.selectExpr(
        f"`{row_col}`",
        f"stack({len(value_cols)}, {pairs}) AS (`{key_name}`, "
        f"`{value_name}`)")
    return stacked.filter(F.col(value_name) != 0)
