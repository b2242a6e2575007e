"""Shuffle-skew diagnosis — the report you read before picking a join
strategy at 100 TB.

A skewed join key (one customer with 10M rows) stalls a whole stage on
one task. plans/join_strategies.py has the CURES (salting, broadcast);
this module is the DIAGNOSIS: per-key frequency distribution of a
prospective shuffle key, exact — heaviest keys, total rows, and how
dominant the head is. Run it on a sample or the full table; the output
is a handful of rows.

Scale shape: one groupBy on the key (map-side partial), then
TakeOrdered for the top-k and a 1-row aggregate for the totals —
never a global sort of the frequency table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def skew_report(df: DataFrame, key_cols: list[str] | str,
                top_k: int = 10) -> DataFrame:
    """Top-`top_k` heaviest key values of a prospective shuffle key,
    each with its share of ALL rows — the number that predicts the
    straggler task. Output: key value (stringified composite), n_rows,
    frac_of_total, rank."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counted = (
        df.groupBy(*keys)
        .agg(F.count("*").cast("bigint").alias("n_rows"))
        .select(
            F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
            .alias("key_value"),
            "n_rows",
        )
    )
    top = (counted.orderBy(F.desc("n_rows"), F.asc("key_value"))
           .limit(top_k))
    total = counted.agg(F.sum("n_rows").alias("__total"))
    from dbt_fusion_spark.llm.corpus import _join_scalar

    return (
        _join_scalar(top, "n_rows", total, "__total")
        .select(
            "key_value", "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 9)
            .alias("frac_of_total"),
        )
        .select(
            "key_value", "n_rows", "frac_of_total",
            # global window is bounded: it ranks the <= top_k rows
            # that survived the TakeOrdered, not the key table
            F.row_number().over(
                Window.orderBy(F.desc("n_rows"), F.asc("key_value")))
            .cast("int").alias("rank"),
        )
    )
