"""Exact table profiling: per-column stats in ONE aggregate pass.

Beyond-reference surface (data-quality companion to the adapter's
describe/analyze ops, spark_adapter.py): the long-format profile every
warehouse team runs before trusting a 100 TB table — row count, null
count, exact distinct count, min/max — computed declaratively so
Catalyst plans a single scan.

Scale notes:
- All per-column aggregates ride one Aggregate node; Spark rewrites
  the multiple COUNT(DISTINCT)s into ONE Expand (+n_cols-fold row
  multiplication) feeding a single shuffle — exact, and the standard
  price of exact NDV. For quick profiles at fleet scale pass
  exact_distinct=False to use HLL approx_count_distinct instead
  (not oracle-portable: HLL sketches are engine-specific, which is
  exactly why the KMV sketch in llm/sketch.py exists).
- min/max emission is canonicalized for cross-engine comparison:
  float columns go through DECIMAL(38,9) (IEEE doubles print
  differently per engine; decimals print identically), timestamps
  through an explicit microsecond format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _minmax_exprs(col: str, dtype: str) -> tuple:
    c = F.col(col)
    if dtype in ("double", "float"):
        dec = c.cast("decimal(38,9)")
        return (F.min(dec).cast("string"), F.max(dec).cast("string"))
    if dtype.startswith("timestamp"):
        return (F.date_format(F.min(c), _TS_FMT),
                F.date_format(F.max(c), _TS_FMT))
    return (F.min(c).cast("string"), F.max(c).cast("string"))


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  exact_distinct: bool = True) -> DataFrame:
    """Long-format profile: one row per column with
    (column, n_rows, n_nulls, n_distinct, min_value, max_value)."""
    from dbt_fusion_spark.plans.partitioning import ensure_parallelism

    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    # The Expand below multiplies rows (n_cols+1)-fold BEFORE the first
    # exchange; an under-parallelized scan would run all of it on one
    # core (single-file local inputs — no-op at fleet scale).
    df = ensure_parallelism(df)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__total")]
    for i, c in enumerate(cols):
        nd = (F.countDistinct(F.col(c)) if exact_distinct
              else F.approx_count_distinct(F.col(c)))
        mn, mx = _minmax_exprs(c, dtypes[c])
        aggs += [
            F.count(F.col(c)).cast("bigint").alias(f"__cnt_{i}"),
            nd.cast("bigint").alias(f"__nd_{i}"),
            mn.alias(f"__mn_{i}"),
            mx.alias(f"__mx_{i}"),
        ]
    one = df.agg(*aggs)
    stack_args = []
    for i, c in enumerate(cols):
        stack_args.append(
            f"'{c}', __total - __cnt_{i}, __nd_{i}, __mn_{i}, __mx_{i}")
    gen = (f"stack({len(cols)}, " + ", ".join(stack_args)
           + ") AS (column, n_nulls, n_distinct, min_value, max_value)")
    return (one.select(F.col("__total").alias("n_rows"), F.expr(gen))
               .select("column", "n_rows", "n_nulls", "n_distinct",
                       "min_value", "max_value"))
