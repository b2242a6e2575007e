"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship query on sf0.001; queries()/oracle_sql()
expose the engine's operator battery (populated by
dbt_fusion_spark.demo) for the DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dbt_fusion_spark.demo import QUERIES

    return QUERIES["tpch_q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dbt_fusion_spark.demo import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from dbt_fusion_spark.demo import ORACLES

    return dict(ORACLES)
