"""Registry mapping query names to (spark callable, duckdb oracle SQL).

Contract (driver): each callable takes (SparkSession, sf_dir) and
returns a DataFrame; ORACLES[name] is ANSI SQL DuckDB runs over the
same parquet views. Column names must match exactly — every computed
column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_fusion_spark.sources.registry import register_views, tables_in_sql

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _claim(name: str) -> None:
    """Duplicate registrations fail LOUDLY at import: a silent
    overwrite swaps the semantics behind an already-certified registry
    name (caught live in r11 — a new sequential funnel shadowed the r7
    flag-funnel under the same name until gated output rows changed)."""
    if name in QUERIES:
        raise RuntimeError(
            f"duplicate query registration: {name!r} is already "
            f"registered by {QUERIES[name].__module__}."
            f"{QUERIES[name].__name__}; pick a distinct name")


def register(name: str, oracle: str | None = None):
    """Decorator registering a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn):
        _claim(name)
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def sql_query(name: str, sql: str, oracle: str | None = None) -> None:
    """Register a query whose Spark side is `spark.sql(sql)` over the
    source views. When `oracle` is omitted the SAME text runs on DuckDB —
    the dialect-shared subset is the cheapest correctness win."""

    needed = tables_in_sql(sql)

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, needed)
        return spark.sql(sql)

    fn.__name__ = f"q_{name}"
    _claim(name)
    QUERIES[name] = fn
    ORACLES[name] = oracle if oracle is not None else sql
