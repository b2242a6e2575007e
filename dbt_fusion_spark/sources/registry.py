"""Source registry: external parquet tables registered as Spark views.

Mirrors the reference's notion of *sources* (DbtSource,
crates/dbt-schemas/src/schemas/nodes.rs:3084-3114): externally-loaded
relations that models reference by name. Here a "source" is a parquet
path registered as a temp view; on a cluster it would be a catalog
table. Registration is metadata-only — Catalyst still pushes filters
and prunes columns down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long (see session.py nanosAsLong);
        # convert to microsecond timestamps — DuckDB does the same on
        # read. Integer DIV, not /1000: epoch nanos (~1e18) exceed
        # double's 53-bit mantissa, so float division drifts by ±1 µs.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each source parquet as a temp view (idempotent)."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
