"""SparkSession factory tuned for this engine.

Defaults target correctness-vs-DuckDB (UTC session timezone) and
local[32] benchmarking, while remaining cluster-safe: every setting here
is also what you'd want on a 1000-executor cluster (AQE on, dynamic
partition overwrite, Arrow transfers), except shuffle partitions which
scale with cores locally and would be set higher (or left to AQE) on a
real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "dbt-fusion-spark",
    cpus: str | int | None = None,
    warehouse_dir: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    conf: dict[str, str] = {
        # Correctness: DuckDB timestamps are UTC-naive; pin Spark to UTC so
        # collected datetimes agree with the oracle.
        "spark.sql.session.timeZone": "UTC",
        # Scale: AQE re-plans at runtime (skew joins, partition coalescing)
        # — the single most important flag for the 100 TB target.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # insert_overwrite materializations replace only touched partitions.
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
        # Local-mode parallelism ~= cores. On a cluster this would be
        # ~2-3x total cores or left to AQE's initial partition num.
        "spark.sql.shuffle.partitions": cpus,
        # Arrow for toPandas()/pandas UDFs (vectorized python boundary).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        "spark.ui.enabled": "false",
        # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as long and convert in the source registry.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.parquet.compression.codec": "snappy",
    }
    if warehouse_dir:
        conf["spark.sql.warehouse.dir"] = warehouse_dir
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
