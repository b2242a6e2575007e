"""Input-parallelism guard shared by scan-heavy operators.

A single parquet file is one row group is ONE scan partition — Spark
cannot split inside a row group, so `maxPartitionBytes` does not help:
every per-row expansion stacked on that scan (shingling, hashing,
Expand for multi-distinct aggregates) runs on one core. This helper
repartitions ONLY under-parallelized inputs up to the cluster's core
count; at real scale inputs already carry >= cores partitions and it
is a no-op — no shuffle is ever added for big inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition `df` to defaultParallelism iff it has fewer
    partitions than that (observed 30s -> 3s on local[32] for the
    shingle->minhash pipeline over a single-file corpus)."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
