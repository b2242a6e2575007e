"""Training-data export: deterministic sharded writes + manifest.

The last stage of a pretraining pipeline is handing the corpus to the
trainer as a fixed set of shard files whose membership and order do not
depend on cluster size, partitioning, or execution history — rerunning
the export after a cluster resize must produce byte-identical shards,
and the trainer's dataloader addresses shards by index.

Spark-first shape (100 TB):
- shard assignment is the engine-portable md5 unit hash pmod n_shards —
  a pure function of (seed, key), NOT Spark's partition id (which
  changes with parallelism) nor monotonically_increasing_id (which
  changes with file layout);
- the write repartitions on the shard column and writes
  `partitionBy(shard)` so every shard is its own directory of
  one-or-few parquet files, each produced by map-side work only (one
  shuffle total);
- rows inside a shard are sortWithinPartitions-ordered by the portable
  hash (then key) so file content is reproducible, never dependent on
  upstream operator order;
- the manifest (shard -> rows, docs, payload bytes) is aggregated from
  the SAME shard expression, so it is exact for the written files and
  cheap (|n_shards| rows).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from dbt_fusion_spark.sample.strategies import _unit_hash


def with_shard(df: DataFrame, key_col: str, n_shards: int,
               seed: int = 42, shard_col: str = "shard") -> DataFrame:
    """Attach the deterministic shard index: pmod(md5-hash(seed|key),
    n_shards). Stable under repartitioning and corpus growth (a doc
    never moves shards when OTHER docs are added/removed)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return df.withColumn(
        shard_col, F.pmod(_unit_hash([key_col], seed), F.lit(n_shards)))


def shard_manifest(df: DataFrame, key_col: str, n_shards: int,
                   seed: int = 42,
                   size_cols: Sequence[str] = ()) -> DataFrame:
    """Per-shard statistics from the same shard assignment the writer
    uses: row count, distinct keys, and a sum per requested size column
    (e.g. n_chars, n_tokens) as `sum_<col>`. One partial-agg shuffle on
    the shard index; missing shards (possible when n_shards >> rows) are
    simply absent."""
    sharded = with_shard(df, key_col, n_shards, seed)
    aggs = [F.count("*").alias("n_rows"),
            F.count_distinct(F.col(key_col)).alias("n_keys")]
    aggs += [F.sum(c).cast("bigint").alias(f"sum_{c}") for c in size_cols]
    return sharded.groupBy("shard").agg(*aggs)


def write_training_shards(df: DataFrame, path: str, key_col: str,
                          n_shards: int, seed: int = 42,
                          order_cols: Sequence[str] = ()) -> DataFrame:
    """Write `path/shard=<s>/part-*.parquet` with deterministic shard
    membership and row order; returns the manifest of what was written
    (read back from the files, so it reflects the actual sink).

    Row order within a shard: portable hash then key then order_cols —
    a stable total order for duplicate-key corpora when order_cols pin
    the remaining freedom (e.g. an epoch index from upsample_epochs).

    One shuffle (repartition on shard); each shard directory's files
    are produced by the task(s) owning that shard hash — at 1000
    executors this is an embarrassingly parallel columnar write with no
    driver-side involvement.
    """
    sharded = with_shard(df, key_col, n_shards, seed)
    # `shard` leads the sort: FileFormatWriter requires task rows
    # ordered by the partitionBy columns and inserts its own —
    # stability-unspecified — sort when they are not, which would
    # scramble the in-shard order (observed: byte-diff between runs).
    # With shard first, the writer sees the ordering satisfied and
    # keeps the full (hash, key, order_cols) order.
    ordered = sharded.repartition(n_shards, "shard").sortWithinPartitions(
        F.col("shard"), _unit_hash([key_col], seed), F.col(key_col),
        *[F.col(c) for c in order_cols])
    ordered.write.mode("overwrite").partitionBy("shard").parquet(path)
    spark = df.sparkSession
    return (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.count("*").alias("n_rows"),
             F.count_distinct(F.col(key_col)).alias("n_keys"))
        .withColumn("shard", F.col("shard").cast("int"))
    )
