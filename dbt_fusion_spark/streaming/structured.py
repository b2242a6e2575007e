"""Structured Streaming analogs of the reference's streaming-shaped
declarations (SURVEY §2.9).

The reference executes no streams itself; it *declares*:
- Databricks `streaming_table`
  (crates/dbt-adapter/src/relation/databricks/configs/streaming_table.rs:16)
- Snowflake `dynamic_table` with target_lag / refresh_mode / initialize
  (crates/dbt-adapter/src/relation/snowflake/dynamic_table.rs:141,215,285)
- microbatch incremental models (model_config.rs:79-82)

Here they become real Spark Structured Streaming pipelines:
- streaming_table  -> readStream → transform → writeStream.toTable
- dynamic_table    -> the same with trigger(processingTime=target_lag);
                      refresh_mode full ≈ complete mode, incremental ≈
                      append/update
- microbatch       -> trigger(availableNow=True) backfill — each micro-
                      batch lands idempotently, then the query stops
- late data        -> withWatermark(event_time, lookback)

Scale notes: state lives in the checkpoint (RocksDB on real clusters);
watermarks bound it. foreachBatch + MERGE gives exactly-once upserts —
the streaming twin of the incremental merge strategy.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery


def streaming_table(
    source: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    target_table: str,
    checkpoint: str,
    trigger: dict | None = None,
    output_mode: str = "append",
) -> StreamingQuery:
    """streaming_table materialization: continuous readStream →
    transform → writeStream.toTable."""
    out = transform(source)
    writer = (
        out.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.toTable(target_table)


def dynamic_table(
    source: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    target_table: str,
    checkpoint: str,
    target_lag: str = "60 seconds",
    refresh_mode: str = "incremental",
) -> StreamingQuery:
    """dynamic_table(target_lag, refresh_mode): refresh cadence maps to
    a processingTime trigger; 'full' refresh ≈ complete output of an
    aggregate, 'incremental' ≈ append."""
    mode = "complete" if refresh_mode == "full" else "append"
    return streaming_table(
        source, transform, target_table, checkpoint,
        trigger={"processingTime": target_lag}, output_mode=mode,
    )


def windowed_aggregate(
    events: DataFrame,
    event_time: str = "ts",
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window aggregate with late-data watermark — the
    streaming twin of the microbatch day-partition rollup. The
    `lookback` config of microbatch models is exactly this watermark."""
    keys = keys or ["event_type"]
    return (
        events.withWatermark(event_time, watermark)
        .groupBy(F.window(F.col(event_time), window_size).alias("win"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys, "n_events", "total_value",
        )
    )


def streaming_merge(
    source: DataFrame,
    target_table: str,
    unique_key: str | list[str],
    checkpoint: str,
    spark: SparkSession,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Exactly-once streaming upsert: foreachBatch + the engine's merge
    strategy per micro-batch (checkpoint makes batch ids replay-safe,
    merge makes the replay idempotent)."""
    from dbt_fusion_spark.incremental import merge as merge_fn

    def upsert(batch: DataFrame, batch_id: int) -> None:
        if not spark.catalog.tableExists(target_table):
            batch.write.saveAsTable(target_table)
            return
        merged = merge_fn(spark.table(target_table), batch, unique_key)
        merged.createOrReplaceTempView("__stream_merged")
        tmp = target_table + "__dbt_tmp"
        spark.sql(f"DROP TABLE IF EXISTS {tmp}")
        spark.sql(f"CREATE TABLE {tmp} AS SELECT * FROM __stream_merged")
        spark.sql(f"DROP TABLE {target_table}")
        spark.sql(f"ALTER TABLE {tmp} RENAME TO {target_table}")

    # update mode: each micro-batch delivers changed rows only — the
    # merge makes applying them idempotent (aggregations without
    # watermark are not allowed in append mode).
    writer = (
        source.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
