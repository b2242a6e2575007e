from dbt_fusion_spark.streaming.structured import (  # noqa: F401
    dynamic_table,
    stateful_sessionize,
    stream_stream_join,
    streaming_ann_ingest,
    streaming_winnow_ingest,
    streaming_dedup,
    streaming_merge,
    streaming_psi_monitor,
    streaming_table,
    streaming_volume_monitor,
    windowed_aggregate,
)
