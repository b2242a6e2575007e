from dbt_fusion_spark.streaming.structured import (  # noqa: F401
    dynamic_table,
    stateful_sessionize,
    streaming_merge,
    streaming_table,
    windowed_aggregate,
)
