from dbt_fusion_spark.adapter.query_cache import QueryCache  # noqa: F401
from dbt_fusion_spark.adapter.record_replay import (  # noqa: F401
    RecordingAdapter,
    ReplayAdapter,
)
from dbt_fusion_spark.adapter.spark_adapter import AdapterResponse, SparkAdapter  # noqa: F401
