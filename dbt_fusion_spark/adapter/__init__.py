from dbt_fusion_spark.adapter.spark_adapter import AdapterResponse, SparkAdapter  # noqa: F401
