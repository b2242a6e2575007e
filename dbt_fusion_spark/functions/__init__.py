from dbt_fusion_spark.functions import crossdb  # noqa: F401
