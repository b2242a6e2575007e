from dbt_fusion_spark.sources.registry import TABLES, load_table, register_views  # noqa: F401
