from dbt_fusion_spark.sql.dialects import translate_sql  # noqa: F401
