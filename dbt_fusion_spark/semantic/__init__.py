from dbt_fusion_spark.semantic.compiler import (  # noqa: F401
    compile_metric_sql,
    compile_saved_query_sql,
)
