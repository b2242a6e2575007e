from dbt_fusion_spark.jinja.environment import (  # noqa: F401
    CompileError,
    compile_node,
    parse_node,
)
