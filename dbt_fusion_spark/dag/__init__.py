from dbt_fusion_spark.dag.graph import (  # noqa: F401
    Dag,
    select_by_definition,
    select_nodes,
)
