from dbt_fusion_spark.plans.join_strategies import (  # noqa: F401
    broadcast_dim,
    salted_join,
)
