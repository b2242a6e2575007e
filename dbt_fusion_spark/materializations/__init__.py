from dbt_fusion_spark.materializations.executors import (  # noqa: F401
    MATERIALIZATION_REGISTRY,
    materialize_incremental,
    materialize_seed,
    materialize_snapshot,
    materialize_table,
    materialize_view,
)
