from dbt_fusion_spark.dag.graph import Dag, select_nodes  # noqa: F401
