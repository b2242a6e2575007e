from dbt_fusion_spark.project.loader import Project, load_project  # noqa: F401
from dbt_fusion_spark.project.nodes import Node  # noqa: F401
