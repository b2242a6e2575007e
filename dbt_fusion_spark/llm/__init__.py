from dbt_fusion_spark.llm import dedup, multimodal, similarity, text  # noqa: F401
