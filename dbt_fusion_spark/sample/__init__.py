from dbt_fusion_spark.sample.strategies import (  # noqa: F401
    sample_branch,
    sample_clone,
    sample_group,
    sample_hash,
    sample_limit,
    sample_pass,
    sample_random,
    sample_random_portable,
    sample_stratified,
    sample_stratified_portable,
    sample_time,
)
