from dbt_fusion_spark.incremental.strategies import (  # noqa: F401
    append,
    delete_insert,
    insert_overwrite,
    merge,
    microbatch_windows,
    replace_where,
)
