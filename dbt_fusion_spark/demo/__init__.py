"""Demo query battery: the driver-facing surface of the engine.

Importing this package populates the QUERIES / ORACLES registries from
every submodule. Each entry exercises an engine operator (SURVEY.md §2)
and, where SQL-expressible, carries a DuckDB oracle.
"""

from dbt_fusion_spark.demo.registry import ORACLES, QUERIES  # noqa: F401

# Import for side effects: each module registers its queries.
from dbt_fusion_spark.demo import (  # noqa: F401, E402
    dialect_demo,
    functions_demo,
    incremental_demo,
    llm_demo,
    operators_demo,
    runner_demo,
    sampling_demo,
    semantic_demo,
    snapshot_demo,
    testing_demo,
    tpch,
    utils_demo,
)
