from dbt_fusion_spark.testing.generic import (  # noqa: F401
    get_test_sql,
    test_accepted_values,
    test_not_null,
    test_relationships,
    test_unique,
)
from dbt_fusion_spark.testing.unit import build_fixture_sql, unit_test_sql  # noqa: F401
