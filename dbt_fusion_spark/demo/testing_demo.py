"""Driver-gate queries for data tests & unit tests (SURVEY §2.1 test/unit).

The generic-test SQL and the unit-test compare SQL are dialect-shared,
so the oracle runs the very same text the engine generates.
"""

from __future__ import annotations

from dbt_fusion_spark.demo.registry import register
from dbt_fusion_spark.sources.registry import register_views, tables_in_sql
from dbt_fusion_spark.testing import (
    build_fixture_sql,
    get_test_sql,
    test_accepted_values,
    test_relationships,
    test_unique,
    unit_test_sql,
)

# unique over a genuinely non-unique column -> real failure rows wrapped
# by the severity calc (test.sql + helpers.sql:8-17)
_UNIQUE_WRAPPED = get_test_sql(test_unique("orders", "o_custkey"))


@register("data_test_unique_severity", oracle=_UNIQUE_WRAPPED)
def data_test_unique_severity(spark, sf_dir):
    register_views(spark, sf_dir, tables_in_sql(_UNIQUE_WRAPPED))
    return spark.sql(_UNIQUE_WRAPPED)


_ACCEPTED = get_test_sql(
    test_accepted_values("orders", "o_orderstatus", ["O", "F"])  # 'P' fails
)


@register("data_test_accepted_values", oracle=_ACCEPTED)
def data_test_accepted_values(spark, sf_dir):
    register_views(spark, sf_dir, tables_in_sql(_ACCEPTED))
    return spark.sql(_ACCEPTED)


_REL = get_test_sql(
    test_relationships("lineitem", "l_orderkey", to="orders", field="o_orderkey")
)


@register("data_test_relationships", oracle=_REL)
def data_test_relationships(spark, sf_dir):
    register_views(spark, sf_dir, tables_in_sql(_REL))
    return spark.sql(_REL)


# --- unit test: revenue model against literal fixtures -----------------

_FIXTURE_ORDERS = build_fixture_sql(
    [
        {"o_orderkey": 1, "o_custkey": 10, "o_totalprice": 100.0},
        {"o_orderkey": 2, "o_custkey": 10, "o_totalprice": 50.0},
        {"o_orderkey": 3, "o_custkey": 20},  # price padded to NULL
    ],
    {"o_orderkey": "BIGINT", "o_custkey": "BIGINT", "o_totalprice": "DOUBLE"},
)

_MODEL_SQL = """
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM fixture_orders GROUP BY o_custkey
"""

# expected: deliberately WRONG for custkey 20 (total 0 vs NULL) so the
# compare emits marker rows — proving the diff machinery, not just the
# happy path.
_EXPECTED = build_fixture_sql(
    [
        {"o_custkey": 10, "n_orders": 2, "total": 150.0},
        {"o_custkey": 20, "n_orders": 1, "total": 0.0},
    ],
    {"o_custkey": "BIGINT", "n_orders": "BIGINT", "total": "DOUBLE"},
)

_UNIT_SQL = unit_test_sql(_MODEL_SQL, {"fixture_orders": _FIXTURE_ORDERS}, _EXPECTED)


@register("unit_test_fixture_compare", oracle=_UNIT_SQL)
def unit_test_fixture_compare(spark, sf_dir):
    register_views(spark, sf_dir, tables_in_sql(_UNIT_SQL))
    return spark.sql(_UNIT_SQL)
