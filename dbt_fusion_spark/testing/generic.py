"""Data tests: generic test SQL generators + severity wrapper.

Re-expresses the reference's generic tests
(dbt_macro_assets/dbt-adapters/macros/generic_test_sql/{unique,not_null,
accepted_values,relationships}.sql) and the test materialization wrapper
(materializations/tests/test.sql + helpers.sql:8-17):

    select {fail_calc} as failures,
           {fail_calc} {warn_if} as should_warn,
           {fail_calc} {error_if} as should_error
    from (main_sql [limit N]) dbt_internal_test

Severity config (warn_if/error_if/fail_calc/limit) mirrors
crates/dbt-schemas common.rs:1007-1016.
"""

from __future__ import annotations

from dataclasses import dataclass


def test_unique(model: str, column_name: str) -> str:
    # generic_test_sql/unique.sql
    return (
        f"SELECT {column_name} AS unique_field, COUNT(*) AS n_records\n"
        f"FROM {model}\n"
        f"WHERE {column_name} IS NOT NULL\n"
        f"GROUP BY {column_name}\n"
        f"HAVING COUNT(*) > 1"
    )


def test_not_null(model: str, column_name: str) -> str:
    # generic_test_sql/not_null.sql
    return f"SELECT {column_name} FROM {model} WHERE {column_name} IS NULL"


def test_accepted_values(model: str, column_name: str, values: list,
                         quote: bool = True) -> str:
    # generic_test_sql/accepted_values.sql
    rendered = ", ".join(f"'{v}'" if quote else str(v) for v in values)
    return (
        f"SELECT {column_name} AS value_field, COUNT(*) AS n_records\n"
        f"FROM {model}\n"
        f"GROUP BY {column_name}\n"
        f"HAVING {column_name} NOT IN ({rendered})"
    )


def test_relationships(model: str, column_name: str, to: str, field: str) -> str:
    # generic_test_sql/relationships.sql
    return (
        f"SELECT child.from_field FROM (\n"
        f"  SELECT {column_name} AS from_field FROM {model}\n"
        f"  WHERE {column_name} IS NOT NULL) child\n"
        f"LEFT JOIN (SELECT {field} AS to_field FROM {to}) parent\n"
        f"ON child.from_field = parent.to_field\n"
        f"WHERE parent.to_field IS NULL"
    )


def get_test_sql(main_sql: str, fail_calc: str = "count(*)",
                 warn_if: str = "!= 0", error_if: str = "!= 0",
                 limit: int | None = None) -> str:
    # materializations/tests/helpers.sql:8-17
    limited = f"{main_sql}\nLIMIT {limit}" if limit is not None else main_sql
    return (
        f"SELECT {fail_calc} AS failures,\n"
        f"       {fail_calc} {warn_if} AS should_warn,\n"
        f"       {fail_calc} {error_if} AS should_error\n"
        f"FROM (\n{limited}\n) dbt_internal_test"
    )


@dataclass
class TestResult:
    failures: int
    should_warn: bool
    should_error: bool

    @property
    def status(self) -> str:
        if self.should_error:
            return "fail"
        if self.should_warn:
            return "warn"
        return "pass"


def run_test(spark, main_sql: str, **kwargs) -> TestResult:
    row = spark.sql(get_test_sql(main_sql, **kwargs)).collect()[0]
    return TestResult(row["failures"], bool(row["should_warn"]),
                      bool(row["should_error"]))
