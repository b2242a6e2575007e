"""Unit tests: fixture synthesis + actual-vs-expected comparison SQL.

Re-expresses the reference unit-test materialization
(materializations/tests/unit.sql, helpers.sql:20-46 get_unit_test_sql)
and fixture synthesis (unit_test_sql/get_fixture_sql.sql:1-48):
fixtures become UNION ALL SELECT literals (missing columns padded with
typed NULLs, empty fixture = LIMIT 0); the model SQL runs against the
fixture CTEs; actual vs expected compare via two-way EXCEPT ALL with a
marker column. The emitted SQL is dialect-shared (runs on both Spark
and the DuckDB oracle verbatim).
"""

from __future__ import annotations


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    # backslash first: Spark string literals treat \ as an escape
    return "'" + str(v).replace("\\", "\\\\").replace("'", "''") + "'"


def build_fixture_sql(rows: list[dict], columns: dict[str, str]) -> str:
    """rows -> UNION ALL of typed literal SELECTs.

    `columns` maps name -> SQL type; a column absent from a row becomes
    CAST(NULL AS type) (get_fixture_sql.sql cast-null padding). Empty
    rows -> zero-row shape via WHERE FALSE."""
    cols = list(columns)
    if not rows:
        body = ", ".join(f"CAST(NULL AS {columns[c]}) AS {c}" for c in cols)
        return f"SELECT {body} WHERE FALSE"
    selects = []
    for r in rows:
        parts = []
        for c in cols:
            if c in r and r[c] is not None:
                parts.append(f"CAST({_lit(r[c])} AS {columns[c]}) AS {c}")
            else:
                parts.append(f"CAST(NULL AS {columns[c]}) AS {c}")
        selects.append("SELECT " + ", ".join(parts))
    return "\nUNION ALL\n".join(selects)


def unit_test_sql(model_sql: str, fixtures: dict[str, str], expected_sql: str) -> str:
    """helpers.sql:20-46: run model SQL with ref()/source() redirected to
    fixture CTEs; emit rows that differ (empty result = test passes)."""
    ctes = ",\n".join(f"{name} AS (\n{sql}\n)" for name, sql in fixtures.items())
    return (
        f"WITH {ctes},\n"
        f"dbt_internal_unit_test_actual AS (\n{model_sql}\n),\n"
        f"dbt_internal_unit_test_expected AS (\n{expected_sql}\n)\n"
        "SELECT 'actual' AS actual_or_expected, * FROM (\n"
        "  SELECT * FROM dbt_internal_unit_test_actual\n"
        "  EXCEPT ALL\n"
        "  SELECT * FROM dbt_internal_unit_test_expected)\n"
        "UNION ALL\n"
        "SELECT 'expected' AS actual_or_expected, * FROM (\n"
        "  SELECT * FROM dbt_internal_unit_test_expected\n"
        "  EXCEPT ALL\n"
        "  SELECT * FROM dbt_internal_unit_test_actual)"
    )
