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


# --- dbt_utils generic tests (the 8 most-installed community tests;
# SQL shapes match dbt-utils macros/generic_tests/*.sql semantics,
# re-expressed as Spark SQL generators like the built-ins above) ---


def test_expression_is_true(model: str, expression: str,
                            where: str | None = None) -> str:
    # dbt_utils.expression_is_true: rows where the expression does NOT
    # hold fail (NULL counts as not-true)
    base = f"SELECT * FROM {model}"
    if where:
        base += f" WHERE {where}"
    return (f"SELECT * FROM ({base}) dbt_subquery\n"
            f"WHERE NOT({expression}) OR ({expression}) IS NULL")


def test_unique_combination_of_columns(model: str,
                                       combination: list[str]) -> str:
    cols = ", ".join(combination)
    return (f"SELECT {cols}, COUNT(*) AS n_records\n"
            f"FROM {model}\nGROUP BY {cols}\nHAVING COUNT(*) > 1")


def test_accepted_range(model: str, column_name: str,
                        min_value=None, max_value=None,
                        inclusive: bool = True) -> str:
    lo_op, hi_op = (">=", "<=") if inclusive else (">", "<")
    conds = []
    if min_value is not None:
        conds.append(f"NOT ({column_name} {lo_op} {min_value})")
    if max_value is not None:
        conds.append(f"NOT ({column_name} {hi_op} {max_value})")
    return (f"SELECT {column_name} FROM {model}\n"
            f"WHERE {' OR '.join(conds) if conds else 'FALSE'}")


def test_not_null_proportion(model: str, column_name: str,
                             at_least: float, at_most: float = 1.0) -> str:
    # fails when the non-null proportion falls outside [at_least, at_most]
    return (
        f"WITH validation AS (\n"
        f"  SELECT SUM(CASE WHEN {column_name} IS NOT NULL THEN 1 ELSE 0 END)"
        f" / CAST(COUNT(*) AS DOUBLE) AS not_null_proportion\n"
        f"  FROM {model})\n"
        f"SELECT not_null_proportion FROM validation\n"
        f"WHERE not_null_proportion < {at_least}"
        f" OR not_null_proportion > {at_most}"
    )


def test_equal_rowcount(model: str, compare_model: str) -> str:
    # one failing row when counts differ (fail_calc-compatible shape)
    return (
        f"WITH a AS (SELECT COUNT(*) AS c FROM {model}),\n"
        f"b AS (SELECT COUNT(*) AS c FROM {compare_model})\n"
        f"SELECT a.c AS count_a, b.c AS count_b FROM a, b WHERE a.c <> b.c"
    )


def test_fewer_rows_than(model: str, compare_model: str) -> str:
    return (
        f"WITH a AS (SELECT COUNT(*) AS c FROM {model}),\n"
        f"b AS (SELECT COUNT(*) AS c FROM {compare_model})\n"
        f"SELECT a.c AS count_model, b.c AS count_compare\n"
        f"FROM a, b WHERE a.c >= b.c"
    )


def test_recency(model: str, field: str, datepart: str, interval: int) -> str:
    # fails when max(field) is older than now - interval
    return (
        f"SELECT MAX({field}) AS most_recent FROM {model}\n"
        f"HAVING MAX({field}) < current_timestamp() -"
        f" INTERVAL {interval} {datepart}"
    )


def test_relationships_where(model: str, column_name: str, to: str,
                             field: str, from_condition: str = "1=1",
                             to_condition: str = "1=1") -> str:
    return (
        f"SELECT child.from_field FROM (\n"
        f"  SELECT {column_name} AS from_field FROM {model}\n"
        f"  WHERE {column_name} IS NOT NULL AND {from_condition}) child\n"
        f"LEFT JOIN (SELECT {field} AS to_field FROM {to}\n"
        f"  WHERE {to_condition}) parent\n"
        f"ON child.from_field = parent.to_field\n"
        f"WHERE parent.to_field IS NULL"
    )


def test_volume_anomaly(model: str, column_name: str, window: int = 7,
                        min_periods: int = 3, z_thresh: float = 3.0,
                        group_by: str | None = None) -> str:
    """Observability volume check as a schema test (the data-test twin
    of plans/anomaly.volume_anomalies): fails with one row per day
    whose row count deviates > z_thresh trailing z-scores from the
    previous `window` days (current excluded), including gap-filled
    zero-count days and flat-baseline breaks. `column_name` is the
    event-time column; `group_by` optionally checks per segment."""
    grp = f"{group_by}, " if group_by else ""
    gsel = f"s.{group_by}, " if group_by else ""
    gjoin = (f"s.{group_by} = c.{group_by} AND " if group_by else "")
    part = f"PARTITION BY {group_by} " if group_by else ""
    return f"""
WITH counts AS (
  SELECT {grp}date_trunc('day', {column_name}) AS bucket,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM {model}
  GROUP BY {grp}date_trunc('day', {column_name})),
bounds AS (
  SELECT {grp}MIN(bucket) AS lo, MAX(bucket) AS hi
  FROM counts {("GROUP BY " + group_by) if group_by else ""}),
spine AS (
  SELECT {grp}explode(sequence(lo, hi, interval 1 day)) AS bucket
  FROM bounds),
filled AS (
  SELECT {gsel}s.bucket, COALESCE(c.n, 0) AS n_rows
  FROM spine s LEFT JOIN counts c
    ON {gjoin}s.bucket = c.bucket),
stats AS (
  SELECT {grp}bucket, n_rows,
         AVG(n_rows) OVER w AS mu,
         STDDEV_SAMP(n_rows) OVER w AS sd,
         COUNT(*) OVER w AS nw
  FROM filled
  WINDOW w AS ({part}ORDER BY bucket
               ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING))
SELECT {grp}bucket, CAST(n_rows AS BIGINT) AS n_rows,
       round(CASE WHEN nw >= {min_periods} AND sd > 0
                  THEN (n_rows - mu) / sd END, 6) AS z
FROM stats
WHERE COALESCE(abs(CASE WHEN nw >= {min_periods} AND sd > 0
                        THEN (n_rows - mu) / sd END) > {z_thresh}, FALSE)
   OR COALESCE(nw >= {min_periods} AND sd = 0 AND n_rows <> mu, FALSE)
"""
