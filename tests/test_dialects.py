"""Dialect translation: snowflake/bigquery/redshift/trino SQL executed
on Spark after translate_sql — every case runs live, not just string-
compares, because the point is executable parity."""

from __future__ import annotations

import pytest

from dbt_fusion_spark.sql import translate_sql


def run1(spark, sql):
    return spark.sql(sql).collect()[0][0]


# --- snowflake ----------------------------------------------------------


def test_snowflake_iff_nvl_zeroifnull(spark):
    sql = translate_sql(
        "SELECT IFF(1 > 0, 'y', 'n') || ZEROIFNULL(NULL)", "snowflake")
    assert run1(spark, sql) == "y0"


def test_snowflake_dateadd_datediff(spark):
    sql = translate_sql(
        "SELECT DATEDIFF(day, '2024-01-01'::date, "
        "DATEADD(day, 9, '2024-01-01'::date))", "snowflake")
    assert run1(spark, sql) == 9


def test_snowflake_listagg(spark):
    sql = translate_sql(
        "SELECT LISTAGG(x, ',') FROM VALUES ('b'), ('a'), ('c') AS t(x)",
        "snowflake")
    assert run1(spark, sql) == "a,b,c"


def test_snowflake_charindex_argswap(spark):
    sql = translate_sql("SELECT CHARINDEX('lo', 'hello')", "snowflake")
    assert run1(spark, sql) == 4


def test_snowflake_to_varchar_to_number(spark):
    sql = translate_sql(
        "SELECT TO_VARCHAR(42) || '-' || CAST(TO_NUMBER('7') AS STRING)",
        "snowflake")
    assert run1(spark, sql) == "42-7"


def test_snowflake_qualify(spark):
    sql = translate_sql("""
        SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rn
        FROM VALUES (30), (10), (20) AS t(x)
        QUALIFY rn <= 2
        ORDER BY x
    """, "snowflake")
    rows = spark.sql(sql).collect()
    assert [r["x"] for r in rows] == [10, 20]


def test_snowflake_qualify_inline_window(spark):
    sql = translate_sql("""
        SELECT x FROM VALUES (30), (10), (20) AS t(x)
        QUALIFY ROW_NUMBER() OVER (ORDER BY x DESC) = 1
    """, "snowflake")
    rows = spark.sql(sql).collect()
    assert [r["x"] for r in rows] == [30]


def test_string_literals_protected(spark):
    # 'IFF(' inside a string literal must NOT be rewritten
    sql = translate_sql("SELECT 'IFF(a,b,c)' AS s", "snowflake")
    assert run1(spark, sql) == "IFF(a,b,c)"


# --- bigquery -----------------------------------------------------------


def test_bigquery_safe_cast_divide_countif(spark):
    sql = translate_sql(
        "SELECT SAFE_CAST('x' AS INT) IS NULL AND SAFE_DIVIDE(1, 0) IS NULL",
        "bigquery")
    assert run1(spark, sql) is True
    sql = translate_sql(
        "SELECT COUNTIF(x > 1) FROM VALUES (1), (2), (3) AS t(x)", "bigquery")
    assert run1(spark, sql) == 2


def test_bigquery_format_date(spark):
    sql = translate_sql(
        "SELECT FORMAT_DATE('%Y-%m', DATE '2024-03-15')", "bigquery")
    assert run1(spark, sql) == "2024-03"


def test_bigquery_regexp_contains_logical_or(spark):
    sql = translate_sql(
        "SELECT REGEXP_CONTAINS('abc123', '[0-9]+') AND "
        "(SELECT LOGICAL_OR(b) FROM VALUES (false), (true) AS t(b))",
        "bigquery")
    assert run1(spark, sql) is True


# --- redshift -----------------------------------------------------------


def test_redshift_len_getdate_nvl2(spark):
    sql = translate_sql(
        "SELECT LEN('abcd') + NVL2(NULL, 1, 10)", "redshift")
    assert run1(spark, sql) == 14
    sql = translate_sql("SELECT GETDATE() IS NOT NULL", "redshift")
    assert run1(spark, sql) is True


def test_redshift_strtol(spark):
    sql = translate_sql("SELECT STRTOL('ff', 16)", "redshift")
    assert run1(spark, sql) == 255


# --- trino --------------------------------------------------------------


def test_trino_functions(spark):
    sql = translate_sql(
        "SELECT APPROX_DISTINCT(x) FROM VALUES (1), (2), (2) AS t(x)",
        "trino")
    assert run1(spark, sql) == 2
    sql = translate_sql("SELECT STRPOS('hello', 'lo')", "trino")
    assert run1(spark, sql) == 4
    sql = translate_sql(
        "SELECT DATE_DIFF('day', DATE '2024-01-01', DATE '2024-01-11')",
        "trino")
    assert run1(spark, sql) == 10
    sql = translate_sql(
        "SELECT JSON_EXTRACT_SCALAR('{\"k\": 5}', '$.k')", "trino")
    assert run1(spark, sql) == "5"
    sql = translate_sql("SELECT CARDINALITY(ARRAY(1, 2, 3))", "trino")
    assert run1(spark, sql) == 3


# --- passthrough & runner integration ----------------------------------


def test_spark_passthrough():
    sql = "SELECT IFF(1, 2, 3)"  # would change under snowflake
    assert translate_sql(sql, None) == sql
    assert translate_sql(sql, "spark") == sql
    assert translate_sql(sql, "databricks") == sql
    with pytest.raises(ValueError):
        translate_sql(sql, "oracle9i")


def test_runner_honors_model_dialect(spark, tmp_path):
    from dbt_fusion_spark.project.scaffold import init_project
    from dbt_fusion_spark.runner import DbtSparkRunner

    root = init_project(tmp_path / "proj")
    (root / "models" / "snow_model.sql").write_text(
        "{{ config(materialized='table', dialect='snowflake') }}\n"
        "SELECT IFF(amount > 15, 'big', 'small') AS bucket, order_id, amount\n"
        "FROM {{ ref('orders') }}\n"
        "QUALIFY ROW_NUMBER() OVER (ORDER BY amount DESC) <= 2\n")
    runner = DbtSparkRunner(spark, str(root),
                            profile={"schema": "dlx", "name": "dev"})
    rr = runner.run(select="+snow_model", include_tests=False)
    assert rr.ok, [r.message for r in rr.results if r.status == "error"]
    rows = spark.sql("SELECT bucket FROM dlx.snow_model").collect()
    assert len(rows) == 2 and all(r["bucket"] == "big" for r in rows)


# --- translation boundary (sql/DIALECTS.md) ----------------------------
# The contract for constructs OUTSIDE the rewrite map: they reach
# Spark's parser verbatim and raise loudly — never execute silently
# with changed semantics. One probe per documented loud-failure row.

_BOUNDARY_CASES = [
    ("snowflake", "SELECT id FROM t START WITH id = 1 CONNECT BY PRIOR id = id"),
    ("snowflake", "SELECT * FROM t AT(TIMESTAMP => '2024-01-01')"),
    ("snowflake", "SELECT OBJECT_KEYS(s) FROM t"),
    ("snowflake", "SELECT * FROM TABLE(FLATTEN(input => arr))"),
    ("snowflake", "SELECT $1 FROM @stage"),
    ("bigquery", "SELECT x FROM t, UNNEST(arr) AS x"),
    ("bigquery", "SELECT SAFE.SUBSTR(s, 1, 2) FROM t"),
    ("bigquery", "SELECT ARRAY<BIGINT>[1, 2]"),
    ("bigquery", "SELECT * FROM t FOR SYSTEM_TIME AS OF '2024-01-01'"),
    ("redshift", "SELECT TOP 3 id FROM t"),
    ("redshift", "SELECT CONVERT(INTEGER, s) FROM t"),
    ("redshift", "SELECT id INTO #tmp FROM t"),
    # three-array UNNEST stays outside the translated shapes
    ("trino", "SELECT x FROM t CROSS JOIN UNNEST(arr, arr, arr) AS u(x, y, z)"),
    ("trino", "SELECT TRY(1/0)"),
    ("trino", "SELECT ROW(1, 2)"),
    ("trino", "SELECT MAP(ARRAY[1,2], ARRAY['a','b'])"),
    ("trino", "SELECT ARRAY[1,2,3]"),
]


@pytest.mark.parametrize("dialect,sql", _BOUNDARY_CASES,
                         ids=[f"{d}-{i}" for i, (d, _) in
                              enumerate(_BOUNDARY_CASES)])
def test_unsupported_construct_fails_loudly(spark, dialect, sql):
    from pyspark.errors.exceptions.captured import (
        AnalysisException,
        ParseException,
    )

    spark.range(5).selectExpr(
        "id", "cast(id as string) s", "array(id, id+1) arr"
    ).createOrReplaceTempView("t")
    with pytest.raises((ParseException, AnalysisException)):
        spark.sql(translate_sql(sql, dialect)).collect()


def test_documented_passthroughs_keep_semantics(spark):
    """Constructs the boundary doc declares pass-through must execute
    with the source dialect's semantics unchanged."""
    spark.range(5).selectExpr(
        "id", "cast(id as string) s", "array(id, id+1) arr"
    ).createOrReplaceTempView("t")
    # redshift DECODE == Spark's Oracle-style decode
    assert run1(spark, translate_sql(
        "SELECT DECODE(1, 1, 'one', 'other')", "redshift")) == "one"
    # trino lambdas share Spark's syntax
    assert run1(spark, translate_sql(
        "SELECT cardinality(filter(arr, x -> x > 4)) FROM t WHERE id = 4",
        "trino")) == 1  # arr = [4, 5] -> only 5 survives
    # snowflake :: cast is valid Spark 4
    assert run1(spark, translate_sql(
        "SELECT 7::string", "snowflake")) == "7"


def test_split_literal_delimiter(spark):
    """Warehouse SPLIT takes a LITERAL delimiter; Spark's split takes a
    regex. '|' would split every character if passed through raw."""
    for d in ("snowflake", "trino"):
        sql = translate_sql("SELECT SPLIT('a|b|c', '|')", d)
        assert run1(spark, sql) == ["a", "b", "c"], (d, sql)
    # regex metachars stay literal
    assert run1(spark, translate_sql(
        "SELECT SPLIT('x.y.z', '.')", "snowflake")) == ["x", "y", "z"]
    # BQ 1-arg form defaults to ','
    assert run1(spark, translate_sql(
        "SELECT SPLIT('a,b')", "bigquery")) == ["a", "b"]
    # SPLIT_PART is untouched (Spark-native, already literal)
    assert run1(spark, translate_sql(
        "SELECT SPLIT_PART('a|b|c', '|', 2)", "snowflake")) == "b"


def test_bigquery_date_arithmetic(spark):
    import datetime

    assert run1(spark, translate_sql(
        "SELECT DATE_DIFF(DATE '2024-03-10', DATE '2024-03-01', DAY)",
        "bigquery")) == 9
    assert run1(spark, translate_sql(
        "SELECT TIMESTAMP_DIFF(TIMESTAMP '2024-01-01 12:00:00',"
        " TIMESTAMP '2024-01-01 09:30:00', MINUTE)", "bigquery")) == 150
    assert run1(spark, translate_sql(
        "SELECT DATE_ADD(DATE '2024-02-27', INTERVAL 3 DAY)",
        "bigquery")) == datetime.date(2024, 3, 1)
    assert run1(spark, translate_sql(
        "SELECT DATE_SUB(DATE '2024-03-01', INTERVAL 2 MONTH)",
        "bigquery")) == datetime.date(2024, 1, 1)
    assert run1(spark, translate_sql(
        "SELECT FORMAT_TIMESTAMP('%Y-%m-%d %H', TIMESTAMP"
        " '2024-05-06 07:08:09')", "bigquery")) == "2024-05-06 07"


# --- round-3 additions --------------------------------------------------


def test_snowflake_json_path_access(spark):
    sql = translate_sql(
        """SELECT v:user.name::string || '-' || v:tags[0]::string
           FROM (SELECT '{"user": {"name": "ada"}, "tags": ["x"]}' AS v)""",
        "snowflake")
    assert run1(spark, sql) == "ada-x"


def test_snowflake_json_path_skips_casts(spark):
    # `::` casts must never be mistaken for a path access
    sql = translate_sql("SELECT '7'::int + 1", "snowflake")
    assert run1(spark, sql) == 8


def test_snowflake_lateral_flatten(spark):
    sql = translate_sql(
        "SELECT t.id, f.index, f.value FROM "
        "(SELECT 1 AS id, ARRAY_CONSTRUCT('a', 'b') AS arr) t, "
        "LATERAL FLATTEN(INPUT => t.arr) f",
        "snowflake")
    rows = [tuple(r) for r in spark.sql(sql).collect()]
    assert rows == [(1, 0, "a"), (1, 1, "b")]  # index is 0-based


def test_snowflake_to_char_to_date_tokens(spark):
    sql = translate_sql(
        "SELECT TO_CHAR(TO_DATE('2024-03-05', 'YYYY-MM-DD'), 'DD/MON/YYYY')",
        "snowflake")
    assert run1(spark, sql) == "05/Mar/2024"


def test_trino_unnest_single(spark):
    sql = translate_sql(
        "SELECT x FROM (SELECT 1) CROSS JOIN UNNEST(ARRAY(10, 20)) AS t (x)",
        "trino")
    assert [r["x"] for r in spark.sql(sql).collect()] == [10, 20]


def test_trino_unnest_with_ordinality(spark):
    sql = translate_sql(
        "SELECT x, n FROM (SELECT 1) "
        "CROSS JOIN UNNEST(ARRAY(10, 20)) WITH ORDINALITY AS t (x, n)",
        "trino")
    rows = [(r["x"], r["n"]) for r in spark.sql(sql).collect()]
    assert rows == [(10, 1), (20, 2)]  # trino ordinality is 1-based


def test_trino_unnest_two_arrays_zip(spark):
    sql = translate_sql(
        "SELECT a, b FROM (SELECT 1) "
        "CROSS JOIN UNNEST(ARRAY(1, 2, 3), ARRAY('x', 'y')) AS t (a, b)",
        "trino")
    rows = [(r["a"], r["b"]) for r in spark.sql(sql).collect()]
    assert rows == [(1, "x"), (2, "y"), (3, None)]  # zip pads to longest


def test_bigquery_array_agg_ignore_nulls(spark):
    sql = translate_sql(
        "SELECT ARRAY_AGG(x IGNORE NULLS) FROM "
        "VALUES (1), (NULL), (3) AS t(x)", "bigquery")
    assert sorted(run1(spark, sql)) == [1, 3]


def test_databricks_colon_path_and_qualify(spark):
    sql = translate_sql(
        "SELECT v, j:a.b AS ab FROM "
        "(SELECT 1 AS v, '{\"a\": {\"b\": 7}}' AS j) "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY v) = 1", "databricks")
    assert "GET_JSON_OBJECT(j, '$.a.b')" in sql
    assert "QUALIFY" not in sql.upper().replace("__QUALIFY_P", "")
    rows = spark.sql(sql).collect()
    assert [(r["v"], r["ab"]) for r in rows] == [(1, "7")]


def test_databricks_passthrough_preserves_spark_sql(spark):
    # ::casts, string literals holding colon paths, and plain Spark SQL
    # survive untouched — Databricks SQL IS Spark SQL outside the two
    # rewritten constructs
    src = "SELECT '5'::int AS a, 'see j:k here' AS s, array(1, 2)[0] AS e"
    out = translate_sql(src, "databricks")
    assert out == src
    r = spark.sql(out).collect()[0]
    assert (r["a"], r["s"], r["e"]) == (5, "see j:k here", 1)
