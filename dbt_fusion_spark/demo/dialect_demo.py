"""Gate queries for the SQL dialect translation layer (sql/dialects.py).

Each query is written in a FOREIGN dialect (snowflake / bigquery /
trino / redshift), translated by `translate_sql`, and executed by
Spark; the oracle restates the intended semantics in DuckDB SQL. A
hash match proves the translation preserved meaning, not just parsed.

Reference parity: crates/dbt-sql/dbt-lexer-{snowflake,bigquery,
redshift,trino} — the reference comprehends these dialects; here they
execute.
"""

from __future__ import annotations

from dbt_fusion_spark.demo.registry import register
from dbt_fusion_spark.sources.registry import register_views
from dbt_fusion_spark.sql.dialects import translate_sql

_SNOWFLAKE_TOPN = """
SELECT o_custkey, o_orderkey, o_totalprice,
       IFF(o_totalprice > 150000, 'big', 'small') AS bucket,
       DATEADD('day', 30, o_orderdate) AS due_date,
       CHARINDEX('-', o_orderpriority) AS dash_pos
FROM orders
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY o_custkey
  ORDER BY o_totalprice DESC, o_orderkey) = 1
"""


@register(
    "dialect_snowflake_qualify_topn",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CASE WHEN o_totalprice > 150000 THEN 'big' ELSE 'small' END
             AS bucket,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(instr(o_orderpriority, '-') AS INTEGER) AS dash_pos
    FROM orders
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY o_custkey
      ORDER BY o_totalprice DESC, o_orderkey) = 1
    """,
)
def dialect_snowflake_qualify_topn(spark, sf_dir):
    """Snowflake model: IFF + quoted-unit DATEADD + CHARINDEX (reversed
    arg order) + QUALIFY over an inline window. The QUALIFY wrap must
    not leak its helper predicate column into the schema."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(translate_sql(_SNOWFLAKE_TOPN, "snowflake"))


_BIGQUERY_AGG = """
SELECT o_orderstatus,
       COUNTIF(o_totalprice > 150000) AS n_big,
       LOGICAL_OR(o_totalprice > 400000) AS any_huge,
       COUNTIF(SAFE_CAST(o_orderpriority AS INT64) IS NOT NULL)
         AS n_numeric_priority
FROM orders
GROUP BY o_orderstatus
"""


@register(
    "dialect_bigquery_aggregates",
    oracle="""
    SELECT o_orderstatus,
           CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
           bool_or(o_totalprice > 400000) AS any_huge,
           CAST(count_if(TRY_CAST(o_orderpriority AS BIGINT) IS NOT NULL)
                AS BIGINT) AS n_numeric_priority
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def dialect_bigquery_aggregates(spark, sf_dir):
    """BigQuery model: COUNTIF / LOGICAL_OR renames plus INT64 -> BIGINT
    type mapping inside SAFE_CAST -> TRY_CAST."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(translate_sql(_BIGQUERY_AGG, "bigquery"))


_TRINO_EVENTS = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(JSON_EXTRACT_SCALAR(props, '$.plan')) AS BIGINT)
         AS n_with_plan,
       CAST(MAX(STRPOS(event_type, 'i')) AS BIGINT) AS max_i_pos
FROM events
GROUP BY event_type
"""


@register(
    "dialect_trino_json_events",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(json_extract_string(props, '$.plan')) AS BIGINT)
             AS n_with_plan,
           CAST(MAX(instr(event_type, 'i')) AS BIGINT) AS max_i_pos
    FROM events
    GROUP BY event_type
    """,
)
def dialect_trino_json_events(spark, sf_dir):
    """Trino model: JSON_EXTRACT_SCALAR -> get_json_object and STRPOS ->
    instr over the events props JSON column."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(translate_sql(_TRINO_EVENTS, "trino"))


_REDSHIFT_LISTAGG = """
SELECT n_regionkey,
       LEN(LISTAGG(n_name, '|')) AS agg_len,
       LISTAGG(n_name, '|') AS names
FROM nation
GROUP BY n_regionkey
"""


@register(
    "dialect_redshift_listagg",
    oracle="""
    SELECT n_regionkey,
           CAST(length(string_agg(n_name, '|' ORDER BY n_name)) AS INTEGER)
             AS agg_len,
           string_agg(n_name, '|' ORDER BY n_name) AS names
    FROM nation
    GROUP BY n_regionkey
    """,
)
def dialect_redshift_listagg(spark, sf_dir):
    """Redshift model: LISTAGG -> sorted collect_list join (deterministic
    ordering) and LEN -> length, nested one inside the other."""
    register_views(spark, sf_dir, ["nation"])
    return spark.sql(translate_sql(_REDSHIFT_LISTAGG, "redshift"))


_DATABRICKS_TOP_EVENTS = """
SELECT event_id, user_id, event_type, value,
       props:k AS k
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY value DESC, event_id ASC) = 1
"""


@register(
    "dialect_databricks_colon_qualify",
    oracle="""
    WITH ranked AS (
      SELECT event_id, user_id, event_type, value,
             json_extract_string(props, '$.k') AS k,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id ASC) AS rn
      FROM events)
    SELECT event_id, user_id, event_type, value, k
    FROM ranked WHERE rn = 1
    """,
)
def dialect_databricks_colon_qualify(spark, sf_dir):
    """Databricks model (the reference's 5th lexer dialect): the
    semi-structured colon path `props:k` -> GET_JSON_OBJECT and
    QUALIFY -> wrapped window filter; every other construct passes
    through untouched because Databricks SQL is Spark SQL."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(translate_sql(_DATABRICKS_TOP_EVENTS, "databricks"))
