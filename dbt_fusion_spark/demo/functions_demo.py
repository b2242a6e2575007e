"""Driver-gate queries for the cross-db macro surface (SURVEY §2.4).

The Spark side composes SQL emitted by dbt_fusion_spark.functions.crossdb
(the `{{ dbt.* }}` macro expansions); the oracle is the hand-written
DuckDB equivalent of each macro's semantics.
"""

from __future__ import annotations

from dbt_fusion_spark.demo.registry import register, sql_query
from dbt_fusion_spark.functions import crossdb as X
from dbt_fusion_spark.sources.registry import register_views

_SCALAR_SPARK = f"""
SELECT
  o_orderkey,
  {X.dateadd('day', 7, 'o_orderdate')}                          AS due_date,
  {X.datediff('o_orderdate', "TIMESTAMP '2002-01-01'", 'day')}  AS days_to_epoch_end,
  {X.date_trunc('quarter', 'o_orderdate')}                      AS order_quarter,
  {X.last_day('o_orderdate')}                                   AS month_end,
  {X.hash('o_orderkey')}                                        AS key_hash,
  {X.concat(['o_orderstatus', "'-'", 'o_orderpriority'])}       AS status_priority,
  {X.length('o_orderpriority')}                                 AS prio_len,
  {X.position("'URGENT'", 'o_orderpriority')}                   AS urgent_pos,
  {X.right('o_orderpriority', 3)}                               AS prio_tail,
  {X.replace('o_orderstatus', "'O'", "'OPEN'")}                 AS status_long,
  {X.split_part('o_orderpriority', "'-'", 1)}                   AS prio_rank,
  {X.split_part('o_orderpriority', "'-'", -1)}                  AS prio_name,
  {X.safe_cast('o_orderpriority', X.type_int())}                AS bad_cast,
  CAST({X.cast('o_totalprice', 'decimal(18,2)')} AS DOUBLE)     AS price_dec,
  {X.date(1995, 3, 15)}                                         AS fixed_date,
  {X.equals('o_orderstatus', "'O'")}                            AS is_open
FROM orders
WHERE o_orderkey % 100 = 0
"""

_SCALAR_DUCK = """
SELECT
  o_orderkey,
  o_orderdate + INTERVAL 7 DAY                                  AS due_date,
  datediff('day', o_orderdate, TIMESTAMP '2002-01-01')          AS days_to_epoch_end,
  CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP)         AS order_quarter,
  last_day(CAST(o_orderdate AS DATE))                           AS month_end,
  md5(CAST(o_orderkey AS VARCHAR))                              AS key_hash,
  concat(o_orderstatus, '-', o_orderpriority)                   AS status_priority,
  length(o_orderpriority)                                       AS prio_len,
  strpos(o_orderpriority, 'URGENT')                             AS urgent_pos,
  right(o_orderpriority, 3)                                     AS prio_tail,
  replace(o_orderstatus, 'O', 'OPEN')                           AS status_long,
  split_part(o_orderpriority, '-', 1)                           AS prio_rank,
  string_split(o_orderpriority, '-')[-1]                        AS prio_name,
  try_cast(o_orderpriority AS INTEGER)                          AS bad_cast,
  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)           AS price_dec,
  make_date(1995, 3, 15)                                        AS fixed_date,
  o_orderstatus IS NOT DISTINCT FROM 'O'                        AS is_open
FROM orders
WHERE o_orderkey % 100 = 0
"""

sql_query("crossdb_scalar_functions", _SCALAR_SPARK, oracle=_SCALAR_DUCK)

_AGG_SPARK = f"""
SELECT
  o_custkey,
  {X.any_value('o_orderstatus')}                       AS some_status,
  {X.bool_or('o_totalprice > 150000')}                 AS has_big_order,
  {X.listagg('o_orderpriority', "','", limit_num=3)}   AS top_prios,
  COUNT(*) AS n
FROM (SELECT * FROM orders WHERE o_custkey < 100 AND o_orderstatus = 'F')
GROUP BY o_custkey
"""

# any_value is deterministic here only because the group is filtered to a
# single status value — mirrors the reference's use in tests.
_AGG_DUCK = """
SELECT
  o_custkey,
  'F'                                                            AS some_status,
  bool_or(o_totalprice > 150000)                                 AS has_big_order,
  string_agg(o_orderpriority, ',' ORDER BY o_orderpriority)
    FILTER (WHERE prio_rank <= 3)                                AS top_prios,
  COUNT(*) AS n
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority)
         AS prio_rank
  FROM orders WHERE o_custkey < 100 AND o_orderstatus = 'F'
)
GROUP BY o_custkey
"""

sql_query("crossdb_aggregates", _AGG_SPARK, oracle=_AGG_DUCK)


@register(
    "crossdb_date_spine",
    oracle="""
    SELECT CAST(d AS DATE) AS date_day
    FROM (SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-06-01',
                                        INTERVAL 1 DAY)) AS d)
    WHERE CAST(d AS DATE) < DATE '1995-06-01'
    """,
)
def crossdb_date_spine(spark, sf_dir):
    """date_spine macro (utils/date_spine.sql:1-30): [start, end) day spine
    via sequence()+explode — generated distributed, no driver loop."""
    return spark.sql(X.date_spine("day", "DATE '1995-01-01'", "DATE '1995-06-01'"))


@register(
    "crossdb_generate_series",
    oracle="SELECT unnest(generate_series(1, 1000)) AS generated_number",
)
def crossdb_generate_series(spark, sf_dir):
    return spark.sql(X.generate_series(1000))


@register(
    "function_sql_udf",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(o_totalprice / 10 AS DECIMAL(18,4))) AS DOUBLE)
             AS total_fee
    FROM orders GROUP BY o_orderpriority
    """,
)
def function_sql_udf(spark, sf_dir):
    """function materialization surface (functions/function.sql,
    DbtFunction nodes.rs:3875-3892): a SQL UDF created in-catalog and
    applied in a query. The oracle inlines the body — the UDF is pure
    SQL, so Catalyst inlines it too (no black-box penalty; the cast to
    decimal keeps the sum associative/exact for parity)."""
    register_views(spark, sf_dir, ["orders"])
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION order_fee(p DOUBLE) "
        "RETURNS DECIMAL(18,4) RETURN CAST(p / 10 AS DECIMAL(18,4))"
    )
    return spark.sql(
        "SELECT o_orderpriority, CAST(SUM(order_fee(o_totalprice)) AS DOUBLE)"
        " AS total_fee FROM orders GROUP BY o_orderpriority"
    )
