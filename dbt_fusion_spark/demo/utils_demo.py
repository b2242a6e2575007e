"""Gate query for the dbt_utils macro namespace: the SQL the macros
emit runs unmodified on BOTH engines (dialect-shared subset), so the
macro layer itself is oracle-checked, not just unit-tested."""

from __future__ import annotations

from dbt_fusion_spark.demo.registry import sql_query
from dbt_fusion_spark.functions.utils_pkg import make_namespace

_ns = make_namespace(adapter=None)

_SK = _ns.generate_surrogate_key(["c_custkey", "c_mktsegment"])
_PIV_B = _ns.pivot("c_mktsegment", ["BUILDING"], alias=False)
_PIV_M = _ns.pivot("c_mktsegment", ["MACHINERY"], alias=False)
_SPAN = _ns.safe_add(["MIN(c_acctbal)", "MAX(c_acctbal)"])
_AVG = _ns.safe_divide(
    "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)", "COUNT(*)")

sql_query(
    "dbt_utils_macro_sql",
    f"""
    SELECT c_nationkey,
           MIN({_SK}) AS min_surrogate_key,
           CAST({_PIV_B} AS BIGINT) AS n_building,
           CAST({_PIV_M} AS BIGINT) AS n_machinery,
           {_SPAN} AS acct_span,
           {_AVG} AS avg_acctbal
    FROM customer
    {_ns.group_by(1)}
    """,
)
