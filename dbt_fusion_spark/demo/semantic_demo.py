"""Driver-gate queries for the EXECUTABLE semantic layer: metrics
compiled to SQL (semantic/compiler.py) and run over the testdata orders
table. The compiler emits dialect-shared ANSI SQL, so the oracle runs
the very same generated text — the strongest possible parity check (a
compiler bug breaks both sides identically only if it's semantic, and
the value-hash still catches it).

Numeric discipline matches demo/tpch.py: measures aggregate through
DECIMAL (exact, associative) and the demo wrapper casts the metric
value to DOUBLE for the canonicalizer.
"""

from __future__ import annotations

from dbt_fusion_spark.demo.registry import register
from dbt_fusion_spark.semantic import compile_metric_sql
from dbt_fusion_spark.sources.registry import register_views

# Semantic model over the testdata orders table — entities, a time
# dimension, and decimal-exact measures (semantic_model.rs shapes).
ORDERS_SM = {
    "name": "orders_sm",
    "defaults": {"agg_time_dimension": "order_month"},
    "entities": [
        {"name": "order", "type": "primary", "expr": "o_orderkey"},
        {"name": "customer", "type": "foreign", "expr": "o_custkey"},
    ],
    "dimensions": [
        {"name": "order_month", "type": "time", "expr": "o_orderdate",
         "type_params": {"time_granularity": "month"}},
        {"name": "status", "type": "categorical", "expr": "o_orderstatus"},
    ],
    "measures": [
        {"name": "order_total", "agg": "sum",
         "expr": "CAST(o_totalprice AS DECIMAL(18,2))"},
        {"name": "order_count", "agg": "count", "expr": "o_orderkey"},
        {"name": "customer_count", "agg": "count_distinct",
         "expr": "o_custkey"},
    ],
}

METRICS = {
    "revenue": {"name": "revenue", "type": "simple",
                "type_params": {"measure": "order_total"}},
    "open_revenue": {"name": "open_revenue", "type": "simple",
                     "type_params": {"measure": "order_total"},
                     "filter": "o_orderstatus = 'O'"},
    "avg_order_value": {"name": "avg_order_value", "type": "ratio",
                        "type_params": {"numerator": "order_total",
                                        "denominator": "order_count"}},
    "cumulative_revenue": {"name": "cumulative_revenue",
                           "type": "cumulative",
                           "type_params": {"measure": "order_total"}},
    "revenue_per_customer": {
        "name": "revenue_per_customer", "type": "derived",
        # cast BEFORE dividing: decimal/bigint division rounds at an
        # engine-chosen scale (Spark vs DuckDB drift by 1 ulp); double
        # division is IEEE-identical (unscaled revenue < 2^53, exact)
        "type_params": {"expr": "CAST(revenue AS DOUBLE) / customers",
                        "metrics": ["revenue", "customers"]}},
    "customers": {"name": "customers", "type": "simple",
                  "type_params": {"measure": "customer_count"}},
}


def _wrap_double(sql: str, dims: list[str], value: str) -> str:
    sel = "".join(f"{d}, " for d in dims)
    return f"SELECT {sel}CAST({value} AS DOUBLE) AS {value} FROM ({sql})"


_SIMPLE_SQL = _wrap_double(
    compile_metric_sql(ORDERS_SM, METRICS["revenue"], "orders",
                       group_by=["order_month"]),
    ["order_month"], "revenue")


@register("metric_simple_revenue_by_month", oracle=_SIMPLE_SQL)
def metric_simple_revenue_by_month(spark, sf_dir):
    """simple metric compiled to a grouped aggregate; the oracle runs
    the SAME generated SQL (dialect-shared by construction)."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_SIMPLE_SQL)


_FILTERED_SQL = _wrap_double(
    compile_metric_sql(ORDERS_SM, METRICS["open_revenue"], "orders",
                       group_by=["status"]),
    ["status"], "open_revenue")


@register("metric_filtered_simple", oracle=_FILTERED_SQL)
def metric_filtered_simple(spark, sf_dir):
    """metric `filter:` compiles to CASE WHEN inside the aggregate —
    only the 'O' group carries a value, others aggregate to NULL."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_FILTERED_SQL)


_RATIO_SQL = compile_metric_sql(ORDERS_SM, METRICS["avg_order_value"],
                                "orders", group_by=["status"])


@register("metric_ratio_aov_by_status", oracle=_RATIO_SQL)
def metric_ratio_aov_by_status(spark, sf_dir):
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_RATIO_SQL)


_CUME_SQL = _wrap_double(
    compile_metric_sql(ORDERS_SM, METRICS["cumulative_revenue"], "orders",
                       group_by=["order_month"], time_grain="month"),
    ["order_month"], "cumulative_revenue")


@register("metric_cumulative_revenue", oracle=_CUME_SQL)
def metric_cumulative_revenue(spark, sf_dir):
    """cumulative metric: per-grain aggregate then running window sum —
    the two-level plan keeps the window input at one row per grain, not
    one per order (the at-scale shape)."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_CUME_SQL)


_DERIVED_SQL = compile_metric_sql(
    ORDERS_SM, METRICS["revenue_per_customer"], "orders",
    group_by=["order_month"], metrics_by_name=METRICS)


@register("metric_derived_revenue_per_customer", oracle=_DERIVED_SQL)
def metric_derived_revenue_per_customer(spark, sf_dir):
    """derived metric: CTE per input metric joined on the group_by keys,
    then the derived expression."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_DERIVED_SQL)


# Saved query: multiple metrics joined on the shared group_by keys —
# exactly what compile_saved_query_sql emits for
# query_params: {metrics: [revenue, avg_order_value], group_by: [...]}
# (saved_queries node shape, nodes.rs:2109-2111).
_SQ_REV = compile_metric_sql(ORDERS_SM, METRICS["revenue"], "orders",
                             group_by=["order_month"])
_SQ_AOV = compile_metric_sql(ORDERS_SM, METRICS["avg_order_value"],
                             "orders", group_by=["order_month"])
_SAVED_QUERY_SQL = (
    f"WITH __m_revenue AS ({_SQ_REV}), __m_aov AS ({_SQ_AOV}) "
    "SELECT __m_revenue.order_month, "
    "CAST(revenue AS DOUBLE) AS revenue, avg_order_value "
    "FROM __m_revenue JOIN __m_aov "
    "ON __m_revenue.order_month = __m_aov.order_month"
)


@register("saved_query_revenue_aov", oracle=_SAVED_QUERY_SQL)
def saved_query_revenue_aov(spark, sf_dir):
    """saved_query execution: one SQL joining each member metric's CTE
    on the group_by keys (semantic/compiler.py
    compile_saved_query_sql)."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_SAVED_QUERY_SQL)
