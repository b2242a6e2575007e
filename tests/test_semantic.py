"""Semantic layer: semantic_models / metrics / saved_queries parsing,
manifest parity (nodes.rs:2109-2111 maps), graph context exposure, and
metric:* selection."""

from __future__ import annotations

import json

import pytest

from dbt_fusion_spark.project.scaffold import init_project

SEMANTIC_YML = """\
semantic_models:
  - name: orders_sm
    description: Order facts.
    model: ref('orders')
    defaults: {agg_time_dimension: order_date}
    primary_entity: order
    entities:
      - {name: order, type: primary, expr: order_id}
      - {name: customer, type: foreign, expr: customer_id}
    dimensions:
      - {name: order_date, type: time, type_params: {time_granularity: day}}
      - {name: status, type: categorical}
    measures:
      - {name: order_total, agg: sum, expr: amount}
      - {name: order_count, agg: count, expr: order_id}

metrics:
  - name: revenue
    label: Revenue
    type: simple
    type_params: {measure: order_total}
  - name: avg_order_value
    label: Average order value
    type: ratio
    type_params: {numerator: order_total, denominator: order_count}
  - name: cumulative_revenue
    label: Cumulative revenue
    type: cumulative
    type_params:
      measure: order_total
      cumulative_type_params: {window: 7 days}

saved_queries:
  - name: weekly_revenue
    description: Revenue rollup for dashboards.
    query_params:
      metrics: [revenue, avg_order_value]
      group_by: ["TimeDimension('order_date', 'week')"]
    exports:
      - name: weekly_revenue_table
        config: {export_as: table}
"""


@pytest.fixture(scope="module")
def proj(tmp_path_factory, spark):
    from dbt_fusion_spark.runner import DbtSparkRunner

    root = init_project(tmp_path_factory.mktemp("sl") / "jaffle_shop")
    (root / "models" / "semantic.yml").write_text(SEMANTIC_YML)
    runner = DbtSparkRunner(spark, str(root),
                            profile={"schema": "jaffle_sl", "name": "dev"})
    runner.parse()
    return runner


def test_semantic_model_parsed(proj):
    sm = proj.project.semantic_models["semantic_model.jaffle_shop.orders_sm"]
    assert sm["model"] == "ref('orders')"
    assert sm["defaults"] == {"agg_time_dimension": "order_date"}
    assert [e["name"] for e in sm["entities"]] == ["order", "customer"]
    assert [m["name"] for m in sm["measures"]] == ["order_total", "order_count"]
    # resolved model edge
    assert sm["depends_on"]["nodes"] == ["model.jaffle_shop.orders"]


def test_metric_parsed_with_deps(proj):
    met = proj.project.metrics["metric.jaffle_shop.revenue"]
    assert met["type"] == "simple"
    assert met["type_params"]["measure"] == "order_total"
    assert "semantic_model.jaffle_shop.orders_sm" in met["depends_on"]["nodes"]
    ratio = proj.project.metrics["metric.jaffle_shop.avg_order_value"]
    assert ratio["type"] == "ratio"
    assert "semantic_model.jaffle_shop.orders_sm" in ratio["depends_on"]["nodes"]


def test_saved_query_parsed(proj):
    sq = proj.project.saved_queries["saved_query.jaffle_shop.weekly_revenue"]
    assert sq["query_params"]["metrics"] == ["revenue", "avg_order_value"]
    assert sq["depends_on"]["nodes"] == [
        "metric.jaffle_shop.revenue", "metric.jaffle_shop.avg_order_value"]
    assert sq["exports"][0]["config"]["export_as"] == "table"


def test_metric_selection(proj):
    # dbt list --select metric:* / metric:revenue
    assert set(proj.list_nodes(select="metric:*")) == {
        "metric.jaffle_shop.revenue",
        "metric.jaffle_shop.avg_order_value",
        "metric.jaffle_shop.cumulative_revenue"}
    assert proj.list_nodes(select="metric:revenue") == [
        "metric.jaffle_shop.revenue"]
    # graph op: +metric pulls its semantic model and the model under it
    up = set(proj.list_nodes(select="+metric:revenue"))
    assert "semantic_model.jaffle_shop.orders_sm" in up
    assert "model.jaffle_shop.orders" in up
    assert set(proj.list_nodes(select="semantic_model:orders_sm")) == {
        "semantic_model.jaffle_shop.orders_sm"}
    assert set(proj.list_nodes(select="saved_query:*")) == {
        "saved_query.jaffle_shop.weekly_revenue"}


def test_manifest_contains_semantic_maps(proj, tmp_path):
    from dbt_fusion_spark.runner import RunResults

    proj.write_artifacts(RunResults([], 0.0))
    manifest = json.loads(
        (proj.project.root / "target" / "manifest.json").read_text())
    assert "metric.jaffle_shop.revenue" in manifest["metrics"]
    assert ("semantic_model.jaffle_shop.orders_sm"
            in manifest["semantic_models"])
    assert ("saved_query.jaffle_shop.weekly_revenue"
            in manifest["saved_queries"])
    # semantic nodes are NOT duplicated into nodes map (dbt manifest v12)
    assert "metric.jaffle_shop.revenue" not in manifest["nodes"]


def test_run_skips_semantic_nodes(proj, capsys):
    rr = proj.run()
    ran = {r.unique_id for r in rr.results}
    assert not any(u.startswith(("metric.", "semantic_model.", "saved_query."))
                   for u in ran)
    assert rr.ok


def test_graph_context_exposes_metrics(proj, spark):
    """{{ graph.metrics }} renders in a model (environment.rs graph)."""
    node = proj.project.nodes["model.jaffle_shop.customers"]
    from dbt_fusion_spark.jinja.environment import _GraphContext as GraphContext

    g = GraphContext(proj.project)
    assert "metric.jaffle_shop.revenue" in g.metrics
    assert "semantic_model.jaffle_shop.orders_sm" in g.semantic_models
    assert node is not None


def test_compile_metric_sql_shapes():
    from dbt_fusion_spark.demo.semantic_demo import METRICS, ORDERS_SM
    from dbt_fusion_spark.semantic import compile_metric_sql

    sql = compile_metric_sql(ORDERS_SM, METRICS["revenue"], "orders",
                             group_by=["order_month", "status"])
    assert "date_trunc('month', o_orderdate)" in sql
    assert "GROUP BY" in sql and "SUM(" in sql
    sql = compile_metric_sql(ORDERS_SM, METRICS["open_revenue"], "orders")
    assert "CASE WHEN o_orderstatus = 'O'" in sql
    sql = compile_metric_sql(ORDERS_SM, METRICS["cumulative_revenue"],
                             "orders", group_by=["status"])
    # two-level: inner per-grain aggregate, outer window partitioned by
    # the non-time dims
    assert "OVER (PARTITION BY status" in sql
    import pytest as _pytest
    with _pytest.raises(ValueError):
        compile_metric_sql(ORDERS_SM, {"name": "x", "type": "simple",
                                       "type_params": {"measure": "nope"}},
                           "orders")


def test_run_saved_query_end_to_end(proj, spark):
    """saved_query over the jaffle semantic YAML: build the models,
    then execute the metric join."""
    rr = proj.run(include_tests=False)
    assert rr.ok
    df = proj.run_saved_query("weekly_revenue")
    rows = df.collect()
    assert set(df.columns) == {"order_date", "revenue", "avg_order_value"}
    assert len(rows) > 0
    total = sum(r["revenue"] for r in rows)
    oracle = spark.sql(
        "SELECT SUM(amount) FROM jaffle_sl.orders").collect()[0][0]
    assert abs(total - oracle) < 1e-9
