"""dbt_utils compatibility shim: models calling {{ dbt_utils.* }} run
end-to-end; adapter-dependent macros (star/union_relations/
get_column_values) introspect at compile time and degrade to dbt's
parse-phase neutral values."""

from __future__ import annotations

import pytest

from dbt_fusion_spark.project.scaffold import init_project
from dbt_fusion_spark.runner import DbtSparkRunner


@pytest.fixture(scope="module")
def runner(tmp_path_factory, spark):
    root = init_project(tmp_path_factory.mktemp("du") / "jaffle_shop")
    models = root / "models"
    (models / "sk_model.sql").write_text(
        "select {{ dbt_utils.generate_surrogate_key(['customer_id', "
        "'order_date']) }} as sk, order_id\n"
        "from {{ ref('stg_orders') }}\n")
    (models / "star_model.sql").write_text(
        "select {{ dbt_utils.star(ref('stg_orders'), except=['status']) }}\n"
        "from {{ ref('stg_orders') }}\n")
    (models / "pivot_model.sql").write_text(
        "select order_date,\n"
        "  {{ dbt_utils.pivot('status', ['completed', 'returned']) }}\n"
        "from {{ ref('stg_orders') }} group by order_date\n")
    (models / "union_model.sql").write_text(
        "{{ dbt_utils.union_relations([ref('stg_customers'), "
        "ref('stg_orders')]) }}\n")
    (models / "dedup_model.sql").write_text(
        "{% set base %}(select status, order_date from "
        "{{ ref('stg_orders') }}) b{% endset %}\n"
        "{{ dbt_utils.deduplicate(base, partition_by='status', "
        "order_by='order_date') }}\n")
    (models / "unpivot_model.sql").write_text(
        "{{ dbt_utils.unpivot(ref('stg_orders'), cast_to='string', "
        "exclude=['order_id']) }}\n")
    (models / "colvals_model.sql").write_text(
        "select order_id, status from {{ ref('stg_orders') }}\n"
        "where status in (\n"
        "{%- for v in dbt_utils.get_column_values(ref('stg_orders'), "
        "'status', max_records=2) %}"
        "'{{ v }}'{% if not loop.last %}, {% endif %}{% endfor %})\n")
    r = DbtSparkRunner(spark, str(root),
                       profile={"schema": "dutils", "name": "dev"})
    rr = r.run(include_tests=False)
    assert rr.ok, [x.message for x in rr.results if x.status == "error"]
    return r


def test_surrogate_key_deterministic(runner, spark):
    rows = spark.sql(
        "SELECT sk FROM dutils.sk_model ORDER BY order_id").collect()
    assert len(rows) == 6
    assert all(len(r["sk"]) == 32 for r in rows)  # md5 hex
    # same inputs -> same key (join back to itself)
    assert spark.sql(
        "SELECT COUNT(*) FROM dutils.sk_model a JOIN dutils.sk_model b "
        "ON a.sk = b.sk AND a.order_id = b.order_id").collect()[0][0] == 6


def test_star_excludes_column(runner, spark):
    cols = [f.name for f in spark.table("dutils.star_model").schema.fields]
    assert "status" not in cols
    assert set(cols) == {"order_id", "customer_id", "order_date"}


def test_pivot_counts(runner, spark):
    row = spark.sql(
        "SELECT SUM(`completed`) AS c, SUM(`returned`) AS r "
        "FROM dutils.pivot_model").collect()[0]
    assert row["c"] == 3 and row["r"] == 1


def test_union_relations_aligns_schemas(runner, spark):
    df = spark.table("dutils.union_model")
    cols = set(df.columns)
    assert "_dbt_source_relation" in cols
    # union of both schemas; missing cols are NULL-padded
    assert {"customer_id", "first_name", "order_id", "status"} <= cols
    n_cust = df.filter("_dbt_source_relation LIKE '%stg_customers%'").count()
    n_ord = df.filter("first_name IS NULL AND order_id IS NOT NULL").count()
    assert n_cust == 5 and n_ord == 6


def test_get_column_values_compiles_in(runner, spark):
    # top-2 statuses by count: completed (3) and one of shipped/placed/
    # returned (1 each) — at least the completed rows must be present
    rows = spark.table("dutils.colvals_model").collect()
    assert len(rows) >= 3
    statuses = {r["status"] for r in rows}
    assert "completed" in statuses and len(statuses) == 2


def test_namespace_pure_helpers():
    from dbt_fusion_spark.functions.utils_pkg import make_namespace

    ns = make_namespace(None)
    assert ns.slugify("Hello World! 9x") == "hello_world_9x"
    assert ns.slugify("9lives") == "_9lives"
    assert ns.safe_add(["a", "b"]) == "coalesce(a, 0) + coalesce(b, 0)"
    assert ns.safe_divide("x", "y") == "(x) / nullif((y), 0)"
    assert ns.group_by(3) == "group by 1, 2, 3"
    # parse-phase neutral values (no adapter)
    assert ns.star("t") == "*"
    assert ns.get_column_values("t", "c") == []
    assert "generate_series" in ns.date_spine(
        "day", "DATE '2024-01-01'", "DATE '2024-02-01'") or "sequence" in \
        ns.date_spine("day", "DATE '2024-01-01'", "DATE '2024-02-01'")


def test_utils_generic_tests(spark, sf_small):
    """dbt_utils community generic tests run through the same severity
    wrapper as the built-ins."""
    from dbt_fusion_spark.sources.registry import register_views
    from dbt_fusion_spark.testing.generic import (
        run_test,
        test_accepted_range,
        test_equal_rowcount,
        test_expression_is_true,
        test_fewer_rows_than,
        test_not_null_proportion,
        test_recency,
        test_relationships_where,
        test_unique_combination_of_columns,
    )

    register_views(spark, sf_small, ["orders", "lineitem", "customer"])

    # holds: o_totalprice is positive
    assert run_test(spark, test_expression_is_true(
        "orders", "o_totalprice > 0")).status == "pass"
    # violated: price > 1e9
    assert run_test(spark, test_expression_is_true(
        "orders", "o_totalprice > 1e9")).status == "fail"

    # o_orderkey is the orders grain (synthetic lineitem has no
    # unique line number)
    assert run_test(spark, test_unique_combination_of_columns(
        "orders", ["o_orderkey"])).status == "pass"
    assert run_test(spark, test_unique_combination_of_columns(
        "orders", ["o_orderstatus", "o_orderpriority"])).status == "fail"

    assert run_test(spark, test_accepted_range(
        "lineitem", "l_discount", min_value=0, max_value=1)).status == "pass"
    assert run_test(spark, test_accepted_range(
        "lineitem", "l_quantity", max_value=10)).status == "fail"

    assert run_test(spark, test_not_null_proportion(
        "orders", "o_custkey", at_least=0.99)).status == "pass"
    assert run_test(spark, test_not_null_proportion(
        "orders", "o_custkey", at_least=0.99, at_most=0.999)).status == "fail"

    assert run_test(spark, test_equal_rowcount(
        "orders", "orders")).status == "pass"
    assert run_test(spark, test_equal_rowcount(
        "orders", "lineitem")).status == "fail"

    assert run_test(spark, test_fewer_rows_than(
        "orders", "lineitem")).status == "pass"
    assert run_test(spark, test_fewer_rows_than(
        "lineitem", "orders")).status == "fail"

    # orders end in 2001 -> anything "within the last 100000 days" passes,
    # "within 1 hour" fails
    assert run_test(spark, test_recency(
        "orders", "o_orderdate", "DAY", 100000)).status == "pass"
    assert run_test(spark, test_recency(
        "orders", "o_orderdate", "HOUR", 1)).status == "fail"

    assert run_test(spark, test_relationships_where(
        "orders", "o_custkey", "customer", "c_custkey")).status == "pass"
    assert run_test(spark, test_relationships_where(
        "orders", "o_custkey", "customer", "c_custkey",
        to_condition="c_custkey < 100")).status == "fail"


def test_deduplicate_one_row_per_key(runner, spark):
    t = spark.table("dutils.dedup_model")
    assert t.count() == t.select("status").distinct().count()
    assert "_dbt_dedup_rn" not in t.columns


def test_unpivot_melts_columns(runner, spark):
    t = spark.table("dutils.unpivot_model")
    assert set(t.columns) == {"order_id", "field_name", "value"}
    src = spark.table("dutils.stg_orders")
    n_melted = len(src.columns) - 1  # all but the excluded key
    assert t.count() == src.count() * n_melted


def test_haversine_and_width_bucket(runner, spark):
    ns = __import__("dbt_fusion_spark.functions.utils_pkg",
                    fromlist=["make_namespace"]).make_namespace()
    # London -> Paris ~= 214 mi
    d = spark.sql(f"SELECT {ns.haversine_distance('51.5074', '-0.1278', '48.8566', '2.3522')} AS d").collect()[0]["d"]
    assert abs(d - 214) < 5
    b = spark.sql(f"SELECT {ns.width_bucket('7', 0, 10, 5)} AS b").collect()[0]["b"]
    assert b == 4
    assert ns.safe_subtract(["a", "b"]) == "coalesce(a, 0) - coalesce(b, 0)"
