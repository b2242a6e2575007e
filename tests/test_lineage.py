"""Column-level lineage (sql/lineage.py) over analyzed Spark plans."""

from __future__ import annotations

import pytest

from dbt_fusion_spark.sql.lineage import column_lineage


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    for t in ("orders", "customer"):
        spark.read.parquet(
            f"/root/testdata/sf0.001/{t}.parquet").createOrReplaceTempView(t)


def _srcs(lin, col):
    return {(s["table"], s["column"]) for s in lin[col]}


def test_lineage_cte_join_window_literal(spark):
    lin = column_lineage(spark, """
        WITH big AS (
          SELECT o_custkey, sum(o_totalprice) AS rev
          FROM orders GROUP BY o_custkey)
        SELECT c.c_name AS name, b.rev * 2 AS rev2, 42 AS konst,
               row_number() OVER (ORDER BY b.rev) AS rk
        FROM customer c JOIN big b ON c.c_custkey = b.o_custkey
    """)
    assert _srcs(lin, "name") == {("customer", "c_name")}
    # through the CTE aggregate to the physical column
    assert _srcs(lin, "rev2") == {("orders", "o_totalprice")}
    # literal-only output -> no sources
    assert lin["konst"] == []
    # window value lineage follows the ordered expression
    assert _srcs(lin, "rk") == {("orders", "o_totalprice")}


def test_lineage_union_merges_branches(spark):
    lin = column_lineage(spark, """
        SELECT x AS u FROM (
          SELECT o_custkey AS x FROM orders
          UNION ALL SELECT c_custkey FROM customer) s
    """)
    assert _srcs(lin, "u") == {("orders", "o_custkey"),
                               ("customer", "c_custkey")}


def test_lineage_stops_at_immediate_view(spark):
    # a view boundary is a SOURCE: lineage reports the view, not the
    # base table behind it — per-model edges, dbt-docs style
    spark.sql("""CREATE OR REPLACE TEMP VIEW rev_by_cust AS
                 SELECT o_custkey, sum(o_totalprice) AS rev
                 FROM orders GROUP BY o_custkey""")
    lin = column_lineage(
        spark, "SELECT rev AS r FROM rev_by_cust")
    (tbl, col), = _srcs(lin, "r")
    assert col == "rev" and "rev_by_cust" in tbl


def test_lineage_multi_source_expression(spark):
    lin = column_lineage(spark, """
        SELECT concat(c_name, '-', cast(c_custkey AS string)) AS tag
        FROM customer
    """)
    assert _srcs(lin, "tag") == {("customer", "c_name"),
                                 ("customer", "c_custkey")}
