"""Unit tests for Relation / Column / AgateTable / SparkAdapter."""

from __future__ import annotations

from dbt_fusion_spark.adapter import SparkAdapter
from dbt_fusion_spark.adapter.spark_adapter import split_statements
from dbt_fusion_spark.agate import AgateTable
from dbt_fusion_spark.column import Column, translate_type
from dbt_fusion_spark.relation import Relation, RelationType


def test_relation_render_quote_include():
    r = Relation.create(database="cat", schema="analytics", identifier="orders",
                        type="table")
    assert r.render() == "`analytics`.`orders`"  # database excluded by default
    assert r.include(database=True).render() == "`cat`.`analytics`.`orders`"
    assert r.quote(schema=False, identifier=False).render() == "analytics.orders"
    assert r.is_table and not r.is_view
    r2 = r.incorporate(identifier="orders__dbt_tmp", type=RelationType.View)
    assert r2.identifier == "orders__dbt_tmp" and r2.is_view
    assert r.identifier == "orders"  # immutable


def test_relation_backtick_escape():
    r = Relation.create(schema="s", identifier="weird`name")
    assert r.render() == "`s`.`weird``name`"


def test_column_translate_and_predicates():
    assert translate_type("varchar(16)") == "string"
    assert translate_type("numeric(10,2)") == "decimal(10,2)"
    assert translate_type("double precision") == "double"
    c = Column.from_description("amount", "numeric(12,2)")
    assert c.is_numeric() and c.data_type == "decimal(12,2)"
    s = Column.from_description("name", "varchar(32)")
    assert s.is_string() and s.string_size() == 32
    assert s.can_expand_to(Column("other", "string"))


def test_split_statements():
    sql = "CREATE TABLE t (a int); INSERT INTO t VALUES (';'); -- c;\nSELECT * FROM t"
    parts = split_statements(sql)
    assert len(parts) == 3
    assert parts[1] == "INSERT INTO t VALUES (';')"


def test_agate_ops():
    t = AgateTable(["a", "b"], [(1, "x"), (2, "y"), (2, "z")])
    assert len(t) == 3
    assert t.select(["b"]).rows == [("x",), ("y",), ("z",)]
    assert t.rename({"a": "id"}).column_names == ["id", "b"]
    assert set(t.grouper("a").keys()) == {1, 2}
    assert t.columns[0].distinct() == [1, 2]
    assert "a | b" in t.print_table()


def test_adapter_schema_relation_lifecycle(spark):
    a = SparkAdapter(spark)
    a.create_schema("dfs_test")
    assert a.check_schema_exists("dfs_test")
    # plain session catalog has no REPLACE TABLE — materializations use
    # CTAS + rename-swap instead (reference table.sql:3-22 does the same)
    a.execute("CREATE TABLE `dfs_test`.`t1` AS SELECT 1 AS id, 'x' AS name")
    rel = a.get_relation(None, "dfs_test", "t1", use_cache=False)
    assert rel is not None and rel.is_table
    cols = a.get_columns_in_relation(rel)
    assert [c.name for c in cols] == ["id", "name"]
    # lazy schema-from-query: no execution
    qcols = a.get_column_schema_from_query("SELECT 1 AS a, CAST(2.5 AS DOUBLE) AS b")
    assert [(c.name, c.dtype) for c in qcols] == [("a", "int"), ("b", "double")]
    # rename + cache
    a.list_relations("dfs_test")
    a.rename_relation(rel, rel.incorporate(identifier="t2"))
    assert a.get_relation(None, "dfs_test", "t2") is not None
    assert a.get_relation(None, "dfs_test", "t1") is None
    # add columns
    t2 = a.get_relation(None, "dfs_test", "t2")
    a.alter_table_add_columns(t2, [Column("extra", "bigint")])
    assert "extra" in [c.name for c in a.get_columns_in_relation(t2)]
    # fetch
    resp, table = a.execute("SELECT * FROM `dfs_test`.`t2`", fetch=True)
    assert table.column_names == ["id", "name", "extra"]
    a.drop_schema("dfs_test")
    assert not a.check_schema_exists("dfs_test")


def test_adapter_bulk_load_copy_snapshot_target(spark, tmp_path):
    import pytest

    a = SparkAdapter(spark)
    csv = tmp_path / "mini.csv"
    csv.write_text("id,name\n1,a\n2,b\n")
    a.load_dataframe("dfs_bulk", "loaded", str(csv), file_format="csv")
    assert spark.table("`dfs_bulk`.`loaded`").count() == 2
    a.copy_table("`dfs_bulk`.`loaded`", "`dfs_bulk`.`copied`")
    assert spark.table("`dfs_bulk`.`copied`").count() == 2
    # valid_snapshot_target: missing SCD-2 metadata columns -> error
    with pytest.raises(ValueError, match="dbt_scd_id"):
        a.valid_snapshot_target("`dfs_bulk`.`copied`")
    a.execute("CREATE TABLE `dfs_bulk`.`snap` AS SELECT 1 AS id,"
              " 'x' AS dbt_scd_id, current_timestamp() AS dbt_updated_at,"
              " current_timestamp() AS dbt_valid_from,"
              " CAST(NULL AS TIMESTAMP) AS dbt_valid_to")
    a.valid_snapshot_target("`dfs_bulk`.`snap`")  # no raise
    a.drop_schema("dfs_bulk")


def test_adapter_convert_type():
    a_table = AgateTable(["x", "y", "z", "d"],
                         [("1", "1.5", "true", "2024-01-02"),
                          ("2", "2", "false", "2024-01-03")])
    a = SparkAdapter.__new__(SparkAdapter)
    assert a.convert_type(a_table, 0) == "bigint"
    assert a.convert_type(a_table, 1) == "double"
    assert a.convert_type(a_table, 2) == "boolean"
    assert a.convert_type(a_table, 3) == "date"


def test_adapter_analyze_and_stats(spark):
    a = SparkAdapter(spark)
    a.create_schema("dfs_stats")
    a.execute("CREATE TABLE `dfs_stats`.`t` AS "
              "SELECT id, id % 7 AS grp FROM RANGE(1000)")
    a.analyze_table("`dfs_stats`.`t`")
    stats = a.table_stats("`dfs_stats`.`t`")
    assert "statistics" in stats and "rows" in stats["statistics"]
    a.analyze_table("`dfs_stats`.`t`", columns=["grp"])  # no raise
    a.drop_schema("dfs_stats")


def test_adapter_compact_table(spark):
    a = SparkAdapter(spark)
    a.create_schema("dfs_compact")
    # fragment: 20 single-row inserts -> many small files
    a.execute("CREATE TABLE `dfs_compact`.`t` AS SELECT 0 AS id, 'x' AS v")
    for i in range(1, 20):
        a.execute(f"INSERT INTO `dfs_compact`.`t` VALUES ({i}, 'x')")
    before = spark.table("`dfs_compact`.`t`").rdd.getNumPartitions()
    n = a.compact_table("`dfs_compact`.`t`", target_partitions=2,
                        sort_by=["id"])
    after = spark.table("`dfs_compact`.`t`")
    assert n == 2
    assert after.count() == 20
    assert after.rdd.getNumPartitions() <= min(before, 4)
    a.drop_schema("dfs_compact")


def test_table_file_format(spark):
    import pytest

    from dbt_fusion_spark.materializations.executors import materialize_table

    a = SparkAdapter(spark)
    a.create_schema("dfs_fmt")
    for fmt in ("orc", "json", "parquet"):
        materialize_table(a, "dfs_fmt", f"t_{fmt}",
                          "SELECT 1 AS id, 'x' AS v", file_format=fmt)
        [r] = spark.table(f"`dfs_fmt`.`t_{fmt}`").collect()
        assert (r["id"], r["v"]) == (1, "x")
        prov = spark.sql(f"DESCRIBE TABLE EXTENDED `dfs_fmt`.`t_{fmt}`") \
            .filter("col_name = 'Provider'").collect()
        assert prov and prov[0]["data_type"].lower() == fmt
    with pytest.raises(ValueError, match="unsupported file_format"):
        materialize_table(a, "dfs_fmt", "t_bad",
                          "SELECT 1 AS id", file_format="feather")
    # delta: not on this cluster -> actionable error, no partial write
    with pytest.raises(ValueError, match="requires the delta runtime"):
        materialize_table(a, "dfs_fmt", "t_delta",
                          "SELECT 1 AS id", file_format="delta")
    a.drop_schema("dfs_fmt")
