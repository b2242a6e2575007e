"""Unit tests: incremental strategy algebra (SURVEY §2.1 strategies)."""

from __future__ import annotations

from dbt_fusion_spark.incremental import (
    append,
    delete_insert,
    insert_overwrite,
    merge,
    microbatch_windows,
)


def rows(df, *cols):
    return sorted((tuple(r) for r in df.select(*cols).collect()), key=repr)


def make(spark, data, cols):
    return spark.createDataFrame(data, cols)


def test_append(spark):
    t = make(spark, [(1, "a"), (2, "b")], ["id", "v"])
    s = make(spark, [(2, "b2")], ["id", "v"])
    assert rows(append(t, s), "id", "v") == [(1, "a"), (2, "b"), (2, "b2")]


def test_merge_updates_and_inserts(spark):
    t = make(spark, [(1, "a", 10), (2, "b", 20)], ["id", "v", "x"])
    s = make(spark, [(2, "B", 99), (3, "c", 30)], ["id", "v", "x"])
    assert rows(merge(t, s, "id"), "id", "v", "x") == [
        (1, "a", 10), (2, "B", 99), (3, "c", 30)]


def test_merge_update_columns_subset(spark):
    t = make(spark, [(1, "a", 10), (2, "b", 20)], ["id", "v", "x"])
    s = make(spark, [(2, "B", 99)], ["id", "v", "x"])
    # only x is updated; v keeps target value
    assert rows(merge(t, s, "id", merge_update_columns=["x"]), "id", "v", "x") == [
        (1, "a", 10), (2, "b", 99)]
    # exclude x: v updated, x kept
    assert rows(merge(t, s, "id", merge_exclude_columns=["x"]), "id", "v", "x") == [
        (1, "a", 10), (2, "B", 20)]


def test_merge_null_safe_keys(spark):
    t = spark.createDataFrame([(None, "old"), (1, "a")], "id bigint, v string")
    s = spark.createDataFrame([(None, "new")], "id bigint, v string")
    # NULL key matches NULL key (dbt's null-safe equals semantics)
    assert rows(merge(t, s, "id"), "id", "v") == [(1, "a"), (None, "new")]


def test_merge_composite_key(spark):
    t = make(spark, [(1, "x", "old"), (1, "y", "old")], ["k1", "k2", "v"])
    s = make(spark, [(1, "x", "new")], ["k1", "k2", "v"])
    assert rows(merge(t, s, ["k1", "k2"]), "k1", "k2", "v") == [
        (1, "x", "new"), (1, "y", "old")]


def test_delete_insert_vs_merge_on_dup_source(spark):
    t = make(spark, [(1, "a"), (2, "b")], ["id", "v"])
    s = make(spark, [(2, "B1"), (2, "B2")], ["id", "v"])
    # delete+insert keeps BOTH source duplicates (merge.sql:62-92 DELETE then INSERT)
    assert rows(delete_insert(t, s, "id"), "id", "v") == [
        (1, "a"), (2, "B1"), (2, "B2")]


def test_insert_overwrite_replaces_partitions(spark):
    t = make(spark, [("2024-01", 1), ("2024-01", 2), ("2024-02", 3)], ["p", "v"])
    s = make(spark, [("2024-01", 9)], ["p", "v"])
    assert rows(insert_overwrite(t, s, "p"), "p", "v") == [
        ("2024-01", 9), ("2024-02", 3)]


def test_microbatch_windows():
    import datetime as dt

    w = microbatch_windows(dt.datetime(2024, 1, 30), dt.datetime(2024, 2, 2), "day")
    assert w[0] == (dt.datetime(2024, 1, 30), dt.datetime(2024, 1, 31))
    assert w[-1] == (dt.datetime(2024, 2, 1), dt.datetime(2024, 2, 2))
    m = microbatch_windows(dt.datetime(2024, 11, 15), dt.datetime(2025, 2, 1), "month")
    assert [x[0].month for x in m] == [11, 12, 1]
    assert m[1] == (dt.datetime(2024, 12, 1), dt.datetime(2025, 1, 1))
