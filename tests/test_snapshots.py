"""Unit tests: SCD2 snapshot pipeline (SURVEY §2.1 snapshot)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dbt_fusion_spark.snapshots import SnapshotConfig, snapshot_build, snapshot_run

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)
def NOW2():
    return F.lit("2024-03-01 00:00:00").cast("timestamp")


def state(spark, rows):
    return spark.createDataFrame(rows, ["id", "val", "updated_at"])


def by_key(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["id"], []).append(r)
    for v in out.values():
        v.sort(key=lambda r: (r["dbt_valid_from"], r["dbt_valid_to"] or dt.datetime.max))
    return out


def cfg(**kw):
    defaults = dict(unique_key="id", strategy="timestamp", updated_at="updated_at")
    defaults.update(kw)
    return SnapshotConfig(**defaults)


def test_build_then_noop_run(spark):
    s1 = state(spark, [(1, "a", T0), (2, "b", T0)])
    snap = snapshot_build(s1, cfg())
    assert snap.count() == 2
    assert snap.filter(F.col("dbt_valid_to").isNull()).count() == 2
    # identical state: no new versions
    snap2 = snapshot_run(snap, s1, cfg(), now=NOW2())
    assert snap2.count() == 2
    assert snap2.filter(F.col("dbt_valid_to").isNull()).count() == 2


def test_update_closes_and_inserts(spark):
    s1 = state(spark, [(1, "a", T0), (2, "b", T0)])
    snap = snapshot_build(s1, cfg())
    s2 = state(spark, [(1, "a2", T1), (2, "b", T0), (3, "c", T1)])
    snap2 = snapshot_run(snap, s2, cfg(), now=NOW2())
    k = by_key(snap2)
    # id=1: old version closed at T1, new open version with val a2
    assert len(k[1]) == 2
    assert k[1][0]["dbt_valid_to"] == T1 and k[1][0]["val"] == "a"
    assert k[1][1]["dbt_valid_to"] is None and k[1][1]["val"] == "a2"
    # id=2 untouched; id=3 inserted open
    assert len(k[2]) == 1 and k[2][0]["dbt_valid_to"] is None
    assert len(k[3]) == 1 and k[3][0]["dbt_valid_from"] == T1
    # scd ids unique
    ids = [r["dbt_scd_id"] for rs in k.values() for r in rs]
    assert len(ids) == len(set(ids))


def test_hard_deletes_ignore_and_invalidate(spark):
    s1 = state(spark, [(1, "a", T0), (2, "b", T0)])
    s2 = state(spark, [(1, "a", T0)])  # id=2 vanished
    base = snapshot_build(s1, cfg())
    # ignore: row stays open
    snap_i = snapshot_run(base, s2, cfg(hard_deletes="ignore"), now=NOW2())
    assert by_key(snap_i)[2][0]["dbt_valid_to"] is None
    # invalidate: closed at now
    snap_v = snapshot_run(base, s2, cfg(hard_deletes="invalidate"), now=NOW2())
    assert by_key(snap_v)[2][0]["dbt_valid_to"] == dt.datetime(2024, 3, 1)


def test_hard_deletes_new_record_tombstone(spark):
    s1 = state(spark, [(1, "a", T0), (2, "b", T0)])
    s2 = state(spark, [(1, "a", T0)])
    base = snapshot_build(s1, cfg(hard_deletes="new_record"))
    assert by_key(base)[1][0]["dbt_is_deleted"] == "False"
    snap = snapshot_run(base, s2, cfg(hard_deletes="new_record"), now=NOW2())
    k = by_key(snap)
    assert len(k[2]) == 2
    closed, tomb = k[2]
    assert closed["dbt_valid_to"] == dt.datetime(2024, 3, 1)
    assert tomb["dbt_is_deleted"] == "True" and tomb["dbt_valid_to"] is None


def test_check_strategy_null_safe(spark):
    df1 = spark.createDataFrame([(1, "a", None), (2, "b", "x")], ["id", "v1", "v2"])
    c = SnapshotConfig(unique_key="id", strategy="check", check_cols=["v1", "v2"])
    base = snapshot_build(df1, c, now=F.lit("2024-01-01").cast("timestamp"))
    # NULL -> "x" must count as changed; "b"/"x" unchanged
    df2 = spark.createDataFrame([(1, "a", "x"), (2, "b", "x")], ["id", "v1", "v2"])
    snap = snapshot_run(base, df2, c, now=NOW2())
    k = by_key(snap)
    assert len(k[1]) == 2 and k[1][0]["dbt_valid_to"] == dt.datetime(2024, 3, 1)
    assert len(k[2]) == 1 and k[2][0]["dbt_valid_to"] is None


def test_composite_key_snapshot(spark):
    df1 = spark.createDataFrame([(1, "x", "a"), (1, "y", "b")], ["k1", "k2", "v"])
    c = SnapshotConfig(unique_key=["k1", "k2"], strategy="check", check_cols="all")
    base = snapshot_build(df1, c, now=F.lit("2024-01-01").cast("timestamp"))
    df2 = spark.createDataFrame([(1, "x", "a2"), (1, "y", "b")], ["k1", "k2", "v"])
    snap = snapshot_run(base, df2, c, now=NOW2())
    assert snap.count() == 3  # (x: closed+new), (y: open)
    open_x = snap.filter((F.col("k2") == "x") & F.col("dbt_valid_to").isNull())
    assert open_x.collect()[0]["v"] == "a2"


def test_valid_to_current_sentinel(spark):
    """dbt_valid_to_current: open rows carry the sentinel timestamp
    instead of NULL, across build AND subsequent runs."""
    from dbt_fusion_spark.snapshots import snapshot_merge

    c = cfg(dbt_valid_to_current="9999-12-31 00:00:00")
    s1 = state(spark, [(1, "a", T0), (2, "b", T0)])
    snap = snapshot_merge(None, s1, c)
    sentinel = dt.datetime(9999, 12, 31)
    assert {r["dbt_valid_to"] for r in snap.collect()} == {sentinel}

    s2 = state(spark, [(1, "a2", T1), (2, "b", T0)])
    snap2 = snapshot_merge(snap, s2, c, now=NOW2())
    rows = by_key(snap2)
    assert len(rows[1]) == 2
    closed, open_ = rows[1]
    assert closed["dbt_valid_to"] == T1          # closed at the update ts
    assert open_["dbt_valid_to"] == sentinel     # new version stays open
    assert rows[2][0]["dbt_valid_to"] == sentinel


def test_custom_meta_column_names(spark):
    """snapshot_meta_column_names (snapshot_config.rs:371-377): the
    output exposes custom names; a second run consumes them back."""
    from dbt_fusion_spark.snapshots import snapshot_merge

    names = {"dbt_scd_id": "row_hash", "dbt_valid_from": "valid_since",
             "dbt_valid_to": "valid_until", "dbt_updated_at": "changed_at"}
    c = cfg(meta_column_names=names)
    s1 = state(spark, [(1, "a", T0)])
    snap = snapshot_merge(None, s1, c)
    assert {"row_hash", "valid_since", "valid_until", "changed_at"} <= set(snap.columns)
    assert "dbt_scd_id" not in snap.columns

    s2 = state(spark, [(1, "a2", T1)])
    snap2 = snapshot_merge(snap, s2, c, now=NOW2())
    assert snap2.count() == 2
    open_rows = snap2.filter(F.col("valid_until").isNull()).collect()
    assert len(open_rows) == 1 and open_rows[0]["val"] == "a2"
