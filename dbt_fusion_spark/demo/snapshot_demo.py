"""Driver-gate scenarios for SCD2 snapshots (SURVEY §2.1 snapshot).

Two deterministic source states are derived from `orders`; the engine
runs build + one snapshot pass; the oracle constructs the expected SCD2
table directly (closed versions ∪ new versions ∪ untouched ∪ inserts)
with the same md5 scd_ids the engine computes
(strategies.sql:56-88: md5(key | updated_at)).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_fusion_spark.demo.registry import register
from dbt_fusion_spark.snapshots import SnapshotConfig, snapshot_build, snapshot_run
from dbt_fusion_spark.sources.registry import load_table

# scd_id must render timestamps identically in both engines:
# Spark date_format(..., 'yyyy-MM-dd HH:mm:ss.SSSSSS')
# DuckDB strftime(..., '%Y-%m-%d %H:%M:%S.%f')
_DUCK_SCD = "md5(concat(CAST({key} AS VARCHAR), '|', strftime({ts}, '%Y-%m-%d %H:%M:%S.%f')))"


def _state1(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < "1997-01-01")
        .select("o_orderkey", "o_orderstatus", "o_totalprice",
                F.col("o_orderdate").alias("updated_at"))
    )


def _state2(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderdate") < "1997-01-01").select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(
            F.col("o_orderstatus") == "F",
            F.col("o_orderdate") + F.expr("INTERVAL 100 DAYS"),
        )
        .otherwise(F.col("o_orderdate"))
        .alias("updated_at"),
    )
    new = orders.filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice",
             F.col("o_orderdate").alias("updated_at"))
    return old.unionByName(new)


_ORACLE_TS = f"""
WITH s1 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate AS updated_at
  FROM orders WHERE o_orderdate < DATE '1997-01-01'
),
changed AS (SELECT * FROM s1 WHERE o_orderstatus = 'F'),
unchanged AS (SELECT * FROM s1 WHERE o_orderstatus <> 'F'),
news AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate AS updated_at
  FROM orders
  WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-07-01'
)
-- closed old versions of changed rows
SELECT o_orderkey, o_orderstatus, o_totalprice, updated_at,
       updated_at AS dbt_updated_at, updated_at AS dbt_valid_from,
       updated_at + INTERVAL 100 DAY AS dbt_valid_to,
       {_DUCK_SCD.format(key="o_orderkey", ts="updated_at")} AS dbt_scd_id
FROM changed
UNION ALL
-- new open versions of changed rows (price doubled, updated shifted)
SELECT o_orderkey, o_orderstatus, o_totalprice * 2, updated_at + INTERVAL 100 DAY,
       updated_at + INTERVAL 100 DAY, updated_at + INTERVAL 100 DAY,
       NULL,
       {_DUCK_SCD.format(key="o_orderkey", ts="updated_at + INTERVAL 100 DAY")}
FROM changed
UNION ALL
-- untouched open rows
SELECT o_orderkey, o_orderstatus, o_totalprice, updated_at,
       updated_at, updated_at, NULL,
       {_DUCK_SCD.format(key="o_orderkey", ts="updated_at")}
FROM unchanged
UNION ALL
-- brand-new keys
SELECT o_orderkey, o_orderstatus, o_totalprice, updated_at,
       updated_at, updated_at, NULL,
       {_DUCK_SCD.format(key="o_orderkey", ts="updated_at")}
FROM news
"""


@register("snapshot_timestamp", oracle=_ORACLE_TS)
def snapshot_timestamp(spark, sf_dir):
    """timestamp strategy: 'F' orders change (updated_at advances 100
    days, price doubles) → closed + reopened; other keys untouched; a
    batch of 1997H1 orders arrives as inserts."""
    cfg = SnapshotConfig(unique_key="o_orderkey", strategy="timestamp",
                         updated_at="updated_at")
    snap1 = snapshot_build(_state1(spark, sf_dir), cfg)
    return snapshot_run(snap1, _state2(spark, sf_dir), cfg,
                        now=F.lit("2024-06-01 00:00:00").cast("timestamp"))


_NOW = "TIMESTAMP '2024-06-01 00:00:00'"
_BUILD_TS = "TIMESTAMP '2024-01-01 00:00:00'"

_ORACLE_CHECK = f"""
WITH s1 AS (
  SELECT c_custkey, c_name, c_mktsegment, c_acctbal
  FROM customer WHERE c_custkey % 10 <> 0
),
s2_updates AS (  -- BUILDING customers change segment
  SELECT c_custkey, c_name, 'PROMO' AS c_mktsegment, c_acctbal
  FROM s1 WHERE c_mktsegment = 'BUILDING'
),
s2_deleted AS (SELECT * FROM s1 WHERE c_custkey % 7 = 0 AND c_mktsegment <> 'BUILDING'),
s2_kept AS (
  SELECT * FROM s1 WHERE c_mktsegment <> 'BUILDING' AND c_custkey % 7 <> 0
)
-- closed old versions of changed rows
SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
       {_BUILD_TS} AS dbt_updated_at, {_BUILD_TS} AS dbt_valid_from,
       {_NOW} AS dbt_valid_to,
       {_DUCK_SCD.format(key="c_custkey", ts=_BUILD_TS)} AS dbt_scd_id,
       'False' AS dbt_is_deleted
FROM s1 WHERE c_mktsegment = 'BUILDING'
UNION ALL
-- new open versions (segment now PROMO)
SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
       {_NOW}, {_NOW}, NULL,
       {_DUCK_SCD.format(key="c_custkey", ts=_NOW)}, 'False'
FROM s2_updates
UNION ALL
-- untouched open rows
SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
       {_BUILD_TS}, {_BUILD_TS}, NULL,
       {_DUCK_SCD.format(key="c_custkey", ts=_BUILD_TS)}, 'False'
FROM s2_kept
UNION ALL
-- hard-deleted keys: old row closed at now
SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
       {_BUILD_TS}, {_BUILD_TS}, {_NOW},
       {_DUCK_SCD.format(key="c_custkey", ts=_BUILD_TS)}, 'False'
FROM s2_deleted
UNION ALL
-- ... plus an open tombstone row
SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
       {_NOW}, {_NOW}, NULL,
       {_DUCK_SCD.format(key="c_custkey", ts=_NOW)}, 'True'
FROM s2_deleted
"""


@register("snapshot_check_new_record", oracle=_ORACLE_CHECK)
def snapshot_check_new_record(spark, sf_dir):
    """check strategy + hard_deletes=new_record: BUILDING customers
    change segment (check_cols detects it); every 7th non-BUILDING key
    vanishes → closed + tombstone."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 != 0)
    s1 = cust.select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    s2 = (
        s1.filter((F.col("c_mktsegment") != "BUILDING") & (F.col("c_custkey") % 7 != 0))
        .unionByName(
            s1.filter(F.col("c_mktsegment") == "BUILDING").withColumn(
                "c_mktsegment", F.lit("PROMO")
            )
        )
    )
    cfg = SnapshotConfig(unique_key="c_custkey", strategy="check",
                         check_cols=["c_mktsegment", "c_acctbal"],
                         hard_deletes="new_record")
    snap1 = snapshot_build(s1, cfg, now=F.lit("2024-01-01 00:00:00").cast("timestamp"))
    return snapshot_run(snap1, s2, cfg,
                        now=F.lit("2024-06-01 00:00:00").cast("timestamp"))


_ORACLE_INVALIDATE = f"""
WITH s1 AS (
  SELECT c_custkey, c_name, c_mktsegment, c_acctbal
  FROM customer WHERE c_custkey % 10 <> 0
),
s2_deleted AS (SELECT * FROM s1 WHERE c_custkey % 7 = 0),
s2_kept AS (SELECT * FROM s1 WHERE c_custkey % 7 <> 0)
-- untouched open rows
SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
       {_BUILD_TS} AS dbt_updated_at, {_BUILD_TS} AS dbt_valid_from,
       NULL AS dbt_valid_to,
       {_DUCK_SCD.format(key="c_custkey", ts=_BUILD_TS)} AS dbt_scd_id
FROM s2_kept
UNION ALL
-- hard-deleted keys: row closed at now, NO tombstone (invalidate)
SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
       {_BUILD_TS}, {_BUILD_TS}, {_NOW},
       {_DUCK_SCD.format(key="c_custkey", ts=_BUILD_TS)}
FROM s2_deleted
"""


@register("snapshot_hard_delete_invalidate", oracle=_ORACLE_INVALIDATE)
def snapshot_hard_delete_invalidate(spark, sf_dir):
    """hard_deletes=invalidate (common.rs:613-617): keys absent from the
    new source state get dbt_valid_to closed at `now`, but unlike
    new_record no tombstone row is added and no dbt_is_deleted column
    exists. Unchanged keys keep their open version untouched."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 != 0)
    s1 = cust.select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    s2 = s1.filter(F.col("c_custkey") % 7 != 0)
    cfg = SnapshotConfig(unique_key="c_custkey", strategy="check",
                         check_cols="all", hard_deletes="invalidate")
    snap1 = snapshot_build(s1, cfg, now=F.lit("2024-01-01 00:00:00").cast("timestamp"))
    return snapshot_run(snap1, s2, cfg,
                        now=F.lit("2024-06-01 00:00:00").cast("timestamp"))


@register("snapshot_partition_scoped", oracle=_ORACLE_TS)
def snapshot_partition_scoped(spark, sf_dir):
    """The r5 partition-scoped snapshot rung END-TO-END through the
    materializer (executors._partition_scoped_snapshot): a real
    o_orderstatus-partitioned managed table, built then snapshot-run;
    only partitions holding staged inserts or closed rows rewrite
    (file-stability pinned in tests/test_native_dml.py; this row
    certifies the landed VALUES equal the same SCD-2 oracle as the
    pure-algebra `snapshot_timestamp` row — the scoped rewrite is the
    identical algebra, partition-pruned)."""
    import shutil

    from dbt_fusion_spark.adapter import SparkAdapter
    from dbt_fusion_spark.materializations.executors import (
        materialize_snapshot,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS dbt_demo")
    spark.sql("DROP TABLE IF EXISTS dbt_demo.snap_scoped")
    wh = (spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
          .removeprefix("file:"))
    for leftover in ("snap_scoped", "snap_scoped__dbt_tmp",
                     "snap_scoped__dbt_scoped_tmp",
                     "snap_scoped__dbt_backup"):
        shutil.rmtree(f"{wh}/dbt_demo.db/{leftover}", ignore_errors=True)
    adapter = SparkAdapter(spark=spark, default_schema="dbt_demo")
    cfg = SnapshotConfig(unique_key="o_orderkey", strategy="timestamp",
                         updated_at="updated_at")
    _state1(spark, sf_dir).createOrReplaceTempView("__snap_scoped_src")
    materialize_snapshot(adapter, "dbt_demo", "snap_scoped",
                         "SELECT * FROM __snap_scoped_src", cfg,
                         partition_by="o_orderstatus")
    _state2(spark, sf_dir).createOrReplaceTempView("__snap_scoped_src")
    materialize_snapshot(adapter, "dbt_demo", "snap_scoped",
                         "SELECT * FROM __snap_scoped_src", cfg,
                         partition_by="o_orderstatus")
    return spark.table("dbt_demo.snap_scoped")
