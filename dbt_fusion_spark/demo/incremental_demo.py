"""Driver-gate scenarios for the incremental strategies (SURVEY §2.1).

Each entry derives a deterministic (target, source) pair from the
testdata, applies the pure-strategy operator from
dbt_fusion_spark.incremental, and returns the post-run table. The
oracle re-states the strategy's SQL contract (the reference's
merge.sql/strategies.sql semantics) in ANSI SQL for DuckDB.

Doubling a double (x*2) is exact in IEEE arithmetic, so the "updated
rows" transform is engine-identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_fusion_spark.demo.registry import register
from dbt_fusion_spark.incremental import (
    delete_insert,
    insert_overwrite,
    merge,
    microbatch_windows,
)
from dbt_fusion_spark.sources.registry import load_table

ORDER_COLS = "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"


def _orders_target(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "2000-01-01"
    )


def _orders_source(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )


_T = f"SELECT {ORDER_COLS} FROM orders WHERE o_orderdate < DATE '2000-01-01'"
_S = (
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2 AS o_totalprice, "
    "o_orderdate, o_orderpriority FROM orders WHERE o_orderdate >= DATE '1999-01-01'"
)


@register(
    "incremental_merge",
    oracle=f"""
    WITH t AS ({_T}), s AS ({_S})
    SELECT s.* FROM s
    UNION ALL
    SELECT t.* FROM t WHERE NOT EXISTS (
      SELECT 1 FROM s WHERE s.o_orderkey = t.o_orderkey)
    """,
)
def incremental_merge(spark, sf_dir):
    """merge.sql:9-54 — matched rows take all source values, unmatched
    source rows insert, unmatched target rows persist."""
    return merge(_orders_target(spark, sf_dir), _orders_source(spark, sf_dir),
                 unique_key="o_orderkey")


@register(
    "incremental_merge_update_columns",
    oracle=f"""
    WITH t AS ({_T}), s AS ({_S})
    SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus, s.o_totalprice,
           t.o_orderdate, t.o_orderpriority
    FROM t JOIN s ON t.o_orderkey = s.o_orderkey
    UNION ALL
    SELECT t.* FROM t WHERE NOT EXISTS (
      SELECT 1 FROM s WHERE s.o_orderkey = t.o_orderkey)
    UNION ALL
    SELECT s.* FROM s WHERE NOT EXISTS (
      SELECT 1 FROM t WHERE t.o_orderkey = s.o_orderkey)
    """,
)
def incremental_merge_update_columns(spark, sf_dir):
    """merge_update_columns (merge.sql:20-33): only the listed columns
    update on match; other target values persist."""
    return merge(
        _orders_target(spark, sf_dir),
        _orders_source(spark, sf_dir),
        unique_key="o_orderkey",
        merge_update_columns=["o_totalprice"],
    )


LI_COLS = ("l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, "
           "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
_LT = f"SELECT {LI_COLS} FROM lineitem WHERE l_shipdate < DATE '2000-01-01'"
_LS = f"SELECT {LI_COLS} FROM lineitem WHERE l_shipdate >= DATE '1999-06-01'"


@register(
    "incremental_delete_insert",
    oracle=f"""
    WITH t AS ({_LT}), s AS ({_LS})
    SELECT t.* FROM t WHERE NOT EXISTS (
      SELECT 1 FROM s WHERE s.l_orderkey = t.l_orderkey)
    UNION ALL
    SELECT s.* FROM s
    """,
)
def incremental_delete_insert(spark, sf_dir):
    """delete+insert (merge.sql:62-92) on a NON-unique key: every target
    row whose l_orderkey appears in source is deleted, then all source
    rows (multiple per key) are inserted — semantics merge can't express."""
    li = load_table(spark, sf_dir, "lineitem")
    target = li.filter(F.col("l_shipdate") < "2000-01-01")
    source = li.filter(F.col("l_shipdate") >= "1999-06-01")
    return delete_insert(target, source, unique_key="l_orderkey")


@register(
    "incremental_insert_overwrite",
    oracle=f"""
    WITH t AS (SELECT {ORDER_COLS},
                      CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS o_month
               FROM orders),
         s AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                      o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority,
                      CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS o_month
               FROM orders WHERE o_orderdate >= DATE '2001-01-01')
    SELECT t.* FROM t WHERE NOT EXISTS (
      SELECT 1 FROM s WHERE s.o_month = t.o_month)
    UNION ALL
    SELECT s.* FROM s
    """,
)
def incremental_insert_overwrite(spark, sf_dir):
    """insert_overwrite (dbt-spark strategies.sql:1-15): months present
    in the source batch replace the matching target partitions wholesale."""
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate")).alias("o_month")
    target = orders.select("*", month)
    source = (
        orders.filter(F.col("o_orderdate") >= "2001-01-01")
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .select("*", month)
    )
    return insert_overwrite(target, source, partition_by="o_month")


@register(
    "incremental_microbatch",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS event_day, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-12'
    GROUP BY 1, 2
    """,
)
def incremental_microbatch(spark, sf_dir):
    """microbatch (model_config.rs:79-82; dbt-spark strategies.sql:80-91):
    the run window [begin, end) splits into day batches; each batch is
    filtered on event_time, aggregated, and insert_overwrites its day
    partition. Partitions are disjoint so the loop is idempotent —
    re-running any batch yields the same table (exactly-once semantics).

    Persists through a real partitioned managed table + dynamic-partition
    INSERT OVERWRITE (the actual 100 TB path: metadata-only swaps, no
    shuffle against existing data)."""
    import datetime as dt
    import tempfile

    events = load_table(spark, sf_dir, "events")
    begin, end = dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 12)

    spark.sql("CREATE DATABASE IF NOT EXISTS dbt_demo")
    spark.sql("DROP TABLE IF EXISTS dbt_demo.microbatch_daily")
    # External table at a fresh temp location: a leftover warehouse dir
    # from a previous run (LOCATION_ALREADY_EXISTS) can't break us.
    loc = tempfile.mkdtemp(prefix="microbatch_daily_")
    spark.sql(
        f"""CREATE TABLE dbt_demo.microbatch_daily
           (event_type STRING, n_events BIGINT, total_value DOUBLE, event_day DATE)
           USING PARQUET PARTITIONED BY (event_day) LOCATION '{loc}'"""
    )
    for lo, hi in microbatch_windows(begin, end, "day"):
        batch = events.filter(
            (F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi))
        )
        agg = batch.groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").alias("event_day"),
            "event_type",
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        agg.select("event_type", "n_events", "total_value", "event_day").write.mode(
            "overwrite"
        ).insertInto("dbt_demo.microbatch_daily")
    return spark.table("dbt_demo.microbatch_daily").select(
        "event_day", "event_type", "n_events", "total_value"
    )


@register(
    "incremental_replace_where",
    oracle=f"""
    WITH t AS ({_T}),
         s AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                      o_totalprice * 2 AS o_totalprice,
                      o_orderdate, o_orderpriority
               FROM orders WHERE o_orderdate >= DATE '1998-06-01')
    SELECT t.* FROM t WHERE NOT (o_orderdate >= TIMESTAMP '1999-01-01')
    UNION ALL
    SELECT s.* FROM s WHERE o_orderdate >= TIMESTAMP '1999-01-01'
    """,
)
def incremental_replace_where(spark, sf_dir):
    """replace_where (common.rs:566-568): the predicate region
    [1999-01-01, inf) is replaced wholesale by the matching source
    rows; out-of-scope source rows (1998-06..1999-01) are dropped —
    the Delta replaceWhere contract."""
    from dbt_fusion_spark.incremental import replace_where

    target = _orders_target(spark, sf_dir)
    source = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1998-06-01")
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    return replace_where(target, source,
                         "o_orderdate >= TIMESTAMP '1999-01-01'")


@register(
    "incremental_merge_partition_scoped",
    # merge semantics restated; the month is part of the key, so the
    # oracle's key join is (o_month, o_orderkey) — identical rows to a
    # plain orderkey merge, but the partition-subset-of-key shape is
    # what routes the executor onto the scoped-overwrite path.
    oracle=f"""
    WITH t AS (SELECT {ORDER_COLS},
                      CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS o_month
               FROM orders WHERE o_orderdate < DATE '2000-01-01'),
         s AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                      o_totalprice * 2 AS o_totalprice, o_orderdate,
                      o_orderpriority,
                      CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS o_month
               FROM orders WHERE o_orderdate >= DATE '1999-07-01'
                             AND o_orderdate < DATE '2000-01-01')
    SELECT s.* FROM s
    UNION ALL
    SELECT t.* FROM t WHERE NOT EXISTS (
      SELECT 1 FROM s WHERE s.o_orderkey = t.o_orderkey
                        AND s.o_month = t.o_month)
    """,
)
def incremental_merge_partition_scoped(spark, sf_dir):
    """The executor's partition-scoped merge end-to-end (r4: the
    O(touched-partitions) fallback when partition keys ⊆ unique key):
    a real month-partitioned managed table, a batch touching only
    1999-07..1999-12, landed via dynamic-partition INSERT OVERWRITE —
    untouched months' files never move (tests/test_native_dml.py pins
    the file-stability property; this row certifies the values)."""
    from dbt_fusion_spark.adapter import SparkAdapter
    from dbt_fusion_spark.materializations.executors import (
        materialize_incremental,
    )
    from dbt_fusion_spark.sources.registry import register_views

    import shutil

    register_views(spark, sf_dir, ["orders"])
    spark.sql("CREATE DATABASE IF NOT EXISTS dbt_demo")
    spark.sql("DROP TABLE IF EXISTS dbt_demo.merge_scoped")
    # vanilla harness sessions get a fresh derby metastore but a
    # persistent ./spark-warehouse: clear any orphaned location from a
    # previous process or CTAS raises LOCATION_ALREADY_EXISTS
    wh = (spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
          .removeprefix("file:"))
    for leftover in ("merge_scoped", "merge_scoped__dbt_tmp",
                     "merge_scoped__dbt_scoped_tmp",
                     "merge_scoped__dbt_backup"):
        shutil.rmtree(f"{wh}/dbt_demo.db/{leftover}", ignore_errors=True)
    adapter = SparkAdapter(spark=spark, default_schema="dbt_demo")
    month = "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS o_month"
    target_sql = (f"SELECT {ORDER_COLS}, {month} FROM orders "
                  "WHERE o_orderdate < DATE '2000-01-01'")
    batch_sql = ("SELECT o_orderkey, o_custkey, o_orderstatus, "
                 f"o_totalprice * 2 AS o_totalprice, o_orderdate, "
                 f"o_orderpriority, {month} FROM orders "
                 "WHERE o_orderdate >= DATE '1999-07-01' "
                 "AND o_orderdate < DATE '2000-01-01'")
    kw = dict(strategy="merge", unique_key=["o_month", "o_orderkey"],
              partition_by="o_month")
    materialize_incremental(adapter, "dbt_demo", "merge_scoped", target_sql,
                            full_refresh=True, **kw)
    out = materialize_incremental(adapter, "dbt_demo", "merge_scoped",
                                  batch_sql, **kw)
    assert "partition-scoped" in out, out
    return spark.table("dbt_demo.merge_scoped").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority", "o_month")
