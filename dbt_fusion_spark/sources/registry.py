"""Source registry: external parquet tables registered as Spark views.

Mirrors the reference's notion of *sources* (DbtSource,
crates/dbt-schemas/src/schemas/nodes.rs:3084-3114): externally-loaded
relations that models reference by name. Here a "source" is a parquet
path registered as a temp view; on a cluster it would be a catalog
table. Registration is metadata-only — Catalyst still pushes filters
and prunes columns down to the parquet scan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def ensure_session_confs(spark: SparkSession) -> None:
    """Make any SparkSession (not just get_spark()'s) behave correctly.
    All three are runtime-settable SQL confs, so this works on a vanilla
    session built by an external harness:

    - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which Spark's
      parquet reader otherwise rejects (PARQUET_TYPE_ILLEGAL).
    - UTC session timezone: collected timestamps must agree with DuckDB's
      UTC-naive timestamps for oracle comparison.
    - dynamic partition overwrite: INSERT OVERWRITE on a partitioned
      table must replace only the partitions present in the batch (the
      incremental insert_overwrite/microbatch contract); static mode
      would silently truncate the whole table.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")


# Backwards-compatible alias (reader-only callers).
ensure_reader_confs = ensure_session_confs


# Schema cache: spark.read.parquet without an explicit schema reads the
# footer and infers the schema EAGERLY on the driver (~10-50 ms/table);
# a query battery re-reading the same immutable source tables pays that
# per query. Caching the inferred StructType (keyed by applicationId so
# it dies with the session) and passing it back via .schema() skips the
# footer read while still returning a FRESH DataFrame per call — a
# shared DataFrame object would trip Spark's ambiguous-self-join
# detection when a query joins two derivations of the same source.
_SCHEMA_CACHE: dict[tuple[str, str, str], object] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    key = (spark.sparkContext.applicationId, sf_dir, name)
    schema = _SCHEMA_CACHE.get(key)
    if schema is not None:
        df = spark.read.schema(schema).parquet(path)
    else:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long (nanosAsLong above); convert to
        # microsecond timestamps — DuckDB does the same on read. Integer
        # DIV, not /1000: epoch nanos (~1e18) exceed double's 53-bit
        # mantissa, so float division drifts by ±1 µs.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def tables_in_sql(sql: str) -> list[str]:
    """Source tables referenced by a SQL text (word-boundary match).

    Used for lazy registration: a query only pays the schema-read for the
    tables it actually names, and an unreadable table can't break
    unrelated queries.
    """
    return [t for t in TABLES if re.search(rf"\b{t}\b", sql)]


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each source parquet as a temp view (idempotent).

    Pass `tables` (or a SQL string via `tables_in_sql`) to register only
    what a query needs — registration is eager per table (the parquet
    footer is read to build the view), so narrowing the list matters.
    """
    for name in tables if tables is not None else TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
