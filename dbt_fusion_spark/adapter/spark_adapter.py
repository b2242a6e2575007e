"""SparkAdapter — the engine's warehouse interface, over one SparkSession.

Re-expresses the reference's BaseAdapter surface
(crates/dbt-adapter/src/base_adapter.rs, ~1190 LoC of trait methods;
typed impl typed_adapter.rs; engine adapter_engine.rs) where the
"warehouse" is Spark itself:

- execute(sql, fetch, limit)        base_adapter.rs:367
- drop/truncate/rename relation     base_adapter.rs:453,469,486
- create/drop/list schemas          base_adapter.rs:540,556,521
- get_relation / list_relations     base_adapter.rs:626,524
- get_columns_in_relation           base_adapter.rs:710
- get_column_schema_from_query      base_adapter.rs:769 (lazy, no exec)
- get_missing_columns               base_adapter.rs:693
- expand_target_column_types        base_adapter.rs:504
- alter_table_add_columns           base_adapter.rs:877
- quote / quote_as_configured       base_adapter.rs:209,222
- convert_type (seed inference)     base_adapter.rs:258
- dispatch (spark__x -> default__x) base_adapter.rs:297
- valid_incremental_strategies      base_adapter.rs:1033
- relation cache                    base_adapter.rs:136-190, cache.rs
- execute retry                     adapter_engine.rs:689
- statement splitting               stmt_splitter.rs:24

Everything is metadata ops + `spark.sql`; Catalyst handles query
optimization. At 100 TB the only scale-sensitive members here are the
catalog listings (cached) and `execute` (pure Spark job submission).
"""

from __future__ import annotations

import datetime as _dt
import fnmatch
import re
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from dbt_fusion_spark.agate import AgateTable
from dbt_fusion_spark.column import Column
from dbt_fusion_spark.relation import Policy, Relation, RelationType


@dataclass
class AdapterResponse:
    """Mirror of the reference's AdapterResponse (code + rows_affected)."""

    message: str = "OK"
    code: str | None = None
    rows_affected: int | None = None


def split_statements(sql: str) -> list[str]:
    """Split multi-statement SQL on ';' outside strings/comments
    (reference stmt_splitter.rs:24)."""
    out, buf = [], []
    i, n = 0, len(sql)
    in_s: str | None = None  # quote char
    while i < n:
        c = sql[i]
        if in_s:
            buf.append(c)
            if c == in_s:
                in_s = None
            elif c == "\\" and i + 1 < n:
                i += 1
                buf.append(sql[i])
            i += 1
            continue
        if c in ("'", '"', "`"):
            in_s = c
            buf.append(c)
            i += 1
            continue
        if c == "-" and sql[i : i + 2] == "--":
            j = sql.find("\n", i)
            j = n if j == -1 else j
            buf.append(sql[i:j])
            i = j
            continue
        if c == "/" and sql[i : i + 2] == "/*":
            j = sql.find("*/", i)
            j = n if j == -1 else j + 2
            buf.append(sql[i:j])
            i = j
            continue
        if c == ";":
            out.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(c)
        i += 1
    out.append("".join(buf))
    return [s.strip() for s in out if s.strip()]


@dataclass
class SparkAdapter:
    spark: SparkSession
    default_schema: str = "default"
    query_comment: str | None = None
    retries: int = 0
    retry_backoff: float = 1.0
    # run cancellation (reference dbt-cancel: the token reaches the
    # adapter engine so a cancelled run stops BETWEEN statements too,
    # and a cancelled statement is never retried).  The runner sets
    # this to the active token's is_cancelled for the run's duration.
    cancellation_check: object | None = None
    # relation cache (reference cache.rs): schema -> {identifier -> Relation}
    _cache: dict[str, dict[str, Relation]] = field(default_factory=dict)

    # ------------------------------------------------------------------ SQL
    def execute(
        self,
        sql: str,
        auto_begin: bool = False,  # kept for API parity; Spark has no txns
        fetch: bool = False,
        limit: int | None = None,
    ) -> tuple[AdapterResponse, AgateTable | None]:
        """reference base_adapter.rs:367 + adapter_engine.rs:456-467.
        Multi-statement SQL runs sequentially; the last result is
        fetched when fetch=True."""
        stmts = split_statements(sql)
        df: DataFrame | None = None
        for stmt in stmts:
            df = self._sql_with_retry(self._commented(stmt))
        table = None
        if fetch and df is not None:
            table = AgateTable.from_dataframe(df, limit=limit)
        rows = len(table) if table is not None else None
        return AdapterResponse(rows_affected=rows), table

    def run_query(self, sql: str, limit: int | None = None) -> AgateTable:
        return self.execute(sql, fetch=True, limit=limit)[1]

    def add_query(self, sql: str) -> None:  # base_adapter.rs:417
        self.execute(sql)

    def sql_df(self, sql: str) -> DataFrame:
        """Lazy DataFrame for a SELECT (no action triggered)."""
        return self.spark.sql(self._commented(sql))

    def _commented(self, sql: str) -> str:
        # reference query_comment.rs: prepend a marker comment
        if self.query_comment:
            return f"/* {self.query_comment} */\n{sql}"
        return sql

    def _cancelled(self) -> bool:
        return (self.cancellation_check is not None
                and self.cancellation_check())

    def _sql_with_retry(self, sql: str) -> DataFrame:
        # reference adapter_engine.rs:689 execute_query_with_retry,
        # threaded with the cancellation token (dbt-cancel): never
        # start a statement after cancel, never retry a cancelled one
        attempt = 0
        while True:
            if self._cancelled():
                raise RuntimeError("run cancelled")
            try:
                return self.spark.sql(sql)
            except Exception:
                attempt += 1
                if attempt > self.retries or self._cancelled():
                    raise
                time.sleep(self.retry_backoff * attempt)

    # -------------------------------------------------------------- schemas
    def create_schema(self, schema: str) -> None:  # base_adapter.rs:540
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{schema}`")

    def drop_schema(self, schema: str) -> None:  # base_adapter.rs:556
        self.spark.sql(f"DROP DATABASE IF EXISTS `{schema}` CASCADE")
        self._cache.pop(schema, None)

    def list_schemas(self) -> list[str]:  # base_adapter.rs:521
        return [d.name for d in self.spark.catalog.listDatabases()]

    def check_schema_exists(self, schema: str) -> bool:  # base_adapter.rs:734
        return self.spark.catalog.databaseExists(schema)

    # ------------------------------------------------------------ relations
    def _rel_type(self, table_type: str) -> RelationType:
        return {
            "VIEW": RelationType.View,
            "TEMPORARY": RelationType.View,
            "MANAGED": RelationType.Table,
            "EXTERNAL": RelationType.External,
        }.get(table_type, RelationType.Table)

    def get_relation(self, database: str | None, schema: str, identifier: str,
                     use_cache: bool = True) -> Relation | None:
        """base_adapter.rs:626. Consults the relation cache first."""
        cached = self._cache.get(schema)
        if use_cache and cached is not None:
            return cached.get(identifier.lower())
        try:
            t = self.spark.catalog.getTable(f"`{schema}`.`{identifier}`")
        except Exception:
            return None
        return Relation.create(
            database=None, schema=schema, identifier=t.name,
            type=self._rel_type(t.tableType),
        )

    def list_relations_without_caching(self, schema: str) -> list[Relation]:
        # base_adapter.rs:524
        if not self.check_schema_exists(schema):
            return []
        out = []
        for t in self.spark.catalog.listTables(schema):
            if t.isTemporary:
                continue
            out.append(
                Relation.create(schema=schema, identifier=t.name,
                                type=self._rel_type(t.tableType))
            )
        return out

    def list_relations(self, schema: str) -> list[Relation]:
        """Cached listing (reference cache.rs + base_adapter.rs:1113
        is_already_fully_cached)."""
        if schema not in self._cache:
            self._cache[schema] = {
                r.identifier.lower(): r
                for r in self.list_relations_without_caching(schema)
            }
        return list(self._cache[schema].values())

    def get_relations_by_pattern(self, schema_pattern: str, table_pattern: str
                                 ) -> list[Relation]:
        # MA relations/get_relations_by_pattern.sql
        out = []
        for s in self.list_schemas():
            if not fnmatch.fnmatch(s, schema_pattern):
                continue
            out.extend(
                r for r in self.list_relations(s)
                if fnmatch.fnmatch(r.identifier, table_pattern)
            )
        return out

    # --- cache maintenance (base_adapter.rs:136-190) ---
    def cache_added(self, relation: Relation) -> None:
        if relation.schema in self._cache:
            self._cache[relation.schema][relation.identifier.lower()] = relation

    def cache_dropped(self, relation: Relation) -> None:
        if relation.schema in self._cache:
            self._cache[relation.schema].pop(relation.identifier.lower(), None)

    def cache_renamed(self, from_rel: Relation, to_rel: Relation) -> None:
        self.cache_dropped(from_rel)
        self.cache_added(to_rel)

    # --- DDL (base_adapter.rs:453,469,486) ---
    def drop_relation(self, relation: Relation) -> None:
        kind = "VIEW" if relation.is_view else "TABLE"
        self.spark.sql(f"DROP {kind} IF EXISTS {relation.render()}")
        self.cache_dropped(relation)

    def truncate_relation(self, relation: Relation) -> None:
        self.spark.sql(f"TRUNCATE TABLE {relation.render()}")

    def rename_relation(self, from_rel: Relation, to_rel: Relation) -> None:
        self.spark.sql(
            f"ALTER TABLE {from_rel.render()} RENAME TO {to_rel.render()}"
        )
        self.cache_renamed(from_rel, to_rel.incorporate(type=from_rel.type))

    # -------------------------------------------------------------- columns
    def get_columns_in_relation(self, relation: Relation | str) -> list[Column]:
        # base_adapter.rs:710
        name = relation.render() if isinstance(relation, Relation) else relation
        return [Column.from_struct_field(f) for f in self.spark.table(name).schema.fields]

    def get_column_schema_from_query(self, sql: str) -> list[Column]:
        # base_adapter.rs:769 — schema-only, no execution (lazy analysis)
        return [Column.from_struct_field(f) for f in self.spark.sql(sql).schema.fields]

    get_columns_in_select_sql = get_column_schema_from_query  # base_adapter.rs:776

    def get_missing_columns(self, from_relation: Relation, to_relation: Relation
                            ) -> list[Column]:
        """Columns in from_relation missing from to_relation
        (base_adapter.rs:693)."""
        have = {c.name.lower() for c in self.get_columns_in_relation(to_relation)}
        return [
            c for c in self.get_columns_in_relation(from_relation)
            if c.name.lower() not in have
        ]

    def alter_table_add_columns(self, relation: Relation, columns: list[Column]
                                ) -> None:
        # base_adapter.rs:877
        if not columns:
            return
        cols = ", ".join(f"{c.quoted} {c.data_type}" for c in columns)
        self.spark.sql(f"ALTER TABLE {relation.render()} ADD COLUMNS ({cols})")

    def expand_target_column_types(self, from_relation: Relation,
                                   to_relation: Relation) -> None:
        """base_adapter.rs:504 — widen string columns. Spark strings are
        unbounded, so this is a no-op kept for API parity (the reference
        Spark adapter does the same)."""
        return None

    # -------------------------------------------------------------- quoting
    def quote(self, identifier: str) -> str:  # base_adapter.rs:209
        return "`" + identifier.replace("`", "``") + "`"

    def quote_as_configured(self, identifier: str, quote_config: bool) -> str:
        return self.quote(identifier) if quote_config else identifier

    def quote_seed_column(self, column: str, quote_config: bool | None) -> str:
        # base_adapter.rs:240 — seeds quote by default
        return self.quote(column) if quote_config is not False else column

    # -------------------------------------------------- seed type inference
    def convert_type(self, table: AgateTable, col_idx: int) -> str:
        """base_adapter.rs:258 — agate-style type sniffing for seed CSVs."""
        vals = [r[col_idx] for r in table.rows if r[col_idx] not in (None, "")]
        if not vals:
            return "string"
        return _sniff_type([str(v) for v in vals])

    # ----------------------------------------------------------- dispatch
    def dispatch(self, macro_name: str, registry: dict[str, object],
                 package: str | None = None):
        """spark__name > default__name (base_adapter.rs:297)."""
        for candidate in (f"spark__{macro_name}", f"default__{macro_name}", macro_name):
            if candidate in registry:
                return registry[candidate]
        raise KeyError(f"no implementation for macro {macro_name!r}")

    def valid_incremental_strategies(self) -> list[str]:  # base_adapter.rs:1033
        return ["append", "merge", "delete+insert", "insert_overwrite", "microbatch"]

    # ------------------------------------------------------------ bulk load
    def load_dataframe(self, schema: str, identifier: str, path: str,
                       file_format: str = "csv", mode: str = "overwrite",
                       **options) -> None:
        """base_adapter.rs:886 (BigQuery bulk-load analog): file ->
        catalog table via the native reader, so format decoding and
        partitioned write both run distributed."""
        opts = {"header": "true", "inferSchema": "true"} \
            if file_format == "csv" else {}
        opts.update({k: str(v) for k, v in options.items()})
        reader = self.spark.read.format(file_format).options(**opts)
        self.create_schema(schema)
        reader.load(path).write.mode(mode).saveAsTable(
            f"`{schema}`.`{identifier}`")

    def copy_table(self, from_relation: Relation | str,
                   to_relation: Relation | str) -> None:
        """base_adapter.rs:850 — CTAS copy of an existing relation."""
        src = from_relation.render() if hasattr(from_relation, "render") \
            else from_relation
        dst = to_relation.render() if hasattr(to_relation, "render") \
            else to_relation
        self.execute(f"CREATE TABLE {dst} AS SELECT * FROM {src}")

    # ----------------------------------------------------------- snapshots
    SNAPSHOT_META_COLUMNS = ("dbt_scd_id", "dbt_updated_at",
                             "dbt_valid_from", "dbt_valid_to")

    def valid_snapshot_target(self, relation: Relation | str) -> None:
        """base_adapter.rs:572 — assert an existing snapshot table has
        the SCD-2 metadata columns before merging into it."""
        cols = {c.name.lower() for c in self.get_columns_in_relation(relation)}
        missing = [c for c in self.SNAPSHOT_META_COLUMNS if c not in cols]
        if missing:
            rel = relation.render() if hasattr(relation, "render") else relation
            raise ValueError(
                f"snapshot target {rel} missing columns {missing}")

    # ------------------------------------------------------------- indexes
    def parse_index(self, raw: dict) -> dict:
        """base_adapter.rs:1081 — normalize an index config dict
        ({columns, unique?, type?})."""
        cols = raw.get("columns") or []
        if isinstance(cols, str):
            cols = [cols]
        return {"columns": list(cols),
                "unique": bool(raw.get("unique", False)),
                "type": raw.get("type")}

    def create_indexes(self, relation: Relation | str,
                       indexes: list[dict]) -> list[dict]:
        """MA adapters/indexes.sql. The Spark session catalog has no
        secondary indexes; parsed configs are recorded and returned so
        callers can route them to a format-specific layout hook (for
        Delta: OPTIMIZE ... ZORDER BY (cols); for plain parquet:
        a sort-within-partitions write). No-op DDL-wise, like the
        reference on warehouses without index support."""
        return [self.parse_index(ix) for ix in indexes or []]

    # ------------------------------------------------------------- metadata
    def describe_relation(self, relation: Relation) -> AgateTable:
        # base_adapter.rs:950
        return self.run_query(f"DESCRIBE TABLE EXTENDED {relation.render()}")

    def analyze_table(self, relation: Relation | str,
                      columns: list[str] | None = None) -> None:
        """ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS ...].

        The 100 TB lever behind it: CBO join reordering and the
        broadcast-threshold decision read these stats; a freshly CTAS'd
        external table has none, so Spark falls back to file-size
        estimates that overestimate post-filter sizes and miss broadcast
        opportunities. Run after materializing large models (dbt
        post-hook shape). Column stats (ndv/min/max/nulls) additionally
        feed skew and selectivity estimates."""
        rendered = relation.render() if hasattr(relation, "render") else relation
        if columns:
            self.execute(
                f"ANALYZE TABLE {rendered} COMPUTE STATISTICS "
                f"FOR COLUMNS {', '.join(columns)}")
        else:
            self.execute(f"ANALYZE TABLE {rendered} COMPUTE STATISTICS")

    def table_stats(self, relation: Relation | str) -> dict[str, str]:
        """Parsed `Statistics` row of DESCRIBE EXTENDED (bytes/rows)."""
        rendered = relation.render() if hasattr(relation, "render") else relation
        rows = self.run_query(f"DESCRIBE TABLE EXTENDED {rendered}").rows
        out: dict[str, str] = {}
        for r in rows:
            if r[0] == "Statistics":
                out["statistics"] = r[1]
        return out

    def compact_table(self, relation: Relation | str,
                      target_partitions: int | None = None,
                      sort_by: list[str] | None = None) -> int:
        """Small-file compaction: rewrite a table into `target_partitions`
        files (default: session shuffle parallelism), optionally
        sort-within-partitions for clustering (the plain-parquet stand-in
        for Delta OPTIMIZE / ZORDER, see create_indexes).

        Incremental strategies that append per batch accumulate files;
        at fleet scale a 10k-file table turns every downstream scan into
        a listing + open storm. Returns the file-partition count written.
        Atomic via the same staging-table swap the table
        materialization uses."""
        rendered = relation.render() if hasattr(relation, "render") else relation
        n = target_partitions or int(
            self.spark.conf.get("spark.sql.shuffle.partitions"))
        df = self.spark.table(rendered)
        df = df.repartition(n)
        if sort_by:
            df = df.sortWithinPartitions(*sort_by)
        # suffix must land INSIDE a backtick-quoted identifier
        tmp = (rendered[:-1] + "__dbt_compact`" if rendered.endswith("`")
               else rendered + "__dbt_compact")
        self.execute(f"DROP TABLE IF EXISTS {tmp}")
        df.write.saveAsTable(tmp)
        self.execute(f"DROP TABLE {rendered}")
        self.execute(f"ALTER TABLE {tmp} RENAME TO {rendered}")
        return n


_BOOL = {"true", "false", "t", "f", "yes", "no"}
_INT_RE = re.compile(r"^[+-]?\d+$")
_FLOAT_RE = re.compile(r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$")
_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_TS_RE = re.compile(r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?$")


def _sniff_type(vals: list[str]) -> str:
    if all(v.lower() in _BOOL for v in vals):
        return "boolean"
    if all(_INT_RE.match(v) for v in vals):
        # always bigint, matching dbt-spark convert_number_type (seeds
        # never sniff 32-bit int — avoids silent overflow on append)
        return "bigint"
    if all(_FLOAT_RE.match(v) for v in vals):
        return "double"
    if all(_DATE_RE.match(v) for v in vals):
        return "date"
    if all(_TS_RE.match(v) for v in vals):
        return "timestamp"
    return "string"


def _coerce(v: str | None, typ: str):
    if v is None or v == "":
        return None
    if typ == "boolean":
        return v.lower() in ("true", "t", "yes")
    if typ in ("int", "bigint"):
        return int(v)
    if typ == "double":
        return float(v)
    if typ == "date":
        return _dt.date.fromisoformat(v)
    if typ == "timestamp":
        return _dt.datetime.fromisoformat(v.replace("T", " "))
    return v
