"""Local replica of the driver's correctness gate.

Runs a Spark query and its DuckDB oracle SQL side-by-side and compares
row count, column names, and an order-insensitive canonicalized value
multiset. Designed to be *stricter* than the driver (exact float repr)
so anything passing here should pass the gate.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from dbt_fusion_spark.sources.registry import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round to 9 significant-ish decimals to absorb printing noise only;
        # queries are designed to be bit-exact across engines.
        return repr(v)
    if isinstance(v, Decimal):
        return f"dec:{v.normalize()}"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, _dt.datetime):
        return "ts:" + v.isoformat()
    if isinstance(v, _dt.date):
        return "d:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canon_cell(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    return "s:" + str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, oracle_sql: str, sf_dir: str, limit: int = 2_000_000):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    con = duckdb_conn(sf_dir)
    cur = con.execute(oracle_sql)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    con.close()

    errs = []
    if sorted(s_cols) != sorted(o_cols):
        errs.append(f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    if len(s_rows) != len(o_rows):
        errs.append(f"rowcount mismatch: spark={len(s_rows)} oracle={len(o_rows)}")
    if not errs:
        cs, co = canon_rows(s_cols, s_rows), canon_rows(o_cols, o_rows)
        if cs != co:
            diffs = [
                (a, b) for a, b in zip(cs, co) if a != b
            ][:5]
            errs.append(f"value mismatch; first diffs (spark vs oracle): {diffs}")
    return errs
