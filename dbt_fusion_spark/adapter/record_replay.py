"""Record & replay of warehouse interactions ("time machine").

Re-expresses crates/dbt-adapter/src/record_and_replay.rs +
time_machine/{engine,event_recorder,event_replay}.rs: in record mode
every execute() is captured (normalized SQL, response, fetched rows)
to a JSONL file; in replay mode the same sequence is served back
without touching Spark — deterministic adapter-level tests and
debugging of production runs with zero warehouse access.
"""

from __future__ import annotations

import json
from pathlib import Path

from dbt_fusion_spark.adapter.spark_adapter import AdapterResponse, SparkAdapter
from dbt_fusion_spark.agate import AgateTable


def _norm(sql: str) -> str:
    return " ".join(sql.split())


class RecordingAdapter:
    """Wraps a live SparkAdapter; mirrors its surface, records
    execute() traffic."""

    def __init__(self, inner: SparkAdapter, path: str | Path):
        self._inner = inner
        self._path = Path(path)
        self._path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = self._path.open("w")

    def execute(self, sql: str, auto_begin: bool = False, fetch: bool = False,
                limit: int | None = None):
        response, table = self._inner.execute(sql, auto_begin, fetch, limit)
        event = {
            "sql": _norm(sql),
            "fetch": bool(fetch),
            "rows_affected": response.rows_affected,
            "columns": table.column_names if table is not None else None,
            "rows": [list(map(_jsonable, r)) for r in table.rows]
            if table is not None else None,
        }
        self._fh.write(json.dumps(event) + "\n")
        self._fh.flush()
        return response, table

    def __getattr__(self, name):  # everything else passes through live
        return getattr(self._inner, name)


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return str(v)


class ReplayAdapter:
    """Serves a recorded session back in order. No SparkSession needed:
    execute() asserts the incoming SQL matches the recorded event and
    returns the recorded response/rows."""

    def __init__(self, path: str | Path):
        self._events = [json.loads(line)
                        for line in Path(path).read_text().splitlines() if line]
        self._pos = 0

    @property
    def remaining(self) -> int:
        return len(self._events) - self._pos

    def execute(self, sql: str, auto_begin: bool = False, fetch: bool = False,
                limit: int | None = None):
        if self._pos >= len(self._events):
            raise AssertionError(
                f"replay exhausted after {self._pos} events; got: {_norm(sql)}")
        ev = self._events[self._pos]
        self._pos += 1
        if ev["sql"] != _norm(sql):
            raise AssertionError(
                f"replay divergence at event {self._pos}:\n"
                f"  recorded: {ev['sql']}\n  got:      {_norm(sql)}")
        table = None
        if ev["rows"] is not None:
            table = AgateTable(ev["columns"], [tuple(r) for r in ev["rows"]])
        return AdapterResponse(rows_affected=ev["rows_affected"]), table

    def run_query(self, sql: str, limit: int | None = None) -> AgateTable:
        _, table = self.execute(sql, fetch=True, limit=limit)
        return table
