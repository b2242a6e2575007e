"""Driver-side result table ("agate" in dbt parlance).

Re-expresses crates/dbt-agate/src/table.rs — the small collected table
Jinja iterates over: select (:504), rename (:716), grouper (:510),
per-column distinct/without_nulls/sorted (:174-192), counts/indexing
(:194-272), print_table (:537). Only used for seeds, run_query()
results and `show` — never for bulk data (that stays distributed).
"""

from __future__ import annotations

from collections.abc import Iterable
from dataclasses import dataclass


@dataclass
class AgateColumn:
    name: str
    values: list

    def distinct(self) -> list:
        seen, out = set(), []
        for v in self.values:
            k = repr(v)
            if k not in seen:
                seen.add(k)
                out.append(v)
        return out

    def without_nulls(self) -> list:
        return [v for v in self.values if v is not None]

    def sorted(self) -> list:
        return sorted(self.without_nulls())


class AgateTable:
    def __init__(self, column_names: list[str], rows: list[tuple],
                 column_types: list[str] | None = None):
        self.column_names = list(column_names)
        self.rows = [tuple(r) for r in rows]
        self.column_types = column_types or ["unknown"] * len(self.column_names)

    @classmethod
    def from_dataframe(cls, df, limit: int | None = None) -> AgateTable:
        if limit is not None:
            df = df.limit(limit)
        return cls(
            df.columns,
            [tuple(r) for r in df.collect()],
            [f.dataType.simpleString() for f in df.schema.fields],
        )

    @property
    def columns(self) -> list[AgateColumn]:
        return [
            AgateColumn(n, [r[i] for r in self.rows])
            for i, n in enumerate(self.column_names)
        ]

    def __len__(self) -> int:
        return len(self.rows)

    def __iter__(self):
        return iter(self.rows)

    def __getitem__(self, i):
        return self.rows[i]

    # --- table.rs:504 ---
    def select(self, keys: Iterable[str]) -> AgateTable:
        keys = list(keys)
        idx = [self.column_names.index(k) for k in keys]
        return AgateTable(
            keys,
            [tuple(r[i] for i in idx) for r in self.rows],
            [self.column_types[i] for i in idx],
        )

    # --- table.rs:716 ---
    def rename(self, column_names: dict[str, str] | list[str] | None = None) -> AgateTable:
        if isinstance(column_names, dict):
            new = [column_names.get(c, c) for c in self.column_names]
        elif column_names:
            new = list(column_names)
        else:
            new = self.column_names
        return AgateTable(new, self.rows, self.column_types)

    # --- table.rs:510 / grouper.rs ---
    def grouper(self, key: str) -> dict:
        i = self.column_names.index(key)
        groups: dict = {}
        for r in self.rows:
            groups.setdefault(r[i], []).append(r)
        return groups

    def where(self, pred) -> AgateTable:
        keep = [r for r in self.rows if pred(dict(zip(self.column_names, r)))]
        return AgateTable(self.column_names, keep, self.column_types)

    # --- table.rs:537 ---
    def print_table(self, max_rows: int = 20) -> str:
        shown = self.rows[:max_rows]
        widths = [
            max([len(str(n))] + [len(str(r[i])) for r in shown])
            for i, n in enumerate(self.column_names)
        ]
        sep = "-+-".join("-" * w for w in widths)
        head = " | ".join(n.ljust(w) for n, w in zip(self.column_names, widths))
        body = [
            " | ".join(str(v).ljust(w) for v, w in zip(r, widths)) for r in shown
        ]
        more = [] if len(self.rows) <= max_rows else [f"... ({len(self.rows)} rows)"]
        return "\n".join([head, sep, *body, *more])
