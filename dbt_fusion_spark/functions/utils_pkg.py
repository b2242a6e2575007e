"""dbt_utils compatibility namespace: `{{ dbt_utils.* }}`.

The most-depended-on hub package, re-expressed as SQL-emitting Python
callables (same pattern as functions/crossdb.py for `{{ dbt.* }}`).
Reference behavior source: the public dbt-utils macro semantics
(generate_surrogate_key coalesces each value to a sentinel and md5s the
'-'-joined string; star expands to '*' at parse time and to the pruned
column list at execute time; get_column_values returns [] at parse).

Adapter-dependent macros (star, union_relations, get_column_values)
take effect at compile/run time when an adapter is present; during the
parse render (execute=False, no adapter) they return the same neutral
values dbt-core's originals do.
"""

from __future__ import annotations

from collections.abc import Sequence

_NULL_SENTINEL = "_dbt_utils_surrogate_key_null_"


def make_namespace(adapter=None):
    """Build the dbt_utils namespace; adapter is None during parse."""
    from types import SimpleNamespace

    def generate_surrogate_key(field_list: Sequence[str]) -> str:
        parts = [
            f"coalesce(cast({f} as string), '{_NULL_SENTINEL}')"
            for f in field_list
        ]
        return f"md5(concat_ws('-', {', '.join(parts)}))"

    def star(from_rel, except_: Sequence[str] = (), relation_alias: str = "",
             **kwargs) -> str:
        except_ = list(kwargs.get("except", except_) or ())
        if adapter is None:
            return "*"
        cols = [c.name for c in adapter.get_columns_in_relation(str(from_rel))]
        exc = {e.lower() for e in except_}
        keep = [c for c in cols if c.lower() not in exc]
        prefix = f"{relation_alias}." if relation_alias else ""
        return ", ".join(f"{prefix}`{c}`" for c in keep)

    def get_column_values(table, column: str, order_by: str = "count(*) desc",
                          max_records: int | None = None,
                          default=None) -> list:
        if adapter is None:
            return default if default is not None else []
        limit = f" LIMIT {max_records}" if max_records else ""
        t = adapter.run_query(
            f"SELECT {column} AS v FROM {table} GROUP BY {column} "
            f"ORDER BY {order_by}{limit}")
        return [r[0] for r in t.rows]

    def pivot(column: str, values: Sequence, alias: bool = True,
              agg: str = "sum", cmp: str = "=", prefix: str = "",
              suffix: str = "", then_value=1, else_value=0,
              quote_identifiers: bool = True) -> str:
        out = []
        for v in values:
            lit = f"'{v}'" if isinstance(v, str) else str(v)
            expr = (f"{agg}(case when {column} {cmp} {lit} "
                    f"then {then_value} else {else_value} end)")
            if alias:
                name = f"{prefix}{v}{suffix}"
                ident = f"`{name}`" if quote_identifiers else name
                expr += f" as {ident}"
            out.append(expr)
        return ", ".join(out)

    def union_relations(relations: Sequence,
                        column_override: dict | None = None,
                        exclude: Sequence[str] = (),
                        source_column_name: str = "_dbt_source_relation"
                        ) -> str:
        if adapter is None:
            return "SELECT 1 AS __dbt_parse_stub WHERE 1 = 0"
        exclude_l = {e.lower() for e in exclude or ()}
        rel_cols = {
            str(r): {c.name: c.data_type
                     for c in adapter.get_columns_in_relation(str(r))}
            for r in relations
        }
        ordered: list[str] = []
        for cols in rel_cols.values():
            for c in cols:
                if c.lower() not in exclude_l and c not in ordered:
                    ordered.append(c)
        selects = []
        for rel, cols in rel_cols.items():
            parts = [f"cast('{rel}' as string) as {source_column_name}"]
            for c in ordered:
                typ = (column_override or {}).get(c) or cols.get(c)
                if c in cols:
                    parts.append(f"cast(`{c}` as {typ}) as `{c}`")
                else:
                    parts.append(f"cast(null as {typ or 'string'}) as `{c}`")
            selects.append(f"select {', '.join(parts)} from {rel}")
        return "\nunion all\n".join(selects)

    def group_by(n: int) -> str:
        return "group by " + ", ".join(str(i) for i in range(1, n + 1))

    def slugify(text: str) -> str:
        import re
        s = re.sub(r"[^a-zA-Z0-9_]+", "_", str(text)).strip("_").lower()
        return re.sub(r"^(\d)", r"_\1", s)

    def safe_add(fields: Sequence[str]) -> str:
        return " + ".join(f"coalesce({f}, 0)" for f in fields)

    def safe_subtract(fields: Sequence[str]) -> str:
        return " - ".join(f"coalesce({f}, 0)" for f in fields)

    def safe_divide(numerator: str, denominator: str) -> str:
        return f"({numerator}) / nullif(({denominator}), 0)"

    def deduplicate(relation, partition_by: str, order_by: str) -> str:
        """Keep row 1 per partition — the dbt-utils QUALIFY pattern,
        emitted as the subquery form Spark executes directly."""
        return (
            f"select * except (_dbt_dedup_rn) from ("
            f"select *, row_number() over (partition by {partition_by} "
            f"order by {order_by}) as _dbt_dedup_rn from {relation}"
            f") where _dbt_dedup_rn = 1"
        )

    def unpivot(relation, cast_to: str = "string",
                exclude: Sequence[str] = (), remove: Sequence[str] = (),
                field_name: str = "field_name",
                value_name: str = "value") -> str:
        """Columns -> rows via a stacked UNION ALL (the dbt-utils
        shape; adapter-introspected column list)."""
        if adapter is None:
            return "SELECT 1 AS __dbt_parse_stub WHERE 1 = 0"
        cols = [c.name for c in adapter.get_columns_in_relation(str(relation))]
        excl = {e.lower() for e in exclude or ()}
        rm = {r.lower() for r in remove or ()}
        keep = [c for c in cols if c.lower() in excl]
        melt = [c for c in cols
                if c.lower() not in excl and c.lower() not in rm]
        selects = []
        for c in melt:
            parts = [f"`{k}`" for k in keep]
            parts.append(f"cast('{c}' as string) as {field_name}")
            parts.append(f"cast(`{c}` as {cast_to}) as {value_name}")
            selects.append(f"select {', '.join(parts)} from {relation}")
        return "\nunion all\n".join(selects)

    def haversine_distance(lat1: str, lon1: str, lat2: str, lon2: str,
                           unit: str = "mi") -> str:
        radius = 3963.190592 if unit == "mi" else 6378.137
        return (
            f"2 * {radius} * asin(sqrt("
            f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
            f"cos(radians({lat1})) * cos(radians({lat2})) * "
            f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
        )

    def width_bucket(expr: str, min_value, max_value, num_buckets) -> str:
        return f"width_bucket({expr}, {min_value}, {max_value}, {num_buckets})"

    from dbt_fusion_spark.functions import crossdb

    return SimpleNamespace(
        generate_surrogate_key=generate_surrogate_key,
        surrogate_key=generate_surrogate_key,  # legacy alias
        star=star,
        get_column_values=get_column_values,
        pivot=pivot,
        union_relations=union_relations,
        group_by=group_by,
        slugify=slugify,
        safe_add=safe_add,
        safe_subtract=safe_subtract,
        safe_divide=safe_divide,
        deduplicate=deduplicate,
        unpivot=unpivot,
        haversine_distance=haversine_distance,
        width_bucket=width_bucket,
        # shared with the dbt.* namespace
        date_spine=crossdb.date_spine,
        dateadd=crossdb.dateadd,
        datediff=crossdb.datediff,
        last_day=crossdb.last_day,
        split_part=crossdb.split_part,
        hash=crossdb.hash,
    )
