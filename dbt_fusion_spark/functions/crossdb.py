"""Cross-database macro surface (`{{ dbt.* }}`) emitting native Spark SQL.

Re-expresses the reference macro library under
dbt_macro_assets/dbt-adapters/macros/utils/ (one Jinja-SQL file per
macro) and its dbt-spark dialect overrides
(dbt_macro_assets/dbt-spark/macros/utils/). Each function returns a SQL
*snippet string* — exactly what the Jinja macro expands to — so model
SQL composes them and Spark SQL executes the result. The per-macro
reference file is cited inline.

These are compile-time text transforms; zero runtime cost. The emitted
forms are all whole-stage-codegen-friendly built-ins (no UDFs).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

# --- date/time ---------------------------------------------------------


def dateadd(datepart: str, interval: int | str, from_expr: str) -> str:
    # utils/dateadd.sql:1-15; spark override dbt-spark/macros/utils/dateadd.sql
    return f"timestampadd({datepart.upper()}, {interval}, {from_expr})"


def datediff(first_date: str, second_date: str, datepart: str) -> str:
    # utils/datediff.sql:1-14 (second - first); spark override exists
    return f"timestampdiff({datepart.upper()}, {first_date}, {second_date})"


def date_trunc(datepart: str, expr: str) -> str:
    # utils/date_trunc.sql
    return f"date_trunc('{datepart.upper()}', {expr})"


def last_day(expr: str, datepart: str = "month") -> str:
    # utils/last_day.sql: month is native; other parts via trunc+shift
    if datepart.lower() == "month":
        return f"last_day({expr})"
    return (
        f"CAST({dateadd('DAY', -1, dateadd(datepart.upper(), 1, date_trunc(datepart, expr)))}"
        " AS DATE)"
    )


def current_timestamp() -> str:
    # adapters/timestamps.sql
    return "current_timestamp()"


def date(year: int | str, month: int | str, day: int | str) -> str:
    # utils/date.sql
    return f"make_date({year}, {month}, {day})"


def date_spine(datepart: str, start_date: str, end_date: str) -> str:
    """utils/date_spine.sql:1-30 — all datepart-starts in [start, end).
    Spark-first: sequence() + explode (no recursive CTE, no driver loop;
    scales to arbitrary ranges as a generated column)."""
    return (
        "SELECT date_day FROM ("
        f"SELECT explode(sequence(CAST({start_date} AS DATE), CAST({end_date} AS DATE),"
        f" INTERVAL 1 {datepart.upper()})) AS date_day) "
        f"WHERE date_day < CAST({end_date} AS DATE)"
    )


def generate_series(upper_bound: int) -> str:
    # utils/generate_series.sql:1-30
    return f"SELECT explode(sequence(1, {upper_bound})) AS generated_number"


# --- strings -----------------------------------------------------------


def hash(field: str) -> str:
    # utils/hash.sql:5-7: md5(cast(field as varchar))
    return f"md5(CAST({field} AS STRING))"


def concat(fields: Sequence[str]) -> str:
    # utils/concat.sql
    return "concat(" + ", ".join(fields) + ")"


def length(expr: str) -> str:
    return f"length({expr})"


def position(substring_text: str, string_text: str) -> str:
    # utils/position.sql — spark emits instr(string, substring)
    return f"instr({string_text}, {substring_text})"


def right(string_text: str, length_expr: int | str) -> str:
    return f"right({string_text}, {length_expr})"


def replace(field: str, old_chars: str, new_chars: str) -> str:
    return f"replace({field}, {old_chars}, {new_chars})"


def split_part(string_text: str, delimiter_text: str, part_number: int) -> str:
    """utils/split_part.sql:1-29 — negative indexes count from the end
    (emulated in the reference; native in Spark via element_at)."""
    if isinstance(part_number, int) and part_number < 0:
        return f"element_at(split({string_text}, {delimiter_text}), {part_number})"
    return f"split_part({string_text}, {delimiter_text}, {part_number})"


def escape_single_quotes(expr: str) -> str:
    # utils/escape_single_quotes.sql
    return expr.replace("'", "\\'")


def string_literal(value) -> str:
    # utils/literal.sql
    return f"'{value}'"


# --- casts & types -----------------------------------------------------


def cast(field: str, type_: str) -> str:
    return f"CAST({field} AS {type_})"


def safe_cast(field: str, type_: str) -> str:
    # utils/safe_cast.sql:1-12 -> try_cast on spark
    return f"try_cast({field} AS {type_})"


def cast_bool_to_text(field: str) -> str:
    return f"CAST({field} AS STRING)"


# utils/data_types.sql
def type_string() -> str:
    return "string"


def type_timestamp() -> str:
    return "timestamp"


def type_float() -> str:
    return "float"


def type_int() -> str:
    return "int"


def type_bigint() -> str:
    return "bigint"


def type_numeric() -> str:
    return "decimal(28,6)"


def type_boolean() -> str:
    return "boolean"


# --- aggregates --------------------------------------------------------


def any_value(expr: str) -> str:
    # utils/any_value.sql
    return f"any_value({expr})"


def bool_or(expr: str) -> str:
    # utils/bool_or.sql:1-9
    return f"bool_or({expr})"


def listagg(measure: str, delimiter_text: str = "','",
            order_by_clause: str | None = None, limit_num: int | None = None) -> str:
    """utils/listagg.sql:1-30. Spark-first deterministic form:
    sorted collect_list + array_join (+ slice for limit). Avoids the
    nondeterministic bare collect_list ordering.

    order_by_clause ('ORDER BY <expr> [ASC|DESC]') is honored by
    collecting (key, measure) structs and sorting on the key (struct
    sort_array orders field-by-field, so ties break on the measure);
    without it the measure itself is the sort key."""
    if order_by_clause:
        m = re.match(r"(?is)\s*order\s+by\s+(.+?)\s*(asc|desc)?\s*$",
                     order_by_clause)
        if not m:
            raise ValueError(
                f"listagg: cannot parse order_by_clause {order_by_clause!r}")
        key, direction = m.group(1), (m.group(2) or "asc").lower()
        asc = "true" if direction == "asc" else "false"
        arr = (f"transform(sort_array(collect_list("
               f"struct({key} AS k, {measure} AS v)), {asc}), s -> s.v)")
    else:
        arr = f"sort_array(collect_list({measure}))"
    if limit_num:
        arr = f"slice({arr}, 1, {limit_num})"
    return f"array_join({arr}, {delimiter_text})"


# --- arrays ------------------------------------------------------------


def array_construct(inputs: Sequence[str]) -> str:
    return "array(" + ", ".join(str(i) for i in inputs) + ")"


def array_append(array_expr: str, new_element: str) -> str:
    return f"array_append({array_expr}, {new_element})"


def array_concat(array_1: str, array_2: str) -> str:
    return f"concat({array_1}, {array_2})"


# --- misc --------------------------------------------------------------


def equals(expr1: str, expr2: str) -> str:
    # utils/equals.sql:9-18 — NULL-safe equality
    return f"{expr1} <=> {expr2}"


def except_() -> str:
    return "EXCEPT"


def intersect() -> str:
    return "INTERSECT"


def get_true_sql() -> str:
    # snapshots/helpers.sql:28-36
    return "TRUE"


# --- custom naming (get_custom_name/*.sql) -----------------------------


def generate_schema_name(custom_schema_name: str | None, default_schema: str) -> str:
    return default_schema if not custom_schema_name else f"{default_schema}_{custom_schema_name}"


def generate_alias_name(custom_alias: str | None, node_name: str) -> str:
    return custom_alias or node_name


def generate_database_name(custom_database: str | None, default_database: str) -> str:
    return custom_database or default_database
