"""SQL dialect translation: run models written for other warehouses.

The reference ships per-dialect ANTLR lexers (crates/dbt-sql/
dbt-lexer-{snowflake,bigquery,redshift,databricks,trino}) for SQL
comprehension; this module is the Spark-first equivalent for the
EXECUTION side — rewrite the high-frequency dialect-specific constructs
into Spark SQL so a migrated project runs unchanged. It is a targeted
translator (function renames + a few structural rewrites), not a full
parser: constructs outside the map pass through untouched, and Spark's
own parser reports anything genuinely unsupported.

All rewriting is string-literal- and comment-aware: quoted strings and
comments are sliced out first and never touched.
"""

from __future__ import annotations

import re

# --- tokenizer-lite: protect strings/comments --------------------------

_PROTECT_RE = re.compile(
    r"""('(?:[^'\\]|\\.|'')*')   # single-quoted string ('' escape)
      | ("(?:[^"\\]|\\.)*")      # double-quoted identifier
      | (`[^`]*`)                # backtick identifier
      | (--[^\n]*)               # line comment
      | (/\*.*?\*/)              # block comment
    """,
    re.VERBOSE | re.DOTALL,
)


def _protect(sql: str) -> tuple[str, list[str]]:
    saved: list[str] = []

    def stash(m: re.Match) -> str:
        saved.append(m.group(0))
        return f"\x00{len(saved) - 1}\x00"

    return _PROTECT_RE.sub(stash, sql), saved


def _restore(sql: str, saved: list[str]) -> str:
    return re.sub(r"\x00(\d+)\x00", lambda m: saved[int(m.group(1))], sql)


# --- per-dialect function maps (applied on code segments only) ---------

# simple function renames: src_name -> spark_name (word-boundary + '(')
_RENAMES: dict[str, dict[str, str]] = {
    "snowflake": {
        "IFF": "IF",
        "TO_VARCHAR": "CAST_TO_STRING_",   # handled structurally below
        "LISTAGG": "LISTAGG_",             # structural
        "DATEADD": "DATEADD_UNIT_",        # structural: unit may be quoted
        "DATEDIFF": "DATEDIFF_UNIT_",
        "TO_NUMBER": "CAST_TO_DECIMAL_",
        "SQUARE": "SQUARE_",
        "TRY_TO_NUMBER": "TRY_CAST_DECIMAL_",
        "CURRENT_TIMESTAMP": "CURRENT_TIMESTAMP",
        "ARRAY_CONSTRUCT": "ARRAY",
        "ARRAY_SIZE": "SIZE",
        "OBJECT_CONSTRUCT": "NAMED_STRUCT_KV_",
        "REGEXP_SUBSTR": "REGEXP_EXTRACT",
        "CHARINDEX": "CHARINDEX_",         # arg order differs: structural
        "EDITDISTANCE": "LEVENSHTEIN",
        "ZEROIFNULL": "ZEROIFNULL_",
        # literal delimiter vs Spark's regex split: structural
        "SPLIT": "SPLIT_LITERAL_",
        # fmt-token mapping (YYYY -> yyyy etc.): structural
        "TO_CHAR": "TO_CHAR_SF_",
        "TO_DATE": "TO_DATE_SF_",
        "TO_TIMESTAMP": "TO_TIMESTAMP_SF_",
    },
    "bigquery": {
        "SAFE_CAST": "TRY_CAST",
        "SAFE_DIVIDE": "TRY_DIVIDE",
        "FORMAT_DATE": "FORMAT_DATE_",     # structural: fmt tokens differ
        "GENERATE_UUID": "UUID",
        "ARRAY_LENGTH": "SIZE",
        "REGEXP_CONTAINS": "REGEXP_CONTAINS_",
        "TIMESTAMP_MILLIS": "TIMESTAMP_MILLIS",
        "COUNTIF": "COUNT_IF",
        "LOGICAL_OR": "BOOL_OR",
        "LOGICAL_AND": "BOOL_AND",
        "SPLIT": "SPLIT_LITERAL_",         # literal delim (default ',')
        # BQ puts the unit LAST and bare: DATE_DIFF(a, b, DAY) = a - b
        "DATE_DIFF": "BQ_DIFF_",
        "TIMESTAMP_DIFF": "BQ_DIFF_",
        "DATETIME_DIFF": "BQ_DIFF_",
        # strip IGNORE NULLS (collect_list drops nulls anyway)
        "ARRAY_AGG": "BQ_ARRAY_AGG_",
        # BQ interval arithmetic: DATE_ADD(x, INTERVAL n DAY). The
        # DATE_ variants return DATE (TIMESTAMPADD yields timestamp,
        # so they re-cast); TIMESTAMP_/DATETIME_ keep the timestamp.
        "DATE_ADD": "BQ_DATE_ADD_",
        "TIMESTAMP_ADD": "BQ_ADD_",
        "DATETIME_ADD": "BQ_ADD_",
        "DATE_SUB": "BQ_DATE_SUB_",
        "TIMESTAMP_SUB": "BQ_SUB_",
        "DATETIME_SUB": "BQ_SUB_",
        "FORMAT_TIMESTAMP": "FORMAT_DATE_",
    },
    "redshift": {
        "GETDATE": "CURRENT_TIMESTAMP",
        "SYSDATE": "CURRENT_TIMESTAMP",
        "LEN": "LENGTH",
        "STRTOL": "CONV_TO_DEC_",
        "DATEADD": "DATEADD_UNIT_",
        "DATEDIFF": "DATEDIFF_UNIT_",
        "LISTAGG": "LISTAGG_",
        "CHARINDEX": "CHARINDEX_",
        "NVL2": "NVL2",
        "TO_CHAR": "TO_CHAR_SF_",
        "TO_DATE": "TO_DATE_SF_",
    },
    "trino": {
        "APPROX_DISTINCT": "APPROX_COUNT_DISTINCT",
        "ARBITRARY": "ANY_VALUE",
        "STRPOS": "INSTR_",                # arg order matches instr
        "CARDINALITY": "SIZE",
        "DATE_ADD": "DATE_ADD_UNIT_",      # ('day', n, d): structural
        "DATE_DIFF": "TIMESTAMPDIFF_TRINO_",
        "JSON_EXTRACT_SCALAR": "GET_JSON_OBJECT",
        "TO_UNIXTIME": "UNIX_TIMESTAMP",
        "FROM_UNIXTIME": "FROM_UNIXTIME",
        "SPLIT": "SPLIT_LITERAL_",         # literal delim
    },
}


def _rename_functions(sql: str, mapping: dict[str, str]) -> str:
    for src, dst in mapping.items():
        sql = re.sub(rf"\b{src}\s*\(", f"{dst}(", sql, flags=re.IGNORECASE)
    return sql


# --- structural rewrites ----------------------------------------------


def _split_args(argstr: str) -> list[str]:
    """Split a protected (no strings/comments) arg list on top-level
    commas."""
    out, depth, cur = [], 0, []
    for ch in argstr:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def _rewrite_calls(sql: str, name: str, fn, saved: list[str]) -> str:
    """Rewrite every `name(args)` call via fn(list_of_args) -> str,
    handling nested parens. Args are restored (string literals visible)
    before the builder runs — builders like FORMAT_DATE_ need to read
    and transform the literal."""
    pat = re.compile(rf"\b{name}\(", re.IGNORECASE)
    while True:
        m = pat.search(sql)
        if not m:
            return sql
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        args = [_restore(a, saved)
                for a in _split_args(sql[m.end():i - 1])]
        sql = sql[:m.start()] + fn(args) + sql[i:]


def _bq_interval(tok: str) -> tuple[str, str]:
    """'INTERVAL 5 DAY' -> ('5', 'DAY') (BQ interval-literal arg)."""
    m = re.fullmatch(r"\s*INTERVAL\s+(.+?)\s+(\w+)\s*", tok,
                     re.IGNORECASE | re.DOTALL)
    if not m:
        raise ValueError(f"expected INTERVAL <n> <unit>, got {tok!r}")
    return m.group(1), m.group(2)


def _bq_add(a: list[str], negate: bool) -> str:
    n, unit = _bq_interval(a[1])
    n = f"-({n})" if negate else n
    return f"TIMESTAMPADD({unit}, {n}, {a[0]})"


_STRUCTURAL = {
    "CAST_TO_STRING_": lambda a: f"CAST({a[0]} AS STRING)",
    # warehouses split on a LITERAL delimiter; Spark's split() takes a
    # regex. \Q...\E quoting makes any delimiter literal (doubled
    # backslashes survive Spark's string-literal unescaping). BQ's
    # 1-arg form defaults to ','.
    "SPLIT_LITERAL_": lambda a: (
        f"SPLIT({a[0]}, CONCAT('\\\\Q', "
        f"{a[1] if len(a) > 1 else chr(39) + ',' + chr(39)}, '\\\\E'))"),
    "BQ_DIFF_": lambda a: f"TIMESTAMPDIFF({_unquote(a[2])}, {a[1]}, {a[0]})",
    "BQ_ADD_": lambda a: _bq_add(a, negate=False),
    "BQ_SUB_": lambda a: _bq_add(a, negate=True),
    "BQ_DATE_ADD_": lambda a: f"CAST({_bq_add(a, negate=False)} AS DATE)",
    "BQ_DATE_SUB_": lambda a: f"CAST({_bq_add(a, negate=True)} AS DATE)",
    "CAST_TO_DECIMAL_": lambda a: (
        f"CAST({a[0]} AS DECIMAL({', '.join(a[1:]) if len(a) > 1 else '38, 0'}))"),
    "TRY_CAST_DECIMAL_": lambda a: (
        f"TRY_CAST({a[0]} AS DECIMAL({', '.join(a[1:]) if len(a) > 1 else '38, 0'}))"),
    "SQUARE_": lambda a: f"({a[0]}) * ({a[0]})",
    "ZEROIFNULL_": lambda a: f"COALESCE({a[0]}, 0)",
    "CHARINDEX_": lambda a: f"INSTR({a[1]}, {a[0]})",  # (needle, hay) -> (hay, needle)
    "INSTR_": lambda a: f"INSTR({a[0]}, {a[1]})",
    "LISTAGG_": lambda a: (
        "ARRAY_JOIN(SORT_ARRAY(COLLECT_LIST("
        f"{a[0]})), {a[1] if len(a) > 1 else chr(39) + chr(39)})"),
    "NAMED_STRUCT_KV_": lambda a: f"NAMED_STRUCT({', '.join(a)})",
    "CONV_TO_DEC_": lambda a: f"CAST(CONV({a[0]}, {a[1]}, 10) AS BIGINT)",
    "REGEXP_CONTAINS_": lambda a: f"({a[0]} RLIKE {a[1]})",
    "FORMAT_DATE_": lambda a: f"DATE_FORMAT({a[1]}, {_bq_fmt(a[0])})",
    "DATE_ADD_UNIT_": lambda a: f"TIMESTAMPADD({_unquote(a[0])}, {a[1]}, {a[2]})",
    # Snowflake/Redshift allow DATEADD(day, ...), DATEADD('day', ...);
    # Spark's timestampadd only takes a bare unit identifier
    "DATEADD_UNIT_": lambda a: f"TIMESTAMPADD({_unquote(a[0])}, {a[1]}, {a[2]})",
    "DATEDIFF_UNIT_": lambda a: (
        f"TIMESTAMPDIFF({_unquote(a[0])}, {a[1]}, {a[2]})"),
    "TIMESTAMPDIFF_TRINO_": lambda a: (
        f"TIMESTAMPDIFF({_unquote(a[0])}, {a[1]}, {a[2]})"),
    "TO_CHAR_SF_": lambda a: (
        f"CAST({a[0]} AS STRING)" if len(a) == 1
        else f"DATE_FORMAT({a[0]}, {_sf_fmt(a[1])})"),
    "TO_DATE_SF_": lambda a: (
        f"TO_DATE({a[0]})" if len(a) == 1
        else f"TO_DATE({a[0]}, {_sf_fmt(a[1])})"),
    "TO_TIMESTAMP_SF_": lambda a: (
        f"TO_TIMESTAMP({a[0]})" if len(a) == 1
        else f"TO_TIMESTAMP({a[0]}, {_sf_fmt(a[1])})"),
    "BQ_ARRAY_AGG_": lambda a: (
        "COLLECT_LIST("
        + re.sub(r"\s+IGNORE\s+NULLS\s*$", "", a[0],
                 flags=re.IGNORECASE) + ")"),
}


def _unquote(tok: str) -> str:
    tok = tok.strip()
    return tok[1:-1] if tok.startswith("'") and tok.endswith("'") else tok


_BQ_FMT_MAP = {"%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH",
               "%M": "mm", "%S": "ss", "%F": "yyyy-MM-dd"}


def _bq_fmt(tok: str) -> str:
    s = _unquote(tok)
    for k, v in _BQ_FMT_MAP.items():
        s = s.replace(k, v)
    return f"'{s}'"


# Snowflake/Redshift datetime format tokens -> Spark's (longest first so
# e.g. HH24 is consumed before HH; MM is identical in both and omitted).
_SF_FMT_TOKENS = [("YYYY", "yyyy"), ("HH24", "HH"), ("HH12", "hh"),
                  ("MON", "MMM"), ("DY", "EEE"), ("YY", "yy"),
                  ("DD", "dd"), ("MI", "mm"), ("SS", "ss")]


def _sf_fmt(tok: str) -> str:
    s = _unquote(tok)
    for k, v in _SF_FMT_TOKENS:
        s = re.sub(k, v, s, flags=re.IGNORECASE)
    return f"'{s}'"


# --- Snowflake VARIANT path access: col:a.b[0] -> GET_JSON_OBJECT ------

# base identifier (possibly qualified), ':', then a dotted/indexed path.
# `::` casts never match: after `x:` the next char is ':' which cannot
# start a path. Strings/comments are already stashed by _protect.
_SF_JSONPATH_RE = re.compile(
    r"(?<![:\w])((?:[A-Za-z_]\w*\.)*[A-Za-z_]\w*)\s*:\s*"
    r"([A-Za-z_]\w*(?:\.[A-Za-z_]\w*|\[\d+\])*)")


def _rewrite_sf_jsonpath(sql: str) -> str:
    return _SF_JSONPATH_RE.sub(
        lambda m: f"GET_JSON_OBJECT({m.group(1)}, '$.{m.group(2)}')", sql)


def _match_paren(sql: str, open_idx: int) -> int:
    """Index just past the ')' matching the '(' at open_idx."""
    depth, i = 1, open_idx + 1
    while i < len(sql) and depth:
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
        i += 1
    return i


_FLATTEN_RE = re.compile(r",?\s*LATERAL\s+FLATTEN\s*\(", re.IGNORECASE)


def _rewrite_flatten(sql: str) -> str:
    """Snowflake `FROM t, LATERAL FLATTEN(INPUT => t.arr) f` ->
    `FROM t LATERAL VIEW [OUTER] POSEXPLODE(t.arr) f AS index, value`.
    Snowflake's `f.index` is 0-based like posexplode's pos, and
    `f.value` is the element — the two columns models actually use
    (key/path/seq/this are not emulated). OUTER => TRUE maps to
    LATERAL VIEW OUTER."""
    while True:
        m = _FLATTEN_RE.search(sql)
        if not m:
            return sql
        end = _match_paren(sql, m.end() - 1)
        args = _split_args(sql[m.end():end - 1])
        input_expr, outer = None, False
        for arg in args:
            kv = re.fullmatch(r"\s*(\w+)\s*=>\s*(.+)\s*", arg, re.DOTALL)
            if kv and kv.group(1).upper() == "INPUT":
                input_expr = kv.group(2)
            elif kv and kv.group(1).upper() == "OUTER":
                outer = kv.group(2).strip().upper() == "TRUE"
            elif not kv and input_expr is None:
                input_expr = arg
        if input_expr is None:
            raise ValueError("FLATTEN without an INPUT argument")
        am = re.match(r"\s*(?!(?:WHERE|GROUP|ORDER|ON|JOIN|INNER|LEFT|"
                      r"RIGHT|FULL|CROSS|LIMIT|QUALIFY|UNION|HAVING)\b)"
                      r"([A-Za-z_]\w*)", sql[end:], re.IGNORECASE)
        alias = am.group(1) if am else "__flat"
        tail = sql[end + am.end():] if am else sql[end:]
        sql = (sql[:m.start()]
               + f" LATERAL VIEW {'OUTER ' if outer else ''}"
               + f"POSEXPLODE({input_expr}) {alias} AS index, value"
               + tail)


_UNNEST_RE = re.compile(r"CROSS\s+JOIN\s+UNNEST\s*\(", re.IGNORECASE)


def _rewrite_unnest(sql: str) -> str:
    """Trino `CROSS JOIN UNNEST(a) [WITH ORDINALITY] AS t (c...)` ->
    LATERAL VIEW. One array -> EXPLODE; one array WITH ORDINALITY ->
    INLINE of (element, 1-based ordinal) structs (Trino ordinality is
    1-based and LAST in the column list); two arrays -> INLINE of
    ZIP_WITH structs (both zip to the longest, padding NULL). Other
    shapes pass through and fail loudly in Spark's parser."""
    while True:
        m = _UNNEST_RE.search(sql)
        if not m:
            return sql
        end = _match_paren(sql, m.end() - 1)
        arrays = _split_args(sql[m.end():end - 1])
        am = re.match(
            r"\s*(WITH\s+ORDINALITY\s+)?AS\s+([A-Za-z_]\w*)\s*"
            r"\(([^)]*)\)", sql[end:], re.IGNORECASE)
        if not am:
            return sql  # un-aliased UNNEST: leave for Spark to reject
        ordinal = am.group(1) is not None
        alias, cols = am.group(2), _split_args(am.group(3))
        if len(arrays) == 1 and not ordinal and len(cols) == 1:
            view = f"EXPLODE({arrays[0]}) {alias} AS {cols[0]}"
        elif len(arrays) == 1 and ordinal and len(cols) == 2:
            view = (f"INLINE(TRANSFORM({arrays[0]}, (__e, __i) -> "
                    f"STRUCT(__e AS {cols[0]}, CAST(__i + 1 AS BIGINT) "
                    f"AS {cols[1]}))) {alias} AS {cols[0]}, {cols[1]}")
        elif len(arrays) == 2 and not ordinal and len(cols) == 2:
            view = (f"INLINE(ZIP_WITH({arrays[0]}, {arrays[1]}, "
                    f"(__l, __r) -> STRUCT(__l AS {cols[0]}, __r AS "
                    f"{cols[1]}))) {alias} AS {cols[0]}, {cols[1]}")
        else:
            return sql  # unsupported shape: loud failure downstream
        sql = (sql[:m.start()] + f"LATERAL VIEW {view}"
               + sql[end + am.end():])


_BQ_TYPES = {"INT64": "BIGINT", "FLOAT64": "DOUBLE", "BOOL": "BOOLEAN",
             "BYTES": "BINARY", "BIGNUMERIC": "DECIMAL(38, 9)",
             "NUMERIC": "DECIMAL(38, 9)"}

_QUALIFY_RE = re.compile(r"\bQUALIFY\b", re.IGNORECASE)


def _rewrite_qualify(sql: str) -> str:
    """QUALIFY pred -> wrap in a subquery filtering on the window pred
    (Snowflake/BigQuery/Databricks construct Spark lacks). Window
    expressions referenced by alias in QUALIFY work because the wrap
    selects * from the full projection. Fidelity limit: an inline
    window in QUALIFY may only reference columns present in the
    projection (Snowflake also allows un-projected FROM columns)."""
    m = _QUALIFY_RE.search(sql)
    if not m:
        return sql
    # end of the QUALIFY predicate: first ORDER BY / LIMIT at paren
    # depth 0 (an ORDER BY inside an OVER(...) belongs to the predicate)
    rest = sql[m.end():]
    pred_end = m.end() + len(rest)
    depth = 0
    for tm in re.finditer(r"\(|\)|\b(?:ORDER\s+BY|LIMIT)\b", rest,
                          re.IGNORECASE):
        tok = tm.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            pred_end = m.end() + tm.start()
            break
    pred = sql[m.end():pred_end].strip()
    tail = sql[pred_end:]
    body = sql[:m.start()].rstrip()
    # alias-only predicates filter the wrapped projection; window calls
    # inline in the predicate are re-evaluated in the outer projection
    if re.search(r"\bOVER\s*\(", pred, re.IGNORECASE):
        # EXCEPT drops the helper predicate column so the translated
        # query's schema matches the original projection exactly
        return (f"SELECT * EXCEPT (__qualify_p) FROM "
                f"(SELECT __q.*, ({pred}) AS __qualify_p "
                f"FROM ({body}) __q) WHERE __qualify_p {tail}")
    return (f"SELECT * FROM ({body}) __q WHERE {pred} {tail}")


def translate_sql(sql: str, dialect: str | None) -> str:
    """Translate `sql` written in `dialect` into Spark SQL. dialect in
    {snowflake, bigquery, redshift, trino, databricks, spark, None};
    spark/None pass through. Databricks SQL ⊇ Spark SQL for the
    function surface, but two Databricks-only constructs OSS Spark
    lacks are rewritten (reference lexer:
    crates/dbt-sql/dbt-lexer-databricks): QUALIFY, and the
    semi-structured colon path `col:a.b[0]` (same surface syntax as
    Snowflake's VARIANT access, and GET_JSON_OBJECT matches its
    JSON-text return type). Everything else passes through untouched —
    it IS Spark SQL."""
    if not dialect or dialect.lower() == "spark":
        return sql
    if dialect.lower() == "databricks":
        protected, saved = _protect(sql)
        protected = _rewrite_qualify(protected)
        protected = _rewrite_sf_jsonpath(protected)
        return _restore(protected, saved)
    mapping = _RENAMES.get(dialect.lower())
    if mapping is None:
        raise ValueError(f"unknown SQL dialect {dialect!r}")
    protected, saved = _protect(sql)
    protected = _rewrite_qualify(protected)
    if dialect.lower() == "snowflake":
        protected = _rewrite_flatten(protected)
        protected = _rewrite_sf_jsonpath(protected)
    if dialect.lower() == "trino":
        protected = _rewrite_unnest(protected)
    protected = _rename_functions(protected, mapping)
    if dialect.lower() == "bigquery":
        # BQ type names inside CAST/declarations -> Spark types
        for bq, sp in _BQ_TYPES.items():
            protected = re.sub(rf"\b{bq}\b", sp, protected,
                               flags=re.IGNORECASE)
    for marker, builder in _STRUCTURAL.items():
        if marker in protected.upper():
            protected = _rewrite_calls(protected, marker, builder, saved)
    # snowflake/redshift :: casts are already valid Spark 4 syntax;
    # BigQuery EXCEPT DISTINCT == Spark EXCEPT; nothing to do for those.
    return _restore(protected, saved)
