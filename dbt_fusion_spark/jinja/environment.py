"""Jinja compilation: parse context (dependency capture) and compile
context (relation resolution).

The reference implements a forked minijinja in Rust
(crates/dbt-jinja); per SURVEY §2.5 our engine uses real Python Jinja2
— filters/tests/pycompat come free — and implements only the dbt
context functions:

- parse phase (execute=False): ref/source/config RECORD dependencies
  and configs, SQL goes nowhere
  (crates/dbt-jinja-utils/src/phases/parse/resolve_model_context.rs:
  120-205, init.rs:80-107)
- compile/run phase: ref/source resolve to relation names, `this`,
  `is_incremental()`, `run_query`, `adapter`, `statement` become live
  (phases/run/run_node_context.rs:65-313, compile_node_context.rs)
- ephemeral deps inline as __dbt__cte__<name> CTEs
  (RelationType::CTE, dbt_types.rs:15)
- cross-db macros exposed as the `dbt` namespace (SURVEY §2.4)
"""

from __future__ import annotations

import json
import os
import re
from types import SimpleNamespace
from typing import Any

import jinja2

from dbt_fusion_spark.functions import crossdb


class CompileError(Exception):
    pass


# Builtin macro library prepended to every render — the statement
# call-block protocol (MA etc/statement.sql:5-28,50-56): the macro body
# is the SQL; __execute_statement runs it and stashes the result for
# store_result/load_result.
BUILTIN_MACROS = """\
{% macro statement(name=None, fetch_result=False, auto_begin=True, language='sql') %}
{%- set _ = __execute_statement(name, caller(), fetch_result) -%}
{% endmacro %}
{% macro noop_statement(name=None, message=None, code=None, rows_affected=None, res=None) %}
{%- set _ = __store_raw(name, message, code, rows_affected, res) -%}
{% endmacro %}
"""


def _parse_python_model(node) -> tuple[list[tuple[str, ...]], dict]:
    """Static analysis of a python model: collect dbt.ref()/dbt.source()
    dependencies and dbt.config() kwargs — the same trick dbt-core uses
    (and the reference's python_model wrapper expects,
    MA python_model/python.sql)."""
    import ast

    deps: list[tuple[str, ...]] = []
    config: dict = {}
    tree = ast.parse(node.raw_code)
    for n in ast.walk(tree):
        if not (isinstance(n, ast.Call) and isinstance(n.func, ast.Attribute)):
            continue
        if not (isinstance(n.func.value, ast.Name) and n.func.value.id == "dbt"):
            continue
        args = [a.value for a in n.args if isinstance(a, ast.Constant)]
        if n.func.attr == "ref" and args:
            deps.append(("ref", *args))
        elif n.func.attr == "source" and len(args) == 2:
            deps.append(("source", *args))
        elif n.func.attr == "config":
            for kw in n.keywords:
                if isinstance(kw.value, ast.Constant) and kw.arg:
                    config[kw.arg] = kw.value.value
    return deps, config


def _base_env() -> jinja2.Environment:
    env = jinja2.Environment(
        undefined=jinja2.StrictUndefined, autoescape=False,
        # {% do %} + {% break %}/{% continue %} — dbt macros rely on both
        extensions=["jinja2.ext.do", "jinja2.ext.loopcontrols"])
    env.filters["as_bool"] = lambda v: bool(v)
    env.filters["as_number"] = lambda v: float(v)
    env.filters["as_text"] = str
    return env


def _utils_namespace(adapter) -> SimpleNamespace:
    from dbt_fusion_spark.functions.utils_pkg import make_namespace

    return make_namespace(adapter)


def _dbt_namespace() -> SimpleNamespace:
    """`{{ dbt.dateadd(...) }}` etc. — every §2.4 macro."""
    ns = {
        n: getattr(crossdb, n)
        for n in dir(crossdb)
        if not n.startswith("_") and callable(getattr(crossdb, n))
    }
    ns["except"] = crossdb.except_
    return SimpleNamespace(**ns)


class _BehaviorFlags:
    """`behavior` context var (behavior_flags.rs:22-104): attribute
    access yields the flag's configured value (dbt_project.yml `flags:`),
    defaulting to False — so `{% if behavior.my_flag %}` gates work
    without pre-registration."""

    def __init__(self, flags: dict):
        self._flags = dict(flags or {})

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        return bool(self._flags.get(name, False))


class _GraphContext:
    """`graph` context var: manifest introspection
    (jinja_environment.rs exposes the resolved Nodes maps). Built
    lazily — only renders that touch `graph` pay the serialization
    cost, and each maps is memoized per render context."""

    def __init__(self, project):
        self._project = project
        self._cache: dict[str, dict] = {}

    def _get(self, key: str) -> dict:
        if key not in self._cache:
            p = self._project
            if key == "nodes":
                self._cache[key] = {uid: n.to_manifest_dict()
                                    for uid, n in p.nodes.items()}
            elif key == "sources":
                self._cache[key] = {uid: s.to_manifest_dict()
                                    for uid, s in p.sources.items()}
            elif key == "exposures":
                self._cache[key] = dict(getattr(p, "exposures", {}))
            elif key in ("metrics", "semantic_models", "saved_queries"):
                self._cache[key] = dict(getattr(p, key, {}))
            else:
                self._cache[key] = {}
        return self._cache[key]

    @property
    def nodes(self) -> dict:
        return self._get("nodes")

    @property
    def sources(self) -> dict:
        return self._get("sources")

    @property
    def exposures(self) -> dict:
        return self._get("exposures")

    @property
    def metrics(self) -> dict:
        return self._get("metrics")

    @property
    def semantic_models(self) -> dict:
        return self._get("semantic_models")

    @property
    def saved_queries(self) -> dict:
        return self._get("saved_queries")


def _common_context(project, node) -> dict[str, Any]:
    """Base dbt context (jinja-utils functions/base.rs:42-64 +
    phases/parse/init.rs:80-107): var/env_var/target/run_started_at/
    invocation_id/flags/json+yaml codecs/local_md5/api/modules."""
    import datetime as _dt
    import hashlib
    import uuid

    import pytz
    import yaml

    def var(name, default=None):
        return project.vars.get(name, default)

    def env_var(name, default=None):
        val = os.environ.get(name, default)
        if val is None:
            raise CompileError(f"env_var {name!r} not set")
        return val

    exceptions = SimpleNamespace(
        raise_compiler_error=lambda msg: (_ for _ in ()).throw(CompileError(msg)),
        warn=lambda msg: msg,
    )
    # run_started_at / invocation_id are per-project-run constants
    # (init.rs:80, base.rs invocation_id) — stamped once, then shared by
    # every node render in the run
    if not hasattr(project, "_run_started_at"):
        project._run_started_at = _dt.datetime.now(tz=pytz.UTC)
        project._invocation_id = str(uuid.uuid4())

    from dbt_fusion_spark.column import Column
    from dbt_fusion_spark.relation import Relation

    return {
        "var": var,
        "env_var": env_var,
        "doc": lambda *a: getattr(project, "docs", {}).get(a[-1], ""),
        "graph": _GraphContext(project),
        "behavior": _BehaviorFlags(getattr(project, "flags", {})),
        "target": SimpleNamespace(
            name=project.profile.get("name", "dev"),
            schema=project.default_schema,
            type="spark",
            threads=project.profile.get("threads", 4),
        ),
        "dbt": _dbt_namespace(),
        # dbt_utils compatibility shim (functions/utils_pkg.py) —
        # parse-phase namespace; compile_node swaps in the adapter-aware
        # one so star()/union_relations() can introspect
        "dbt_utils": _utils_namespace(None),
        "dbt_version": "fusion-spark-0.1",
        "run_started_at": project._run_started_at,
        "invocation_id": project._invocation_id,
        "invocation_args_dict": {"project_dir": str(project.root)},
        "flags": SimpleNamespace(FULL_REFRESH=False, WHICH="run",
                                 STORE_FAILURES=False),
        "exceptions": exceptions,
        "tojson": json.dumps,
        "fromjson": json.loads,
        "toyaml": yaml.safe_dump,
        "fromyaml": yaml.safe_load,
        "local_md5": lambda s: hashlib.md5(s.encode()).hexdigest(),
        "diff_of_two_dicts": lambda a, b: {
            k: v for k, v in a.items() if b.get(k) != v},
        "log": lambda msg, info=False: None,
        "print": lambda msg: None,
        "model": SimpleNamespace(name=node.name, unique_id=node.unique_id,
                                 config=node.config),
        "zip": zip,
        "set": lambda xs: list(dict.fromkeys(xs)),
        "api": SimpleNamespace(Relation=Relation, Column=Column),
        "modules": SimpleNamespace(re=re, datetime=_dt, pytz=pytz),
    }


def resolve_ref_uid(project, node, *args, v=None, version=None) -> str | None:
    """dbt ref() resolution order (resolver.rs package search): the
    two-arg form ref('pkg', 'name') targets a package explicitly; the
    one-arg form searches the referencing node's own package, then the
    root project, then any single package defining the name.

    Versioned models (dbt 1.5): ref('m', v=2) pins version 2
    (uid model.<pkg>.m.v2); an unversioned ref to a versioned model
    resolves to its latest_version."""
    ver = v if v is not None else version
    name = args[-1]
    rts = ("model", "seed", "snapshot")
    if len(args) == 2:
        pkgs: list[str] = [args[0]]
    else:
        pkgs = list(dict.fromkeys(
            [getattr(node, "package", None) or project.name, project.name]))
    for pkg in pkgs:
        for rt in rts:
            if ver is not None:
                uid = f"{rt}.{pkg}.{name}.v{ver}"
                if uid in project.nodes:
                    return uid
                continue
            uid = f"{rt}.{pkg}.{name}"
            if uid in project.nodes:
                return uid
            latest = f"{rt}.{pkg}.{name}.v"
            for u, n in project.nodes.items():
                if (u.startswith(latest) and n.name == name
                        and n.version == n.latest_version):
                    return u
    # fall back: unique match across all packages
    hits = [u for u, n in project.nodes.items()
            if n.name == name and n.resource_type in rts
            and (n.version == ver if ver is not None
                 else n.version in (None, n.latest_version))]
    return hits[0] if len(hits) == 1 else None


def parse_node(project, node) -> None:
    """Render with capturing ref/source/config; fills node.depends_on
    and node.config (reference resolve_model_context.rs:120-205)."""
    deps: list[str] = []

    if node.config.get("language") == "python":
        py_deps, py_config = _parse_python_model(node)
        merged = dict(node.config)
        merged.update(py_config)
        node.config = merged
        resolved = []
        for d in py_deps:
            if d[0] == "ref":
                uid = resolve_ref_uid(project, node, *d[1:])
                if uid is None:
                    raise CompileError(
                        f"{node.unique_id}: unknown ref {d[-1]!r}")
                resolved.append(uid)
            else:
                uid = f"source.{project.name}.{d[1]}.{d[2]}"
                if uid not in project.sources:
                    raise CompileError(f"{node.unique_id}: unknown source {d[1]}.{d[2]}")
                resolved.append(uid)
        node.depends_on = list(dict.fromkeys(resolved))
        return

    def ref(*args, **kwargs):
        uid = resolve_ref_uid(project, node, *args, **kwargs)
        if uid is None:
            raise CompileError(f"{node.unique_id}: unknown ref {args[-1]!r}")
        deps.append(uid)
        return f"__ref__{uid}__"

    def source(src, tbl):
        uid = f"source.{project.name}.{src}.{tbl}"
        if uid not in project.sources:
            raise CompileError(f"{node.unique_id}: unknown source {src}.{tbl}")
        deps.append(uid)
        return f"__ref__{uid}__"

    def config(*args, **kwargs):
        captured.update(kwargs)
        return ""

    captured: dict[str, Any] = {}
    ctx = _common_context(project, node)
    ctx.update(
        ref=ref, source=source, config=config,
        this="__this__", is_incremental=lambda: False,
        execute=False,
        run_query=lambda sql: None,
        adapter=None,
        __execute_statement=lambda *a, **k: "",
        __store_raw=lambda *a, **k: "",
        store_result=lambda *a, **k: "",
        load_result=lambda name: None,
    )
    env = _base_env()
    try:
        src = BUILTIN_MACROS + project.macros_src + "\n" + node.raw_code
        env.from_string(src).render(**ctx)
    except jinja2.UndefinedError as e:
        raise CompileError(f"{node.unique_id}: {e}") from e
    # per-node config() wins over dir-level config (reference precedence)
    merged = dict(node.config)
    merged.update(captured)
    node.config = merged
    seen = set()
    node.depends_on = [d for d in deps if not (d in seen or seen.add(d))]


def compile_node(project, node, relation_for, adapter=None,
                 is_incremental: bool = False,
                 extra_ctx: dict[str, Any] | None = None,
                 empty: bool = False,
                 extra_macros: str = "",
                 sample: tuple | None = None) -> str:
    """Second render: ref/source emit relation names; ephemeral deps
    inline as CTEs (compile_node_context.rs; __dbt__cte__ naming).
    empty=True is the dbt `--empty` dry run: every ref/source input is
    wrapped `(select * from rel where false)` so the node builds with
    its real schema and zero rows. sample=(start, end) is the dbt
    `--sample` run filter (dbt-core event_time/sample_window.py;
    reference crates/dbt-schemas/src/filter.rs + node_resolver.rs:49
    "filters applied to run/build, supports --empty or --sample"):
    inputs whose TARGET declares an `event_time` config are wrapped
    with `event_time >= start AND event_time < end`; inputs without
    event_time pass through unfiltered, exactly like dbt-core."""
    ephemeral_ctes: dict[str, str] = {}
    empty_n = [0]

    def resolve(uid: str) -> str:
        target = project.nodes.get(uid) or project.sources.get(uid)
        if target is not None and getattr(target, "is_ephemeral", False):
            cte = f"__dbt__cte__{target.name}"
            if cte not in ephemeral_ctes:
                ephemeral_ctes[cte] = compile_node(
                    project, target, relation_for, adapter, False,
                    empty=empty, sample=sample,
                )
            return cte
        rel = relation_for(uid)
        if empty:
            empty_n[0] += 1
            return (f"(select * from {rel} where false) "
                    f"__dbt_empty_{empty_n[0]}")
        if sample is not None and target is not None:
            et = (getattr(target, "config", None) or {}).get("event_time")
            if et:
                start, end = sample
                conds = ([f"{et} >= '{start}'"] if start else []) + \
                        ([f"{et} < '{end}'"] if end else [])
                if conds:
                    empty_n[0] += 1
                    return (f"(select * from {rel} where"
                            f" {' and '.join(conds)})"
                            f" __dbt_sample_{empty_n[0]}")
        return rel

    def ref(*args, **kwargs):
        uid = resolve_ref_uid(project, node, *args, **kwargs)
        if uid is None:
            raise CompileError(f"{node.unique_id}: unknown ref {args[-1]!r}")
        return resolve(uid)

    def source(src, tbl):
        return resolve(f"source.{project.name}.{src}.{tbl}")

    def run_query(sql: str):
        if adapter is None:
            raise CompileError("run_query unavailable without adapter")
        return adapter.run_query(sql)

    # statement protocol (MA etc/statement.sql): results stored per
    # compile, readable via load_result
    statement_results: dict[str, dict] = {}

    def __execute_statement(name, sql, fetch_result=False):
        if adapter is None:
            raise CompileError("statement unavailable without adapter")
        response, table = adapter.execute(sql, fetch=bool(fetch_result))
        if name:
            statement_results[name] = {
                "response": response, "table": table,
                "data": list(table.rows) if table is not None else [],
            }
        return ""

    def __store_raw(name, message, code, rows_affected, res):
        if name:
            statement_results[name] = {
                "response": {"message": message, "code": code,
                             "rows_affected": rows_affected},
                "table": res, "data": [],
            }
        return ""

    def store_result(name, response=None, agate_table=None):
        statement_results[name] = {
            "response": response, "table": agate_table,
            "data": list(agate_table.rows) if agate_table is not None else [],
        }
        return ""

    ctx = _common_context(project, node)
    ctx.update(
        ref=ref, source=source, config=lambda *a, **k: "",
        this=node.relation_name(), is_incremental=lambda: is_incremental,
        execute=True, run_query=run_query, adapter=adapter,
        dbt_utils=_utils_namespace(adapter),
        __execute_statement=__execute_statement,
        __store_raw=__store_raw,
        store_result=store_result,
        load_result=statement_results.get,
    )
    if extra_ctx:
        ctx.update(extra_ctx)
    # extra_macros render AFTER project macros: a later {% macro %} with
    # the same name rebinds it (unit-test overrides ride on this)
    src = (BUILTIN_MACROS + project.macros_src + "\n" + extra_macros
           + "\n" + node.raw_code)
    body = _base_env().from_string(src).render(**ctx).strip()
    if ephemeral_ctes:
        ctes = ",\n".join(f"{name} AS (\n{sql}\n)" for name, sql in ephemeral_ctes.items())
        # merge with an existing WITH in the model body if present
        m = re.match(r"(?is)^\s*WITH\s+(.*)$", body)
        if m:
            body = f"WITH {ctes},\n{m.group(1)}"
        else:
            body = f"WITH {ctes}\n{body}"
    return body
