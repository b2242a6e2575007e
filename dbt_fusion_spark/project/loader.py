"""Project loading: dbt_project.yml + file discovery.

Re-expresses crates/dbt-loader/src/loader.rs: discover files by kind
and extension (models .sql, seeds .csv/.parquet/.json — loader.rs:
590-633, seed extensions :611-618), read dbt_project.yml
(dbt_project_yml_loader.rs), profiles (load_profiles.rs), vars
(load_vars.rs). Packages/deps are out of scope for v1 (single-package
projects).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml

from dbt_fusion_spark.project.nodes import Node

SNAPSHOT_BLOCK_RE = re.compile(
    r"{%\s*snapshot\s+(\w+)\s*%}(.*?){%\s*endsnapshot\s*%}", re.S
)

# {% test name(model, column_name, ...) %} blocks (parser.rs:920-933
# block tags): custom generic tests. Rewritten to plain macros named
# test_<name> so the standard macro machinery renders them.
TEST_BLOCK_RE = re.compile(
    r"{%\s*test\s+(\w+)\s*(\([^)]*\))?\s*%}(.*?){%\s*endtest\s*%}", re.S
)

# {% docs name %}...{% enddocs %} blocks in .md files (parser.rs:
# 920-933 block tags); referenced from YAML descriptions via doc()
DOCS_BLOCK_RE = re.compile(
    r"{%\s*docs\s+(\w+)\s*%}(.*?){%\s*enddocs\s*%}", re.S
)


# {% materialization name, default | adapter='spark' %} blocks
# (parser.rs:920-933; materialization_resolver.rs custom
# materializations). Rewritten to zero-arg macros named
# materialization_<name>_<adapter>; the runner renders the winning
# adapter's macro with `sql`/`this` in context.
MATERIALIZATION_BLOCK_RE = re.compile(
    r"{%\s*materialization\s+(\w+)\s*,\s*([^%]*?)\s*%}"
    r"(.*?){%\s*endmaterialization\s*%}", re.S
)


def _rewrite_test_blocks(src: str, found: set[str]) -> str:
    def sub(m: re.Match) -> str:
        name, args, body = m.group(1), m.group(2) or "(model, column_name)", m.group(3)
        found.add(name)
        return f"{{% macro test_{name}{args} %}}{body}{{% endmacro %}}"

    return TEST_BLOCK_RE.sub(sub, src)


def _rewrite_materialization_blocks(src: str, found: dict[str, set[str]]
                                    ) -> str:
    def sub(m: re.Match) -> str:
        name, header, body = m.group(1), m.group(2), m.group(3)
        am = re.search(r"adapter\s*=\s*['\"](\w+)['\"]", header)
        adapter = am.group(1) if am else "default"
        found.setdefault(name, set()).add(adapter)
        return (f"{{% macro materialization_{name}_{adapter}() %}}"
                f"{body}{{% endmacro %}}")

    return MATERIALIZATION_BLOCK_RE.sub(sub, src)


@dataclass
class Project:
    root: Path
    name: str
    vars: dict[str, Any] = field(default_factory=dict)
    models_config: dict[str, Any] = field(default_factory=dict)
    seeds_config: dict[str, Any] = field(default_factory=dict)
    profile: dict[str, Any] = field(default_factory=dict)
    nodes: dict[str, Node] = field(default_factory=dict)
    sources: dict[str, Node] = field(default_factory=dict)  # source.<src>.<table>
    # concatenated {% macro %} definitions from macro-paths; prepended to
    # every template render so models can call project macros (the
    # reference resolves macros per package, resolver.rs:103-112)
    macros_src: str = ""
    # dbt_project.yml on-run-start / on-run-end hook SQL
    on_run_start: list[str] = field(default_factory=list)
    on_run_end: list[str] = field(default_factory=list)
    # exposures from schema.yml (nodes.rs exposures map) — manifest-only
    exposures: dict[str, dict] = field(default_factory=dict)
    # groups (nodes.rs groups map): name -> {owner...}; model `group:` +
    # `access:` gate private refs (enforced in runner.parse)
    groups: dict[str, dict] = field(default_factory=dict)
    # names declared via {% test %} blocks in macro paths
    custom_tests: set[str] = field(default_factory=set)
    # {% docs %} block name -> body, from .md files in docs/model paths
    docs: dict[str, str] = field(default_factory=dict)
    # selectors.yml: name -> definition (string or union/intersection dict)
    selectors: dict[str, Any] = field(default_factory=dict)
    # dbt_project.yml `flags:` — behavior-flag overrides
    # (behavior_flags.rs:22-104)
    flags: dict[str, Any] = field(default_factory=dict)
    # {% materialization %} block names -> adapters declared for each
    custom_materializations: dict[str, set[str]] = field(default_factory=dict)
    # semantic layer (nodes.rs:2109-2111 semantic_models / metrics /
    # saved_queries maps) — manifest + selection surface; uid -> dict
    semantic_models: dict[str, dict] = field(default_factory=dict)
    metrics: dict[str, dict] = field(default_factory=dict)
    saved_queries: dict[str, dict] = field(default_factory=dict)

    @property
    def default_schema(self) -> str:
        return self.profile.get("schema", "analytics")


def _dir_config(tree: dict, rel_parts: tuple[str, ...], project_name: str) -> dict:
    """Resolve hierarchical models:/seeds: config (project-level, then
    per-directory, '+'-prefixed keys) — dbt_project.yml semantics."""
    out: dict[str, Any] = {}
    scope = tree.get(project_name, tree) if tree else {}

    def take(d: dict):
        for k, v in d.items():
            if k.startswith("+"):
                out[k[1:]] = v
            elif not isinstance(v, dict):
                out[k] = v

    if isinstance(scope, dict):
        take(scope)
        node = scope
        for part in rel_parts:
            nxt = node.get(part)
            if not isinstance(nxt, dict):
                break
            take(nxt)
            node = nxt
    return out


def load_project(root: str | Path, profile: dict | None = None,
                 vars_overrides: dict | None = None) -> Project:
    root = Path(root)
    cfg = yaml.safe_load((root / "dbt_project.yml").read_text()) or {}
    name = cfg.get("name", root.name)
    proj = Project(
        root=root,
        name=name,
        vars=dict(cfg.get("vars", {}) or {}),
        models_config=cfg.get("models", {}) or {},
        seeds_config=cfg.get("seeds", {}) or {},
        profile=profile or {"schema": "analytics", "threads": 4, "name": "dev"},
    )
    if vars_overrides:
        proj.vars.update(vars_overrides)

    def _hook_list(v) -> list[str]:
        return [v] if isinstance(v, str) else list(v or [])

    proj.on_run_start = _hook_list(cfg.get("on-run-start"))
    proj.on_run_end = _hook_list(cfg.get("on-run-end"))
    proj.flags = dict(cfg.get("flags", {}) or {})

    model_paths = cfg.get("model-paths", ["models"])
    seed_paths = cfg.get("seed-paths", ["seeds"])
    snapshot_paths = cfg.get("snapshot-paths", ["snapshots"])
    macro_paths = cfg.get("macro-paths", ["macros"])
    analysis_paths = cfg.get("analysis-paths", ["analyses"])

    # --- macros (project macro-paths + installed packages) ---
    # package macros load first so project macros of the same name win
    # (reference locality precedence Core < Imported < Root,
    # materialization_resolver.rs:27-34; packages via dbt-deps, local
    # package kind packages.rs:27-32)
    macro_chunks: list[str] = []
    custom_tests: set[str] = set()
    custom_mats: dict[str, set[str]] = {}

    def _macro_chunk(f: Path) -> str:
        src = _rewrite_test_blocks(f.read_text(), custom_tests)
        return _rewrite_materialization_blocks(src, custom_mats)

    pkg_root = root / cfg.get("packages-install-path", "dbt_packages")
    if pkg_root.exists():
        for pkg_dir in sorted(p for p in pkg_root.iterdir() if p.is_dir()):
            pkg_cfg_file = pkg_dir / "dbt_project.yml"
            pkg_cfg = (yaml.safe_load(pkg_cfg_file.read_text()) or {}
                       if pkg_cfg_file.exists() else {})
            pkg_name = pkg_cfg.get("name", pkg_dir.name)
            for sub in pkg_cfg.get("macro-paths", ["macros"]):
                base = pkg_dir / sub
                if base.exists():
                    macro_chunks += [_macro_chunk(f)
                                     for f in sorted(base.rglob("*.sql"))]
            # package models run under the package's namespace
            # (loader.rs package traversal; ref() searches packages too)
            for sub in pkg_cfg.get("model-paths", ["models"]):
                base = pkg_dir / sub
                if not base.exists():
                    continue
                for f in sorted(base.rglob("*.sql")):
                    rel = f.relative_to(base)
                    uid = f"model.{pkg_name}.{f.stem}"
                    conf = _dir_config(pkg_cfg.get("models", {}) or {},
                                       rel.parts[:-1], pkg_name)
                    proj.nodes[uid] = Node(
                        unique_id=uid, name=f.stem, resource_type="model",
                        package=pkg_name, path=str(f.relative_to(pkg_root)),
                        raw_code=f.read_text(), config=conf,
                    )
    for mp in macro_paths:
        base = root / mp
        if base.exists():
            macro_chunks += [_macro_chunk(f)
                             for f in sorted(base.rglob("*.sql"))]
    proj.macros_src = "\n".join(macro_chunks)
    proj.custom_tests = custom_tests
    proj.custom_materializations = custom_mats

    # --- {% docs %} blocks (.md in docs-paths, default = model-paths) ---
    # loaded before schema.yml so doc() references in descriptions resolve
    for dp in cfg.get("docs-paths", model_paths):
        base = root / dp
        if not base.exists():
            continue
        for f in sorted(base.rglob("*.md")):
            for m in DOCS_BLOCK_RE.finditer(f.read_text()):
                proj.docs[m.group(1)] = m.group(2).strip()

    # --- selectors.yml (crates/dbt-selector-parser: named selectors) ---
    sel_file = root / "selectors.yml"
    if sel_file.exists():
        for s in (yaml.safe_load(sel_file.read_text()) or {}).get(
                "selectors", []) or []:
            proj.selectors[s["name"]] = s.get("definition")

    # --- models (+ schema.yml in model dirs); .py = python models ---
    for mp in model_paths:
        base = root / mp
        if not base.exists():
            continue
        for f in sorted(base.rglob("*.sql")) + sorted(base.rglob("*.py")):
            rel = f.relative_to(base)
            node_name = f.stem
            uid = f"model.{name}.{node_name}"
            conf = _dir_config(proj.models_config, rel.parts[:-1], name)
            if f.suffix == ".py":
                conf = dict(conf)
                conf["language"] = "python"
            proj.nodes[uid] = Node(
                unique_id=uid, name=node_name, resource_type="model",
                package=name, path=str(f.relative_to(root)),
                raw_code=f.read_text(), config=conf,
            )
        for f in sorted(base.rglob("*.yml")) + sorted(base.rglob("*.yaml")):
            _load_schema_yml(proj, f)

    # --- seeds (loader.rs:611-618: csv/parquet/json) ---
    for sp in seed_paths:
        base = root / sp
        if not base.exists():
            continue
        for f in sorted(base.rglob("*")):
            if f.suffix.lower() not in (".csv", ".parquet", ".json"):
                continue
            uid = f"seed.{name}.{f.stem}"
            conf = _dir_config(proj.seeds_config, f.relative_to(base).parts[:-1], name)
            proj.nodes[uid] = Node(
                unique_id=uid, name=f.stem, resource_type="seed",
                package=name, path=str(f.relative_to(root)), config=conf,
            )

    # --- analyses (nodes.rs analyses map): compile-only SQL — they
    # parse (dep capture) and `dbt compile` renders them, but the
    # runner never executes them ---
    for ap in analysis_paths:
        base = root / ap
        if not base.exists():
            continue
        for f in sorted(base.rglob("*.sql")):
            uid = f"analysis.{name}.{f.stem}"
            proj.nodes[uid] = Node(
                unique_id=uid, name=f.stem, resource_type="analysis",
                package=name, path=str(f.relative_to(root)),
                raw_code=f.read_text(),
            )

    # --- snapshots ({% snapshot %} blocks, parser.rs:920-933 block tags) ---
    for sp in snapshot_paths:
        base = root / sp
        if not base.exists():
            continue
        for f in sorted(base.rglob("*.sql")):
            for m in SNAPSHOT_BLOCK_RE.finditer(f.read_text()):
                snap_name, body = m.group(1), m.group(2)
                uid = f"snapshot.{name}.{snap_name}"
                proj.nodes[uid] = Node(
                    unique_id=uid, name=snap_name, resource_type="snapshot",
                    package=name, path=str(f.relative_to(root)), raw_code=body,
                )

    _resolve_semantic_deps(proj)
    return proj


def _resolve_semantic_deps(proj: Project) -> None:
    """Post-pass: metric -> semantic-model edges via measure names.
    Runs after ALL schema.yml files load, so cross-file definitions
    resolve (a metric's measure may live in another file's
    semantic_model)."""
    measure_owner: dict[str, str] = {}
    for sm_uid, sm in proj.semantic_models.items():
        for ms in sm["measures"]:
            if ms.get("name"):
                measure_owner[ms["name"]] = sm_uid
    for met_uid, met in proj.metrics.items():
        deps = met["depends_on"]["nodes"]
        for measure in met.get("measures", []):
            sm_uid = measure_owner.get(measure)
            if sm_uid and sm_uid not in deps:
                deps.append(sm_uid)
        node = proj.nodes.get(met_uid)
        if node is not None:
            node.depends_on = list(deps)


def _expand_model_versions(proj: Project, model: dict) -> list:
    """dbt 1.5 versioned models: each `versions:` entry becomes its own
    node `model.<pkg>.<name>.v<v>` with default alias `<name>_v<v>`.
    Version v's code comes from `defined_in`, else `<name>_v<v>.sql`,
    else the shared `<name>.sql`; the raw per-file nodes consumed this
    way are retired so only versioned uids remain selectable.
    `latest_version` defaults to the last declared entry and is what an
    unversioned ref() resolves to (environment.resolve_ref_uid)."""
    name = model["name"]
    entries = model["versions"]
    latest = model.get("latest_version", entries[-1]["v"])
    out, consumed = [], set()
    for entry in entries:
        v = entry["v"]
        for stem in ([entry["defined_in"]] if entry.get("defined_in")
                     else [f"{name}_v{v}", name]):
            src = proj.nodes.get(f"model.{proj.name}.{stem}")
            if src is not None and src.version is None:
                break
        else:
            raise ValueError(
                f"versioned model {name} v{v}: no model file "
                f"({name}_v{v}.sql / {name}.sql / defined_in)")
        consumed.add(src.unique_id)
        uid = f"model.{proj.name}.{name}.v{v}"
        cfg = dict(src.config)
        cfg.update(entry.get("config") or {})
        node = Node(
            unique_id=uid, name=name, resource_type="model",
            package=proj.name, path=src.path, raw_code=src.raw_code,
            config=cfg, version=v, latest_version=latest,
            alias=cfg.get("alias") or f"{name}_v{v}",
        )
        proj.nodes[uid] = node
        out.append(node)
    for uid in consumed:
        proj.nodes.pop(uid, None)
    return out


_TEST_BUILDERS = {"unique", "not_null", "accepted_values", "relationships"}


def _render_description(proj: Project, text: str) -> str:
    """Resolve {{ doc('name') }} references in YAML descriptions
    (docs blocks, parser.rs:920-933; doc() context fn)."""
    if not text or "{{" not in text:
        return text
    import jinja2
    try:
        return jinja2.Template(text).render(
            doc=lambda *a: proj.docs.get(a[-1], "")).strip()
    except Exception:
        return text


def _load_schema_yml(proj: Project, path: Path) -> None:
    """schema.yml: sources, model descriptions/columns, generic tests
    (reference resolve_{sources,tests}.rs)."""
    doc = yaml.safe_load(path.read_text()) or {}

    for src in doc.get("sources", []) or []:
        src_name = src["name"]
        src_schema = src.get("schema", src_name)
        for tbl in src.get("tables", []) or []:
            uid = f"source.{proj.name}.{src_name}.{tbl['name']}"
            node = Node(
                unique_id=uid, name=tbl["name"], resource_type="source",
                package=proj.name, path=str(path.relative_to(proj.root)),
                source_name=src_name,
                config={"schema": src_schema,
                        "identifier": tbl.get("identifier", tbl["name"]),
                        "location": tbl.get("meta", {}).get("location"),
                        "format": tbl.get("meta", {}).get("format", "parquet"),
                        "freshness": tbl.get("freshness") or src.get("freshness"),
                        "loaded_at_field": tbl.get("loaded_at_field")
                        or src.get("loaded_at_field"),
                        # dbt 1.9: custom freshness SELECT wins over field
                        "loaded_at_query": tbl.get("loaded_at_query")
                        or src.get("loaded_at_query"),
                        # --sample / microbatch input filtering target
                        "event_time": (tbl.get("config") or {}).get(
                            "event_time") or tbl.get("event_time")},
                loader_meta=tbl.get("meta", {}) or {},
            )
            proj.sources[uid] = node

    for grp in doc.get("groups", []) or []:
        proj.groups[grp["name"]] = {"owner": grp.get("owner") or {}}

    for model in doc.get("models", []) or []:
        if model.get("versions"):
            targets = _expand_model_versions(proj, model)
        else:
            targets = [n for n in
                       [proj.nodes.get(f"model.{proj.name}.{model['name']}")]
                       if n is not None]
        for node in targets:
            node.description = _render_description(
                proj, model.get("description", ""))
            if model.get("constraints"):
                node.config["model_constraints"] = model["constraints"]
            for key in ("group", "access"):
                if model.get(key):
                    node.config[key] = model[key]
            # model contracts (DbtContract common.rs:531-552): either
            # top-level `contract:` or under `config:`
            contract = (model.get("contract")
                        or (model.get("config") or {}).get("contract"))
            if contract:
                node.config["contract"] = contract
        for col in model.get("columns", []) or []:
            for node in targets:
                node.columns[col["name"]] = {
                    "description": _render_description(
                        proj, col.get("description", "")),
                    "data_type": col.get("data_type"),
                    "constraints": col.get("constraints") or [],
                }
            for t in (col.get("tests") or col.get("data_tests") or []):
                _add_generic_test(proj, model["name"], col["name"], t, path)

    # exposures (nodes.rs:2100-2115 exposures map) — downstream BI/ML
    # consumers; manifest-only, selectable via graph operators
    for exp in doc.get("exposures", []) or []:
        uid = f"exposure.{proj.name}.{exp['name']}"
        proj.exposures[uid] = {
            "unique_id": uid, "name": exp["name"],
            "type": exp.get("type", "dashboard"),
            "owner": exp.get("owner") or {},
            "depends_on": exp.get("depends_on") or [],
            "url": exp.get("url"), "description": exp.get("description", ""),
        }

    # --- semantic layer ------------------------------------------------
    # semantic_models (manifest/semantic_model.rs:23-57: model ref,
    # node_relation, entities, dimensions, measures, defaults)
    for sm in doc.get("semantic_models", []) or []:
        uid = f"semantic_model.{proj.name}.{sm['name']}"
        model_ref = sm.get("model", "")
        m = re.match(r"\s*(?:{{\s*)?ref\(\s*'([^']+)'\s*\)\s*(?:}})?\s*",
                     str(model_ref))
        model_uid = f"model.{proj.name}.{m.group(1)}" if m else None
        proj.semantic_models[uid] = {
            "unique_id": uid, "name": sm["name"],
            "resource_type": "semantic_model", "package_name": proj.name,
            "path": str(path.relative_to(proj.root)),
            "description": sm.get("description", ""),
            "model": str(model_ref),
            "label": sm.get("label"),
            "defaults": sm.get("defaults") or {},
            "entities": sm.get("entities") or [],
            "dimensions": sm.get("dimensions") or [],
            "measures": sm.get("measures") or [],
            "primary_entity": sm.get("primary_entity"),
            "depends_on": {"nodes": [model_uid] if model_uid else []},
        }
        proj.nodes[uid] = Node(
            unique_id=uid, name=sm["name"], resource_type="semantic_model",
            package=proj.name, path=str(path.relative_to(proj.root)),
            depends_on=[model_uid] if model_uid else [],
        )

    # metrics (manifest/metric.rs:25-49: type, type_params{measure,
    # numerator, denominator, window, grain_to_date}, filter, label)
    for met in doc.get("metrics", []) or []:
        uid = f"metric.{proj.name}.{met['name']}"
        # a metric depends on the semantic model defining its measure(s)
        tp = met.get("type_params") or {}
        measures = []
        for key in ("measure", "numerator", "denominator"):
            v = tp.get(key)
            if isinstance(v, str):
                measures.append(v)
            elif isinstance(v, dict) and v.get("name"):
                measures.append(v["name"])
        deps = []  # semantic-model deps resolved in _resolve_semantic_deps
        for inp in tp.get("metrics", []) or []:
            nm = inp if isinstance(inp, str) else inp.get("name")
            deps.append(f"metric.{proj.name}.{nm}")
        proj.metrics[uid] = {
            "unique_id": uid, "name": met["name"],
            "resource_type": "metric", "package_name": proj.name,
            "path": str(path.relative_to(proj.root)),
            "description": met.get("description", ""),
            "label": met.get("label", met["name"]),
            "type": met.get("type", "simple"),
            "type_params": tp,
            "filter": met.get("filter"),
            "measures": measures,
            "depends_on": {"nodes": deps},
        }
        proj.nodes[uid] = Node(
            unique_id=uid, name=met["name"], resource_type="metric",
            package=proj.name, path=str(path.relative_to(proj.root)),
            depends_on=deps,
        )

    # saved_queries (manifest/saved_query.rs:18-66: query_params
    # {metrics, group_by, where}, exports)
    for sq in doc.get("saved_queries", []) or []:
        uid = f"saved_query.{proj.name}.{sq['name']}"
        qp = sq.get("query_params") or {}
        deps = [f"metric.{proj.name}.{m}" for m in qp.get("metrics", []) or []]
        proj.saved_queries[uid] = {
            "unique_id": uid, "name": sq["name"],
            "resource_type": "saved_query", "package_name": proj.name,
            "path": str(path.relative_to(proj.root)),
            "description": sq.get("description", ""),
            "query_params": qp,
            "exports": sq.get("exports") or [],
            "depends_on": {"nodes": deps},
        }
        proj.nodes[uid] = Node(
            unique_id=uid, name=sq["name"], resource_type="saved_query",
            package=proj.name, path=str(path.relative_to(proj.root)),
            depends_on=deps,
        )

    # unit tests (nodes.rs unit_tests map; fixtures common.rs:759-780
    # Formats{Dict,Csv,Sql} + Rows)
    for ut in doc.get("unit_tests", []) or []:
        uid = f"unit_test.{proj.name}.{ut['name']}"
        proj.nodes[uid] = Node(
            unique_id=uid, name=ut["name"], resource_type="unit_test",
            package=proj.name, path=str(path.relative_to(proj.root)),
            config={"model": ut["model"], "given": ut.get("given") or [],
                    "expect": ut.get("expect") or {},
                    # dbt 1.8 unit-test overrides (UnitTestOverrides,
                    # unit_test_properties.rs:29-33: macros/vars/env_vars)
                    "overrides": ut.get("overrides") or {}},
            depends_on=[f"model.{proj.name}.{ut['model']}"],
        )


def _add_generic_test(proj: Project, model_name: str, column: str, t, path: Path
                      ) -> None:
    if isinstance(t, str):
        test_type, kwargs = t, {}
    else:
        test_type, kwargs = next(iter(t.items()))
    custom = test_type not in _TEST_BUILDERS
    if custom and test_type not in proj.custom_tests:
        return
    suffix = f"{test_type}_{model_name}_{column}"
    uid = f"test.{proj.name}.{suffix}"
    # custom generic tests render as a call to the macro the {% test %}
    # block was rewritten to; builtin tests use the native SQL builders
    raw = ""
    if custom:
        extra = "".join(
            f", {k}={v!r}" for k, v in (kwargs or {}).items()
            if k != "severity")
        raw = ("{{ test_%s(model=ref('%s'), column_name='%s'%s) }}"
               % (test_type, model_name, column, extra))
    proj.nodes[uid] = Node(
        unique_id=uid, name=suffix, resource_type="test", package=proj.name,
        path=str(path.relative_to(proj.root)), raw_code=raw,
        config={"test_type": test_type, "column_name": column,
                "model_name": model_name, "kwargs": kwargs or {},
                "custom": custom,
                "severity": (kwargs or {}).get("severity", "error")},
        depends_on=[f"model.{proj.name}.{model_name}"],
    )
