"""`dbt man` — machine-readable JSON Schemas for the config surfaces
this engine accepts (reference: crates/dbt-sa-cli/src/dbt_sa_clap.rs
ManArgs + crates/dbt-common/src/io_args.rs:604 JsonSchemaTypes —
selector/schema/project/profile/telemetry).

The schemas document what project/loader.py actually reads, so they are
maintained next to the loader and spot-checked by tests/test_cli.py
against loader behavior. `telemetry` is intentionally absent: this
engine emits no telemetry.
"""

from __future__ import annotations

_SELECT_DEF = {
    "oneOf": [
        {"type": "string"},
        {"type": "object", "properties": {
            "method": {"type": "string"},
            "value": {"type": "string"},
            "children": {"type": "boolean"},
            "parents": {"type": "boolean"},
            "children_depth": {"type": "integer"},
            "parents_depth": {"type": "integer"},
            "union": {"type": "array",
                      "items": {"$ref": "#/$defs/definition"}},
            "intersection": {"type": "array",
                             "items": {"$ref": "#/$defs/definition"}},
            "exclude": {"type": "array",
                        "items": {"$ref": "#/$defs/definition"}},
        }, "additionalProperties": False},
    ]
}

_HOOK = {"oneOf": [{"type": "string"},
                   {"type": "array", "items": {"type": "string"}}]}

_FRESHNESS = {
    "type": "object",
    "properties": {
        "warn_after": {"$ref": "#/$defs/period"},
        "error_after": {"$ref": "#/$defs/period"},
        "filter": {"type": "string"},
    },
}

SCHEMAS: dict[str, dict] = {
    "project": {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "title": "dbt_project.yml",
        "type": "object",
        "required": ["name"],
        "properties": {
            "name": {"type": "string"},
            "version": {"type": ["string", "number"]},
            "profile": {"type": "string"},
            "config-version": {"type": "integer"},
            "vars": {"type": "object"},
            "models": {"type": "object",
                       "description": "config tree; leaf keys prefixed "
                                      "with '+' apply to the subtree"},
            "seeds": {"type": "object"},
            "snapshots": {"type": "object"},
            "tests": {"type": "object"},
            "flags": {"type": "object",
                      "description": "behavior flags honored by the "
                                     "runner (e.g. send_anonymous_usage_"
                                     "stats, require_explicit_package_"
                                     "overrides_for_builtin_materializations)"},
            "on-run-start": _HOOK,
            "on-run-end": _HOOK,
            "model-paths": {"type": "array", "items": {"type": "string"}},
            "seed-paths": {"type": "array", "items": {"type": "string"}},
            "snapshot-paths": {"type": "array", "items": {"type": "string"}},
            "macro-paths": {"type": "array", "items": {"type": "string"}},
            "analysis-paths": {"type": "array", "items": {"type": "string"}},
            "docs-paths": {"type": "array", "items": {"type": "string"}},
            "packages-install-path": {"type": "string"},
            "query-comment": {"oneOf": [{"type": "string"},
                                        {"type": "object"}]},
        },
    },
    "schema": {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "title": "schema.yml (properties file)",
        "type": "object",
        "$defs": {
            "period": {"type": "object",
                       "properties": {"count": {"type": "integer"},
                                      "period": {"enum": ["minute", "hour",
                                                          "day"]}}},
            "column": {
                "type": "object",
                "required": ["name"],
                "properties": {
                    "name": {"type": "string"},
                    "description": {"type": "string"},
                    "data_type": {"type": "string"},
                    "constraints": {"type": "array"},
                    "tests": {"type": "array"},
                    "data_tests": {"type": "array"},
                    "meta": {"type": "object"},
                    "tags": {"type": "array", "items": {"type": "string"}},
                },
            },
        },
        "properties": {
            "version": {"const": 2},
            "models": {"type": "array", "items": {
                "type": "object", "required": ["name"],
                "properties": {
                    "name": {"type": "string"},
                    "description": {"type": "string"},
                    "config": {"type": "object"},
                    "constraints": {"type": "array"},
                    "columns": {"type": "array",
                                "items": {"$ref": "#/$defs/column"}},
                    "tests": {"type": "array"},
                    "data_tests": {"type": "array"},
                    "versions": {"type": "array", "items": {
                        "type": "object", "required": ["v"],
                        "properties": {"v": {"type": ["integer", "string"]},
                                       "defined_in": {"type": "string"},
                                       "config": {"type": "object"},
                                       "columns": {"type": "array"}}}},
                    "latest_version": {"type": ["integer", "string"]},
                    "access": {"enum": ["public", "protected", "private"]},
                    "group": {"type": "string"},
                    "contract": {"type": "object", "properties": {
                        "enforced": {"type": "boolean"}}},
                }}},
            "sources": {"type": "array", "items": {
                "type": "object", "required": ["name"],
                "properties": {
                    "name": {"type": "string"},
                    "schema": {"type": "string"},
                    "loaded_at_field": {"type": "string"},
                    "freshness": _FRESHNESS,
                    "tables": {"type": "array", "items": {
                        "type": "object", "required": ["name"],
                        "properties": {
                            "name": {"type": "string"},
                            "identifier": {"type": "string"},
                            "loaded_at_field": {"type": "string"},
                            "freshness": _FRESHNESS,
                            "meta": {"type": "object", "properties": {
                                "location": {"type": "string"},
                                "format": {"type": "string"}}},
                            "columns": {"type": "array"},
                        }}}}}},
            "seeds": {"type": "array"},
            "snapshots": {"type": "array"},
            "groups": {"type": "array", "items": {
                "type": "object", "required": ["name"],
                "properties": {"name": {"type": "string"},
                               "owner": {"type": "object"}}}},
            "exposures": {"type": "array", "items": {
                "type": "object", "required": ["name"],
                "properties": {"name": {"type": "string"},
                               "type": {"type": "string"},
                               "depends_on": {"type": "array"},
                               "owner": {"type": "object"}}}},
            "metrics": {"type": "array"},
            "semantic_models": {"type": "array"},
            "saved_queries": {"type": "array"},
            "unit_tests": {"type": "array", "items": {
                "type": "object", "required": ["name", "model"],
                "properties": {"name": {"type": "string"},
                               "model": {"type": "string"},
                               "given": {"type": "array"},
                               "expect": {"type": "object"}}}},
        },
    },
    "selector": {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "title": "selectors.yml",
        "type": "object",
        "$defs": {"definition": _SELECT_DEF},
        "required": ["selectors"],
        "properties": {
            "selectors": {"type": "array", "items": {
                "type": "object", "required": ["name", "definition"],
                "properties": {
                    "name": {"type": "string"},
                    "description": {"type": "string"},
                    "default": {"type": "boolean"},
                    "definition": _SELECT_DEF,
                }}},
        },
    },
    "profile": {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "title": "profiles.yml",
        "type": "object",
        "description": "profile-name -> {target, outputs.<name>} map; "
                       "output fields feed SparkSession/adapter config",
        "additionalProperties": {
            "type": "object",
            "properties": {
                "target": {"type": "string"},
                "outputs": {"type": "object", "additionalProperties": {
                    "type": "object",
                    "properties": {
                        "type": {"const": "spark"},
                        "schema": {"type": "string"},
                        "threads": {"type": "integer"},
                        "warehouse_dir": {"type": "string"},
                        "shuffle_partitions": {"type": "integer"},
                    }}},
            },
        },
    },
}


def man_schemas(names: list[str] | None = None) -> dict[str, dict]:
    """The requested schema documents (all when names is empty)."""
    if not names:
        return dict(SCHEMAS)
    unknown = [n for n in names if n not in SCHEMAS]
    if unknown:
        raise KeyError(f"unknown schema types {unknown}; "
                       f"available: {sorted(SCHEMAS)}")
    return {n: SCHEMAS[n] for n in names}
