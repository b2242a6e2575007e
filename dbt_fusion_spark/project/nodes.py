"""Node graph data model.

Re-expresses the reference's `Nodes` collections
(crates/dbt-schemas/src/schemas/nodes.rs:2100-2115 — models, seeds,
tests, unit_tests, sources, snapshots keyed by unique_id) and the node
config surface (DbtMaterialization common.rs:217-239,
DbtIncrementalStrategy common.rs:558-572, OnSchemaChange
common.rs:583-590, HardDeletes common.rs:613-617).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

MATERIALIZATIONS = {
    # common.rs:217-239
    "view", "table", "incremental", "ephemeral", "seed", "snapshot", "test",
    "unit", "materialized_view", "streaming_table", "dynamic_table",
    "clone", "function",
}

INCREMENTAL_STRATEGIES = {
    # common.rs:558-572
    "append", "merge", "delete+insert", "insert_overwrite", "microbatch",
    "replace_where",
}

ON_SCHEMA_CHANGE = {"ignore", "append_new_columns", "fail", "sync_all_columns"}


@dataclass
class Node:
    unique_id: str             # e.g. model.pkg.stg_orders
    name: str
    resource_type: str         # model | seed | snapshot | test | source | unit_test
    package: str
    path: str                  # project-relative file path
    raw_code: str = ""
    config: dict[str, Any] = field(default_factory=dict)
    depends_on: list[str] = field(default_factory=list)
    description: str = ""
    columns: dict[str, dict] = field(default_factory=dict)
    # source-specific
    source_name: str | None = None
    loader_meta: dict[str, Any] = field(default_factory=dict)
    # model versions (dbt 1.5 versioned models; reference
    # dbt-schemas nodes.rs model `version`/`latest_version` fields):
    # version is set only on nodes expanded from a `versions:` YAML
    # block; unique_id becomes model.<pkg>.<name>.v<version>
    version: int | str | None = None
    latest_version: int | str | None = None
    # filled at compile/run time
    compiled_code: str | None = None
    schema: str | None = None
    alias: str | None = None

    @property
    def materialized(self) -> str:
        if self.resource_type == "model":
            return self.config.get("materialized", "view")
        return self.resource_type

    @property
    def identifier(self) -> str:
        return self.alias or self.config.get("alias") or self.name

    def relation_name(self) -> str:
        return f"`{self.schema}`.`{self.identifier}`"

    @property
    def is_ephemeral(self) -> bool:
        return self.resource_type == "model" and self.materialized == "ephemeral"

    def to_manifest_dict(self) -> dict:
        import hashlib

        return {
            "checksum": {
                "name": "sha256",
                "checksum": hashlib.sha256(
                    (self.raw_code or "").encode()).hexdigest(),
            },
            "unique_id": self.unique_id,
            "name": self.name,
            "resource_type": self.resource_type,
            "package_name": self.package,
            "path": self.path,
            "original_file_path": self.path,
            "raw_code": self.raw_code,
            "compiled_code": self.compiled_code,
            "config": dict(self.config),
            "depends_on": {"nodes": list(self.depends_on)},
            "description": self.description,
            "columns": self.columns,
            "schema": self.schema,
            "alias": self.identifier,
            "version": self.version,
            "latest_version": self.latest_version,
        }
