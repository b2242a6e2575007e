"""Relation: a (database, schema, identifier) triple with quoting policy.

Re-expresses the reference's `BaseRelation`
(crates/dbt-schemas/src/schemas/relations/base.rs:112-672 — methods
database/schema/identifier, include, incorporate, render, is_table/
is_view/is_cte) and quoting `Policy` (base.rs:56-82), plus
`RelationType` (crates/dbt-schemas/src/dbt_types.rs:9-24), mapped onto
Spark's catalog namespace. Spark quotes with backticks; `database`
maps to the Spark catalog name and is normally omitted from rendering
(dbt-spark's two-level namespace convention).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from enum import Enum


class RelationType(str, Enum):
    # crates/dbt-schemas/src/dbt_types.rs:9-24
    Table = "table"
    View = "view"
    CTE = "cte"
    MaterializedView = "materialized_view"
    Ephemeral = "ephemeral"
    External = "external"
    PointerTable = "pointer_table"


@dataclass(frozen=True)
class Policy:
    """Per-part on/off switch; used for both quoting and inclusion
    (reference base.rs:56-82)."""

    database: bool = False  # Spark: catalog rarely rendered
    schema: bool = True
    identifier: bool = True


def quote_part(part: str) -> str:
    return "`" + part.replace("`", "``") + "`"


@dataclass(frozen=True)
class Relation:
    database: str | None = None
    schema: str | None = None
    identifier: str | None = None
    type: RelationType | None = None
    include_policy: Policy = field(default_factory=Policy)
    quote_policy: Policy = field(default_factory=lambda: Policy(True, True, True))

    @classmethod
    def create(
        cls,
        database: str | None = None,
        schema: str | None = None,
        identifier: str | None = None,
        type: RelationType | str | None = None,
    ) -> Relation:
        if isinstance(type, str):
            type = RelationType(type)
        return cls(database=database, schema=schema, identifier=identifier, type=type)

    # --- reference base.rs `include` / `incorporate` ---
    def include(self, database: bool | None = None, schema: bool | None = None,
                identifier: bool | None = None) -> Relation:
        pol = self.include_policy
        return replace(
            self,
            include_policy=Policy(
                pol.database if database is None else database,
                pol.schema if schema is None else schema,
                pol.identifier if identifier is None else identifier,
            ),
        )

    def quote(self, database: bool | None = None, schema: bool | None = None,
              identifier: bool | None = None) -> Relation:
        pol = self.quote_policy
        return replace(
            self,
            quote_policy=Policy(
                pol.database if database is None else database,
                pol.schema if schema is None else schema,
                pol.identifier if identifier is None else identifier,
            ),
        )

    def incorporate(self, database: str | None = None, schema: str | None = None,
                    identifier: str | None = None,
                    type: RelationType | str | None = None) -> Relation:
        if isinstance(type, str):
            type = RelationType(type)
        return replace(
            self,
            database=database or self.database,
            schema=schema or self.schema,
            identifier=identifier or self.identifier,
            type=type or self.type,
        )

    def replace_path(self, **kwargs) -> Relation:
        return self.incorporate(**kwargs)

    def render(self) -> str:
        parts = []
        for name, inc, qt in (
            (self.database, self.include_policy.database, self.quote_policy.database),
            (self.schema, self.include_policy.schema, self.quote_policy.schema),
            (self.identifier, self.include_policy.identifier, self.quote_policy.identifier),
        ):
            if name is not None and inc:
                parts.append(quote_part(name) if qt else name)
        return ".".join(parts)

    def __str__(self) -> str:  # Jinja renders relations via str()
        return self.render()

    # --- type predicates (reference base.rs is_table/is_view/is_cte) ---
    @property
    def is_table(self) -> bool:
        return self.type == RelationType.Table

    @property
    def is_view(self) -> bool:
        return self.type == RelationType.View

    @property
    def is_cte(self) -> bool:
        return self.type == RelationType.CTE

    @property
    def is_materialized_view(self) -> bool:
        return self.type == RelationType.MaterializedView

    def without_identifier(self) -> Relation:
        return replace(self, identifier=None)
