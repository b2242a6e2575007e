"""Column-level lineage from Spark's ANALYZED logical plan.

The reference's flagship differentiator over dbt-core is static SQL
comprehension — it parses every model with its own SQL frontend
(crates/dbt-sql + patched DataFusion, Cargo.toml:96-99) to understand
column provenance without executing anything. Spark gives us the same
capability natively: `spark.sql(text)` ANALYZES (name-resolves) the
query against the catalog without running it, and the analyzed plan
carries globally-unique expression ids that survive CTEs, subquery
aliases, joins and unions. Walking that tree yields exact value-level
column lineage with zero extra parsing machinery — the Spark-first
answer to a hand-rolled SQL frontend.

Scope: VALUE lineage (which source columns feed each output column's
value). Predicate/join-key provenance ("filter lineage") is
deliberately out: dbt docs' column lineage means value flow. Output
columns built only from literals resolve to an empty source list.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _seq(jseq):
    return [jseq.apply(i) for i in range(jseq.size())]


def _attr_ids(jexpr) -> list[int]:
    return [a.exprId().id() for a in _seq(jexpr.references().toSeq())]


def column_lineage(spark: SparkSession, sql: str) -> dict[str, list[dict]]:
    """{output_column: [{"table": name, "column": source_col}, ...]}.

    `sql` is analyzed (not executed) against the current catalog/temp
    views; every referenced relation must resolve. Source lists are
    sorted and de-duplicated; columns derived only from literals map
    to []."""
    plan = spark.sql(sql)._jdf.queryExecution().analyzed()

    sources: dict[int, tuple[str, str]] = {}   # exprId -> (table, col)
    edges: dict[int, set[int]] = {}            # exprId -> parent exprIds

    def add_named(ne) -> None:
        out_id = ne.exprId().id()
        refs = set(_attr_ids(ne)) - {out_id}
        if refs:
            edges.setdefault(out_id, set()).update(refs)
        elif out_id not in edges:
            edges[out_id] = set()

    def mark_source(node, name: str) -> None:
        for a in _seq(node.output()):
            # first (innermost) naming wins; don't overwrite
            sources.setdefault(a.exprId().id(), (name, a.name()))

    def walk(node, alias: str | None) -> None:
        cls = node.getClass().getSimpleName()
        if cls == "SubqueryAlias":
            # remember the alias for an anonymous relation below it
            try:
                alias = node.identifier().toString()
            except Exception:
                pass
        elif cls == "View":
            try:
                name = node.desc().identifier().unquotedString()
            except Exception:
                name = alias or "<view>"
            mark_source(node, name)
            return  # inner plan is the view body; its columns ARE the source
        elif cls == "HiveTableRelation":
            mark_source(node, node.tableMeta().identifier().unquotedString())
            return
        elif cls in ("LogicalRelation", "StreamingRelation",
                     "DataSourceV2Relation"):
            mark_source(node, alias or "<relation>")
            return
        elif cls in ("Project", "Aggregate"):
            exprs = (node.projectList() if cls == "Project"
                     else node.aggregateExpressions())
            for ne in _seq(exprs):
                add_named(ne)
        elif cls == "Window":
            for ne in _seq(node.windowExpressions()):
                add_named(ne)
        elif cls == "Generate":
            gen_refs = set(_attr_ids(node.generator()))
            for a in _seq(node.generatorOutput()):
                edges.setdefault(a.exprId().id(), set()).update(gen_refs)
        elif cls in ("Union", "Intersect", "Except"):
            kids = _seq(node.children())
            out = _seq(node.output())
            for kid in kids:
                kout = _seq(kid.output())
                for o, k in zip(out, kout):
                    oid, kid_id = o.exprId().id(), k.exprId().id()
                    if oid != kid_id:
                        edges.setdefault(oid, set()).add(kid_id)
        # every other node (Filter/Join/Sort/Limit/Distinct/CTE defs &
        # refs/WithCTE...) passes attribute ids through unchanged
        for child in _seq(node.children()):
            walk(child, alias)

    walk(plan, None)

    def resolve(eid: int, seen: frozenset = frozenset()) -> set:
        if eid in sources:
            return {sources[eid]}
        if eid in seen:
            return set()
        out: set = set()
        for parent in edges.get(eid, ()):
            out |= resolve(parent, seen | {eid})
        return out

    result: dict[str, list[dict]] = {}
    for a in _seq(plan.output()):
        srcs = resolve(a.exprId().id())
        result[a.name()] = [
            {"table": t, "column": c} for t, c in sorted(srcs)]
    return result
