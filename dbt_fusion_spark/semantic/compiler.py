"""Metric -> SQL compilation: execute the semantic layer, not just
parse it.

The reference parses semantic_models/metrics/saved_queries into the
manifest (crates/dbt-schemas/src/schemas/semantic_layer/) and hands
query planning to MetricFlow; here the planner is a direct SQL
generator over the semantic-model node relation — Spark SQL IS the
execution engine, so a metric query is just a grouped aggregate that
Catalyst optimizes like any model SELECT (map-side partial aggs, pushed
filters, pruned scans — the metric layer adds zero runtime machinery).

Supported metric types (semantic_layer/metric.rs MetricType):
- simple:      AGG(measure) [WHERE filter]
- ratio:       AGG(numerator) / AGG(denominator)
- cumulative:  running AGG over the agg_time_dimension (window frame;
               bounded window when type_params.cumulative_type_params
               .window is set, e.g. '7 days')
- derived:     expression over previously-compiled input metrics

The generated SQL is dialect-shared ANSI (date_trunc/CASE/SUM), so the
same text runs on Spark and the DuckDB oracle.
"""

from __future__ import annotations

import re

_AGGS = {"sum": "SUM", "count": "COUNT", "count_distinct": "COUNT(DISTINCT",
         "avg": "AVG", "min": "MIN", "max": "MAX"}


def _measure_map(semantic_model: dict) -> dict[str, dict]:
    return {m["name"]: m for m in semantic_model.get("measures", [])}


def _dim_expr(semantic_model: dict, name: str, grain: str | None) -> str:
    for d in semantic_model.get("dimensions", []):
        if d["name"] == name:
            expr = d.get("expr", name)
            if d.get("type") == "time":
                g = grain or (d.get("type_params") or {}).get(
                    "time_granularity", "day")
                # day+ grains emit DATE: Spark's date_trunc returns
                # TIMESTAMP while DuckDB's returns DATE — the cast
                # aligns both engines (lossless at these grains)
                if g in ("day", "week", "month", "quarter", "year"):
                    return f"CAST(date_trunc('{g}', {expr}) AS DATE)"
                return f"CAST(date_trunc('{g}', {expr}) AS TIMESTAMP)"
            return expr
    for e in semantic_model.get("entities", []):
        if e["name"] == name:
            return e.get("expr", name)
    return name


def _agg_sql(measure: dict, where: str | None = None) -> str:
    agg = measure.get("agg", "sum").lower()
    expr = measure.get("expr", measure["name"])
    if where:
        expr = f"CASE WHEN {where} THEN {expr} END"
        if agg == "count":
            # COUNT over a CASE with no ELSE counts only matching rows
            return f"COUNT({expr})"
    if agg == "count_distinct":
        return f"COUNT(DISTINCT {expr})"
    if agg not in _AGGS:
        raise ValueError(f"unsupported measure agg {agg!r}")
    if agg == "count":
        return f"COUNT({expr})"
    return f"{_AGGS[agg]}({expr})"


def _parse_window(window: str | None) -> tuple[int, str] | None:
    if not window:
        return None
    m = re.match(r"\s*(\d+)\s+(day|week|month|year)s?\s*$", str(window))
    if not m:
        raise ValueError(f"unsupported cumulative window {window!r}")
    return int(m.group(1)), m.group(2)


def compile_metric_sql(semantic_model: dict, metric: dict,
                       relation: str,
                       group_by: list[str] | None = None,
                       time_grain: str | None = None,
                       metrics_by_name: dict[str, dict] | None = None) -> str:
    """One metric -> executable SQL over the semantic model's relation.
    group_by entries are dimension/entity NAMES (resolved to exprs);
    the metric value column is aliased to the metric name."""
    group_by = group_by or []
    measures = _measure_map(semantic_model)
    tp = metric.get("type_params") or {}
    mtype = metric.get("type", "simple")
    where = metric.get("filter")

    dims = {name: _dim_expr(semantic_model, name, time_grain)
            for name in group_by}
    dim_select = "".join(f"{expr} AS {name}, " for name, expr in dims.items())
    group_clause = (" GROUP BY " + ", ".join(dims[n] for n in group_by)
                    if group_by else "")

    def measure_of(key) -> dict:
        name = key if isinstance(key, str) else key.get("name")
        if name not in measures:
            raise ValueError(
                f"measure {name!r} not in semantic model "
                f"{semantic_model.get('name')!r}")
        return measures[name]

    if mtype == "simple":
        agg = _agg_sql(measure_of(tp["measure"]), where)
        return (f"SELECT {dim_select}{agg} AS {metric['name']} "
                f"FROM {relation}{group_clause}")

    if mtype == "ratio":
        num = _agg_sql(measure_of(tp["numerator"]), where)
        den = _agg_sql(measure_of(tp["denominator"]), where)
        return (f"SELECT {dim_select}CAST({num} AS DOUBLE) / {den} "
                f"AS {metric['name']} FROM {relation}{group_clause}")

    if mtype == "cumulative":
        measure = measure_of(tp["measure"])
        agg = _agg_sql(measure, where)
        time_dim = (semantic_model.get("defaults") or {}).get(
            "agg_time_dimension")
        if not time_dim:
            raise ValueError("cumulative metric needs defaults."
                             "agg_time_dimension on the semantic model")
        grain = time_grain or "day"
        win = _parse_window((tp.get("cumulative_type_params") or {})
                            .get("window"))
        other = [n for n in group_by if n != time_dim]
        if time_dim not in dims:
            dims[time_dim] = _dim_expr(semantic_model, time_dim, grain)
            group_by = [*group_by, time_dim]
        inner_dims = "".join(
            f"{dims[n]} AS {n}, " for n in group_by)
        inner = (f"SELECT {inner_dims}{agg} AS __v FROM {relation} "
                 f"GROUP BY {', '.join(dims[n] for n in group_by)}")
        outer_part = ("PARTITION BY " + ", ".join(other) + " "
                      if other else "")
        outer_frame = (f"ORDER BY CAST({time_dim} AS TIMESTAMP) "
                       f"RANGE BETWEEN INTERVAL {win[0]} {win[1]} PRECEDING "
                       "AND CURRENT ROW" if win else
                       f"ORDER BY {time_dim} ROWS BETWEEN UNBOUNDED "
                       "PRECEDING AND CURRENT ROW")
        sel = ", ".join(group_by)
        return (f"SELECT {sel}, SUM(__v) OVER ({outer_part}{outer_frame}) "
                f"AS {metric['name']} FROM ({inner})")

    if mtype == "derived":
        if metrics_by_name is None:
            raise ValueError("derived metric needs metrics_by_name")
        expr = tp.get("expr") or metric["name"]
        inputs = tp.get("metrics") or []
        ctes = []
        for inp in inputs:
            name = inp if isinstance(inp, str) else inp["name"]
            sub = compile_metric_sql(
                semantic_model, metrics_by_name[name], relation,
                group_by=group_by, time_grain=time_grain,
                metrics_by_name=metrics_by_name)
            ctes.append((name, sub))
        join_keys = group_by
        base, *rest = ctes
        from_clause = f"{base[0]}"
        for name, _ in rest:
            cond = (" AND ".join(
                f"{base[0]}.{k} = {name}.{k}" for k in join_keys)
                if join_keys else "1=1")
            from_clause += f" JOIN {name} ON {cond}"
        sel_dims = "".join(f"{base[0]}.{k}, " for k in join_keys)
        with_sql = ", ".join(f"{n} AS ({s})" for n, s in ctes)
        return (f"WITH {with_sql} SELECT {sel_dims}{expr} AS "
                f"{metric['name']} FROM {from_clause}")

    raise ValueError(f"unsupported metric type {mtype!r}")


def compile_saved_query_sql(project, saved_query: dict,
                            relation_for_model) -> str:
    """saved_query -> one SQL joining its metrics on the group_by keys.
    group_by entries are plain dimension names (the TimeDimension(...)
    form reduces to its dimension name + grain)."""
    qp = saved_query.get("query_params") or {}
    metric_names = qp.get("metrics") or []
    raw_group_by = qp.get("group_by") or []
    group_by, grain = [], None
    for g in raw_group_by:
        m = re.match(r"\s*TimeDimension\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)",
                     str(g))
        if m:
            group_by.append(m.group(1))
            grain = m.group(2)
        else:
            group_by.append(str(g))

    pkg = saved_query["unique_id"].split(".")[1]
    metrics_by_name = {m["name"]: m for m in project.metrics.values()}
    ctes, sel = [], []
    sm_for = {}
    for met_uid, met in project.metrics.items():
        for dep in met["depends_on"]["nodes"]:
            if dep.startswith("semantic_model."):
                sm_for[met["name"]] = project.semantic_models[dep]
    for name in metric_names:
        met = metrics_by_name[name]
        sm = sm_for[name]
        relation = relation_for_model(sm["depends_on"]["nodes"][0])
        sql = compile_metric_sql(sm, met, relation, group_by=group_by,
                                 time_grain=grain,
                                 metrics_by_name=metrics_by_name)
        ctes.append((f"__m_{name}", sql))
        sel.append(name)
    base, *rest = ctes
    from_clause = base[0]
    for cname, _ in rest:
        cond = (" AND ".join(f"{base[0]}.{k} = {cname}.{k}"
                             for k in group_by) if group_by else "1=1")
        from_clause += f" JOIN {cname} ON {cond}"
    dim_sel = "".join(f"{base[0]}.{k}, " for k in group_by)
    with_sql = ", ".join(f"{n} AS ({s})" for n, s in ctes)
    met_sel = ", ".join(f"{n}" for n in sel)
    return f"WITH {with_sql} SELECT {dim_sel}{met_sel} FROM {from_clause}"
