"""Golden-file harness for compiled SQL and the manifest graph.

Reference semantics: crates/dbt-test-utils/src/task/goldie.rs:120-241 —
capture the compiled artifact of a fixture project once, then fail any
run whose compiled text drifts from the snapshot unless the snapshot is
explicitly regenerated. This is the regression net the ad-hoc artifact
asserts in test_runner.py cannot provide: a macro or jinja-env change
that silently alters compiled SQL text now fails loudly.

Regenerate after an INTENTIONAL change with:

    UPDATE_GOLDEN=1 python -m pytest tests/test_golden.py -q

and review the `tests/golden/` diff like any other code change.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path

import pytest

from dbt_fusion_spark.runner import DbtSparkRunner

PROJECT = str(Path(__file__).parent / "fixtures" / "tpch_project")
GOLDEN = Path(__file__).parent / "golden"
UPDATE = os.environ.get("UPDATE_GOLDEN") == "1"


@pytest.fixture(scope="module")
def runner(spark):
    import shutil

    # Some models introspect at compile time (run_query over upstream
    # relations), so goldens are captured against a BUILT project —
    # still deterministic: the fixture data is fixed.
    spark.sql("DROP DATABASE IF EXISTS analytics CASCADE")
    shutil.rmtree(Path(PROJECT) / "target" / "checkpoints",
                  ignore_errors=True)
    r = DbtSparkRunner(spark, PROJECT)
    r.parse()
    rr = r.run(include_tests=False)
    assert rr.ok, [(x.unique_id, x.status, x.message) for x in rr.results
                   if x.status not in ("success", "pass")]
    return r


def _normalize(sql: str) -> str:
    """Strip run-scoped nondeterminism so goldens are stable: UUIDs
    (invocation_id) and ISO timestamps (run_started_at) become
    placeholders; trailing whitespace is canonicalized."""
    sql = re.sub(
        r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}",
        "<uuid>", sql)
    sql = re.sub(r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d+)?(\+\d{2}:\d{2})?",
                 "<timestamp>", sql)
    return "\n".join(line.rstrip() for line in sql.strip().splitlines()) + "\n"


def _sql_nodes(runner):
    for uid in sorted(runner.project.nodes):
        node = runner.project.nodes[uid]
        if node.resource_type not in ("model", "snapshot", "function"):
            continue
        if node.path and node.path.endswith(".py"):
            continue  # python models have no compiled SQL text
        yield uid, node


def _assert_or_update(path: Path, content: str) -> list[str]:
    if UPDATE:
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(content)
        return []
    if not path.exists():
        return [f"missing golden {path.name} (run UPDATE_GOLDEN=1 to create)"]
    want = path.read_text()
    if want != content:
        import difflib

        diff = "".join(difflib.unified_diff(
            want.splitlines(keepends=True), content.splitlines(keepends=True),
            fromfile=f"golden/{path.name}", tofile="compiled", n=2))
        return [f"compiled drift in {path.name}:\n{diff}"]
    return []


def test_compiled_sql_matches_golden(runner):
    """Every SQL model/snapshot/function node's compiled text equals its
    snapshot under tests/golden/compiled/."""
    problems: list[str] = []
    seen = set()
    for uid, node in _sql_nodes(runner):
        sql = runner.compile(node, is_incremental=False)
        fname = uid.replace(".", "__") + ".sql"
        seen.add(fname)
        problems += _assert_or_update(GOLDEN / "compiled" / fname,
                                      _normalize(sql))
    # orphaned snapshots (node deleted/renamed) fail too — goldie.rs
    # compares the full directory, not just present nodes
    existing = {p.name for p in (GOLDEN / "compiled").glob("*.sql")}
    for orphan in sorted(existing - seen):
        if UPDATE:
            (GOLDEN / "compiled" / orphan).unlink()
        else:
            problems.append(f"orphan golden {orphan} has no matching node")
    assert not problems, "\n".join(problems)


def test_manifest_graph_matches_golden(runner):
    """A stable projection of the manifest graph — node set, deps,
    materialization, schema/alias, enabled tests — snapshotted as JSON.
    Catches silent DAG rewires (a ref regression changes depends_on
    without breaking any single-model test)."""
    proj = {}
    for uid in sorted(runner.project.nodes):
        node = runner.project.nodes[uid]
        proj[uid] = {
            "resource_type": node.resource_type,
            "depends_on": sorted(node.depends_on),
            "materialized": node.config.get("materialized"),
            "schema": node.schema,
            "alias": node.identifier,
        }
    content = json.dumps(proj, indent=1, sort_keys=True) + "\n"
    problems = _assert_or_update(GOLDEN / "manifest.json", content)
    assert not problems, "\n".join(problems)
