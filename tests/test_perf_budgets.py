"""Per-query performance budgets (judge r3 "Next round" #8).

Each headline query gets a wall-time budget of 1.5x its official
BENCH_r03 time (floor 1.5 s — sub-second queries are dominated by
fixed per-query overheads and carry ±1-2 s battery noise, so a tight
multiple would only measure the scheduler). A plan regression — a lost
broadcast, a new shuffle, a collapsed-to-single-partition window —
blows past 1.5x immediately, so this fails in CI before the round
driver's bench sees it.

Measurement mirrors bench.py: warm each query's codegen at sf0.001
(untimed), then min-of-2 at sf0.1, clearing the cache between queries.
Skippable under load (SPARK_GRAFT_SKIP_PERF=1, or 1-min loadavg above
half the cores at start — a busy box would fail every budget for
reasons that have nothing to do with the plans).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import pytest

BUDGET_FILE = Path(__file__).parent / "perf_budgets.json"
WARM_SF = "/root/testdata/sf0.001"


def _skip_reason() -> str | None:
    if os.environ.get("SPARK_GRAFT_SKIP_PERF"):
        return "SPARK_GRAFT_SKIP_PERF set"
    load = os.getloadavg()[0]
    cpus = os.cpu_count() or 1
    if load > cpus * 0.5:
        return f"1-min load {load:.1f} > {cpus}/2 cores; timings meaningless"
    return None


def test_headline_queries_within_budget(spark):
    reason = _skip_reason()
    if reason:
        pytest.skip(reason)
    from dbt_fusion_spark.demo import QUERIES

    spec = json.loads(BUDGET_FILE.read_text())
    budgets, sf_dir = spec["budgets_sec"], spec["sf_dir"]
    over = []
    for name, budget in budgets.items():
        fn = QUERIES[name]
        try:
            fn(spark, WARM_SF).count()  # codegen warm-up, untimed
        except Exception:
            pass
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
        if best > budget:
            over.append((name, round(best, 2), budget))
    assert not over, f"queries over 1.5x budget (measured, budget): {over}"
