"""Registry-wide budget + gate bookkeeping checks (judge r5 #8).

Three recurring verdict findings, turned into CI so they cannot
regress silently:

(a) every bench.py HEADLINE query must carry a perf budget in
    tests/perf_budgets.json (and every budget key must name a real
    registry query) — a new headline query without a budget is a
    plan-regression blind spot;
(b) a budget whose number comes from a non-official source (warm-local
    debut timing instead of a driver BENCH artifact) must be refreshed
    within one round: perf_budgets.json records such queries in a
    `provisional: {query: round_int}` map, and this check fails once
    the current round (max BENCH_r{N}.json present + 1) is two or more
    rounds past the recorded one;
(c) cumulative driver-gate coverage — the count of distinct registry
    rows ever certified by a CORRECTNESS_r*.json artifact, plus the
    rows the CURRENT gate window would certify this round — must never
    regress below the high-water mark recorded as
    `cumulative_gate_rows` in any PARITY_LOCAL_r*.json.

Run directly (`python tools/hygiene_check.py`) or via
tests/test_hygiene.py. Pure filesystem/JSON — no SparkSession.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _round_artifacts(pattern: str) -> dict[int, Path]:
    out: dict[int, Path] = {}
    for p in REPO.glob(pattern):
        m = re.search(r"_r(\d+)\.json$", p.name)
        if m:
            out[int(m.group(1))] = p
    return out


def current_round() -> int:
    """The round in progress = one past the newest driver bench."""
    benches = _round_artifacts("BENCH_r*.json")
    return (max(benches) + 1) if benches else 1


def check_headline_budgets(errors: list[str]) -> None:
    sys.path.insert(0, str(REPO))
    import bench
    from dbt_fusion_spark.demo import QUERIES

    spec = json.loads((REPO / "tests/perf_budgets.json").read_text())
    budgets = spec["budgets_sec"]
    missing = [q for q in bench.HEADLINE if q not in budgets]
    if missing:
        errors.append(
            f"headline queries without a perf budget: {missing}")
    stale = [q for q in budgets if q not in QUERIES]
    if stale:
        errors.append(f"perf budgets naming unknown queries: {stale}")


def check_provisional_budget_age(errors: list[str]) -> None:
    spec = json.loads((REPO / "tests/perf_budgets.json").read_text())
    provisional: dict[str, int] = spec.get("provisional", {})
    now = current_round()
    for q, rnd in provisional.items():
        if now - int(rnd) >= 2:
            errors.append(
                f"budget for {q!r} has been non-official (warm-local, "
                f"round {rnd}) for {now - int(rnd)} rounds — refresh it "
                f"from an official BENCH artifact")


def cumulative_gate_rows() -> int:
    from dbt_fusion_spark.demo import GATE_WINDOW, QUERIES

    gated: set[str] = set()
    for p in _round_artifacts("CORRECTNESS_r*.json").values():
        gated |= set(json.loads(p.read_text()))
    gated &= set(QUERIES)  # early rounds gated rows that were renamed
    gated |= set(GATE_WINDOW)  # what THIS round's window will certify
    return len(gated)


def check_gate_coverage_monotone(errors: list[str]) -> None:
    high_water = 0
    for p in _round_artifacts("PARITY_LOCAL_r*.json").values():
        try:
            doc = json.loads(p.read_text())
        except Exception:
            continue
        # recorded either top-level or nested under the rotation record
        for holder in (doc, doc.get("gate_window_rotation", {})):
            v = holder.get("cumulative_gate_rows", 0) \
                if isinstance(holder, dict) else 0
            if isinstance(v, int):
                high_water = max(high_water, v)
    cur = cumulative_gate_rows()
    if cur < high_water:
        errors.append(
            f"cumulative driver-gate coverage regressed: {cur} rows now "
            f"vs recorded high-water {high_water} — the rotation dropped "
            f"never-certified rows or shrank the window")


def check_prior_round_artifacts_tracked(errors: list[str]) -> None:
    """Judge r6 #2: driver artifacts (BENCH_r{N}.json /
    CORRECTNESS_r{N}.json) land AFTER the round's final commit, so
    every round must commit the PREVIOUS round's pair first thing — a
    fresh clone otherwise stalls current_round() and loses certified
    rows from the cumulative count. Fails when any such artifact exists
    on disk but is untracked in git."""
    import subprocess

    try:
        tracked = set(subprocess.run(
            ["git", "ls-files"], cwd=REPO, capture_output=True,
            text=True, timeout=30).stdout.split())
    except Exception:
        return  # not a git checkout (e.g. exported tree) — nothing to check
    for pattern in ("BENCH_r*.json", "CORRECTNESS_r*.json",
                    "PARITY_LOCAL_r*.json"):
        for p in _round_artifacts(pattern).values():
            if p.name not in tracked:
                errors.append(
                    f"driver artifact {p.name} exists but is untracked "
                    f"— commit it (the three-round-running bookkeeping "
                    f"finding, now CI)")


def check_local_bench_artifacts(errors: list[str]) -> None:
    """Judge r7 #7: the driver's BENCH_r{N}.json tail truncates and its
    `parsed` is null, so round-over-round comparison depended on
    regex-scraping. From r8 on, every COMPLETED round (one whose
    BENCH_r{N} exists) must also carry the builder's complete local
    bench as BENCH_LOCAL_r{N}.json (machine-readable, all rows)."""
    benches = _round_artifacts("BENCH_r*.json")
    for n in benches:
        if n >= 8 and not (REPO / f"BENCH_LOCAL_r{n:02d}.json").exists() \
                and not (REPO / f"BENCH_LOCAL_r{n}.json").exists():
            errors.append(
                f"round {n} closed (BENCH_r{n:02d}.json exists) without "
                f"a self-contained BENCH_LOCAL_r{n:02d}.json — run "
                f"bench.py and commit its full JSON (judge r7 #7)")


def check_closing_sweep_covers_registry(errors: list[str]) -> None:
    """Judge r9 #3 ("close the post-sweep-debut hole in CI, not
    prose"): twice now (r8 row #239, r9 rows #258-259) a query was
    registered AFTER the closing full-battery sweeps ran, shipping a
    registry row no full pytest/parity pass ever exercised.  The
    freeze rule, as CI: once the CURRENT round's closing artifact
    (PARITY_LOCAL_r{N}.json, N = current_round()) exists, BOTH its
    battery records must carry an explicit `rows` list covering every
    `__spark_entry__.queries()` entry — so registering one more query
    after the sweep turns this red until the sweep re-runs and the
    artifact is refreshed.  (Earlier rounds' artifacts recorded only
    counts and are exempt; the format requirement starts at r10.)"""
    n = current_round()
    p = REPO / f"PARITY_LOCAL_r{n:02d}.json"
    if not p.exists():
        p = REPO / f"PARITY_LOCAL_r{n}.json"
    if not p.exists():
        return  # closing artifact not written yet — nothing frozen
    try:
        doc = json.loads(p.read_text())
    except Exception as e:
        errors.append(f"{p.name} unreadable: {e}")
        return
    from dbt_fusion_spark.demo import QUERIES

    registry = set(QUERIES)
    for battery in ("sf001_full_battery", "sf01_full_battery"):
        rec = doc.get(battery)
        if not isinstance(rec, dict) or not isinstance(
                rec.get("rows"), list):
            errors.append(
                f"{p.name} {battery} lacks an explicit `rows` list — "
                f"from r10 on the closing sweep must record WHICH "
                f"registry rows it swept (judge r9 #3)")
            continue
        missing = sorted(registry - set(rec["rows"]))
        if missing:
            errors.append(
                f"{p.name} {battery} did not sweep {len(missing)} "
                f"registered queries (post-sweep debuts): {missing} — "
                f"re-run the closing sweep and refresh the artifact")


def _last_code_commit() -> str | None:
    """SHA of the newest commit touching executable code (source,
    tests, bench, entry, tools) — the thing full-suite evidence must
    have been recorded AT, or it is stale."""
    import subprocess
    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%H", "--",
             "dbt_fusion_spark", "tests", "bench.py",
             "__spark_entry__.py", "tools"],
            cwd=REPO, capture_output=True, text=True, timeout=30)
    except Exception:
        return None
    sha = out.stdout.strip()
    return sha or None


def check_pytest_evidence_at_head(errors: list[str]) -> None:
    """Judge r10 #2 ("close the stale-pytest hole in CI"): r10's
    committed `pytest_full_suite` tail recorded a FAILED parity row
    because the suite ran BEFORE a late oracle fix — committed
    evidence was red while HEAD was green.  The rule, as CI: once the
    CURRENT round's closing artifact exists (r11+), its
    `pytest_full_suite` record must carry `head_sha` (the commit the
    suite ran at) and `green: true`, and `head_sha` must equal the
    last code-touching commit — so any code change after the recorded
    run turns this red until the suite re-runs at HEAD and the
    artifact is refreshed."""
    n = current_round()
    if n < 11:
        return  # format requirement starts at r11
    p = REPO / f"PARITY_LOCAL_r{n:02d}.json"
    if not p.exists():
        p = REPO / f"PARITY_LOCAL_r{n}.json"
    if not p.exists():
        return  # closing artifact not written yet — nothing frozen
    try:
        rec = json.loads(p.read_text()).get("pytest_full_suite")
    except Exception as e:
        errors.append(f"{p.name} unreadable: {e}")
        return
    if not isinstance(rec, dict) or not rec.get("head_sha"):
        errors.append(
            f"{p.name} pytest_full_suite lacks `head_sha` — from r11 "
            f"on the closing full-suite record must pin the commit it "
            f"ran at (judge r10 #2)")
        return
    if rec.get("green") is not True:
        errors.append(
            f"{p.name} pytest_full_suite is not recorded green — "
            f"committed closing evidence must never be red; re-run "
            f"the suite and refresh the artifact")
    head = _last_code_commit()
    if head and rec["head_sha"] != head:
        errors.append(
            f"{p.name} pytest_full_suite ran at {rec['head_sha'][:12]} "
            f"but the last code-touching commit is {head[:12]} — the "
            f"recorded run is stale; re-run the full suite at HEAD and "
            f"refresh the artifact (judge r10 #2)")


def run_checks() -> list[str]:
    errors: list[str] = []
    check_headline_budgets(errors)
    check_provisional_budget_age(errors)
    check_gate_coverage_monotone(errors)
    check_prior_round_artifacts_tracked(errors)
    check_local_bench_artifacts(errors)
    check_closing_sweep_covers_registry(errors)
    check_pytest_evidence_at_head(errors)
    return errors


def main() -> int:
    errors = run_checks()
    for e in errors:
        print(f"HYGIENE FAIL: {e}")
    if not errors:
        print(f"hygiene OK (round {current_round()}, cumulative gate "
              f"rows {cumulative_gate_rows()})")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
