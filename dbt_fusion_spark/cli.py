"""Command-line entry point: `python -m dbt_fusion_spark <command>`.

Mirrors the reference CLI surface (crates/dbt-sa-cli/src/dbt_sa_lib.rs:
205-265 — run/test/build/seed/snapshot/compile/list/show/debug/deps/
source freshness/run-operation/init/man, plus retry, docs generate, and
static funcsign typecheck) on top of DbtSparkRunner. The CLI
is a thin shell: argument parsing and exit codes here, all semantics in
the runner — same layering as the reference, where the CLI crate only
dispatches into dbt-core scheduling.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import yaml


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="dbt-fusion-spark",
        description="PySpark-native dbt engine")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--project-dir", default=".")
        sp.add_argument("--profiles-dir", default=None)
        sp.add_argument("--target", default=None)
        sp.add_argument("--vars", default=None,
                        help="YAML/JSON dict of var overrides")
        sp.add_argument("-s", "--select", default=None)
        sp.add_argument("--exclude", default=None)
        sp.add_argument("--selector", default=None)
        sp.add_argument("--state", default=None)
        sp.add_argument("--defer", action="store_true")
        sp.add_argument("--threads", type=int, default=None)
        sp.add_argument("--full-refresh", action="store_true")
        sp.add_argument("--fail-fast", action="store_true",
                        help="skip scheduling further nodes after the "
                             "first failure")
        sp.add_argument("--sample", default=None,
                        help="event_time run filter: '3 days' or "
                             "{'start': ..., 'end': ...}")
        sp.add_argument("--empty", action="store_true",
                        help="schema-only dry run: model inputs limited "
                             "to zero rows")
        return sp

    for name in ("run", "test", "build", "seed", "snapshot", "compile",
                 "parse", "typecheck", "retry", "clone", "lineage"):
        common(sub.add_parser(name))
    ls = common(sub.add_parser("list", aliases=["ls"]))
    ls.add_argument("--output", choices=["name", "json"], default="name")
    show = common(sub.add_parser("show"))
    show.add_argument("model", nargs="?")
    show.add_argument("--limit", type=int, default=5)
    show.add_argument("--inline", default=None,
                      help="SQL to preview instead of a model (supports "
                           "ref()/source())")
    op = common(sub.add_parser("run-operation"))
    op.add_argument("macro")
    op.add_argument("--args", default=None)
    src = common(sub.add_parser("source"))
    src.add_argument("subcommand", choices=["freshness"])
    docs = common(sub.add_parser("docs"))
    docs.add_argument("subcommand", choices=["generate"])
    deps = sub.add_parser("deps")
    deps.add_argument("--project-dir", default=".")
    init = sub.add_parser("init")
    init.add_argument("name")
    init.add_argument("--project-dir", default=".")
    clean = sub.add_parser("clean")
    clean.add_argument("--project-dir", default=".")
    common(sub.add_parser("debug"))
    man = sub.add_parser(
        "man", help="print JSON Schemas for accepted config files "
                    "(reference: dbt man --schema)")
    man.add_argument("--schema", nargs="*", default=None,
                     choices=["project", "schema", "selector", "profile"])
    return p


def _load_profile(args) -> dict | None:
    """profiles.yml resolution (profile name from dbt_project.yml,
    target from --target or the profile's default)."""
    proj_dir = Path(args.project_dir)
    profiles_dir = Path(args.profiles_dir) if args.profiles_dir else proj_dir
    path = profiles_dir / "profiles.yml"
    if not path.exists():
        return None
    profiles = yaml.safe_load(path.read_text()) or {}
    cfg = yaml.safe_load((proj_dir / "dbt_project.yml").read_text()) or {}
    prof_name = cfg.get("profile", cfg.get("name"))
    prof = profiles.get(prof_name)
    if not prof:
        return None
    target = args.target or prof.get("target", "dev")
    out = dict(prof.get("outputs", {}).get(target, {}))
    out.setdefault("name", target)
    return out


def _parse_vars(raw: str | None) -> dict:
    if not raw:
        return {}
    return yaml.safe_load(raw) or {}


def _runner(args, spark=None):
    from dbt_fusion_spark.runner import DbtSparkRunner

    if spark is None:
        from dbt_fusion_spark.session import get_spark
        spark = get_spark(app_name="dbt-fusion-spark-cli")
    return DbtSparkRunner(
        spark, args.project_dir,
        profile=_load_profile(args),
        vars=_parse_vars(getattr(args, "vars", None)) or None)


_RESOURCE_TYPES = {
    "run": {"model"},
    "seed": {"seed"},
    "snapshot": {"snapshot"},
    "test": {"test", "unit_test"},
    "build": None,  # everything, DAG-ordered
}


def _print_results(rr) -> int:
    for r in rr.results:
        line = f"{r.status.upper():8s} {r.unique_id}"
        if r.message:
            line += f"  ({str(r.message).splitlines()[0][:120]})"
        print(line)
    n_err = sum(1 for r in rr.results if r.status in ("error", "fail"))
    print(f"Done. {len(rr.results)} nodes, {n_err} failures "
          f"in {rr.elapsed:.1f}s")
    return 1 if n_err else 0


def main(argv: list[str] | None = None, spark=None) -> int:
    args = _build_parser().parse_args(argv)
    cmd = args.command
    if cmd == "man":
        # dbt_sa_clap.rs:183-190 Man: emit JSON schema documents for the
        # accepted config file formats
        from dbt_fusion_spark.man import man_schemas
        print(json.dumps(man_schemas(args.schema), indent=2))
        return 0
    if cmd == "deps":
        from dbt_fusion_spark.deps import install_deps
        for pkg in install_deps(args.project_dir):
            print(f"Installed {pkg}")
        return 0
    if cmd == "init":
        from dbt_fusion_spark.project.scaffold import init_project
        init_project(Path(args.project_dir) / args.name)
        print(f"Created project {args.name}")
        return 0
    if cmd == "clean":
        # dbt_sa_clap.rs:85-86 Clean: remove target dirs (clean-targets
        # defaults to target/ and dbt_packages/ per dbt_project.yml)
        import shutil
        proj = Path(args.project_dir)
        cfg = yaml.safe_load((proj / "dbt_project.yml").read_text()) or {}
        for d in cfg.get("clean-targets", ["target", "dbt_packages"]):
            tgt = proj / d
            if tgt.exists():
                shutil.rmtree(tgt)
                print(f"Cleaned {tgt}")
        return 0

    runner = _runner(args, spark=spark)

    if cmd == "debug":
        # connection + project sanity (reference `dbt debug` shape)
        import pyspark
        print(f"python: {sys.version.split()[0]}")
        print(f"pyspark: {pyspark.__version__}")
        print(f"spark master: {runner.spark.conf.get('spark.master')}")
        ok = runner.spark.sql("SELECT 1 AS ok").collect()[0]["ok"] == 1
        print(f"connection test: {'OK' if ok else 'FAILED'}")
        runner.parse()
        print(f"project: {runner.project.name} "
              f"({len(runner.project.nodes)} nodes, "
              f"{len(runner.project.sources)} sources) — parse OK")
        return 0 if ok else 1

    if cmd == "parse":
        runner.parse()
        runner.write_artifacts(
            __import__("dbt_fusion_spark.runner", fromlist=["RunResults"])
            .RunResults([], 0.0))
        print("Parsed OK")
        return 0
    if cmd in ("list", "ls"):
        for uid in runner.list_nodes(select=args.select, exclude=args.exclude):
            if args.output == "json":
                node = runner.project.nodes.get(uid)
                print(json.dumps({
                    "unique_id": uid,
                    "resource_type": getattr(node, "resource_type", None),
                    "name": getattr(node, "name", uid)}))
            else:
                print(uid)
        return 0
    if cmd == "show":
        table = runner.show(args.model, limit=args.limit,
                            inline=args.inline)
        print(" | ".join(table.column_names))
        for row in table.rows:
            print(" | ".join(str(v) for v in row))
        return 0
    if cmd == "run-operation":
        print(runner.run_operation(args.macro,
                                   _parse_vars(args.args) or None))
        return 0
    if cmd == "source":
        runner.parse()
        worst = 0
        for uid, node in runner.project.sources.items():
            if (node.config or {}).get("freshness") or (node.meta or {}).get("freshness"):
                status = runner.check_source_freshness(uid)
                print(f"{status['status'].upper():8s} {uid} "
                      f"(age {status.get('max_loaded_at_age', '?')})")
                worst = max(worst, 1 if status["status"] == "error" else 0)
        return worst
    if cmd == "clone":
        # dbt 1.6 `dbt clone --state <dir>`: clone the state's
        # relations into this target (pointer views on parquet)
        if not args.state:
            print("clone requires --state <dir>")
            return 2
        rr = runner.clone_from_state(args.state, select=args.select,
                                     exclude=args.exclude)
        return _print_results(rr)
    if cmd == "retry":
        # rerun exactly the nodes that errored/failed/skipped in the
        # previous invocation's run_results.json (reference `dbt retry`)
        rr_path = Path(args.project_dir) / "target" / "run_results.json"
        if not rr_path.exists():
            print("No target/run_results.json — nothing to retry.")
            return 2
        prev = json.loads(rr_path.read_text())
        failed = {r["unique_id"] for r in prev.get("results", [])
                  if r.get("status") in ("error", "fail", "skipped")}
        if not failed:
            print("Nothing to retry: previous run fully succeeded.")
            return 0
        rr = runner.run(uids=failed, threads=args.threads,
                        full_refresh=args.full_refresh)
        return _print_results(rr)
    if cmd == "docs":
        # docs generate: introspect built relations -> target/catalog.json
        # (reference: DESCRIBE-based metadata catalog build); the writer
        # lives in the runner and also refreshes the file after `run`.
        runner.parse()
        catalog = runner.generate_catalog()
        print(f"Wrote {Path(args.project_dir) / 'target' / 'catalog.json'} "
              f"({len(catalog.get('nodes', {}))} nodes)")
        return 0
    if cmd == "typecheck":
        # static funcsign validation (reference: dbt-jinja-utils
        # typecheck.rs) — no SQL runs, exit 1 on any diagnostic
        from dbt_fusion_spark.jinja.typecheck import typecheck_project

        runner.parse()
        problems = typecheck_project(runner.project)
        for p in problems:
            print(f"TYPECHECK {p}")
        print(f"{len(problems)} problem(s)")
        return 1 if problems else 0
    if cmd == "lineage":
        # Column-level lineage via Spark's analyzed plans (sql/lineage.py)
        # — the reference computes this with its own SQL frontend
        # (crates/dbt-sql static analysis); Spark's analyzer is ours.
        # Requires upstream relations to exist (run/build first): the
        # analyzer resolves names against the live catalog, and lineage
        # stops at each model's IMMEDIATE parents (view/table bounds).
        from dbt_fusion_spark.sql.lineage import column_lineage

        runner.parse()
        out: dict = {}
        for uid, node in runner.project.nodes.items():
            if (node.resource_type != "model"
                    or node.config.get("language") == "python"):
                continue
            try:
                out[uid] = column_lineage(spark, runner.compile(node))
            except Exception as e:  # unresolvable ref = not built yet
                out[uid] = {"error": str(e).splitlines()[0][:300]}
        dest = Path(args.project_dir) / "target" / "lineage.json"
        dest.parent.mkdir(parents=True, exist_ok=True)
        dest.write_text(json.dumps(out, indent=1, sort_keys=True))
        n_err = sum(1 for v in out.values() if "error" in v)
        print(f"Wrote {dest} ({len(out)} models, {n_err} unresolved)")
        return 1 if n_err else 0
    if cmd == "compile":
        runner.parse()
        outdir = Path(args.project_dir) / "target" / "compiled"
        for uid, node in runner.project.nodes.items():
            if (node.resource_type not in ("model", "analysis")
                    or node.config.get("language") == "python"):
                continue
            sql = runner.compile(node)
            dest = outdir / (node.path or f"{node.name}.sql")
            dest.parent.mkdir(parents=True, exist_ok=True)
            dest.write_text(sql)
            print(f"Compiled {uid} -> {dest}")
        return 0

    # run / test / build / seed / snapshot
    rr = runner.run(
        select=args.select, exclude=args.exclude, selector=args.selector,
        full_refresh=args.full_refresh, threads=args.threads,
        state_dir=args.state, defer=args.defer,
        include_tests=(cmd in ("test", "build")),
        resource_types=_RESOURCE_TYPES[cmd],
        empty=getattr(args, "empty", False),
        fail_fast=getattr(args, "fail_fast", False),
        sample=getattr(args, "sample", None))
    return _print_results(rr)


if __name__ == "__main__":
    sys.exit(main())
