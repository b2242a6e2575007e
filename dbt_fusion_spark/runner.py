"""The runner: parse -> compile -> schedule -> materialize -> artifacts.

Re-expresses the reference's execute_all_phases
(crates/dbt-sa-cli/src/dbt_sa_lib.rs:205-265): load (dbt-loader),
resolve (dbt-parser resolver.rs:82-265, parse contexts), manifest
(manifest.rs, dbt_sa_lib.rs:250-256), then the run loop (run contexts
run_node_context.rs:65-313 + materialization dispatch
materialization_resolver.rs) with DAG waves (dbt-dag schedule.rs:22)
executed across threads (profile `threads`, dbt_sa_lib.rs:218).

Spark concurrency: the driver is thread-safe; each thread submits
independent jobs, so a wave of N models runs N concurrent Spark jobs
sharing the executor pool.
"""

from __future__ import annotations

import json
import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import SparkSession

from dbt_fusion_spark.adapter import SparkAdapter
from dbt_fusion_spark.dag import Dag, select_by_definition, select_nodes
from dbt_fusion_spark.jinja import (CompileError, compile_node,
                                    parse_node)
from dbt_fusion_spark.materializations.executors import (
    materialize_clone,
    materialize_function,
    materialize_incremental,
    materialize_materialized_view,
    materialize_seed,
    materialize_snapshot,
    materialize_table,
    materialize_view,
    run_generic_test,
)
from dbt_fusion_spark.project import load_project
from dbt_fusion_spark.snapshots import SnapshotConfig


class CancellationToken:
    """Run-wide cancellation (reference: crates/dbt-cancel's
    CancellationToken threaded through the adapter engine so ctrl-C
    cancels in-flight warehouse statements and marks the rest of the
    DAG skipped).

    Spark-native shape: every node executes inside its own Spark job
    group (``sc.setJobGroup(unique_id, ..., interruptOnCancel=True)``
    — job groups are thread-local, and each node runs on its own pool
    thread).  ``cancel()`` flips the flag and calls
    ``sc.cancelJobGroup`` for every registered in-flight node, so
    running warehouse work stops NOW — not after the current action
    finishes — and no orphan Spark jobs outlive the run.  In-flight
    nodes surface as status ``cancelled``; nodes not yet started are
    ``skipped`` (Cancellable::Cancelled semantics).
    """

    def __init__(self):
        self._flag = threading.Event()
        self._lock = threading.Lock()
        self._active: dict[str, object] = {}  # uid -> SparkContext

    @property
    def is_cancelled(self) -> bool:
        return self._flag.is_set()

    def register(self, uid: str, sc) -> None:
        with self._lock:
            self._active[uid] = sc
        if self._flag.is_set():  # lost the race with cancel()
            sc.cancelJobGroup(uid)

    def deregister(self, uid: str) -> None:
        with self._lock:
            self._active.pop(uid, None)

    def cancel(self) -> None:
        self._flag.set()
        # cancelJobGroup only kills jobs ACTIVE at call time — a node
        # cancelled between two of its jobs (compile, staging writes)
        # would happily start the next one.  Sweep: keep re-cancelling
        # registered groups until every in-flight node deregisters
        # (the adapter's pre-statement check stops new statements, so
        # the sweep converges; bounded as a backstop).
        def _sweep():
            for _ in range(150):  # 30 s grace
                with self._lock:
                    active = list(self._active.items())
                if not active:
                    return
                for uid, sc in active:
                    try:
                        sc.cancelJobGroup(uid)
                    except Exception:  # noqa: BLE001 — teardown
                        pass
                time.sleep(0.2)

        threading.Thread(target=_sweep, daemon=True).start()


@dataclass
class NodeResult:
    unique_id: str
    status: str          # success | error | pass | warn | fail |
    #                      skipped | cancelled
    message: str = ""
    execution_time: float = 0.0


@dataclass
class RunResults:
    results: list[NodeResult] = field(default_factory=list)
    elapsed: float = 0.0

    @property
    def ok(self) -> bool:
        return all(r.status in ("success", "pass", "warn", "skipped")
                   for r in self.results)

    def to_dict(self) -> dict:
        return {
            "elapsed_time": self.elapsed,
            "results": [
                {"unique_id": r.unique_id, "status": r.status,
                 "message": r.message, "execution_time": r.execution_time}
                for r in self.results
            ],
        }


class DbtSparkRunner:
    def __init__(self, spark: SparkSession, project_dir: str,
                 profile: dict | None = None, vars: dict | None = None):
        self.spark = spark
        self.project = load_project(project_dir, profile=profile,
                                    vars_overrides=vars)
        self.adapter = SparkAdapter(spark,
                                    default_schema=self.project.default_schema)
        self.dag: Dag | None = None
        self._parsed = False
        # continuous streaming queries started by streaming_table /
        # dynamic_table models with a target_lag (caller manages lifetime)
        self.streams: list = []
        # standardized grants recorded per node (no GRANT DDL in the
        # Spark session catalog — see _apply_grants)
        self.applied_grants: dict[str, dict] = {}
        # --defer: previous-state manifest used to resolve refs to
        # relations not built locally (prev_state/mod.rs)
        self._defer_manifest: dict | None = None

    # ------------------------------------------------------------- parse
    def parse(self) -> None:
        import re as _re

        from dbt_fusion_spark.jinja.environment import resolve_ref_uid

        proj = self.project
        for node in proj.nodes.values():
            if node.resource_type in ("model", "snapshot", "analysis"):
                parse_node(proj, node)
            node.schema = node.config.get("schema") or proj.default_schema
        # generic-test args holding ref()/source() (relationships `to:`)
        # introduce real DAG edges — the target must build first
        for node in proj.nodes.values():
            if node.resource_type != "test" or node.config.get("custom"):
                continue
            for v in (node.config.get("kwargs") or {}).values():
                if not isinstance(v, str):
                    continue
                m = _re.fullmatch(
                    r"\s*ref\(\s*'([^']+)'\s*(?:,\s*'([^']+)'\s*)?\)\s*", v)
                if m:
                    uid = resolve_ref_uid(
                        proj, node, *[a for a in m.groups() if a])
                    if uid and uid not in node.depends_on:
                        node.depends_on.append(uid)
        # model access enforcement (dbt 1.5 groups; nodes.rs groups
        # map): a `private` model may only be ref'd from its own group.
        # `protected` (the default) stays pass-through — within one
        # installation cross-package refs are legal; only cross-PROJECT
        # mesh refs would gate on it, and there is one project here.
        for node in proj.nodes.values():
            if node.resource_type != "model":
                continue  # analyses/tests are project-internal ad-hoc
            for dep_uid in node.depends_on:
                dep = proj.nodes.get(dep_uid)
                if dep is None or dep.config.get("access") != "private":
                    continue
                grp = dep.config.get("group")
                if grp and node.config.get("group") != grp:
                    raise CompileError(
                        f"{node.unique_id} cannot ref private model "
                        f"{dep_uid} (group {grp!r})")
        self.dag = Dag({uid: n.depends_on for uid, n in proj.nodes.items()})
        self._parsed = True

    # ----------------------------------------------------------- resolve
    def relation_for(self, uid: str) -> str:
        proj = self.project
        if uid.startswith("source."):
            src = proj.sources[uid]
            location = src.config.get("location")
            schema, ident = src.config["schema"], src.config["identifier"]
            if location:
                # register as an external table (metadata only, no copy):
                # persistent views may not reference temp views, and at
                # scale sources ARE catalog tables. The source CONFIG is
                # the source of truth: if a previous registration (same
                # catalog, different project/environment) points at a
                # different location, re-register — IF NOT EXISTS alone
                # would silently read the stale data root.
                fmt = src.config.get("format", "parquet")
                self.adapter.create_schema(schema)
                if self.spark.catalog.tableExists(f"`{schema}`.`{ident}`"):
                    current = next(
                        (r["data_type"] for r in self.spark.sql(
                            f"DESCRIBE TABLE EXTENDED `{schema}`.`{ident}`"
                        ).collect() if r["col_name"] == "Location"), None)
                    if current is not None and \
                            current.removeprefix("file:") != \
                            str(location).removeprefix("file:"):
                        self.spark.sql(
                            f"DROP TABLE `{schema}`.`{ident}`")
                self.spark.sql(
                    f"CREATE TABLE IF NOT EXISTS `{schema}`.`{ident}` "
                    f"USING {fmt} LOCATION '{location}'"
                )
            return f"`{schema}`.`{ident}`"
        node = proj.nodes[uid]
        # --defer: a ref to a relation missing locally resolves to the
        # previous state's (e.g. prod) schema.alias instead
        if (self._defer_manifest is not None
                and node.resource_type in ("model", "seed", "snapshot")
                and not node.is_ephemeral
                and not self.spark.catalog.tableExists(
                    f"{node.schema}.{node.identifier}")):
            prev = self._defer_manifest.get("nodes", {}).get(uid)
            if prev is not None:
                return f"`{prev['schema']}`.`{prev['alias']}`"
        return node.relation_name()

    def compile(self, node, is_incremental: bool = False) -> str:
        sql = compile_node(self.project, node, self.relation_for,
                           adapter=self.adapter, is_incremental=is_incremental,
                           empty=getattr(self, "_empty", False)
                           and node.resource_type == "model",
                           sample=getattr(self, "_sample", None))
        # dialect translation AFTER jinja render (dbt-sql lexers in the
        # reference; node `dialect:` config wins over project flag)
        dialect = node.config.get("dialect") or self.project.flags.get(
            "sql_dialect")
        if dialect:
            from dbt_fusion_spark.sql import translate_sql
            sql = translate_sql(sql, dialect)
        node.compiled_code = sql
        return sql

    # --------------------------------------------------------------- run
    def run(self, select: str | None = None, exclude: str | None = None,
            full_refresh: bool = False, include_tests: bool = True,
            threads: int | None = None,
            state_dir: str | None = None,
            defer: bool = False,
            selector: str | None = None,
            resource_types: set[str] | None = None,
            uids: set[str] | None = None,
            empty: bool = False,
            fail_fast: bool = False,
            sample: str | dict | None = None) -> RunResults:
        # dbt --empty: schema-only dry run — model inputs are wrapped
        # to zero rows at compile time (environment.compile_node)
        self._empty = empty
        # dbt --sample: event_time run filter (filter.rs / dbt-core
        # sample_window); inputs with event_time compile wrapped
        self._sample = parse_sample_spec(sample) if sample else None
        if not self._parsed:
            self.parse()
        t_start = time.perf_counter()
        proj = self.project
        self.adapter.create_schema(proj.default_schema)
        for schema in {n.schema for n in proj.nodes.values() if n.schema}:
            self.adapter.create_schema(schema)

        # state:modified / state:new compare against a previous manifest
        # (prev_state/mod.rs; --state flag in the reference CLI)
        prev_manifest = None
        if state_dir is not None:
            prev_manifest = json.loads(
                (Path(state_dir) / "manifest.json").read_text())
        self._defer_manifest = prev_manifest if defer else None

        if uids is not None:
            # exact node set (dbt retry: rerun the run_results failures
            # verbatim — name-glob selection could over-match)
            selected = {u for u in uids if u in proj.nodes}
        elif selector is not None:
            # named selector from selectors.yml (dbt-selector-parser)
            if selector not in proj.selectors:
                raise ValueError(f"unknown selector {selector!r}")
            selected = select_by_definition(
                proj, self.dag, proj.selectors[selector],
                prev_manifest=prev_manifest)
            if exclude:
                selected -= select_nodes(proj, self.dag, exclude,
                                         prev_manifest=prev_manifest)
        else:
            selected = select_nodes(proj, self.dag, select, exclude,
                                    prev_manifest=prev_manifest)

        # project-level hooks (common.rs:810-830 run-level variant)
        for sql in proj.on_run_start:
            self.adapter.execute(sql)
        if not include_tests:
            selected = {u for u in selected
                        if proj.nodes[u].resource_type != "test"}
        if resource_types is not None:
            # dbt command semantics: `run` executes models only, `seed`
            # seeds, `snapshot` snapshots, `test` tests; `build` passes
            # None and executes everything DAG-ordered.
            selected = {u for u in selected
                        if proj.nodes[u].resource_type in resource_types}
        # semantic-layer nodes are manifest/selection-only, never
        # executed; analyses are compile-only (nodes.rs analyses map)
        selected = {u for u in selected
                    if proj.nodes[u].resource_type not in
                    ("semantic_model", "metric", "saved_query",
                     "analysis")}
        threads = threads or proj.profile.get("threads", 4)
        results: dict[str, NodeResult] = {}
        failed: set[str] = set()

        # run cancellation (crates/dbt-cancel): one token per run;
        # ctrl-C (SIGINT, main-thread runs only — signal handlers are
        # main-thread-only in Python) and runner.cancel() both flip it
        token = CancellationToken()
        self.cancellation_token = token
        # thread the token into the adapter: statements check it
        # before starting and never retry after it trips
        self.adapter.cancellation_check = lambda: token.is_cancelled
        prev_sigint = None
        if threading.current_thread() is threading.main_thread():
            import signal

            prev_sigint = signal.getsignal(signal.SIGINT)

            def _on_sigint(signum, frame):
                token.cancel()

            signal.signal(signal.SIGINT, _on_sigint)

        aborted = False
        try:
            for wave in self.dag.generations():
                runnable = [u for u in wave if u in selected]
                if not runnable:
                    continue
                if aborted or token.is_cancelled:
                    # dbt --fail-fast / cancellation: nodes not yet
                    # scheduled when the trigger fired are skipped,
                    # not run (Cancellable::Cancelled semantics)
                    why = "fail-fast" if aborted else "run cancelled"
                    for uid in runnable:
                        results[uid] = NodeResult(uid, "skipped", why)
                    continue
                with ThreadPoolExecutor(max_workers=threads) as pool:
                    futs = {}
                    for uid in runnable:
                        if any(d in failed
                               for d in self.dag.deps.get(uid, [])):
                            results[uid] = NodeResult(uid, "skipped",
                                                      "upstream failure")
                            failed.add(uid)
                            continue
                        futs[uid] = pool.submit(self._run_node, uid,
                                                full_refresh, token)
                    # consume in COMPLETION order: a fail-fast or
                    # cancel trigger from a fast-failing node must not
                    # wait behind a slow sibling earlier in the wave
                    from concurrent.futures import as_completed

                    futmap = {fut: uid for uid, fut in futs.items()}
                    for fut in as_completed(futmap):
                        uid = futmap[fut]
                        res = fut.result()
                        results[uid] = res
                        if res.status in ("error", "fail"):
                            failed.add(uid)
                            if fail_fast:
                                aborted = True
                                # stop in-flight siblings NOW, not
                                # after their current action finishes
                                token.cancel()
                        if res.status == "cancelled":
                            failed.add(uid)
        finally:
            self.adapter.cancellation_check = None
            if prev_sigint is not None:
                import signal

                signal.signal(signal.SIGINT, prev_sigint)

        for sql in proj.on_run_end:
            self.adapter.execute(sql)

        rr = RunResults(list(results.values()), time.perf_counter() - t_start)
        self.write_artifacts(rr)
        return rr

    def cancel(self) -> None:
        """Cancel the in-progress run(): in-flight nodes' Spark job
        groups are cancelled (status `cancelled`), unscheduled nodes
        are `skipped` — the programmatic twin of ctrl-C."""
        token = getattr(self, "cancellation_token", None)
        if token is not None:
            token.cancel()

    def _run_node(self, uid: str, full_refresh: bool,
                  token: CancellationToken | None = None) -> NodeResult:
        node = self.project.nodes[uid]
        t0 = time.perf_counter()
        sc = self.spark.sparkContext
        if token is not None:
            if token.is_cancelled:
                return NodeResult(uid, "cancelled", "run cancelled")
            # every Spark job this node's thread submits joins the
            # uid-named group; cancelJobGroup(uid) then interrupts
            # exactly this node's in-flight work (job groups are
            # thread-local; pinned-thread mode is the pyspark default)
            sc.setJobGroup(uid, f"dbt node {uid}",
                           interruptOnCancel=True)
            token.register(uid, sc)
        try:
            msg = self._materialize(node, full_refresh)
            status = "success"
            if node.resource_type in ("test", "unit_test"):
                status = msg  # pass | warn | fail
                msg = ""
        except Exception as e:  # noqa: BLE001 — node errors become results
            if token is not None and token.is_cancelled:
                return NodeResult(uid, "cancelled", "run cancelled",
                                  time.perf_counter() - t0)
            return NodeResult(uid, "error", str(e)[:500],
                              time.perf_counter() - t0)
        finally:
            if token is not None:
                token.deregister(uid)
                sc.setJobGroup("", "")
        # a cancel that landed after the last action finished: the
        # node's work completed, report it as such
        return NodeResult(uid, status, msg, time.perf_counter() - t0)

    def _enforce_contract(self, node, sql: str) -> None:
        """dbt model contracts (DbtContract, common.rs:531-552 with
        `enforced`): the compiled SELECT's schema must match the
        declared columns exactly — names AND types — BEFORE anything
        is built. Schema comes from analysis only (spark.sql().schema
        is lazy), so a violated contract costs zero execution."""
        cfg = node.config.get("contract") or {}
        enforced = cfg.get("enforced") if isinstance(cfg, dict) else cfg
        if not enforced:
            return
        actual = {f.name.lower(): f.dataType.simpleString()
                  for f in self.spark.sql(sql).schema.fields}
        declared = {n.lower(): (c.get("data_type") or "").lower()
                    .replace(" ", "")
                    for n, c in node.columns.items()}
        problems = []
        for n in declared:
            if n not in actual:
                problems.append(f"declared column {n!r} missing")
            elif declared[n] and declared[n] != actual[n].replace(" ", ""):
                problems.append(
                    f"{n!r}: declared {declared[n]}, got {actual[n]}")
        problems += [f"undeclared column {n!r}" for n in actual
                     if n not in declared]
        if problems:
            raise CompileError(
                f"{node.unique_id}: contract violated — "
                + "; ".join(problems))

    def clone_from_state(self, state_dir: str,
                         select: str | None = None,
                         exclude: str | None = None) -> RunResults:
        """`dbt clone` (reference CLI, dbt 1.6): for each selected
        relation-producing node in the --state manifest, clone the
        state's relation into this target's schema — pointer views on
        plain parquet (materialize_clone's fallback), so dev schemas
        materialize instantly against prod data."""
        import time as _time

        from dbt_fusion_spark.materializations.executors import (
            materialize_clone as _clone,
        )

        if not self._parsed:
            self.parse()
        t0 = _time.perf_counter()
        prev = json.loads(
            (Path(state_dir) / "manifest.json").read_text())
        selected = select_nodes(self.project, self.dag, select, exclude,
                                prev_manifest=prev)
        self.adapter.create_schema(self.project.default_schema)
        results = []
        for uid in sorted(selected):
            node = self.project.nodes[uid]
            if node.resource_type not in ("model", "seed", "snapshot") \
                    or node.is_ephemeral:
                continue
            src = prev["nodes"].get(uid)
            if src is None or not src.get("schema"):
                results.append(NodeResult(uid, "skipped",
                                          "not in state manifest"))
                continue
            t1 = _time.perf_counter()
            try:
                msg = _clone(self.adapter, node.schema, node.identifier,
                             f"`{src['schema']}`.`{src['alias']}`")
                results.append(NodeResult(uid, "success", msg,
                                          _time.perf_counter() - t1))
            except Exception as e:  # noqa: BLE001
                results.append(NodeResult(uid, "error", str(e)[:500],
                                          _time.perf_counter() - t1))
        rr = RunResults(results, _time.perf_counter() - t0)
        self.write_artifacts(rr)
        return rr

    def _hooks(self, node, key: str) -> None:
        hooks = node.config.get(key) or []
        if isinstance(hooks, str):
            hooks = [hooks]
        for h in hooks:
            self.adapter.execute(h)

    def _render_test_kwargs(self, node, kwargs: dict) -> dict:
        """schema.yml test args may hold ref()/source() expressions
        (e.g. relationships' `to: ref('customers')`) — resolve them to
        relation names (generic_test_context rendering in the ref)."""
        import re as _re

        from dbt_fusion_spark.jinja.environment import resolve_ref_uid

        def render(v):
            if not isinstance(v, str):
                return v
            m = _re.fullmatch(r"\s*ref\(\s*'([^']+)'\s*(?:,\s*'([^']+)'\s*)?\)\s*", v)
            if m:
                args = [a for a in (m.group(1), m.group(2)) if a]
                uid = resolve_ref_uid(self.project, node, *args)
                if uid is None:
                    raise ValueError(f"{node.unique_id}: unknown ref in test arg {v!r}")
                return self.relation_for(uid)
            m = _re.fullmatch(r"\s*source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*", v)
            if m:
                return self.relation_for(
                    f"source.{self.project.name}.{m.group(1)}.{m.group(2)}")
            return v

        return {k: render(v) for k, v in kwargs.items()}

    def _materialize(self, node, full_refresh: bool) -> str:
        rt = node.resource_type
        if rt == "unit_test":
            return self._run_unit_test(node)
        if rt == "test":
            cfg = node.config
            model_uid = node.depends_on[0]
            if cfg.get("custom"):
                # {% test %}-block test: raw_code is a call to the
                # rewritten test_<name> macro; compile resolves ref()
                from dbt_fusion_spark.testing.generic import (
                    TestResult,
                    get_test_sql,
                )
                main_sql = self.compile(node)
                row = self.spark.sql(get_test_sql(main_sql)).collect()[0]
                res = TestResult(row["failures"], bool(row["should_warn"]),
                                 bool(row["should_error"]))
            else:
                res = run_generic_test(
                    self.adapter, cfg["test_type"],
                    self.relation_for(model_uid), cfg["column_name"],
                    self._render_test_kwargs(node, cfg["kwargs"]),
                )
            if res.should_error and cfg.get("severity", "error") == "error":
                return "fail"
            return "warn" if res.should_warn else "pass"

        if rt == "seed":
            return materialize_seed(
                self.adapter, node.schema, node.identifier,
                str(self.project.root / node.path),
                column_types=node.config.get("column_types"),
            )

        self._hooks(node, "pre_hook")
        # sql_header config (run_node_context.rs sql_header): session
        # statements (SET ...) executed before the node's main DDL/DML
        if node.config.get("sql_header"):
            self.adapter.execute(node.config["sql_header"])
        if rt == "snapshot":
            sql = self.compile(node)
            cfg = SnapshotConfig(
                unique_key=node.config["unique_key"],
                strategy=node.config.get("strategy", "timestamp"),
                updated_at=node.config.get("updated_at"),
                check_cols=node.config.get("check_cols", "all"),
                hard_deletes=node.config.get("hard_deletes", "ignore"),
            )
            out = materialize_snapshot(
                self.adapter, node.schema, node.identifier, sql, cfg,
                partition_by=node.config.get("partition_by"),
                salt_threshold=node.config.get("salt_threshold"))
        elif rt == "model" and node.config.get("language") == "python":
            out = self._run_python_model(node, full_refresh)
        elif rt == "model":
            mat = node.materialized
            if mat == "ephemeral":
                return "EPHEMERAL (inlined downstream)"
            if mat in ("streaming_table", "dynamic_table"):
                return self._run_streaming_model(node)
            exists = self.adapter.get_relation(
                None, node.schema, node.identifier, use_cache=False)
            sql = self.compile(
                node,
                is_incremental=(mat == "incremental" and exists is not None
                                and not full_refresh),
            )
            self._enforce_contract(node, sql)
            if mat == "view":
                out = materialize_view(self.adapter, node.schema,
                                       node.identifier, sql)
            elif mat == "table":
                out = materialize_table(self.adapter, node.schema,
                                        node.identifier, sql,
                                        node.config.get("partition_by"),
                                        node.config.get("bucket_by"),
                                        node.config.get("buckets"),
                                        node.config.get("file_format"),
                                        node.config.get("zorder_by"))
            elif mat == "materialized_view":
                out = materialize_materialized_view(
                    self.adapter, node.schema, node.identifier, sql,
                    node.config.get("on_configuration_change", "apply"))
            elif mat == "clone":
                out = materialize_clone(
                    self.adapter, node.schema, node.identifier,
                    self.relation_for(node.depends_on[0]),
                    copy=bool(node.config.get("copy")),
                    file_format=node.config.get("file_format"))
            elif mat == "function":
                out = materialize_function(self.adapter, node.schema,
                                           node.identifier, sql, node.config)
            elif mat == "incremental":
                out = materialize_incremental(
                    self.adapter, node.schema, node.identifier, sql,
                    strategy=node.config.get(
                        "incremental_strategy",
                        "merge" if node.config.get("unique_key") else "append"),
                    unique_key=node.config.get("unique_key"),
                    partition_by=node.config.get("partition_by"),
                    on_schema_change=node.config.get("on_schema_change", "ignore"),
                    full_refresh=full_refresh or bool(node.config.get("full_refresh")),
                    merge_update_columns=node.config.get("merge_update_columns"),
                    merge_exclude_columns=node.config.get("merge_exclude_columns"),
                    incremental_predicates=node.config.get("incremental_predicates"),
                    event_time=node.config.get("event_time"),
                    batch_size=node.config.get("batch_size", "day"),
                    lookback=int(node.config.get("lookback", 1)),
                    begin=node.config.get("begin"),
                    file_format=node.config.get("file_format"),
                    salt_threshold=node.config.get("salt_threshold"),
                )
            elif mat in self.project.custom_materializations:
                out = self._run_custom_materialization(node, sql)
            else:
                raise ValueError(f"unsupported materialization {mat!r}")
        else:
            raise ValueError(f"unsupported resource_type {rt!r}")
        self._hooks(node, "post_hook")
        if rt in ("model", "seed", "snapshot"):
            self._validate_constraints(node)
            self._persist_docs(node)
            self._apply_grants(node)
        return out

    def _run_custom_materialization(self, node, sql: str) -> str:
        """{% materialization %}-block materialization: render the
        rewritten materialization_<name>_<adapter> macro under the run
        context with `sql`/`this` bound to this node — the body's
        {% call statement %} blocks execute its DDL/DML
        (materialization_resolver.rs custom dispatch; adapter-specific
        beats default, locality Core < Imported < Root)."""
        from dbt_fusion_spark.jinja import compile_node
        from dbt_fusion_spark.project.nodes import Node
        mat = node.materialized
        adapters = self.project.custom_materializations[mat]
        adapter_name = "spark" if "spark" in adapters else "default"
        call = Node(
            unique_id=f"materialization.{node.unique_id}", name=node.name,
            resource_type="model", package=node.package, path=node.path,
            raw_code="{{ materialization_%s_%s() }}" % (mat, adapter_name))
        call.schema, call.alias = node.schema, node.identifier
        compile_node(self.project, call, self.relation_for,
                     adapter=self.adapter, extra_ctx={"sql": sql})
        return f"CUSTOM {mat} ({adapter_name})"

    def _validate_constraints(self, node) -> None:
        """Constraints (common.rs:634-670: not_null/unique/primary_key/
        foreign_key/check) under ConstraintSupport::NotEnforced:
        parquet tables can't enforce DDL constraints, so the engine
        validates by query after the build (render_constraint.rs's
        documented fallback) and fails the node on violations."""
        rel = node.relation_name()

        def violated(sql: str) -> int:
            return self.spark.sql(sql).collect()[0][0]

        def validate(col: str | None, c: dict) -> None:
            ctype = c.get("type")
            if ctype == "not_null":
                n = violated(f"SELECT COUNT(*) FROM {rel} WHERE `{col}` IS NULL")
                kind = f"not_null({col})"
            elif ctype in ("unique", "primary_key"):
                cols = c.get("columns") or [col]
                key = ", ".join(f"`{x}`" for x in cols)
                n = violated(
                    f"SELECT COUNT(*) FROM (SELECT {key} FROM {rel} "
                    f"GROUP BY {key} HAVING COUNT(*) > 1) __dups")
                if ctype == "primary_key":
                    n += violated(
                        f"SELECT COUNT(*) FROM {rel} WHERE "
                        + " OR ".join(f"`{x}` IS NULL" for x in cols))
                kind = f"{ctype}({cols})"
            elif ctype == "check":
                n = violated(
                    f"SELECT COUNT(*) FROM {rel} "
                    f"WHERE NOT ({c['expression']})")
                kind = f"check({c['expression']})"
            elif ctype == "foreign_key":
                to_cols = ", ".join(
                    f"`{x}`" for x in (c.get("to_columns") or [col]))
                n = violated(
                    f"SELECT COUNT(*) FROM {rel} WHERE `{col}` IS NOT NULL "
                    f"AND `{col}` NOT IN (SELECT {to_cols} FROM {c['to']})")
                kind = f"foreign_key({col} -> {c['to']})"
            else:
                return  # custom: not validatable generically
            if n:
                raise RuntimeError(
                    f"constraint violation: {kind} on {rel} ({n} rows)")

        for col, meta in node.columns.items():
            for c in (meta or {}).get("constraints") or []:
                validate(col, c if isinstance(c, dict) else {"type": c})
        for c in node.config.get("model_constraints") or []:
            validate(None, c)

    def _persist_docs(self, node) -> None:
        """adapters/persist_docs.sql + get_persist_doc_columns
        (base_adapter.rs:1047): relation and column comments become
        COMMENT ON / ALTER COLUMN DDL when persist_docs is configured."""
        cfg = node.config.get("persist_docs") or {}
        rel = node.relation_name()

        def q(s: str) -> str:
            return s.replace("'", "\\'")

        if cfg.get("relation") and node.description:
            self.adapter.execute(
                f"COMMENT ON TABLE {rel} IS '{q(node.description)}'")
        if cfg.get("columns"):
            for col, meta in node.columns.items():
                desc = (meta or {}).get("description")
                if desc:
                    self.adapter.execute(
                        f"ALTER TABLE {rel} ALTER COLUMN `{col}` "
                        f"COMMENT '{q(desc)}'")

    def _apply_grants(self, node) -> None:
        """apply_grants.sql + standardize_grants_dict
        (base_adapter.rs:192): normalize {privilege: grantee|[grantees]}.
        The Spark session catalog has no GRANT statement, so grants are
        standardized and recorded (the reference's behavior for adapters
        without grant support is the same diff-then-skip)."""
        grants = node.config.get("grants")
        if not grants:
            return
        std = {
            str(priv).lower():
                [g] if isinstance(g, str) else [str(x) for x in g]
            for priv, g in grants.items()
        }
        self.applied_grants[node.unique_id] = std

    def _run_unit_test(self, node) -> str:
        """Unit-test node (materializations/tests/unit.sql +
        get_fixture_sql.sql:1-48): each `given` input becomes a typed
        literal CTE (Dict/Csv/Sql fixture formats, common.rs:759-780),
        the model SQL compiles with ref()/source() redirected to those
        CTEs, and actual-vs-expected compares via two-way EXCEPT ALL
        (helpers.sql:20-46)."""
        import csv as _csv
        import io
        import re as _re

        from dbt_fusion_spark.testing.unit import build_fixture_sql, unit_test_sql

        proj = self.project
        model = proj.nodes[f"model.{proj.name}.{node.config['model']}"]

        def parse_rows(spec) -> list[dict]:
            fmt = spec.get("format", "dict")
            rows = spec.get("rows")
            if fmt == "csv":
                return list(_csv.DictReader(io.StringIO(rows)))
            return rows or []

        def input_columns(uid: str) -> dict[str, str]:
            rel = self.relation_for(uid)
            return {c.name: c.data_type
                    for c in self.adapter.get_columns_in_relation(rel)}

        fixtures: dict[str, str] = {}
        redirect: dict[str, str] = {}
        for giv in node.config["given"]:
            inp = giv["input"].strip()
            m = _re.match(r"ref\(\s*'([^']+)'\s*\)", inp)
            if m:
                name = m.group(1)
                uid = next(u for u in (f"model.{proj.name}.{name}",
                                       f"seed.{proj.name}.{name}",
                                       f"snapshot.{proj.name}.{name}")
                           if u in proj.nodes)
            else:
                m = _re.match(r"source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)", inp)
                uid = f"source.{proj.name}.{m.group(1)}.{m.group(2)}"
            cte = f"__dbt_fixture_{len(fixtures)}"
            if giv.get("format") == "sql":
                fixtures[cte] = giv["rows"]
            else:
                fixtures[cte] = build_fixture_sql(parse_rows(giv),
                                                  input_columns(uid))
            redirect[uid] = cte

        def rel_for(uid: str) -> str:
            return redirect.get(uid) or self.relation_for(uid)

        # dbt 1.8 unit-test overrides (UnitTestOverrides,
        # unit_test_properties.rs:29-33): vars/env_vars swap the context
        # functions; macro overrides append {% macro %} redefinitions
        # (a later definition rebinds the name), returning the literal.
        ov = node.config.get("overrides") or {}
        extra_ctx: dict = {}
        if ov.get("vars"):
            merged = {**proj.vars, **ov["vars"]}
            extra_ctx["var"] = (
                lambda name, default=None, _m=merged: _m.get(name, default))
        if ov.get("env_vars"):
            env_ov = ov["env_vars"]
            extra_ctx["env_var"] = (
                lambda name, default=None, _e=env_ov:
                _e[name] if name in _e
                else os.environ.get(name, default))
        extra_macros = "".join(
            # referencing varargs/kwargs lets callers pass any args
            "{% macro " + mname + "() %}"
            "{% set _v = varargs %}{% set _k = kwargs %}"
            + str(mval)
            + "{% endmacro %}\n"
            for mname, mval in (ov.get("macros") or {}).items()
            if "." not in mname)
        for mname, mval in (ov.get("macros") or {}).items():
            if "." in mname:  # namespaced: dbt.current_timestamp etc.
                ns_name, attr = mname.split(".", 1)
                base = extra_ctx.get(ns_name)
                if base is None:
                    from dbt_fusion_spark.jinja.environment import (
                        _common_context)
                    base = _common_context(proj, model).get(ns_name)
                if base is not None:
                    import copy as _copy
                    ns = _copy.copy(base)
                    setattr(ns, attr,
                            lambda *a, _v=mval, **k: str(_v))
                    extra_ctx[ns_name] = ns

        model_sql = compile_node(proj, model, rel_for, adapter=self.adapter,
                                 extra_ctx=extra_ctx or None,
                                 extra_macros=extra_macros)

        exp_rows = parse_rows(node.config["expect"])
        exp_cols = list(dict.fromkeys(k for r in exp_rows for k in r))
        # expected literal types come from the actual output schema
        # (lazy analysis only — get_column_schema_from_query)
        probe = (
            "WITH " + ",\n".join(f"{k} AS (\n{v}\n)" for k, v in fixtures.items())
            + f"\nSELECT * FROM (\n{model_sql}\n) __dbt_ut_probe"
            if fixtures else model_sql
        )
        schema = {c.name: c.data_type
                  for c in self.adapter.get_column_schema_from_query(probe)}
        expected_sql = build_fixture_sql(
            exp_rows, {c: schema.get(c, "string") for c in exp_cols})
        actual_sql = (f"SELECT {', '.join(exp_cols)} FROM (\n{model_sql}\n)"
                      " __dbt_ut_actual")
        diff = self.spark.sql(unit_test_sql(actual_sql, fixtures, expected_sql))
        return "pass" if diff.isEmpty() else "fail"

    def _run_streaming_model(self, node) -> str:
        """streaming_table (databricks streaming_table.rs:16) and
        dynamic_table (snowflake dynamic_table.rs:129-291) as real
        Structured Streaming: each source dependency becomes a
        readStream temp view, the model SQL runs against it (yielding a
        streaming DataFrame), and the result lands via writeStream.
        No target_lag -> trigger(availableNow) backfill that terminates
        (the microbatch-shaped default); target_lag ->
        trigger(processingTime=lag), query handle kept in self.streams."""
        import os

        spark = self.spark
        proj = self.project

        def rel_for(uid: str) -> str:
            if uid.startswith("source."):
                src = proj.sources[uid]
                loc = src.config.get("location")
                if loc:
                    fmt = src.config.get("format", "parquet")
                    batch_schema = spark.read.format(fmt).load(loc).schema
                    d, base = os.path.split(loc)
                    reader = spark.readStream.schema(batch_schema).format(fmt)
                    # file-path source: stream the parent dir with a glob
                    # (the file-stream source wants a directory)
                    if "." in base:
                        sdf = reader.option("pathGlobFilter", base).load(d)
                    else:
                        sdf = reader.load(loc)
                    view = f"__dbt_stream_{src.config['identifier']}"
                    sdf.createOrReplaceTempView(view)
                    return view
            return self.relation_for(uid)

        sql = compile_node(proj, node, rel_for, adapter=self.adapter)
        node.compiled_code = sql
        sdf = spark.sql(sql)
        cfg = node.config
        mat = node.materialized
        output_mode = cfg.get("output_mode", "append")
        if mat == "dynamic_table" and cfg.get("refresh_mode") == "full":
            output_mode = "complete"
        ckpt = str(proj.root / "target" / "checkpoints" / node.name)
        writer = (sdf.writeStream.outputMode(output_mode)
                  .option("checkpointLocation", ckpt))
        target_lag = cfg.get("target_lag")
        if target_lag:
            q = writer.trigger(processingTime=target_lag).toTable(
                node.relation_name())
            self.streams.append(q)
            return f"STREAMING ({mat}, target_lag={target_lag})"
        q = writer.trigger(availableNow=True).toTable(node.relation_name())
        q.awaitTermination()
        return f"STREAMING ({mat}, availableNow backfill)"

    def _run_python_model(self, node, full_refresh: bool) -> str:
        """Python models run natively: `session` IS the SparkSession and
        dbt.ref() returns DataFrames — the place this engine is *more*
        natural than the reference, which ships python jobs to warehouse
        runtimes (base_adapter.rs:436 submit_python_job,
        crates/dbt-adapter/src/python/*.rs)."""
        runner = self

        class _Dbt:
            def ref(self, *args):
                name = args[-1]
                for uid in (f"model.{runner.project.name}.{name}",
                            f"seed.{runner.project.name}.{name}",
                            f"snapshot.{runner.project.name}.{name}"):
                    if uid in runner.project.nodes:
                        return runner.spark.table(runner.relation_for(uid))
                raise KeyError(f"unknown ref {name!r}")

            def source(self, src, tbl):
                return runner.spark.table(
                    runner.relation_for(
                        f"source.{runner.project.name}.{src}.{tbl}"))

            def config(self, **kwargs):  # captured statically at parse
                return None

            this = node.relation_name()

        namespace: dict = {}
        exec(compile(node.raw_code, node.path, "exec"), namespace)  # noqa: S102
        if "model" not in namespace:
            raise ValueError(f"{node.unique_id}: python model must define "
                             "model(dbt, session)")
        result = namespace["model"](_Dbt(), self.spark)
        # dbt python models may return pandas (or pandas-on-Spark)
        # frames; normalize to a Spark DataFrame (dbt-core contract)
        import pandas as pd
        if isinstance(result, pd.DataFrame):
            result = self.spark.createDataFrame(result)
        elif hasattr(result, "to_spark"):  # pandas-on-Spark
            result = result.to_spark()
        view = f"__dbt_py_{node.name}"
        result.createOrReplaceTempView(view)
        return materialize_table(self.adapter, node.schema, node.identifier,
                                 f"SELECT * FROM {view}",
                                 node.config.get("partition_by"))

    # --------------------------------------------------------- artifacts
    def write_artifacts(self, rr: RunResults) -> None:
        target = self.project.root / "target"
        target.mkdir(exist_ok=True)
        manifest = {
            "metadata": {"dbt_schema_version":
                         "https://schemas.getdbt.com/dbt/manifest/v12.json",
                         "project_name": self.project.name},
            "nodes": {uid: n.to_manifest_dict()
                      for uid, n in self.project.nodes.items()
                      if n.resource_type not in
                      ("semantic_model", "metric", "saved_query")},
            "sources": {uid: n.to_manifest_dict()
                        for uid, n in self.project.sources.items()},
            "exposures": dict(self.project.exposures),
            # semantic layer maps (manifest v12 top-level keys,
            # nodes.rs:2109-2111)
            "semantic_models": dict(self.project.semantic_models),
            "metrics": dict(self.project.metrics),
            "saved_queries": dict(self.project.saved_queries),
        }
        (target / "manifest.json").write_text(json.dumps(manifest, indent=1,
                                                         default=str))
        (target / "run_results.json").write_text(json.dumps(rr.to_dict(),
                                                            indent=1))

    # ---------------------------------------------------------- freshness
    def list_nodes(self, select: str | None = None,
                   exclude: str | None = None) -> list[str]:
        """`dbt list`: selected unique_ids in topological order."""
        if not self._parsed:
            self.parse()
        selected = select_nodes(self.project, self.dag, select, exclude)
        return [uid for wave in self.dag.generations()
                for uid in wave if uid in selected]

    def run_operation(self, macro: str, args: dict | None = None) -> str:
        """`dbt run-operation`: invoke a project macro by name with the
        live run context — adapter, run_query, and the statement
        protocol all work, so operation macros can execute DDL/DML
        (reference: the run-operation task renders the macro under the
        run-phase context, run_node_context.rs)."""
        if not self._parsed:
            self.parse()
        from dbt_fusion_spark.project.nodes import Node
        call = "{{ %s(%s) }}" % (
            macro,
            ", ".join(f"{k}={v!r}" for k, v in (args or {}).items()))
        node = Node(
            unique_id=f"operation.{self.project.name}.{macro}", name=macro,
            resource_type="operation", package=self.project.name,
            path="", raw_code=call)
        node.schema = self.project.default_schema
        return self.compile(node)

    def show(self, name: str | None = None, limit: int = 5,
             inline: str | None = None):
        """`dbt show`: compile the model (or an --inline SQL snippet
        with full ref()/source() support) and preview rows as a
        driver-side agate table (§2.6 — the only collect in the
        engine's API surface, and it is LIMIT-bounded)."""
        if not self._parsed:
            self.parse()
        if inline is not None:
            from dbt_fusion_spark.project.nodes import Node
            node = Node(
                unique_id=f"model.{self.project.name}.__dbt_inline",
                name="__dbt_inline", resource_type="model",
                package=self.project.name, path="", raw_code=inline)
            node.schema = self.project.default_schema
            sql = self.compile(node)
        else:
            node = self.project.nodes[f"model.{self.project.name}.{name}"]
            sql = self.compile(node)
        return self.adapter.run_query(
            f"SELECT * FROM (\n{sql}\n) __dbt_show", limit=limit)

    def run_saved_query(self, name: str):
        """Execute a saved_query: compile its metrics to one SQL over
        the semantic models' node relations and return the DataFrame
        (semantic/compiler.py — the executable half of the semantic
        layer; the reference delegates this planning to MetricFlow)."""
        from dbt_fusion_spark.semantic import compile_saved_query_sql

        if not self._parsed:
            self.parse()
        uid = f"saved_query.{self.project.name}.{name}"
        if uid not in self.project.saved_queries:
            raise ValueError(f"unknown saved query {name!r}")
        sql = compile_saved_query_sql(
            self.project, self.project.saved_queries[uid], self.relation_for)
        return self.spark.sql(sql)

    def generate_catalog(self) -> dict:
        """`dbt docs generate` catalog.json: introspected schema of every
        materialized relation (reference: metadata adapters +
        DESCRIBE-based catalog build, metadata_adapter.rs:214-345).
        Written to target/catalog.json."""
        nodes: dict[str, dict] = {}
        for uid, node in self.project.nodes.items():
            if node.resource_type not in ("model", "seed", "snapshot"):
                continue
            if node.config.get("materialized") == "ephemeral":
                continue
            if not self.spark.catalog.tableExists(
                    f"{node.schema}.{node.identifier}"):
                continue
            fields = self.spark.table(node.relation_name()).schema.fields
            is_view = any(
                t.name == node.identifier and t.tableType == "VIEW"
                for t in self.spark.catalog.listTables(node.schema))
            nodes[uid] = {
                "metadata": {"type": "VIEW" if is_view else "TABLE",
                             "schema": node.schema, "name": node.identifier},
                "columns": {
                    f.name: {"name": f.name, "index": i,
                             "type": f.dataType.simpleString()}
                    for i, f in enumerate(fields)
                },
                "stats": {},
            }
        catalog = {
            "metadata": {"dbt_schema_version":
                         "https://schemas.getdbt.com/dbt/catalog/v1.json"},
            "nodes": nodes,
        }
        target = self.project.root / "target"
        target.mkdir(exist_ok=True)
        (target / "catalog.json").write_text(json.dumps(catalog, indent=1))
        return catalog

    def source_freshness(self, uid: str):
        """adapters/freshness.sql:7-18: select max(loaded_at_field),
        current_timestamp() from source. dbt 1.9 `loaded_at_query`
        (freshness.sql:21-36 collect_freshness_custom_sql): an
        arbitrary SELECT wrapped as a scalar CTE wins over the field;
        `{{ this }}` inside it resolves to the source relation."""
        src = self.project.sources[uid]
        rel = self.relation_for(uid)
        query = src.config.get("loaded_at_query")
        if query:
            import re as _re

            body = _re.sub(r"\{\{\s*this\s*\}\}", rel, query)
            sql = (f"WITH source_query AS (\n{body}\n)\n"
                   "SELECT (SELECT * FROM source_query) AS max_loaded_at,"
                   " current_timestamp() AS snapshotted_at")
        else:
            loaded_at = src.config.get("loaded_at_field")
            if not loaded_at:
                raise ValueError(
                    f"{uid} has no loaded_at_field or loaded_at_query")
            sql = (f"SELECT max({loaded_at}) AS max_loaded_at,"
                   f" current_timestamp() AS snapshotted_at FROM {rel}")
        row = self.spark.sql(sql).collect()[0]
        return row["max_loaded_at"], row["snapshotted_at"]

    def check_source_freshness(self, uid: str) -> dict:
        """Freshness status against warn_after/error_after thresholds
        (sources.rs:31-33; source YAML freshness block). Returns
        {max_loaded_at, snapshotted_at, age_sec, status}."""
        import datetime as _dt

        src = self.project.sources[uid]
        max_loaded, snapshotted = self.source_freshness(uid)
        age = (snapshotted - max_loaded.replace(tzinfo=snapshotted.tzinfo)
               ).total_seconds()
        periods = {"minute": 60, "hour": 3600, "day": 86400}

        def threshold(spec) -> float | None:
            if not spec:
                return None
            return spec["count"] * periods[spec["period"]]

        fresh_cfg = src.config.get("freshness") or {}
        status = "pass"
        err = threshold(fresh_cfg.get("error_after"))
        warn = threshold(fresh_cfg.get("warn_after"))
        if err is not None and age > err:
            status = "error"
        elif warn is not None and age > warn:
            status = "warn"
        return {"max_loaded_at": max_loaded, "snapshotted_at": snapshotted,
                "age_sec": age, "status": status}


# filter.rs:92-99 ALLOWED_FORMATS (strptime spellings; %.fZ -> %f).
_SAMPLE_DT_FORMATS = (
    "%Y-%m-%d",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d %H:%M",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%dT%H:%M:%SZ",
    "%Y-%m-%dT%H:%M:%S.%fZ",
)


def _validate_sample_datetime(value: str) -> str:
    import datetime as _dt

    for fmt in _SAMPLE_DT_FORMATS:
        try:
            _dt.datetime.strptime(value, fmt)
            return value
        except ValueError:
            continue
    raise ValueError(
        f"--sample bound {value!r} matches none of the allowed datetime "
        f"formats {_SAMPLE_DT_FORMATS} (filter.rs:92-99)")


def parse_sample_spec(spec: str | dict) -> tuple[str | None, str | None]:
    """dbt --sample spec -> (start, end) ISO strings (either may be
    None for an open-ended range).

    Accepts the dbt-core/reference forms (filter.rs:63-140):
    a relative duration ("3 days", "12 hours" — end = now UTC), or an
    explicit range as a dict / JSON-ish string {'start': ..., 'end':
    ...}; start-only and end-only ranges are allowed, and each bound
    is validated against the reference's ALLOWED_FORMATS (values are
    interpolated into compiled SQL, so arbitrary strings are
    rejected)."""
    import datetime as _dt
    import re as _re

    now = _dt.datetime.now(tz=_dt.timezone.utc).replace(tzinfo=None)
    if isinstance(spec, str) and spec.strip().startswith("{"):
        spec = json.loads(spec.replace("'", '"'))
    if isinstance(spec, dict):
        start = spec.get("start")
        end = spec.get("end")
        if start is None and end is None:
            raise ValueError(
                f"--sample range {spec!r} needs at least one of start/end")
        start = _validate_sample_datetime(str(start)) if start is not None \
            else None
        end = _validate_sample_datetime(str(end)) if end is not None else None
        return start, end
    m = _re.fullmatch(
        r"\s*(?:last\s+)?(\d+)\s*(minute|hour|day|week)s?\s*", str(spec))
    if not m:
        raise ValueError(f"unparseable --sample spec {spec!r}")
    n, unit = int(m.group(1)), m.group(2)
    seconds = {"minute": 60, "hour": 3600, "day": 86400,
               "week": 604800}[unit] * n
    start = now - _dt.timedelta(seconds=seconds)
    return (start.isoformat(sep=" ", timespec="seconds"),
            now.isoformat(sep=" ", timespec="seconds"))
