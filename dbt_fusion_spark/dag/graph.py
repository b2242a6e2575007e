"""DAG scheduling + node selection.

Re-expresses crates/dbt-dag/src/schedule.rs:22-191 (topological waves)
and the node-selection language subset of
crates/dbt-common/src/node_selector.rs:49-530 (name, fnmatch, tag:,
graph operators +model / model+ / +model+).

Scheduling model on Spark: generations (topo waves) run sequentially;
nodes inside a generation run on a thread pool — the Spark driver is
thread-safe and schedules concurrent jobs across executors (reference
parallelism: resolver.rs:185-245 + profile threads).
"""

from __future__ import annotations

import fnmatch
from collections import defaultdict, deque


class DagCycleError(Exception):
    pass


class Dag:
    def __init__(self, nodes: dict[str, list[str]]):
        """nodes: unique_id -> list of dependency unique_ids (edges into
        the node). Unknown deps (sources) are ignored for ordering."""
        self.deps = {k: [d for d in v if d in nodes] for k, v in nodes.items()}
        self.children: dict[str, list[str]] = defaultdict(list)
        for k, ds in self.deps.items():
            for d in ds:
                self.children[d].append(k)

    def generations(self) -> list[list[str]]:
        """Kahn's algorithm by waves (schedule.rs:22 invariant: a node
        runs only after all parents)."""
        indeg = {k: len(ds) for k, ds in self.deps.items()}
        wave = sorted(k for k, d in indeg.items() if d == 0)
        out, seen = [], 0
        while wave:
            out.append(wave)
            seen += len(wave)
            nxt = []
            for n in wave:
                for c in self.children.get(n, []):
                    indeg[c] -= 1
                    if indeg[c] == 0:
                        nxt.append(c)
            wave = sorted(nxt)
        if seen != len(self.deps):
            cyc = [k for k, d in indeg.items() if d > 0]
            raise DagCycleError(f"cycle among {cyc}")
        return out

    def ancestors(self, uid: str) -> set[str]:
        out, q = set(), deque(self.deps.get(uid, []))
        while q:
            n = q.popleft()
            if n not in out:
                out.add(n)
                q.extend(self.deps.get(n, []))
        return out

    def descendants(self, uid: str) -> set[str]:
        out, q = set(), deque(self.children.get(uid, []))
        while q:
            n = q.popleft()
            if n not in out:
                out.add(n)
                q.extend(self.children.get(n, []))
        return out


def select_nodes(project, dag: Dag, select: str | None = None,
                 exclude: str | None = None) -> set[str]:
    """Selection language subset (node_selector.rs:49-90): space-separated
    union of atoms; each atom is [+]name[+] | tag:x | resource:type;
    names support fnmatch globs."""
    all_ids = set(dag.deps)

    def atom(a: str) -> set[str]:
        plus_pre = a.startswith("+")
        plus_post = a.endswith("+")
        a = a.strip("+")
        if a.startswith("tag:"):
            tag = a[4:]
            base = {
                uid for uid in all_ids
                if tag in (project.nodes[uid].config.get("tags") or [])
            }
        elif a.startswith("resource:"):
            rt = a[9:]
            base = {uid for uid in all_ids if project.nodes[uid].resource_type == rt}
        else:
            base = {
                uid for uid in all_ids
                if fnmatch.fnmatch(project.nodes[uid].name, a)
            }
        out = set(base)
        for uid in base:
            if plus_pre:
                out |= dag.ancestors(uid)
            if plus_post:
                out |= dag.descendants(uid)
        return out

    selected = all_ids if not select else set().union(
        *(atom(a) for a in select.split())
    )
    if exclude:
        selected -= set().union(*(atom(a) for a in exclude.split()))
    return selected
