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
                 exclude: str | None = None,
                 prev_manifest: dict | None = None) -> set[str]:
    """Selection language (node_selector.rs:49-90, 107-530):
    space-separated terms union; ","-joined atoms within a term
    intersect; each atom is [@|+]name[+] | tag:x | path:glob |
    resource:type | config.<key>:value | state:modified|new. Names
    support fnmatch globs. `@model` = model, its descendants, and all
    ancestors of those descendants (the build-everything-needed form).
    state: atoms compare raw_code checksums and config against
    prev_manifest (prev_state/mod.rs + changeset.rs)."""
    all_ids = set(dag.deps)

    def state_base(which: str) -> set[str]:
        if prev_manifest is None:
            raise ValueError(
                "state: selector requires a previous manifest (state_dir)")
        prev_nodes = prev_manifest.get("nodes", {})
        out = set()
        for uid in all_ids:
            node = project.nodes[uid]
            prev = prev_nodes.get(uid)
            if prev is None:
                out.add(uid)  # new nodes count as modified AND new
                continue
            if which == "new":
                continue
            if (prev.get("raw_code") != node.raw_code
                    or prev.get("config", {}) != dict(node.config)):
                out.add(uid)
        return out

    def atom(a: str) -> set[str]:
        at_op = a.startswith("@")
        a = a.lstrip("@")
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
        elif a.startswith(("metric:", "semantic_model:", "saved_query:")):
            # semantic-layer selectors (node_selector.rs MethodName::
            # Metric/SemanticModel/SavedQuery): match by node name glob
            rt, _, pat = a.partition(":")
            base = {
                uid for uid in all_ids
                if project.nodes[uid].resource_type == rt
                and fnmatch.fnmatch(project.nodes[uid].name, pat)
            }
        elif a.startswith("path:"):
            pat = a[5:]
            base = {
                uid for uid in all_ids
                if fnmatch.fnmatch(project.nodes[uid].path or "", pat)
                or (project.nodes[uid].path or "").startswith(pat.rstrip("*"))
            }
        elif a.startswith("config."):
            key, _, val = a[7:].partition(":")
            base = {
                uid for uid in all_ids
                if str(project.nodes[uid].config.get(key)) == val
            }
        elif a.startswith("state:"):
            base = state_base(a[6:])
        else:
            base = {
                uid for uid in all_ids
                if fnmatch.fnmatch(project.nodes[uid].name, a)
            }
        out = set(base)
        if at_op:
            # @model: model + children + all ancestors of each of those
            for uid in base:
                desc = dag.descendants(uid)
                out |= desc
                for d in desc | {uid}:
                    out |= dag.ancestors(d)
            return out
        for uid in base:
            if plus_pre:
                out |= dag.ancestors(uid)
            if plus_post:
                out |= dag.descendants(uid)
        return out

    def term(t: str) -> set[str]:
        # "a,b" intersects atoms (node_selector.rs set intersection)
        parts = [p for p in t.split(",") if p]
        out = atom(parts[0])
        for p in parts[1:]:
            out &= atom(p)
        return out

    selected = all_ids if not select else set().union(
        *(term(t) for t in select.split())
    )
    if exclude:
        selected -= set().union(*(term(t) for t in exclude.split()))
    return selected


def select_by_definition(project, dag: Dag, defn,
                         prev_manifest: dict | None = None) -> set[str]:
    """Resolve a selectors.yml named-selector definition
    (crates/dbt-selector-parser/): either a string in the CLI selection
    language, a {method, value, parents?, children?, childrens_parents?}
    leaf, or union/intersection composites whose items may carry an
    {exclude: [...]} entry."""
    def leaf(d: dict) -> set[str]:
        method = d.get("method", "fqn")
        value = str(d.get("value", "*"))
        if method == "fqn":
            atom = value
        elif method == "resource_type":
            atom = f"resource:{value}"
        else:
            atom = f"{method}:{value}"
        if d.get("childrens_parents"):
            sel = f"@{atom}"
        else:
            sel = f"{'+' if d.get('parents') else ''}{atom}" \
                  f"{'+' if d.get('children') else ''}"
        return select_nodes(project, dag, sel, prev_manifest=prev_manifest)

    def resolve(d) -> set[str]:
        if isinstance(d, str):
            return select_nodes(project, dag, d, prev_manifest=prev_manifest)
        if not isinstance(d, dict):
            raise ValueError(f"bad selector definition: {d!r}")
        for key, combine in (("union", "union"), ("intersection", "inter")):
            if key not in d:
                continue
            parts: list[set[str]] = []
            excludes: list = []
            for item in d[key]:
                if isinstance(item, dict) and "exclude" in item:
                    excludes += item["exclude"]
                else:
                    parts.append(resolve(item))
            if not parts:
                out: set[str] = set()
            elif combine == "union":
                out = set().union(*parts)
            else:
                out = set.intersection(*parts)
            for e in excludes:
                out -= resolve(e)
            return out
        return leaf(d)

    return resolve(defn)
