"""SamplerPlan executor: referentially-intact dev-time sampling.

Re-expresses the reference's sampler plan (crates/dbt-sample/src/
plan.rs: `SamplerPlan { keysets, entries }`, `Keyset { cols, from }`,
`Entry { select, strategy, filters }`, `Filter { use, on }`,
`Strategy` tagged enum plan.rs:88-124): a YAML plan names a strategy
per source AND propagates *keysets* so child tables keep only rows
whose foreign keys survived the parent's sample — the property that
makes a dev sample actually joinable.

Spark-first execution:
- a keyset is the DISTINCT key projection of its sampled root — small
  by construction, so every keyset filter is a BROADCAST left-semi
  join against the child (no shuffle of the child table);
- strategies reuse sample/strategies.py (the portable-hash family, so
  a sampled dev environment is reproducible on any engine);
- entries write through the caller-supplied writer (saveAsTable in the
  runner; a dict collector in tests) — the reference's read/write
  SamplerRel indirection.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame, SparkSession, functions as F

from dbt_fusion_spark.sample import strategies as S


def apply_strategy(df: DataFrame, spec: Mapping) -> DataFrame:
    """Dispatch a plan.rs Strategy dict {type, args} onto strategies.py.
    Random/stratified use the PORTABLE keyed variants when `by` is
    given in args, else Spark-native Bernoulli."""
    typ = (spec.get("type") or "clone").lower()
    args = dict(spec.get("args") or {})
    if typ in ("clone", "pass"):
        return df
    if typ == "random":
        by = args.get("by")
        if by:
            return S.sample_random_portable(
                df, args["frac"], by, seed=args.get("seed", 42))
        return S.sample_random(df, args["frac"], seed=args.get("seed", 42))
    if typ == "limit":
        return S.sample_limit(df, args["n"], order_by=args.get("order_by"))
    if typ == "time":
        if args.get("last"):  # plan.rs Time.last: trailing window
            return df.filter(
                F.col(args["by"])
                >= F.expr(f"current_timestamp() - interval {args['last']}"))
        return S.sample_time(df, args["by"], start=args.get("start"),
                             end=args.get("end"))
    if typ == "hash":
        return S.sample_hash(df, args["by"], args["mod"], args["keep"],
                             seed=args.get("seed", 42),
                             method=args.get("method", "md5"))
    if typ == "group":
        return S.sample_group(df, args["by"], args["n_per_group"],
                              order_by=args.get("order_by") or [args["by"]])
    if typ == "stratified":
        return S.sample_stratified_portable(
            df, args["by"], args["frac"],
            key=args.get("key", args["by"]), seed=args.get("seed", 42))
    if typ == "branch":
        return S.sample_branch(df, args["predicates"], args["alloc"])
    raise ValueError(f"unknown sampler strategy {typ!r}")


def run_sampler_plan(spark: SparkSession, plan: Mapping,
                     read: Callable[[str], DataFrame],
                     write: Callable[[str, DataFrame], None] | None = None,
                     ) -> dict[str, DataFrame]:
    """Execute a plan dict (the YAML shape of plan.rs):

        keysets:
          live_orders:
            cols: [o_orderkey]
            from: {root: orders, strategy: {type: hash, args: {...}}}
        entries:
          - select: orders
            strategy: {type: hash, args: {by: o_orderkey, mod: 10, keep: 2}}
          - select: lineitem
            strategy: {type: pass}
            filters: [{use: live_orders, on: l_orderkey}]

    `read(select)` resolves a selector to its DataFrame; returns
    {select: sampled DataFrame}, also handed to `write` if given.
    A filter keeps child rows whose `on` column(s) appear in the
    keyset (left-semi broadcast join); `on` maps positionally onto the
    keyset's cols (plan.rs Mapping::One/Many).
    """
    keysets: dict[str, DataFrame] = {}
    for name, ks in (plan.get("keysets") or {}).items():
        frm = ks["from"]
        if "seed" in frm:
            root = read(frm["seed"])
        else:
            root = apply_strategy(read(frm["root"]),
                                  frm.get("strategy") or {})
        keysets[name] = root.select(*ks["cols"]).distinct()

    out: dict[str, DataFrame] = {}
    for entry in plan.get("entries") or []:
        sel = entry["select"]
        df = apply_strategy(read(sel), entry.get("strategy") or {})
        for filt in entry.get("filters") or []:
            ks = keysets[filt["use"]]
            on = filt["on"]
            on_cols = [on] if isinstance(on, str) else list(on)
            cond = None
            for child_col, key_col in zip(on_cols, ks.columns):
                c = df[child_col] == ks[key_col]
                cond = c if cond is None else (cond & c)
            df = df.join(F.broadcast(ks), cond, "left_semi")
        out[sel] = df
        if write is not None:
            write(sel, df)
    return out
