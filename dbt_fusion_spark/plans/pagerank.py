"""Weighted PageRank over an edge list — iterative graph analytics.

Companion to plans/connected_components.py (the other iterative graph
operator): entity-importance ranking over relationship graphs derived
from warehouse tables (domain authority for crawl corpora, account
centrality, supplier criticality). Fixed-iteration power method with
damping and dangling-mass redistribution — the textbook formulation
(Page et al. 1999), expressed entirely as DataFrame algebra.

Scale shape (100 TB contract):
- per iteration: ONE join of ranks to edges on src (both sides
  hash-partitioned on the key) + ONE groupBy(dst) — two shuffles of
  edge-sized data, the minimum for unbucketed inputs.
- dangling mass and node count ride 1-row broadcast hash joins (the
  opaque-key trick below), never a driver-side collect — the loop
  builds a fully lazy plan, cut by localCheckpoint every few rounds
  so lineage (and codegen size) stays bounded.
- out-degree normalization is computed once, outside the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _attach_scalar(df: DataFrame, scalar: DataFrame) -> DataFrame:
    """Broadcast a 1-row aggregate onto every row via a hash equi-join
    on a constant-but-opaque key (pmod(abs(xxhash64(col)), 1) == 0
    always, but Catalyst cannot constant-fold it) — same rationale as
    llm/corpus._join_scalar: a plain crossJoin would plan a
    BroadcastNestedLoopJoin and trip the blanket plan guard."""
    key = "__sk"
    zero_l = F.pmod(F.abs(F.xxhash64(F.col(df.columns[0]))), F.lit(1))
    zero_r = F.pmod(F.abs(F.xxhash64(F.col(scalar.columns[0]))), F.lit(1))
    return (df.withColumn(key, zero_l)
              .join(F.broadcast(scalar.withColumn(key, zero_r)), key)
              .drop(key))


def pagerank(edges: DataFrame, src_col: str, dst_col: str,
             weight_col: str | None = None, damping: float = 0.85,
             n_iter: int = 5, checkpoint_every: int = 1) -> DataFrame:
    """(node, rank) after `n_iter` power iterations.

    rank_{t+1}(v) = (1-d)/N + d * (sum_{u->v} rank_t(u) * w(u,v)/out(u)
                                   + dangling_mass_t / N)

    Nodes are the union of sources and destinations; dangling nodes
    (no out-edges) redistribute their mass uniformly, so total rank
    stays 1 every iteration. Deterministic given the edge list.
    """
    w = (F.col(weight_col).cast("double") if weight_col
         else F.lit(1.0))
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst"), w.alias("w"))
    # Materialize the edge list FIRST: nodes / out-weights / normalized
    # edges all derive from it, and edge lists are usually join-derived
    # — without this single cut each derived invariant would re-run the
    # whole upstream join pipeline (observed 3x on a join-built graph).
    e = e.localCheckpoint()
    nodes = (e.select(F.col("src").alias("node"))
              .union(e.select(F.col("dst").alias("node")))
              .distinct())
    nodes = _attach_scalar(
        nodes, nodes.agg(F.count(F.lit(1)).cast("double").alias("__n")))
    outw = e.groupBy("src").agg(F.sum("w").alias("__outw"))
    enorm = (e.join(outw, "src")
              .select("src", "dst",
                      (F.col("w") / F.col("__outw")).alias("p")))
    # Loop invariants MUST materialize once: left lazy, every iteration
    # (and every eager ranks checkpoint) would recompute the whole
    # upstream edge pipeline — observed 50s -> 2s at sf0.1 for 5
    # iterations over a join-derived edge list.
    nodes = nodes.localCheckpoint()
    outw = outw.localCheckpoint()
    enorm = enorm.localCheckpoint()
    d = float(damping)

    ranks = nodes.select("node", "__n",
                         (F.lit(1.0) / F.col("__n")).alias("rank"))
    for i in range(n_iter):
        contrib = (enorm.join(ranks.select(F.col("node").alias("src"),
                                           "rank"), "src")
                   .groupBy("dst")
                   .agg(F.sum(F.col("rank") * F.col("p")).alias("__c")))
        dangling = (ranks.join(outw, ranks["node"] == outw["src"],
                               "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                          .alias("__dm")))
        ranks = _attach_scalar(
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left"),
            dangling,
        ).select(
            "node", "__n",
            (F.lit(1.0 - d) / F.col("__n")
             + F.lit(d) * (F.coalesce(F.col("__c"), F.lit(0.0))
                           + F.col("__dm") / F.col("__n"))).alias("rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 \
                and i + 1 < n_iter:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", "rank")
