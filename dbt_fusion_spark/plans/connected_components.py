"""Connected components over an edge list — dedup-cluster assignment.

The missing piece between pairwise near-dup detection (llm/dedup.py
emits verified (id_a, id_b) pairs) and an actionable dedup decision:
group the pairs into clusters and keep one representative per cluster.
The reference has no graph operator; this is a beyond-reference
extension (SURVEY §2.11) in the family of the training-data pipeline.

Algorithm: iterative min-label propagation (the classic "hash-to-min" /
label-propagation connected components used by GraphX and the
Connected Components in MapReduce literature, Rastogi et al. 2013).
Each node starts labeled with its own id; each round every node adopts
the minimum label in its closed neighborhood; fixpoint = every node
carries the minimum node id of its component.

Scale shape (100 TB contract):
- each round is ONE shuffle: edges join labels on src, then a groupBy
  dst taking min — both hash-partitioned by node id, and AQE coalesces
  the tiny later rounds.
- rounds needed = graph diameter, not graph size. Near-dup graphs are
  star-shaped (a cluster of copies all pairwise-linked by LSH), so
  diameter is typically 1-2; `max_iter` caps pathological chains.
- labels are persisted per round and the previous round unpersisted, so
  lineage stays O(1) deep (no exponentially growing plan); on a real
  cluster you'd checkpoint every ~10 rounds — noted below.
- convergence check is a scalar count per round (driver-side control
  flow over an aggregate, not a data collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 20) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    `edges` is an undirected edge list (each pair listed once, either
    direction). Output has one row per distinct node appearing in any
    edge; component ids are stable (min member id), so downstream
    keeper selection (`min(doc_id) per component`) is deterministic.
    """
    # Symmetrize + closed neighborhood: propagation must flow both ways.
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    labels.persist()
    labels.count()  # materialize so each round builds on a flat scan

    for _ in range(max_iter):
        # min label over the closed neighborhood {node} ∪ neighbors(node)
        neighbor_lbl = (
            sym.join(labels, sym.u == labels.node)
            .select(F.col("v").alias("node"), F.col("component"))
        )
        new_labels = (
            neighbor_lbl.unionByName(labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        new_labels.persist()
        # convergence: any node whose label still shrinks this round?
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") < F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
        # production note: at fleet scale checkpoint labels every ~10
        # rounds to truncate lineage; local[32] never needs it because
        # near-dup graphs converge in <=3 rounds.
    return labels


def dedup_clusters(pairs: DataFrame, all_ids: DataFrame, id_col: str,
                   src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Full dedup decision: every document gets a cluster_id (singletons
    keep their own id), plus is_keeper = (id == min of cluster).

    `all_ids` is the corpus id column (one row per doc); `pairs` the
    verified duplicate pairs. Left join keeps the corpus partitioning —
    the pairs side is tiny relative to the corpus, and Spark broadcasts
    it when it fits.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    out = (
        all_ids.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
    )
    w_min = out.groupBy("cluster_id").agg(F.min(id_col).alias("__keep"))
    return (
        out.join(w_min, "cluster_id")
        .select(
            id_col,
            "cluster_id",
            (F.col(id_col) == F.col("__keep")).alias("is_keeper"),
        )
    )
