"""Triangle counting on an undirected edge list (the compact-forward
algorithm: orient every edge low->high, count wedge closures).

Scale design (100 TB): edges are canonicalized (least, greatest) and
deduped once; wedges come from ONE self-equi-join on the middle vertex
(b): (a<b) x (b<c) — the ordering constraint is free because both edges
are already oriented, so each triangle is generated exactly once as
a<b<c and never permuted 6x. The closing check is a second equi-join on
the (a, c) edge key. Work is O(sum deg(b)^2) — the standard bound; a
skew-heavy hub vertex is the known hot spot and callers can pre-filter
with max_degree. Per-vertex counts explode the 3 corners and shuffle on
the vertex id. No cross join, no window, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def triangle_counts(edges: DataFrame, src: str, dst: str,
                    max_degree: int | None = None) -> DataFrame:
    """Per-vertex triangle participation counts: (vertex, n_triangles)
    for every vertex in at least one triangle. `max_degree` optionally
    drops hub vertices (and their edges) before counting — the skew
    guard for power-law graphs (hub wedges dominate O(sum deg^2) while
    their triangles are rarely the signal).
    """
    e = (edges.select(F.least(src, dst).alias("a"),
                      F.greatest(src, dst).alias("b"))
         .filter(F.col("a") != F.col("b"))
         .distinct())
    if max_degree is not None:
        deg = (e.select(F.col("a").alias("v"))
               .unionAll(e.select(F.col("b").alias("v")))
               .groupBy("v").agg(F.count("*").alias("__d"))
               .filter(F.col("__d") > max_degree)
               .select("v"))
        e = (e.join(deg.withColumnRenamed("v", "a"), "a", "left_anti")
             .join(deg.withColumnRenamed("v", "b"), "b", "left_anti")
             .select("a", "b"))
    w = (e.alias("e1")
         .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
         .select(F.col("e1.a").alias("a"), F.col("e1.b").alias("b"),
                 F.col("e2.b").alias("c")))
    tri = w.join(e.select(F.col("a"), F.col("b").alias("c")), ["a", "c"])
    corners = (tri.select(F.col("a").alias("vertex"))
               .unionAll(tri.select(F.col("b").alias("vertex")))
               .unionAll(tri.select(F.col("c").alias("vertex"))))
    return (corners.groupBy("vertex")
            .agg(F.count("*").cast("bigint").alias("n_triangles")))
