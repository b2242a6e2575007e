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
                    max_degree: int | None = None,
                    broadcast_edges: bool = False) -> DataFrame:
    """Per-vertex triangle participation counts: (vertex, n_triangles)
    for every vertex in at least one triangle. `max_degree` optionally
    drops hub vertices (and their edges) before counting — the skew
    guard for power-law graphs (hub wedges dominate O(sum deg^2) while
    their triangles are rarely the signal).
    """
    # The canonical edge table feeds THREE plan subtrees (both wedge
    # sides + the closing join) — persist and materialize it first or
    # its upstream pipeline (often a basket self-join) runs three
    # times (the lsh_candidate_pairs measured-2x trap; edges build
    # once = 5s of the sf0.1 co-order wall).
    e = (edges.select(F.least(src, dst).alias("a"),
                      F.greatest(src, dst).alias("b"))
         .filter(F.col("a") != F.col("b"))
         .distinct()
         .persist())
    e.count()
    if max_degree is not None:
        deg = (e.select(F.col("a").alias("v"))
               .unionAll(e.select(F.col("b").alias("v")))
               .groupBy("v").agg(F.count("*").alias("__d"))
               .filter(F.col("__d") > max_degree)
               .select("v"))
        e = (e.join(deg.withColumnRenamed("v", "a"), "a", "left_anti")
             .join(deg.withColumnRenamed("v", "b"), "b", "left_anti")
             .select("a", "b"))
    # broadcast_edges: when the canonical edge table fits in executor
    # memory (2 longs/row — ~16 MB per 1M edges), broadcasting it into
    # BOTH joins keeps the wedge stream (O(sum deg^2) rows, the
    # dominant intermediate) map-side — generated and closed without
    # an exchange of the 49M wedge rows (measured at sf0.1 on the
    # 1.2M-edge co-order graph: closing join 8.0s -> 5.0s, wedge join
    # 1.6s -> 0.8s; the remaining cost is the probe volume itself,
    # which no join strategy removes). Leave False when the deduped
    # edge list is beyond single-executor memory — the shuffle join is
    # the correct plan there.
    rhs = F.broadcast(e) if broadcast_edges else e
    w = (e.alias("e1")
         .join(rhs.alias("e2"), F.col("e1.b") == F.col("e2.a"))
         .select(F.col("e1.a").alias("a"), F.col("e1.b").alias("b"),
                 F.col("e2.b").alias("c")))
    tri = w.join(rhs.select(F.col("a"), F.col("b").alias("c")),
                 ["a", "c"])
    corners = (tri.select(F.col("a").alias("vertex"))
               .unionAll(tri.select(F.col("b").alias("vertex")))
               .unionAll(tri.select(F.col("c").alias("vertex"))))
    return (corners.groupBy("vertex")
            .agg(F.count("*").cast("bigint").alias("n_triangles")))


def clustering_coefficients(edges: DataFrame, src: str, dst: str,
                            max_degree: int | None = None,
                            broadcast_edges: bool = False) -> DataFrame:
    """Per-vertex local clustering coefficient
    ``cc(v) = 2 T(v) / (deg(v) (deg(v) - 1))`` — how clique-like each
    vertex's neighborhood is (Watts & Strogatz 1998), the standard
    community-structure signal on co-occurrence graphs.

    Returns one row per vertex with degree, triangle count, and cc
    (NULL when degree < 2 — undefined, not zero).  Exact integer
    ratio, no sampling.

    With ``max_degree`` set the result is the exact clustering
    coefficient of the DEGREE-CAPPED SUBGRAPH (hub vertices and their
    edges removed): kept vertices report their subgraph degree so the
    2T/(d(d-1)) ratio is internally consistent, and capped hub
    vertices appear with their full-graph degree but NULL triangles
    and NULL cc — never a fabricated 0.0.  Relative to the full
    graph the kept-vertex values are approximate (a neighborhood
    through a removed hub is invisible); that is the documented price
    of the skew guard, not a silent one.

    Scale: the canonical deduped edge table is built ONCE and feeds
    both the degree aggregate and the compact-forward triangle count
    (the triangle_counts persist discipline; the cache stays for the
    life of the lazy result — an eager unpersist would void it before
    execution).
    """
    e = (edges.select(F.least(src, dst).alias("a"),
                      F.greatest(src, dst).alias("b"))
         .filter(F.col("a") != F.col("b"))
         .distinct()
         .persist())
    e.count()
    deg_full = (e.select(F.col("a").alias("vertex"))
                 .unionAll(e.select(F.col("b").alias("vertex")))
                 .groupBy("vertex")
                 .agg(F.count(F.lit(1)).cast("bigint").alias("degree")))
    hubs = None
    if max_degree is not None:
        hubs = deg_full.filter(F.col("degree") > max_degree)
        keep = deg_full.filter(F.col("degree") <= max_degree) \
                       .select("vertex")
        e2 = (e.join(keep.withColumnRenamed("vertex", "a"), "a")
               .join(keep.withColumnRenamed("vertex", "b"), "b")
               .select("a", "b"))
        # Subgraph degree for kept vertices: cc's denominator must
        # count the same edges the triangle count walked.  A kept
        # vertex whose only neighbors were hubs keeps its row with
        # degree 0 (left join + coalesce), cc NULL.
        deg_sub = (e2.select(F.col("a").alias("vertex"))
                     .unionAll(e2.select(F.col("b").alias("vertex")))
                     .groupBy("vertex")
                     .agg(F.count(F.lit(1)).cast("bigint")
                           .alias("degree")))
        deg = (keep.join(deg_sub, "vertex", "left")
                   .select("vertex",
                           F.coalesce(F.col("degree"), F.lit(0))
                            .cast("bigint").alias("degree")))
    else:
        e2 = e
        deg = deg_full
    tri = triangle_counts(e2, "a", "b", broadcast_edges=broadcast_edges)
    cc = F.when(
        F.col("degree") > 1,
        F.round(2.0 * F.coalesce(F.col("n_triangles"), F.lit(0))
                .cast("double")
                / (F.col("degree") * (F.col("degree") - 1))
                .cast("double"), 6))
    out = (deg.join(tri, "vertex", "left")
           .select("vertex", "degree",
                   F.coalesce(F.col("n_triangles"), F.lit(0))
                    .cast("bigint").alias("n_triangles"),
                   cc.alias("clustering_coeff")))
    if hubs is not None:
        out = out.unionByName(
            hubs.select("vertex", "degree",
                        F.lit(None).cast("bigint").alias("n_triangles"),
                        F.lit(None).cast("double")
                         .alias("clustering_coeff")))
    return out
