"""Similarity search over embedding columns (array<float>).

Beyond-reference surface (north star): brute-force cosine top-k as the
exact baseline, and an IVF-style partitioned variant as the scale path.

Numeric discipline: the dot product is a LEFT-TO-RIGHT fold in double
precision — `aggregate(zip_with(...))` — which is bit-identical to the
DuckDB oracle's `list_reduce(list_transform(...))` (verified
empirically). Never use a parallel/reordered sum on floats when results
must be reproducible.

Scale design (100 TB):
- brute_force_topk broadcasts the (small) query set; each executor
  scans its shard of the corpus once; per-query top-k via window.
  Linear scan — exact, embarrassingly parallel, no shuffle of the
  corpus itself.
- ivf_topk prunes the scan with a coarse partition (here the `label`
  column as cluster id — in production, k-means cell ids): the join
  hits only matching cells, trading recall for a ~n_cells× scan cut.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot_fold(a: str, b: str) -> Column:
    """Sequential-fold dot product in double (engine-reproducible)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def norm_fold(a: str) -> Column:
    return F.sqrt(dot_fold(a, a))


def cosine(a: str, b: str) -> Column:
    return dot_fold(a, b) / (norm_fold(a) * norm_fold(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding"
                     ) -> DataFrame:
    """Exact top-k neighbors per query (excluding self)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            cosine("__qv", "__cv").alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             cell_col: str = "label") -> DataFrame:
    """IVF-style ANN: scan only the query's coarse cell (nprobe=1)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"),
        F.col(cell_col).alias("__cell"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"),
        F.col(cell_col).alias("__cell"),
    )
    scored = (
        F.broadcast(q).join(c, "__cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine("__qv", "__cv").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


def embedding_near_dups(corpus: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        cell_col: str | None = "label") -> DataFrame:
    """Embedding-cosine near-duplicate pairs. With a cell column the
    pair join is blocked per cell (the scale path); without it, exact
    all-pairs."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
                      *( [F.col(cell_col).alias("__cell")] if cell_col else [] ))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
                      *( [F.col(cell_col).alias("__cell")] if cell_col else [] ))
    joined = a.join(b, "__cell") if cell_col else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine("__va", "__vb").alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def hyperplane_bucket(vec_col: str, n_bits: int = 8) -> Column:
    """Sign-bit bucket id: bit j set iff dim j > 0. Axis-aligned
    deterministic hyperplanes — the training-free random-hyperplane
    (cosine-SimHash) LSH; unlike IVF it needs no centroid fit, so the
    bucketing is a pure projection that pushes into the scan."""
    bits = [
        F.when(F.element_at(F.col(vec_col), j + 1).cast("double") > 0,
               F.lit(2 ** j)).otherwise(F.lit(0))
        for j in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def hyperplane_lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                        n_bits: int = 8, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """ANN via sign-bit buckets (2^n_bits cells, nprobe=1): scan only
    the query's cell. Work drops ~2^n_bits-fold vs brute force; recall
    follows the cosine-SimHash collision curve."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"),
        hyperplane_bucket(vec_col, n_bits).alias("__cell"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"),
        hyperplane_bucket(vec_col, n_bits).alias("__cell"),
    )
    scored = (
        F.broadcast(q).join(c, "__cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine("__qv", "__cv").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )
