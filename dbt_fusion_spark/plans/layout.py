"""Data-layout optimization: Z-order (Morton) clustering for writes.

Delta/Iceberg expose `OPTIMIZE ... ZORDER BY (a, b)`; plain Spark has
no equivalent, yet at 100 TB the dominant cost of a selective query is
how many files its predicates can SKIP. Sorting by one column prunes
one dimension; interleaving the bits of several quantized dimensions
(the Morton curve) makes every file's min/max envelope tight in ALL
the z-ordered dimensions at once, so parquet row-group/file statistics
prune multi-predicate scans.

Scale shape:
- per-dimension quantization uses approx quantile boundaries (a fixed
  256-value array per column, computed once, broadcast as a literal) —
  rank-based, so skewed columns still spread across the curve.
- the Morton code is pure bit arithmetic inside codegen; the layout is
  one repartitionByRange + sortWithinPartitions (a single range
  shuffle, the same cost as any global sort-on-write).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

_BITS = 8  # 256 buckets per dimension


def _bucketize(col: Column, boundaries: list[float]) -> Column:
    """Rank bucket in [0, 256) via the precomputed quantile boundaries
    (a 255-element sorted array literal): bucket = #boundaries <= x.
    Array HOF, codegen'd, no join."""
    arr = F.array(*[F.lit(b) for b in boundaries])
    return F.size(F.filter(arr, lambda b: b <= col.cast("double")))


def _spread(bucket: Column, stride: int, offset: int) -> Column:
    """Place bit i of an 8-bit bucket at position i*stride + offset."""
    terms = [
        F.shiftleft(F.shiftright(bucket, i).bitwiseAND(F.lit(1)),
                    i * stride + offset)
        for i in range(_BITS)
    ]
    return reduce(lambda a, b: a + b, terms).cast("bigint")


def zorder_code(df: DataFrame, cols: list[str]) -> Column:
    """Morton code column over `cols` (2+ dimensions). Quantile
    boundaries are computed here with approxQuantile (one pass,
    driver-side array of 255 doubles per column — bounded)."""
    k = len(cols)
    probs = [i / 256 for i in range(1, 256)]
    code = None
    for j, c in enumerate(cols):
        bounds = df.approxQuantile(c, probs, 0.01)
        part = _spread(_bucketize(F.col(c), bounds), k, j)
        code = part if code is None else code + part
    return code.alias("__zorder")


def zorder_layout(df: DataFrame, cols: list[str],
                  n_partitions: int) -> DataFrame:
    """Cluster `df` on the Z-order curve of `cols`: range-partition +
    sort by the Morton code, then drop it. Write the result with any
    sink; each output file covers a compact hyper-rectangle of the
    z-ordered dimensions, so min/max statistics prune reads on any of
    them."""
    z = zorder_code(df, cols)
    return (
        df.withColumn("__zorder", z)
        .repartitionByRange(n_partitions, "__zorder")
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
    )
