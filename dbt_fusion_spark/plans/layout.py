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


def compact_partitions(spark, table: str, max_files: int = 4,
                       target_file_bytes: int = 128 * 1024 * 1024) -> dict:
    """Small-file compaction for a partitioned parquet table — the
    plain-Spark analog of Delta's `OPTIMIZE` bin-packing (without
    ZORDER; compose with zorder_layout for that).

    Continuous ingestion (streaming_merge micro-batches, frequent
    incremental appends) accretes a file per batch per partition; at
    100 TB the resulting file count — not data volume — dominates scan
    planning and task overhead. This rewrites ONLY partitions holding
    more than `max_files` files, coalescing each to
    ceil(bytes / target_file_bytes) files, landed via
    dynamic-partition INSERT OVERWRITE so untouched partitions' files
    never move (same O(touched) contract as the partition-scoped
    merge).

    Driver-side work is one filesystem listing per partition (bounded
    by partition count, the same scale as the catalog itself), routed
    through the Hadoop FileSystem API (sources/fsutil.py) so the same
    code lists file:// locally and s3a://, abfs://, hdfs:// at scale.
    Returns {partition_dir: (files_before, files_after)} for the
    rewritten partitions.
    """
    import math
    import urllib.parse

    from dbt_fusion_spark.sources.fsutil import HadoopFS
    from dbt_fusion_spark.sources.registry import ensure_session_confs

    ensure_session_confs(spark)  # dynamic partition overwrite required
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    loc = next(r["data_type"] for r in rows
               if (r["col_name"] or "").strip().lower() == "location")
    part_cols = []
    seen_marker = False
    for r in rows:
        name = (r["col_name"] or "").strip()
        if name == "# Partition Information":
            seen_marker = True
        elif seen_marker and not name:
            break  # blank row ends the partition block — rows after it
            # are "# Detailed Table Information" (Catalog, Location, …)
        elif seen_marker and name and not name.startswith("#"):
            part_cols.append(name)
    if not part_cols:
        raise ValueError(f"{table} is not partitioned; compact by "
                         "rewriting (CTAS) instead")
    root = loc  # URI as the catalog reports it — scheme stays intact
    fs = HadoopFS(spark, root)

    # descend one directory level per partition column — multi-column
    # partitioned tables nest (a=1/b=2/...); listing only the first
    # level would silently compact nothing
    def _leaf_dirs(rel: str, depth: int):
        if depth == 0:
            yield rel
            return
        base = f"{root}/{rel}" if rel else root
        for child in fs.subdirs(base):
            if "=" in child:
                yield from _leaf_dirs(
                    f"{rel}/{child}" if rel else child, depth - 1)

    todo = {}  # partition dir (relative, a=1/b=2) -> (n_files, bytes)
    for dname in _leaf_dirs("", len(part_cols)):
        files = fs.files(f"{root}/{dname}", suffix=".parquet")
        if len(files) > max_files:
            todo[dname] = (len(files), sum(b for _, b in files))
    if not todo:
        return {}

    # static partition prune from the dir names (dt=2024-01-01 style);
    # values are Hive-escaped (%XX url-style) — decode fully, not just
    # %3A, or the filter matches nothing and the rewrite is a no-op
    def dir_filter(dname: str):
        cond = None
        for piece in dname.split("/"):
            col, _, val = piece.partition("=")
            c = (F.col(col).isNull()
                 if val == "__HIVE_DEFAULT_PARTITION__"
                 else F.col(col).cast("string") ==
                 F.lit(urllib.parse.unquote(val)))
            cond = c if cond is None else (cond & c)
        return cond

    report = {}
    for dname, (n_before, nbytes) in todo.items():
        n_out = max(1, math.ceil(nbytes / target_file_bytes))
        scoped = spark.table(table).filter(dir_filter(dname))
        tmp = f"{table}__compact_tmp"
        spark.sql(f"DROP TABLE IF EXISTS {tmp}")
        scoped.coalesce(n_out).write.saveAsTable(tmp)
        cols = ", ".join(
            f"`{f.name}`" for f in spark.table(table).schema.fields)
        spark.sql(f"INSERT OVERWRITE TABLE {table}\n"
                  f"SELECT {cols} FROM {tmp}")
        spark.sql(f"DROP TABLE {tmp}")
        n_after = len(fs.files(f"{root}/{dname}", suffix=".parquet"))
        report[dname] = (n_before, n_after)
    spark.catalog.refreshTable(table)
    return report
