"""Exact table profiling: per-column stats in ONE aggregate pass.

Beyond-reference surface (data-quality companion to the adapter's
describe/analyze ops, spark_adapter.py): the long-format profile every
warehouse team runs before trusting a 100 TB table — row count, null
count, exact distinct count, min/max — computed declaratively so
Catalyst plans a single scan.

Scale notes:
- All per-column aggregates ride one Aggregate node; Spark rewrites
  the multiple COUNT(DISTINCT)s into ONE Expand (+n_cols-fold row
  multiplication) feeding a single shuffle — exact, and the standard
  price of exact NDV. For quick profiles at fleet scale pass
  exact_distinct=False to use HLL approx_count_distinct instead
  (not oracle-portable: HLL sketches are engine-specific, which is
  exactly why the KMV sketch in llm/sketch.py exists).
- min/max emission is canonicalized for cross-engine comparison:
  float columns go through DECIMAL(38,9) (IEEE doubles print
  differently per engine; decimals print identically), timestamps
  through an explicit microsecond format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _minmax_exprs(col: str, dtype: str) -> tuple:
    c = F.col(col)
    if dtype in ("double", "float"):
        dec = c.cast("decimal(38,9)")
        return (F.min(dec).cast("string"), F.max(dec).cast("string"))
    if dtype.startswith("timestamp"):
        return (F.date_format(F.min(c), _TS_FMT),
                F.date_format(F.max(c), _TS_FMT))
    return (F.min(c).cast("string"), F.max(c).cast("string"))


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  exact_distinct: bool = True) -> DataFrame:
    """Long-format profile: one row per column with
    (column, n_rows, n_nulls, n_distinct, min_value, max_value)."""
    from dbt_fusion_spark.plans.partitioning import ensure_parallelism

    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    # The Expand below multiplies rows (n_cols+1)-fold BEFORE the first
    # exchange; an under-parallelized scan would run all of it on one
    # core (single-file local inputs — no-op at fleet scale).
    df = ensure_parallelism(df)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__total")]
    for i, c in enumerate(cols):
        nd = (F.countDistinct(F.col(c)) if exact_distinct
              else F.approx_count_distinct(F.col(c)))
        mn, mx = _minmax_exprs(c, dtypes[c])
        aggs += [
            F.count(F.col(c)).cast("bigint").alias(f"__cnt_{i}"),
            nd.cast("bigint").alias(f"__nd_{i}"),
            mn.alias(f"__mn_{i}"),
            mx.alias(f"__mx_{i}"),
        ]
    one = df.agg(*aggs)
    stack_args = []
    for i, c in enumerate(cols):
        stack_args.append(
            f"'{c}', __total - __cnt_{i}, __nd_{i}, __mn_{i}, __mx_{i}")
    gen = (f"stack({len(cols)}, " + ", ".join(stack_args)
           + ") AS (column, n_nulls, n_distinct, min_value, max_value)")
    return (one.select(F.col("__total").alias("n_rows"), F.expr(gen))
               .select("column", "n_rows", "n_nulls", "n_distinct",
                       "min_value", "max_value"))


def weighted_median(df: DataFrame, group_col: str, value_col: str,
                    weight_col: str) -> DataFrame:
    """Exact weighted median per group (lower-median convention: the
    smallest value whose cumulative weight reaches half the total) —
    the robust center the mean can't give on skewed monetary data,
    weighted so bulk rows count by their size (e.g. price weighted by
    quantity).

    Engine-exact by construction: weights are decimal-quantized
    integers (exact sums), the cumulative walk runs over the
    (group, value) -> weight DISTRIBUTION grid ordered by value, and
    the median is selected by the integer comparison
    2*cum >= total — no interpolation, no float rounding anywhere;
    the emitted median is a VALUE FROM THE DATA.

    Scale shape: one (group, value) aggregate with map-side partials;
    the cumulative window partitions BY GROUP over the value grid
    (bounded by distinct values per group, never a global sort); the
    total rides the same grid re-aggregated. The min-selection is one
    more group aggregate.
    """
    from pyspark.sql import Window

    w_int = F.col(weight_col).cast("decimal(18,6)")
    grid = (df.groupBy(F.col(group_col).alias("grp"),
                       F.col(value_col).alias("val"))
            .agg(F.sum(w_int).alias("__w")))
    tot = grid.groupBy("grp").agg(F.sum("__w").alias("__tw"))
    win = (Window.partitionBy("grp").orderBy("val")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = grid.withColumn("__cum", F.sum("__w").over(win))
    # tot is provably |groups| rows but Catalyst ESTIMATES its size
    # from the 10x-growable grid — force the broadcast so the plan
    # holds at any scale without waiting for AQE's runtime flip
    hit = (cum.join(F.broadcast(tot), "grp")
           .filter(F.col("__cum") * 2 >= F.col("__tw"))
           .groupBy("grp")
           .agg(F.min("val").alias("weighted_median"),
                F.max("__tw").alias("__tw")))
    return hit.select(F.col("grp").alias(group_col),
                      "weighted_median",
                      F.col("__tw").cast("double").alias("total_weight"))


def mad_outliers(df: DataFrame, group_col: str, value_col: str,
                 k: float = 5.0) -> DataFrame:
    """Robust per-group outlier flags via median absolute deviation:
    a row is flagged when |x - median| > k * MAD (both medians the
    exact lower-median grid walk of weighted_median with unit weights
    — no interpolation, engine-exact). The robust twin of z-score
    anomaly detection: one corrupted batch can drag a mean/stddev arbitrarily,
    but breaks down at 50% contamination instead of one row.

    Scale shape: two grid walks (value grid, then |x - median| grid),
    each partitioned BY GROUP, plus two broadcastable group-level
    joins back onto the rows. No global sort, no Python.
    """
    med = (weighted_median(df.withColumn("__one", F.lit(1.0)),
                           group_col, value_col, "__one")
           .select(F.col(group_col), F.col("weighted_median")
                   .alias("__med")))
    dev = (df.join(F.broadcast(med), group_col)
           .withColumn("__adev",
                       F.abs(F.col(value_col) - F.col("__med"))))
    mad = (weighted_median(dev.withColumn("__one", F.lit(1.0)),
                           group_col, "__adev", "__one")
           .select(F.col(group_col),
                   F.col("weighted_median").alias("__mad")))
    return (dev.join(F.broadcast(mad), group_col)
            .select(F.col(group_col), F.col(value_col),
                    F.col("__med").alias("group_median"),
                    F.col("__mad").alias("group_mad"),
                    (F.col("__adev")
                     > F.lit(float(k)) * F.col("__mad"))
                    .alias("is_outlier")))


def functional_dependency(df: DataFrame, det_col: str,
                          dep_col: str) -> DataFrame:
    """Functional-dependency audit: does `det_col` determine `dep_col`?

    Returns one row per determinant value with its row count, the
    number of distinct dependent values, and the violation flag
    (> 1 distinct dependent) — the relational integrity check behind
    'is this key actually a key' / 'did the join fan out'.

    Scale: one (det, dep) distinct-pair aggregate, then a det-keyed
    rollup — both map-side-combined; no windows, no joins.
    """
    pairs = (df.groupBy(F.col(det_col).alias("det"),
                        F.col(dep_col).alias("dep"))
               .agg(F.count(F.lit(1)).alias("n")))
    return (pairs.groupBy("det")
            .agg(F.sum("n").alias("n_rows"),
                 F.count(F.lit(1)).alias("n_dep_values"))
            .select(F.col("det").alias(det_col), "n_rows",
                    "n_dep_values",
                    (F.col("n_dep_values") > 1).alias("is_violation")))


def k_anonymity_audit(df: DataFrame, quasi_cols: list[str],
                      k: int = 5) -> DataFrame:
    """k-anonymity audit over a quasi-identifier set — the
    re-identification exposure readout privacy review asks for before
    a dataset ships: every quasi-identifier combination shared by
    fewer than k rows is a linkage-attack foothold.

    Returns ONE row: k, n_rows, n_groups, n_violating_groups (size
    < k), n_rows_at_risk, worst (minimum) group size, and the
    violating fraction of rows.

    Scale: ONE map-side-combined aggregate onto the quasi-identifier
    grid + one grid reduce — a single scan; no per-row emission of the
    sensitive combinations themselves (the audit reports exposure, it
    never re-publishes the quasi-identifiers).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    g = (df.groupBy(*[F.col(c) for c in quasi_cols])
           .agg(F.count(F.lit(1)).alias("n")))
    viol = F.col("n") < k
    agg = g.agg(
        F.sum("n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(viol, 1).otherwise(0)).cast("bigint")
         .alias("n_violating_groups"),
        F.sum(F.when(viol, F.col("n")).otherwise(0)).cast("bigint")
         .alias("n_rows_at_risk"),
        F.min("n").cast("bigint").alias("min_group_size"))
    return agg.select(
        F.lit(k).cast("bigint").alias("k"),
        "n_rows", "n_groups", "n_violating_groups", "n_rows_at_risk",
        "min_group_size",
        F.round(F.col("n_rows_at_risk").cast("double")
                / F.col("n_rows").cast("double"), 6)
         .alias("at_risk_frac"))


def l_diversity_audit(df: DataFrame, quasi_cols: list[str],
                      sensitive_col: str, l: int = 3) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the
    disclosure-risk readout k-anonymity misses: a quasi-identifier
    group can be large (k-anonymous) yet give away the SENSITIVE
    attribute because every row in it shares one value.  Each group
    must carry at least l distinct sensitive values.

    Returns ONE row: l, n_rows, n_groups, n_violating_groups
    (distinct sensitive < l), n_rows_at_risk, min_distinct_sensitive,
    min_entropy (the worst per-group Shannon entropy of the sensitive
    distribution, nats — the entropy-l-diversity readout; compare to
    ln(l)), at_risk_frac.

    Determinism: entropy terms ride the round(9)->DECIMAL quantized
    sum (order-free); the final min is exact.

    Scale: one map-side-combined aggregate onto the
    (quasi x sensitive) grid, one grid window for group totals, one
    grid aggregate, one reduce — a single data scan; like
    k_anonymity_audit it never re-publishes the combinations.
    """
    from pyspark.sql import Window

    from dbt_fusion_spark.plans.stats import _d2d, _qterm

    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    qs = [F.col(c) for c in quasi_cols]
    g2 = (df.groupBy(*qs, F.col(sensitive_col).alias("__s"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("__c")))
    wq = Window.partitionBy(*[F.col(c) for c in quasi_cols])
    g2 = g2.withColumn("__n", F.sum("__c").over(wq))
    p = F.col("__c").cast("double") / F.col("__n").cast("double")
    ent_term = _qterm(p * F.log(F.col("__n").cast("double")
                                / F.col("__c").cast("double")))
    g = (g2.groupBy(*[F.col(c) for c in quasi_cols])
           .agg(F.max("__n").cast("bigint").alias("n"),
                F.count(F.lit(1)).cast("bigint").alias("nd"),
                F.sum(ent_term).alias("__ent")))
    viol = F.col("nd") < l
    agg = g.agg(
        F.sum("n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(viol, 1).otherwise(0)).cast("bigint")
         .alias("n_violating_groups"),
        F.sum(F.when(viol, F.col("n")).otherwise(0)).cast("bigint")
         .alias("n_rows_at_risk"),
        F.min("nd").cast("bigint").alias("min_distinct_sensitive"),
        F.min(_d2d("__ent")).alias("__me"))
    return agg.select(
        F.lit(l).cast("bigint").alias("l"),
        "n_rows", "n_groups", "n_violating_groups", "n_rows_at_risk",
        "min_distinct_sensitive",
        F.round(F.col("__me"), 6).alias("min_entropy"),
        F.round(F.col("n_rows_at_risk").cast("double")
                / F.col("n_rows").cast("double"), 6)
         .alias("at_risk_frac"))


def referential_integrity_audit(child: DataFrame, parent: DataFrame,
                                child_key: str,
                                parent_key: str) -> DataFrame:
    """Referential-integrity audit: how many child rows point at a
    parent key that does not exist (the orphan rate every warehouse
    dq suite checks before trusting a join), plus NULL-key counts on
    the child side (a NULL FK is not an orphan — it is a different
    defect — so the two are reported separately).

    Returns ONE row: n_child, n_null_keys, n_orphans, orphan_frac,
    n_parent_keys.

    Scale: one LEFT ANTI equi-join against the parent's DISTINCT key
    projection (broadcast when small, shuffle-hash otherwise — the
    optimizer's call) + two bounded reduces; the child scans once per
    side of the audit, never row-by-row.
    """
    keys = parent.select(F.col(parent_key).alias("__pk")).distinct()
    base = child.select(F.col(child_key).alias("__ck"))
    nulls = base.filter(F.col("__ck").isNull())
    orphans = (base.filter(F.col("__ck").isNotNull())
               .join(keys, F.col("__ck") == F.col("__pk"), "left_anti"))
    c1 = base.agg(F.count(F.lit(1)).cast("bigint").alias("n_child"))
    c2 = nulls.agg(F.count(F.lit(1)).cast("bigint")
                   .alias("n_null_keys"))
    c3 = orphans.agg(F.count(F.lit(1)).cast("bigint")
                     .alias("n_orphans"))
    c4 = keys.agg(F.count(F.lit(1)).cast("bigint")
                  .alias("n_parent_keys"))

    def k(df2, col):
        return df2.withColumn("__k", F.pmod(F.col(col), F.lit(1)))

    one = (k(c1, "n_child")
           .join(F.broadcast(k(c2, "n_null_keys")), "__k")
           .join(F.broadcast(k(c3, "n_orphans")), "__k")
           .join(F.broadcast(k(c4, "n_parent_keys")), "__k")
           .drop("__k"))
    return one.select(
        "n_child", "n_null_keys", "n_orphans",
        F.round(F.col("n_orphans").cast("double")
                / F.col("n_child").cast("double"), 6)
         .alias("orphan_frac"),
        "n_parent_keys")
