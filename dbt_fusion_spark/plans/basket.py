"""Market-basket association rules (Agrawal & Srikant 1994 measures:
support / confidence / lift) over an (order, item) fact table.

Scale design (100 TB): the pair generator is an order-keyed self-join
of the DISTINCT basket table — per-order work is O(basket_size²) with
basket sizes bounded by business reality (a TPC-H order holds ≤ 7
lines), never corpus-wide. Item supports and the order count shuffle on
their own keys with map-side partial aggregation and ride 1-row
broadcast scalar joins back onto the pair table. Every emitted measure
is an exact integer ratio evaluated in double — bit-identical across
engines with no rounding. Top-k is orderBy().limit() —
TakeOrderedAndProject, no global sort.

Reference surface parity note: the reference's SQL layer exposes no
basket operator; this extends the analytics family
(crates/dbt-agate-like aggregations) the way the PMI/TF-IDF rows do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def basket_pair_rules(df: DataFrame, order_col: str, item_col: str,
                      min_count: int = 5, k: int = 20) -> DataFrame:
    """Top-k item pairs by lift: for canonical pairs (a < b) co-present
    in >= min_count baskets, emit
      n_both, support = n_both/N, conf_a_to_b = n_both/c_a,
      conf_b_to_a = n_both/c_b, lift = n_both*N/(c_a*c_b).
    Ranking is lift desc then (item_a, item_b) — all measures are exact
    integer ratios, so both engines rank identical keys.
    """
    from dbt_fusion_spark.llm.corpus import _join_scalar

    baskets = df.select(F.col(order_col).alias("__o"),
                        F.col(item_col).alias("__i")).distinct()
    a = baskets.select("__o", F.col("__i").alias("item_a"))
    b = baskets.select("__o", F.col("__i").alias("item_b"))
    cp = (a.join(b, "__o")
          .filter(F.col("item_a") < F.col("item_b"))
          .groupBy("item_a", "item_b")
          .agg(F.count("*").alias("__cab"))
          .filter(F.col("__cab") >= min_count))
    ci = baskets.groupBy("__i").agg(F.count("*").alias("__ci"))
    n_orders = baskets.agg(
        F.countDistinct("__o").alias("__N"))
    j = (cp.join(ci.select(F.col("__i").alias("item_a"),
                           F.col("__ci").alias("__ca")), "item_a")
         .join(ci.select(F.col("__i").alias("item_b"),
                         F.col("__ci").alias("__cb")), "item_b"))
    j = _join_scalar(j, "__cab", n_orders, "__N")
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        j.select(
            "item_a", "item_b",
            F.col("__cab").cast("bigint").alias("n_both"),
            (dbl("__cab") / dbl("__N")).alias("support"),
            (dbl("__cab") / dbl("__ca")).alias("conf_a_to_b"),
            (dbl("__cab") / dbl("__cb")).alias("conf_b_to_a"),
            (dbl("__cab") * dbl("__N")
             / (dbl("__ca") * dbl("__cb"))).alias("lift"))
        .orderBy(F.col("lift").desc(), "item_a", "item_b")
        .limit(k))
