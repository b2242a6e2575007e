"""TPC-H-ish model queries — the "model SQL" layer of the engine.

In the reference, model SELECTs are executed verbatim by the target
warehouse (SURVEY §2.4 note: fusion implements zero SQL operators; the
warehouse is the executor). Here Spark SQL/Catalyst is that warehouse,
so these queries ARE the engine's query-execution surface: joins,
aggregations, windows, set-ops all ride whole-stage codegen.

Numeric discipline for oracle parity: source money columns are doubles;
every aggregate casts to DECIMAL first (exact, associative — immune to
partial-aggregation order), then the final value is cast to DOUBLE.
Averages divide the exact decimal sum by the count in double space
(IEEE-deterministic), avoiding ROUND entirely.

CRITICAL rules (verified empirically against duckdb 1.0 / spark 4.1):
- decimal→DOUBLE is engine-identical ONLY while the unscaled integer is
  < 2^53 (single correctly-rounded conversion); above that the engines
  differ by 1 ulp.
- NEVER scale-reduce a decimal for parity: Spark casts HALF_UP, DuckDB
  HALF_EVEN (0.20335→.2034 vs .2033).
- when the exact sum needs scale*digits beyond 2^53, return the exact
  decimal CAST TO STRING on both sides (both engines render full scale,
  e.g. '508216551.6471800000'); a bare DECIMAL column reaches pandas as
  Decimal objects from Spark but float64 from DuckDB and can never hash-
  match.
"""

from __future__ import annotations

from dbt_fusion_spark.demo.registry import sql_query

# Exact decimal renderings of the double source columns.
QTY = "CAST(l_quantity AS DECIMAL(18,2))"
PRICE = "CAST(l_extendedprice AS DECIMAL(18,2))"
DISC = "CAST(l_discount AS DECIMAL(8,4))"
TAX = "CAST(l_tax AS DECIMAL(8,4))"
REV = f"{PRICE} * (1 - {DISC})"  # decimal(27,6): exact

sql_query(
    "tpch_q1_pricing_summary",
    f"""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM({QTY}) AS DOUBLE)                         AS sum_qty,
      CAST(SUM({PRICE}) AS DOUBLE)                       AS sum_base_price,
      CAST(SUM({REV}) AS DOUBLE)                         AS sum_disc_price,
      CAST(CAST(SUM({REV} * (1 + {TAX})) AS DECIMAL(38,10)) AS STRING)
                                                         AS sum_charge,
      CAST(SUM({QTY}) AS DOUBLE) / COUNT(*)              AS avg_qty,
      CAST(SUM({PRICE}) AS DOUBLE) / COUNT(*)            AS avg_price,
      CAST(SUM({DISC}) AS DOUBLE) / COUNT(*)             AS avg_disc,
      COUNT(*)                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)

sql_query(
    "tpch_q3_shipping_priority",
    f"""
    SELECT
      o_orderkey,
      CAST(SUM({REV}) AS DOUBLE) AS revenue,
      o_orderdate,
      o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-03-15'
      AND l_shipdate > DATE '1998-03-15'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)

sql_query(
    "tpch_q5_local_supplier_volume",
    f"""
    SELECT
      n_name,
      CAST(SUM({REV}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name
    """,
)

sql_query(
    "tpch_q6_forecast_revenue",
    f"""
    SELECT
      CAST(SUM({PRICE} * {DISC}) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)

sql_query(
    "tpch_q10_returned_items",
    f"""
    SELECT
      c_custkey,
      c_name,
      CAST(SUM({REV}) AS DOUBLE) AS revenue,
      CAST(c_acctbal AS DOUBLE) AS c_acctbal,
      n_name,
      c_mktsegment
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1997-01-01'
      AND o_orderdate < DATE '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)

# Window functions: top-3 spenders per nation (reference models rely on
# warehouse window support; Spark windows are native).
sql_query(
    "window_top_customers_per_nation",
    f"""
    WITH spend AS (
      SELECT c_custkey, c_name, c_nationkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name, c_nationkey
    )
    SELECT n_name, c_name, total_spend, rnk
    FROM (
      SELECT n_name, c_name, total_spend,
             ROW_NUMBER() OVER (
               PARTITION BY n_name
               ORDER BY total_spend DESC, c_custkey
             ) AS rnk
      FROM spend JOIN nation ON c_nationkey = n_nationkey
    ) ranked
    WHERE rnk <= 3
    """,
)

# Set operations + EXISTS-style subqueries.
sql_query(
    "setop_active_vs_lapsed_customers",
    """
    SELECT c_custkey FROM customer
    WHERE c_custkey IN (
      SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '2000-01-01'
    )
    EXCEPT
    SELECT c_custkey FROM customer
    WHERE c_custkey IN (
      SELECT o_custkey FROM orders WHERE o_orderdate < DATE '1996-01-01'
    )
    """,
)

# Correlated-style aggregate subquery (decorrelated by Catalyst).
sql_query(
    "subquery_above_avg_orders",
    """
    WITH stats AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS cust_total
      FROM orders GROUP BY o_custkey
    )
    SELECT COUNT(*) AS n_above,
           CAST(MIN(cust_total) AS DOUBLE) AS min_above
    FROM stats
    WHERE cust_total > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                               / COUNT(*) FROM orders)
    """,
)


sql_query(
    "tpch_q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
             {REV} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)

sql_query(
    "tpch_q8_market_share",
    f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             {REV} AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    ) all_nations
    GROUP BY o_year
    """,
)

sql_query(
    "tpch_q14_promo_revenue",
    f"""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {REV}
                         ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
           * 100 / CAST(SUM({REV}) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1997-09-01' AND l_shipdate < DATE '1997-10-01'
    """,
)

sql_query(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({REV}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)

sql_query(
    "tpch_q18_large_orders",
    # Pre-aggregate lineitem ALONE (narrow l_orderkey+qty shuffle with
    # map-side combine) and filter to the rare >300 orders BEFORE
    # joining orders/customer — aggregating after the 3-table join
    # shuffles every joined row with the wide customer columns
    # attached. Identical semantics: the order->customer join is 1:1,
    # so per-order sums are unchanged by join placement.
    f"""
    WITH big AS (
      SELECT l_orderkey, SUM({QTY}) AS qty_sum
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM({QTY}) > 300)
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(qty_sum AS DOUBLE) AS sum_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)

sql_query(
    "tpch_q19_disjunctive_predicates",
    f"""
    SELECT CAST(SUM({REV}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 40)
    """,
)


sql_query(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)

sql_query(
    "tpch_q17_small_quantity_revenue",
    f"""
    SELECT CAST(SUM({PRICE}) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)

sql_query(
    "tpch_q4_priority_with_exists",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-07-01'
      AND o_orderdate < DATE '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)

# --- pivot / unpivot (relational reshaping; Spark PIVOT clause and
# stack() generator vs conditional-aggregation / UNION ALL oracles) ---

sql_query(
    "pivot_status_by_segment",
    """
    SELECT c_mktsegment,
           COALESCE(n_open, 0)    AS n_open,
           COALESCE(n_filled, 0)  AS n_filled,
           COALESCE(n_pending, 0) AS n_pending
    FROM (SELECT c_mktsegment, o_orderstatus
          FROM customer JOIN orders ON c_custkey = o_custkey)
    PIVOT (COUNT(*) FOR o_orderstatus
           IN ('O' AS n_open, 'F' AS n_filled, 'P' AS n_pending))
    ORDER BY c_mktsegment
    """,
    oracle="""
    SELECT c_mktsegment,
      COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
      COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
      COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)

sql_query(
    "unpivot_lineitem_metrics",
    f"""
    SELECT l_returnflag, metric, value
    FROM (
      SELECT l_returnflag,
             CAST(SUM({QTY}) AS DOUBLE)   AS sum_qty,
             CAST(SUM({PRICE}) AS DOUBLE) AS sum_price,
             CAST(SUM({REV}) AS DOUBLE)   AS sum_rev
      FROM lineitem GROUP BY l_returnflag) agg
    UNPIVOT (value FOR metric IN (sum_qty, sum_price, sum_rev))
    """,
    oracle=f"""
    WITH agg AS (
      SELECT l_returnflag,
             CAST(SUM({QTY}) AS DOUBLE)   AS sum_qty,
             CAST(SUM({PRICE}) AS DOUBLE) AS sum_price,
             CAST(SUM({REV}) AS DOUBLE)   AS sum_rev
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_rev' AS metric, sum_rev AS value FROM agg
    """,
)

# --- multi-level aggregation (ROLLUP / CUBE / GROUPING SETS — shared
# dialect, so the same text is the oracle; GROUPING() disambiguates
# the NULL super-aggregate rows) ---

sql_query(
    "rollup_returnflag_linestatus",
    f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag,
           GROUPING(l_linestatus) AS g_status,
           CAST(SUM({QTY}) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)

sql_query(
    "grouping_sets_segment_status",
    """
    SELECT c_mktsegment, o_orderstatus,
           GROUPING(c_mktsegment) AS g_seg,
           GROUPING(o_orderstatus) AS g_status,
           COUNT(*) AS n_orders
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus),
                            (c_mktsegment, o_orderstatus), ())
    """,
)

# --- window frames + ranking/offset functions (shared dialect) ---

sql_query(
    "window_running_and_moving_revenue",
    f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS running_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS moving_3_total,
           LAG(o_orderkey, 1) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS prev_orderkey,
           NTILE(4) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS quartile,
           CAST(PERCENT_RANK() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS DOUBLE) AS pct_rank
    FROM orders
    WHERE o_custkey <= 200
    """,
)

# --- ordered-set aggregates (PERCENTILE_CONT WITHIN GROUP — exact
# interpolation, IEEE-deterministic in both engines) ---

sql_query(
    "percentile_order_value_by_segment",
    """
    SELECT c_mktsegment,
      PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
      PERCENTILE_CONT(0.5)  WITHIN GROUP (ORDER BY o_totalprice) AS p50,
      PERCENTILE_CONT(0.9)  WITHIN GROUP (ORDER BY o_totalprice) AS p90,
      COUNT(*) AS n_orders
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)


# --- TPC-H q2/q9/q11/q12/q16/q20/q21/q22, adapted to the partsupp-less
# star schema (TESTDATA.md): the part-supplier relation and its "supply
# cost" are derived from lineitem (unit price actually charged), which
# preserves each query's operator shape — correlated MIN subquery (q2),
# per-nation profit decomposition (q9), scalar-subquery HAVING (q11),
# conditional aggregation (q12), NOT IN + COUNT DISTINCT (q16), nested
# grouped IN-subquery (q20), EXISTS/NOT EXISTS self-joins (q21), and
# scalar-avg filter + anti-join (q22). Reference query texts:
# crates/dbt-fusion-tests equivalents run these via the warehouse; here
# Spark SQL is the warehouse (SURVEY §2.4 note).

sql_query(
    "tpch_q2_min_cost_supplier",
    # Classic q2 writes the per-part minimum as a correlated scalar
    # subquery over the same supply relation, which plans TWO lineitem
    # scans + aggregates. The subquery correlates only on partkey and
    # both sides carry the same EUROPE filter, so the per-part minimum
    # over the main join's own rows is identical — one window over the
    # single-pass join replaces the second scan. (The part filters
    # prune partkeys, never the supplier set within a partkey.)
    """
    WITH supply AS (
      SELECT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
      SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, unit_cost,
             MIN(unit_cost) OVER (PARTITION BY p_partkey) AS min_cost
      FROM part
      JOIN supply ON p_partkey = sp_partkey
      JOIN supplier ON s_suppkey = sp_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE p_size <= 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, unit_cost
    FROM eu
    WHERE unit_cost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)

sql_query(
    "tpch_q9_product_type_profit",
    f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             EXTRACT(YEAR FROM o_orderdate) AS o_year,
             {REV} - CAST(p_retailprice AS DECIMAL(6,2))
                     * CAST(l_quantity AS DECIMAL(6,2))
                     * CAST(0.6 AS DECIMAL(2,1)) AS amount
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)

sql_query(
    "tpch_q11_important_stock",
    f"""
    SELECT l_partkey AS ps_partkey,
           CAST(SUM({REV}) AS DOUBLE) AS value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
    GROUP BY l_partkey
    HAVING CAST(SUM({REV}) AS DOUBLE) > (
      SELECT CAST(SUM({REV}) AS DOUBLE) / 500
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3')
    ORDER BY value DESC, ps_partkey
    """,
)

sql_query(
    "tpch_q12_priority_shipping",
    """
    SELECT l_returnflag,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1997-01-01'
      AND l_shipdate < DATE '1998-01-01'
      AND l_shipdate > o_orderdate
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)

sql_query(
    "tpch_q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'MEDIUM'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)

sql_query(
    "tpch_q20_potential_promotion",
    """
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1998-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 40)
    ORDER BY s_name
    """,
)

sql_query(
    "tpch_q21_waiting_supplier",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND r_name = 'ASIA'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)

sql_query(
    "tpch_q22_global_sales_opportunity",
    """
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM (
      SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode,
             c_acctbal, c_custkey
      FROM customer
      WHERE c_nationkey % 5 IN (0, 1, 2)
        AND c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*)
          FROM customer
          WHERE c_acctbal > 0.0 AND c_nationkey % 5 IN (0, 1, 2))
    ) cust
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= DATE '2001-01-01')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
