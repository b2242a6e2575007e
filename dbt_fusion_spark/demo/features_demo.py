"""Gate queries for plans/encode.py + the embedding centroid audit —
the feature-engineering layer of a training pipeline.

Oracles restate each operator's exact arithmetic (integer category
stats, LEAD-window n-grams, round(9)->DECIMAL quantized float moments)
so value hashes compare bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_fusion_spark.demo.registry import register
from dbt_fusion_spark.plans.encode import target_encode_loo, top_paths
from dbt_fusion_spark.sources.registry import load_table


@register(
    "feature_target_encode_orders",
    # LOO mean encoding: (sum_c - y + m*prior)/(n_c - 1 + m), m = 10;
    # integer category stats, prior from grid windows.
    oracle="""
    WITH tagged AS (
      SELECT o_orderkey, o_orderpriority AS cat,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders),
    cats AS (
      SELECT cat, CAST(COUNT(*) AS BIGINT) AS n_c,
             CAST(SUM(y) AS BIGINT) AS sum_c
      FROM tagged GROUP BY 1),
    g AS (
      SELECT *, CAST(SUM(n_c) OVER () AS BIGINT) AS n_all,
                CAST(SUM(sum_c) OVER () AS BIGINT) AS sum_all
      FROM cats)
    SELECT t.o_orderkey, t.cat AS o_orderpriority,
           CAST(t.y AS BIGINT) AS y,
           round((CAST(g.sum_c - t.y AS DOUBLE)
                  + 10.0 * (CAST(g.sum_all AS DOUBLE)
                            / CAST(g.n_all AS DOUBLE)))
                 / (CAST(g.n_c - 1 AS DOUBLE) + 10.0), 6) AS te
    FROM tagged t JOIN g ON t.cat = g.cat
    """,
)
def feature_target_encode_orders(spark, sf_dir):
    """Leave-one-out target encoding of order priority against the
    'order finished' label — the leakage-safe categorical feature every
    tabular model starts with. One grid aggregate + broadcast join."""
    orders = load_table(spark, sf_dir, "orders")
    return target_encode_loo(orders, ["o_orderkey"], "o_orderpriority",
                             (F.col("o_orderstatus") == "F").cast("int"),
                             m=10.0)


@register(
    "events_top_paths",
    # LEAD-window trigrams per user (ts, event_id tiebreak), counts on
    # the |event_types|^3-bounded path grid, deterministic top-20.
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    grams AS (
      SELECT event_type || '>' || t2 || '>' || t3 AS path,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM seq WHERE event_type || '>' || t2 || '>' || t3 IS NOT NULL
      GROUP BY 1)
    SELECT CAST(rank AS INTEGER) AS rank, path, n_occurrences
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY n_occurrences DESC,
                                       path) AS rank
          FROM grams)
    WHERE rank <= 20
    """,
)
def events_top_paths(spark, sf_dir):
    """Top-20 length-3 event paths across all users — the behavioral
    n-gram readout behind funnel design (and the empirical check on
    events_markov_transitions). No self-joins: LEAD offsets come from
    the one per-user window sort."""
    ev = load_table(spark, sf_dir, "events")
    return top_paths(ev, "user_id", "ts", "event_type", "event_id",
                     n=3, k=20)


@register(
    "embedding_label_centroids",
    # per-(label, dim) float moments via round(9)->DECIMAL(38,9)
    # quantization; wide-decimal -> double via VARCHAR.
    oracle="""
    WITH flat AS (
      SELECT label, t.i - 1 AS dim,
        CAST(round(CAST(embedding[t.i] AS DOUBLE), 9)
             AS DECIMAL(38,9)) AS xq,
        CAST(round(CAST(embedding[t.i] AS DOUBLE)
                   * CAST(embedding[t.i] AS DOUBLE), 9)
             AS DECIMAL(38,9)) AS xx
      FROM embeddings,
           unnest(generate_series(1, len(embedding))) t(i)),
    g AS (
      SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n_vecs,
             SUM(xq) AS s, SUM(xx) AS q
      FROM flat GROUP BY 1, 2)
    SELECT label, CAST(dim AS INTEGER) AS dim, n_vecs,
           round(CAST(CAST(s AS VARCHAR) AS DOUBLE)
                 / CAST(n_vecs AS DOUBLE), 6) AS mean,
           CASE WHEN n_vecs > 1 THEN
             round((CAST(CAST(q AS VARCHAR) AS DOUBLE)
                    - CAST(CAST(s AS VARCHAR) AS DOUBLE)
                      * CAST(CAST(s AS VARCHAR) AS DOUBLE)
                      / CAST(n_vecs AS DOUBLE))
                   / (CAST(n_vecs AS DOUBLE) - 1), 6) END AS var
    FROM g
    """,
)
def embedding_label_centroids(spark, sf_dir):
    """Per-label embedding centroids + per-dimension variance — the
    cluster-health audit behind semantic dedup cells and nearest-
    centroid classification. One posexplode pass onto the
    (labels x 64)-bounded grid."""
    from dbt_fusion_spark.llm.similarity import label_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    return label_centroids(emb, "label", "embedding")


@register(
    "feature_winsorize_orders",
    # exact [1,99] percentiles per priority from the integer grid walk
    # (cum*100 >= p*total, lower convention); clip is pure projection.
    oracle="""
    WITH grid AS (
      SELECT o_orderpriority AS grp, o_totalprice AS val,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2),
    cum AS (
      SELECT *,
        CAST(SUM(n) OVER (PARTITION BY grp) AS BIGINT) AS total,
        CAST(SUM(n) OVER (PARTITION BY grp ORDER BY val
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS c
      FROM grid),
    lo AS (SELECT grp, MIN(val) AS lo FROM cum
           WHERE c * 100 >= 1 * total GROUP BY grp),
    hi AS (SELECT grp, MIN(val) AS hi FROM cum
           WHERE c * 100 >= 99 * total GROUP BY grp),
    b AS (SELECT lo.grp, lo.lo, hi.hi FROM lo JOIN hi ON lo.grp = hi.grp)
    SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
           least(greatest(o.o_totalprice, b.lo), b.hi) AS clipped,
           CASE WHEN o.o_totalprice < b.lo THEN 'lo'
                WHEN o.o_totalprice > b.hi THEN 'hi'
                ELSE 'none' END AS clip_side
    FROM orders o JOIN b ON o.o_orderpriority = b.grp
    """,
)
def feature_winsorize_orders(spark, sf_dir):
    """Winsorize order totals to their priority group's exact [1, 99]
    percentiles — the heavy-tail guard before any moment-based feature.
    Percentiles from the integer grid walk; clipping is a broadcast
    join + projection."""
    from dbt_fusion_spark.plans.encode import winsorize_clip

    orders = load_table(spark, sf_dir, "orders")
    return winsorize_clip(orders, ["o_orderkey"], "o_orderpriority",
                          "o_totalprice", p_lo=1, p_hi=99)


@register(
    "feature_zscore_events",
    # per-type moments on DECIMAL-exact sums -> broadcast -> z; the
    # emitted moments and z round(6) (all O(1..100) magnitudes).
    oracle="""
    WITH st AS (
      SELECT event_type AS g, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST("value" AS DECIMAL(18,6))) AS s,
             SUM(CAST("value" AS DECIMAL(19,6))
                 * CAST("value" AS DECIMAL(19,6))) AS q
      FROM events GROUP BY 1),
    m AS (
      SELECT g,
        CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        CASE WHEN n > 1 THEN
          sqrt((CAST(CAST(q AS VARCHAR) AS DOUBLE)
                - CAST(CAST(s AS VARCHAR) AS DOUBLE)
                  * CAST(CAST(s AS VARCHAR) AS DOUBLE)
                  / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
        END AS sd
      FROM st)
    SELECT e.event_id, e.event_type, e."value",
           round(m.mu, 6) AS group_mean,
           round(m.sd, 6) AS group_stddev,
           CASE WHEN m.sd > 0
                THEN round((e."value" - m.mu) / m.sd, 6) END AS z
    FROM events e JOIN m ON e.event_type = m.g
    """,
)
def feature_zscore_events(spark, sf_dir):
    """Per-type z-score standardization of event values — the unit-
    variance transform. One grid aggregate, broadcast back."""
    from dbt_fusion_spark.plans.encode import standardize_zscore

    ev = load_table(spark, sf_dir, "events")
    return standardize_zscore(ev, ["event_id"], "event_type", "value")


@register(
    "dq_functional_dependency",
    # det->dep audit rolled to the bounded cardinality histogram:
    # how many order keys carry exactly k distinct return flags.
    oracle="""
    WITH pairs AS (
      SELECT l_orderkey AS det, l_returnflag AS dep, COUNT(*) AS n
      FROM lineitem GROUP BY 1, 2),
    fd AS (
      SELECT det, CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_dep_values
      FROM pairs GROUP BY det)
    SELECT n_dep_values, CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           n_dep_values > 1 AS is_violation
    FROM fd GROUP BY n_dep_values
    """,
)
def dq_functional_dependency(spark, sf_dir):
    """Functional-dependency audit: does l_orderkey determine
    l_returnflag? (It doesn't — a multi-line order can mix returned and
    kept lines; the histogram quantifies by how much.) The per-key
    audit rolls up to the bounded dependency-cardinality histogram for
    the gate."""
    from dbt_fusion_spark.plans.profile import functional_dependency

    li = load_table(spark, sf_dir, "lineitem")
    fd = functional_dependency(li, "l_orderkey", "l_returnflag")
    return (fd.groupBy("n_dep_values")
            .agg(F.count(F.lit(1)).alias("n_keys"),
                 F.sum("n_rows").alias("n_rows"))
            .select("n_dep_values", "n_keys", "n_rows",
                    (F.col("n_dep_values") > 1).alias("is_violation")))


@register(
    "events_metric_correlations",
    # daily per-type rollup (DECIMAL-exact), pairwise join on day over
    # the bounded (types x days) grid, Pearson from moment sums.
    oracle="""
    WITH daily AS (
      SELECT event_type AS k, date_trunc('day', ts) AS d,
             SUM(CAST("value" AS DECIMAL(18,6))) AS dv
      FROM events GROUP BY 1, 2),
    pair AS (
      SELECT a.k AS key_a, b.k AS key_b,
             CAST(a.dv AS DECIMAL(19,6)) AS va,
             CAST(b.dv AS DECIMAL(19,6)) AS vb
      FROM daily a JOIN daily b ON a.d = b.d AND a.k < b.k),
    m AS (
      SELECT key_a, key_b, CAST(COUNT(*) AS BIGINT) AS n_days,
             SUM(va) AS sx, SUM(vb) AS sy,
             SUM(va * va) AS sxx, SUM(vb * vb) AS syy,
             SUM(va * vb) AS sxy
      FROM pair GROUP BY 1, 2)
    SELECT key_a, key_b, n_days,
      round((CAST(n_days AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
             - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
               * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
            / sqrt((CAST(n_days AS DOUBLE)
                    * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                    - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                      * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
                   * (CAST(n_days AS DOUBLE)
                      * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
                      - CAST(CAST(sy AS VARCHAR) AS DOUBLE)
                        * CAST(CAST(sy AS VARCHAR) AS DOUBLE))), 6)
        AS corr
    FROM m
    """,
)
def events_metric_correlations(spark, sf_dir):
    """Pairwise Pearson correlation matrix of per-type daily value
    series — which metrics move together (redundant) or apart
    (inversely coupled). Pair join runs on the bounded (types x days)
    rollup, never on raw rows."""
    from dbt_fusion_spark.plans.stats import metric_correlations

    ev = load_table(spark, sf_dir, "events")
    return metric_correlations(ev, "event_type", "ts", "value")


@register(
    "graph_clustering_coeff_suppliers",
    # co-order supplier graph; cc = 2T/(d(d-1)) — exact integer ratio;
    # triangles by the compact-forward walk (a<b<c once).
    oracle="""
    WITH b AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS i
               FROM lineitem),
    e AS (SELECT DISTINCT a.i AS a, b2.i AS b
          FROM b a JOIN b b2 USING (o) WHERE a.i < b2.i),
    deg AS (
      SELECT vertex, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT a AS vertex FROM e UNION ALL SELECT b FROM e)
      GROUP BY vertex),
    w AS (SELECT e1.a, e1.b, e2.b AS c
          FROM e e1 JOIN e e2 ON e1.b = e2.a),
    t AS (SELECT w.* FROM w JOIN e ON e.a = w.a AND e.b = w.c),
    tri AS (
      SELECT vertex, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS vertex FROM t
        UNION ALL SELECT b FROM t
        UNION ALL SELECT c FROM t)
      GROUP BY vertex)
    SELECT d.vertex, d.degree,
           COALESCE(tri.n_triangles, 0) AS n_triangles,
           CASE WHEN d.degree > 1 THEN
             round(2.0 * COALESCE(tri.n_triangles, 0)
                   / (d.degree * (d.degree - 1)), 6)
           END AS clustering_coeff
    FROM deg d LEFT JOIN tri ON tri.vertex = d.vertex
    """,
)
def graph_clustering_coeff_suppliers(spark, sf_dir):
    """Local clustering coefficients on the supplier co-order graph
    (suppliers co-present in an order are connected) — how clique-like
    each supplier's neighborhood is, the community-structure dial next
    to pagerank/triangles. Exact 2T/(d(d-1)); one materialized edge
    set feeds degrees and the compact-forward triangle count."""
    from dbt_fusion_spark.plans.triangles import clustering_coefficients

    b = (load_table(spark, sf_dir, "lineitem")
         .select(F.col("l_orderkey").alias("o"),
                 F.col("l_suppkey").alias("i")).distinct())
    a2 = b.withColumnRenamed("i", "i2")
    edges = (b.join(a2, "o")
             .filter(F.col("i") < F.col("i2"))
             .select(F.col("i").alias("src"), F.col("i2").alias("dst")))
    return clustering_coefficients(edges, "src", "dst",
                                   broadcast_edges=True)


@register(
    "feature_woe_iv_orders",
    # equal-width bins over [min, max]; WOE/IV with the zero-cell
    # convention (NULL woe, 0 IV contribution); round(9)-DECIMAL IV
    # terms.
    oracle="""
    WITH base AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
               AS y,
             CAST(o_totalprice AS DOUBLE) AS x
      FROM orders
      WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
    bounds AS (SELECT MIN(x) AS lo, MAX(x) AS hi,
                      CAST(COUNT(*) AS BIGINT) AS nn FROM base),
    binned AS (
      SELECT y,
        CASE WHEN b.hi = b.lo THEN 0
             ELSE least(CAST(floor((x - b.lo) / ((b.hi - b.lo) / 10.0))
                             AS BIGINT), 9) END AS bin,
        b.lo, b.hi
      FROM base CROSS JOIN bounds b),
    g AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(y) AS BIGINT) AS n_good,
             CAST(SUM(1 - y) AS BIGINT) AS n_bad,
             MAX(lo) AS lo, MAX(hi) AS hi
      FROM binned GROUP BY 1),
    w AS (
      SELECT *, CAST(SUM(n_good) OVER () AS BIGINT) AS G,
             CAST(SUM(n_bad) OVER () AS BIGINT) AS B
      FROM g),
    t AS (
      SELECT *,
        CASE WHEN n_good > 0 AND n_bad > 0 AND G > 0 AND B > 0 THEN
          ln((CAST(n_good AS DOUBLE) / CAST(G AS DOUBLE))
             / (CAST(n_bad AS DOUBLE) / CAST(B AS DOUBLE))) END AS woe,
        CASE WHEN n_good > 0 AND n_bad > 0 AND G > 0 AND B > 0 THEN
          CAST(round((CAST(n_good AS DOUBLE) / CAST(G AS DOUBLE)
                      - CAST(n_bad AS DOUBLE) / CAST(B AS DOUBLE))
            * ln((CAST(n_good AS DOUBLE) / CAST(G AS DOUBLE))
                 / (CAST(n_bad AS DOUBLE) / CAST(B AS DOUBLE))), 9)
            AS DECIMAL(38,9))
        ELSE CAST(0 AS DECIMAL(38,9)) END AS ivt
      FROM w)
    SELECT bin,
      round(lo + (hi - lo) / 10.0 * CAST(bin AS DOUBLE), 6) AS bin_lo,
      round(CASE WHEN bin = 9 THEN hi
                 ELSE lo + (hi - lo) / 10.0 * CAST(bin + 1 AS DOUBLE)
            END, 6) AS bin_hi,
      n_rows, n_good, n_bad,
      round(woe, 6) AS woe,
      round(CAST(CAST(ivt AS VARCHAR) AS DOUBLE), 6) AS iv_term,
      round(CAST(CAST(SUM(ivt) OVER () AS VARCHAR) AS DOUBLE), 6)
        AS iv
    FROM t
    """,
)
def feature_woe_iv_orders(spark, sf_dir):
    """WOE/IV screen of order value against the urgent-priority label
    (r10) — the scorecard-style feature-relevance audit: 10 equal-
    width bins, per-bin weight of evidence, table-wide information
    value. One bounds aggregate + one bin-grid aggregate."""
    from dbt_fusion_spark.plans.encode import woe_iv_bins

    orders = load_table(spark, sf_dir, "orders")
    return woe_iv_bins(
        orders, (F.col("o_orderpriority") == "1-URGENT").cast("int"),
        "o_totalprice", bins=10)
