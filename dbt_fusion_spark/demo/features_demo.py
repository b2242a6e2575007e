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
      FROM seq WHERE t3 IS NOT NULL GROUP BY 1)
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
