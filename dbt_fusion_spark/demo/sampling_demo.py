"""Driver-gate queries for sampling strategies (SURVEY §2.8, dbt-sample
plan.rs:89-124)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_fusion_spark.demo.registry import register
from dbt_fusion_spark.sample import (
    neyman_allocation,
    sample_branch,
    sample_group,
    sample_hash,
    sample_random,  # noqa: F401 — documented alternate
    sample_neyman,
    sample_random_portable,
    sample_stratified,  # noqa: F401 — documented alternate
    sample_stratified_portable,
    sample_time,
)
from dbt_fusion_spark.sources.registry import load_table


@register(
    "sample_time_window",
    oracle="""
    SELECT o_orderkey, o_orderdate FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
)
def sample_time_window(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders")
    return sample_time(df, "o_orderdate", start="1997-01-01", end="1998-01-01").select(
        "o_orderkey", "o_orderdate"
    )


@register(
    "sample_hash_bucket",
    oracle="""
    SELECT o_orderkey FROM orders
    WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 8, 1) IN ('0', '1', '2')
    """,
)
def sample_hash_bucket(spark, sf_dir):
    """Hash{by,mod=16,keep=3} with the portable md5 bucket: bucket =
    conv(md5[1:8], 16, 10) % 16, which is exactly the 8th hex nibble —
    the oracle states it that way. Stable under repartitioning."""
    df = load_table(spark, sf_dir, "orders")
    return sample_hash(df, "o_orderkey", mod=16, keep=3, method="md5").select("o_orderkey")


@register(
    "sample_group_topn",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 2
    """,
)
def sample_group_topn(spark, sf_dir):
    """Group{by,n_per_group}: latest 2 orders per customer."""
    df = load_table(spark, sf_dir, "orders")
    return sample_group(
        df, "o_custkey", 2, [F.col("o_orderdate").desc(), F.col("o_orderkey")]
    ).select("o_custkey", "o_orderkey", "o_orderdate")


@register(
    "sample_branch_alloc",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_totalprice > 250000 THEN 'whale'
                WHEN o_orderstatus = 'O' THEN 'open'
           END AS __branch
    FROM orders
    WHERE o_totalprice > 250000 OR o_orderstatus = 'O'
    """,
)
def sample_branch_alloc(spark, sf_dir):
    """Branch{predicates,alloc}: first matching predicate labels the row;
    unmatched rows drop."""
    df = load_table(spark, sf_dir, "orders")
    return sample_branch(
        df,
        predicates=["o_totalprice > 250000", "o_orderstatus = 'O'"],
        alloc=["whale", "open"],
    ).select("o_orderkey", "o_totalprice", "__branch")


@register(
    "sample_random_seeded",
    oracle="""
    SELECT o_orderkey FROM orders
    WHERE CAST('0x' || substring(md5('42|' || CAST(o_orderkey AS VARCHAR)), 1, 8)
               AS BIGINT) < 429496729
    """,
)
def sample_random_seeded(spark, sf_dir):
    """Random{frac,seed} via the portable keyed hash (plan.rs:89-124
    mandates frac+seed determinism, not an RNG): keep rows whose
    md5-derived unit hash < frac*2^32 — exactly oracle-checkable.
    `sample_random` (Spark-native Bernoulli) remains the alternate."""
    df = load_table(spark, sf_dir, "orders")
    return sample_random_portable(df, 0.1, by="o_orderkey", seed=42).select("o_orderkey")


@register(
    "sample_stratified_by_segment",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE CAST('0x' || substring(md5('42|' || CAST(c_custkey AS VARCHAR)), 1, 8)
               AS BIGINT)
          < CASE c_mktsegment WHEN 'BUILDING'   THEN 2147483648
                              WHEN 'AUTOMOBILE' THEN 1073741824
                              WHEN 'MACHINERY'  THEN 429496729
                              ELSE NULL END
    """,
)
def sample_stratified_by_segment(spark, sf_dir):
    """Stratified{by,frac_map,seed} with the portable per-stratum hash
    threshold; `sample_stratified` (df.sampleBy) remains the alternate."""
    df = load_table(spark, sf_dir, "customer")
    return sample_stratified_portable(
        df, "c_mktsegment",
        {"BUILDING": 0.5, "AUTOMOBILE": 0.25, "MACHINERY": 0.1},
        key="c_custkey", seed=42,
    ).select("c_custkey", "c_mktsegment")


@register(
    "sample_split_assign",
    # cumulative thresholds: train [0,.9) = 3865470566, val [.9,.95) =
    # 4080218931, test rest — over the portable unit hash of doc_id.
    oracle="""
    SELECT doc_id,
           CASE WHEN h < 3865470566 THEN 'train'
                WHEN h < 4080218931 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id,
                 CAST('0x' || substring(md5('42|' || CAST(doc_id AS VARCHAR)),
                                        1, 8) AS BIGINT) AS h
          FROM documents)
    """,
)
def sample_split_assign(spark, sf_dir):
    """Deterministic train/val/test assignment from the portable keyed
    hash: reproducible across engines/repartitions, and stable under
    incremental corpus growth (a doc never migrates splits)."""
    from dbt_fusion_spark.sample.strategies import split_assign

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return split_assign(
        docs, "doc_id",
        {"train": 0.9, "val": 0.05, "test": 0.05}, seed=42,
    ).select("doc_id", "split")


@register(
    "sample_weighted_reservoir",
    # A-Res: u = (md5-unit-hash + 1) / 2^32 in (0,1]; keep the 50
    # smallest -ln(u)/n_chars. Same algebra restated verbatim.
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             -ln((CAST('0x' || substring(md5('42|' || CAST(doc_id AS VARCHAR)),
                                         1, 8) AS BIGINT) + 1) / 4294967296.0)
               / CAST(n_chars AS DOUBLE) AS es
      FROM documents WHERE n_chars > 0)
    SELECT doc_id, source, n_chars
    FROM keyed ORDER BY es ASC LIMIT 50
    """,
)
def sample_weighted_reservoir(spark, sf_dir):
    """Weighted sample of 50 docs, probability proportional to length
    (Efraimidis-Spirakis order statistics over the portable hash)."""
    from dbt_fusion_spark.sample.strategies import sample_weighted

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars")
    return sample_weighted(docs, "n_chars", 50, key="doc_id", seed=42)


@register(
    "sampler_plan_referential",
    # SamplerPlan executor (plan.rs SamplerPlan/Keyset/Entry/Filter):
    # hash-sample orders (portable md5 buckets), propagate the
    # surviving order keys as a keyset, lineitem passes through the
    # keyset filter — the oracle restates the identical algebra, and
    # the orphan count being ZERO is the referential-integrity
    # property the keyset machinery exists to provide.
    oracle="""
    WITH sampled_orders AS (
      SELECT * FROM orders
      WHERE CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)
                 AS BIGINT) % 10 < 3),
    sampled_lineitem AS (
      SELECT l.* FROM lineitem l
      WHERE l.l_orderkey IN (SELECT o_orderkey FROM sampled_orders))
    SELECT 'orders' AS tbl,
           CAST((SELECT COUNT(*) FROM sampled_orders) AS BIGINT) AS n_rows,
           CAST(0 AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'lineitem',
           CAST((SELECT COUNT(*) FROM sampled_lineitem) AS BIGINT),
           CAST((SELECT COUNT(*) FROM sampled_lineitem
                 WHERE l_orderkey NOT IN
                       (SELECT o_orderkey FROM sampled_orders)) AS BIGINT)
    """,
)
def sampler_plan_referential(spark, sf_dir):
    """Referentially-intact dev sampling (sample/plan.py, plan.rs
    SamplerPlan): orders hash-sampled on portable md5 buckets, the
    surviving keys broadcast as a keyset, lineitem kept only where its
    foreign key survived (left-semi broadcast join — child table never
    shuffles). Emits per-table row counts + the orphan count (must be
    0: the joinability property the keyset machinery buys)."""
    from dbt_fusion_spark.sample.plan import run_sampler_plan

    plan = {
        "keysets": {
            "live_orders": {
                "cols": ["o_orderkey"],
                "from": {"root": "orders",
                         "strategy": {"type": "hash",
                                      "args": {"by": "o_orderkey",
                                               "mod": 10, "keep": 3,
                                               "method": "md5"}}},
            },
        },
        "entries": [
            {"select": "orders",
             "strategy": {"type": "hash",
                          "args": {"by": "o_orderkey", "mod": 10,
                                   "keep": 3, "method": "md5"}}},
            {"select": "lineitem", "strategy": {"type": "pass"},
             "filters": [{"use": "live_orders", "on": "l_orderkey"}]},
        ],
    }
    out = run_sampler_plan(spark, plan,
                           read=lambda sel: load_table(spark, sf_dir, sel))
    o, li = out["orders"], out["lineitem"]
    okeys = o.select("o_orderkey")
    orphans = (li.join(F.broadcast(okeys),
                       li["l_orderkey"] == okeys["o_orderkey"],
                       "left_anti")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    r1 = o.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows")).select(
        F.lit("orders").alias("tbl"), "n_rows",
        F.lit(0).cast("bigint").alias("n_orphans"))
    r2_n = li.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    key = "__k"
    r2 = (r2_n.withColumn(key, F.pmod(F.abs(F.xxhash64("n_rows")), F.lit(1)))
          .join(F.broadcast(orphans.withColumn(
              key, F.pmod(F.abs(F.xxhash64("n")), F.lit(1)))), key)
          .select(F.lit("lineitem").alias("tbl"), "n_rows",
                  F.col("n").alias("n_orphans")))
    return r1.unionByName(r2)


@register(
    "sample_leakage_safe_split",
    # same corpus-with-copies as embedding_near_dups; the recursive CTE
    # is the min-label closure over the dup pairs (cf.
    # dedup_connected_clusters); fold = portable md5 threshold on the
    # GROUP id, restated verbatim
    oracle="""
    WITH RECURSIVE corpus AS (
      SELECT vec_id, embedding, label FROM embeddings
      UNION ALL
      SELECT vec_id + 10000, embedding, label FROM embeddings
      WHERE vec_id % 50 = 0),
    celled AS (
      SELECT *,
             (CASE WHEN CAST(embedding[1] AS DOUBLE) > 0 THEN 1 ELSE 0 END
            + CASE WHEN CAST(embedding[2] AS DOUBLE) > 0 THEN 2 ELSE 0 END
            + CASE WHEN CAST(embedding[3] AS DOUBLE) > 0 THEN 4 ELSE 0 END
            + CASE WHEN CAST(embedding[4] AS DOUBLE) > 0 THEN 8 ELSE 0 END
             ) AS subcell
      FROM corpus),
    dup AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM celled a JOIN celled b
        ON a.label = b.label AND a.subcell = b.subcell
       AND a.vec_id < b.vec_id
      WHERE (list_sum(list_transform(list_zip(a.embedding, b.embedding),
                                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))))
            / ((sqrt(list_sum(list_transform(list_zip(a.embedding, a.embedding),
                                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))))
             * (sqrt(list_sum(list_transform(list_zip(b.embedding, b.embedding),
                                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))))))
            >= 0.95),
    edges AS (SELECT id_a AS u, id_b AS v FROM dup
              UNION SELECT id_b, id_a FROM dup),
    reach AS (
      SELECT u AS node, u AS lbl FROM edges
      UNION SELECT u, v FROM edges
      UNION SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.node = e.v),
    comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node),
    grouped AS (
      SELECT c.vec_id, COALESCE(p.component, c.vec_id) AS grp
      FROM corpus c LEFT JOIN comp p ON p.node = c.vec_id)
    SELECT vec_id,
           CASE WHEN CAST('0x' || substring(
                    md5('42|' || CAST(grp AS VARCHAR)), 1, 8) AS BIGINT)
                     < CAST(floor(0.8 * 4294967296) AS BIGINT)
                THEN 'train' ELSE 'test' END AS fold
    FROM grouped
    """,
)
def sample_leakage_safe_split(spark, sf_dir):
    """Leakage-safe train/test split (sample/strategies.py
    leakage_safe_split): embedding near-dup pairs -> connected
    components -> fold decided by the portable hash of the COMPONENT
    id, so injected copies always land in the same fold as their
    original — the contamination-control primitive an eval pipeline
    needs at any scale.

    Blocking is label x 4-sign-bit subcell (hyperplane_bucket —
    restated verbatim in the oracle): label-only cells grow linearly
    with the corpus, so the in-cell pair join went quadratic at the
    10x corpus (measured 13.4x wall at 10x before the subcell). True
    near-dups share every sign bit, so the injected copies stay
    co-blocked."""
    from dbt_fusion_spark.llm import similarity as S
    from dbt_fusion_spark.sample.strategies import leakage_safe_split

    emb = load_table(spark, sf_dir, "embeddings")
    copies = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label")
    corpus = (emb.select("vec_id", "embedding", "label")
              .unionByName(copies)
              .withColumn("__cell", F.concat_ws(
                  "|", F.col("label").cast("string"),
                  S.hyperplane_bucket("embedding", 4).cast("string"))))
    pairs = S.embedding_near_dups(corpus, threshold=0.95,
                                  cell_col="__cell")
    return leakage_safe_split(
        corpus.select("vec_id"), "vec_id", pairs,
        fracs={"train": 0.8, "test": 0.2}).select("vec_id", "fold")


@register(
    "sample_neyman_allocation",
    # exact integer arithmetic end-to-end: cents are DECIMAL-quantized,
    # N*sum(x^2) - sum(x)^2 stays an exact integer (HUGEINT), the
    # weight floors to BIGINT, allocation = (n * w) // sum(w).
    oracle="""
    WITH cents AS (
      SELECT o_orderpriority AS stratum,
             CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS HUGEINT) AS c
      FROM orders),
    per AS (
      SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_rows,
             SUM(c) AS sx, SUM(c * c) AS sxx
      FROM cents GROUP BY stratum),
    wt AS (
      SELECT stratum, n_rows,
             sqrt(CAST(n_rows * sxx - sx * sx AS DOUBLE))
               / CAST(n_rows AS DOUBLE) / 100.0 AS value_std,
             CAST(floor(sqrt(CAST(n_rows * sxx - sx * sx AS DOUBLE)))
                  AS BIGINT) AS w
      FROM per),
    tot AS (SELECT SUM(w) AS tw FROM wt)
    SELECT stratum, n_rows, value_std,
           CAST((1000 * w) // tw AS BIGINT) AS n_alloc
    FROM wt CROSS JOIN tot
    """,
)
def sample_neyman_allocation(spark, sf_dir):
    """Neyman-optimal stratified allocation (r8): the sampling budget
    split across order-priority strata proportionally to N_h * S_h of
    the order value — the variance-minimizing eval-set draw plan.
    One stratum-keyed aggregate; N_h*S_h = sqrt(N*sum(x^2)-sum(x)^2)
    over EXACT decimal-integer cents, so both engines floor the same
    IEEE double and the allocation is pure integer arithmetic."""
    orders = load_table(spark, sf_dir, "orders")
    return neyman_allocation(orders, "o_orderpriority", "o_totalprice",
                             total_n=1000)


@register(
    "sample_neyman_rows",
    # the drawn sample itself: per stratum, the n_alloc lowest-md5(id)
    # rows — the portable-hash draw, identical on every engine.
    oracle="""
    WITH cents AS (
      SELECT o_orderpriority AS stratum,
             CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS HUGEINT) AS c
      FROM orders),
    per AS (
      SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_rows,
             SUM(c) AS sx, SUM(c * c) AS sxx
      FROM cents GROUP BY stratum),
    wt AS (
      SELECT stratum,
             CAST(floor(sqrt(CAST(n_rows * sxx - sx * sx AS DOUBLE)))
                  AS BIGINT) AS w
      FROM per),
    tot AS (SELECT SUM(w) AS tw FROM wt),
    alloc AS (SELECT stratum, CAST((1000 * w) // tw AS BIGINT) AS n_alloc
              FROM wt CROSS JOIN tot),
    ranked AS (
      SELECT o_orderkey, o_orderpriority AS stratum,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey)
               AS rk
      FROM orders)
    SELECT r.o_orderkey, r.stratum
    FROM ranked r JOIN alloc a USING (stratum)
    WHERE r.rk <= a.n_alloc
    """,
)
def sample_neyman_rows(spark, sf_dir):
    """The Neyman-allocated draw (r8): within each stratum the n_alloc
    rows with the lowest md5(o_orderkey) — deterministic on every
    engine and run. One per-stratum rank window (partitioned, never
    global) over the base table + a broadcast join of the 5-row
    allocation."""
    orders = load_table(spark, sf_dir, "orders")
    return sample_neyman(orders, "o_orderpriority", "o_totalprice",
                         "o_orderkey", total_n=1000) \
        .withColumnRenamed("o_orderpriority", "stratum")


@register(
    "sample_balanced_downsample",
    # per-lang md5-hash rank <= min class count — exact balanced keep,
    # a pure function of (seed, doc_id).
    oracle="""
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY 1),
    floor_n AS (SELECT MIN(n) AS mn FROM counts),
    ranked AS (
      SELECT doc_id, lang,
        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
          CAST('0x' || substring(md5('42|'
            || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) ASC,
          doc_id ASC) AS rk
      FROM documents)
    SELECT doc_id, lang FROM ranked, floor_n WHERE rk <= mn
    """,
)
def sample_balanced_downsample(spark, sf_dir):
    """Exact balanced class downsample of documents by lang (r10):
    every language keeps min-class-count rows, selected by portable
    md5-hash rank — deterministic, placement-independent, engine-
    reproducible."""
    from dbt_fusion_spark.sample.strategies import balanced_downsample

    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "lang")
    return balanced_downsample(docs, "lang", "doc_id", seed=42)
