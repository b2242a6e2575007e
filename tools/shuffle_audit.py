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


def _snapshot(spark, ui: str, app: str) -> dict[str, int]:
    """Drain the async listener bus, then read cumulative metrics.
    waitUntilEmpty is private[spark] (public in bytecode, reachable via
    py4j); if the bridge ever breaks, poll until two reads agree."""
    import time

    try:
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10000)
    except Exception:
        pass
    prev = _read(ui, app)
    for _ in range(20):
        time.sleep(0.1)
        cur = _read(ui, app)
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
    out = {
        "method": ("cumulative stage-metric deltas via the UI status "
                   "REST API; codegen warmed at sf0.001 outside the "
                   "measured window; cache cleared between queries; "
                   "scale10 = tools/scale10.py deterministic 10x"),
        "queries": rows,
    }
    with open("SHUFFLE_AUDIT.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        n: {"swr": r["shuffle_write_ratio"], "ir": r["input_ratio"]}
        for n, r in rows.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
