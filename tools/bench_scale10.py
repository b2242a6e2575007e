"""Scale-stress bench: the most expensive headline queries at sf0.1 vs
the deterministic 10x corpus (tools/scale10.py), same process, same
methodology as bench.py (codegen warm-up at sf0.001, min-of-2, cache
cleared between queries). Records wall-time scaling factors to
BENCH_scale10.json — the committed evidence that the operators scale
≲ linearly (a ratio well under 10x means fixed overheads still
dominate; a ratio >> 10x means super-linear work and a plan problem).

Run: python tools/bench_scale10.py  (writes BENCH_scale10.json to cwd)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale10 import ensure  # noqa: E402

SF01 = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"

# The 10 most expensive BENCH_r03 queries + one per remaining operator
# family (windowed TPC-H join, as-of union) for shape diversity.
QUERY_SET = [
    "graph_pagerank_suppliers",
    "profile_table_events",
    "corpus_dsir_logweights",
    "decontamination_bloom_prefilter",
    "similarity_pq_adc_topk",
    "decontamination_13gram",
    "snapshot_timestamp",
    "dedup_simhash",
    "dedup_spans_corpus",
    "decontamination_containment",
    "tpch_q3_shipping_priority",
    "dedup_minhash_lsh",
    "asof_join_last_purchase",
]


def timed(fn, spark, sf_dir: str, n: int = 2) -> float:
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    spark.catalog.clearCache()
    return round(best, 4)


def main() -> None:
    import tempfile

    from dbt_fusion_spark.demo import QUERIES
    from dbt_fusion_spark.session import get_spark

    spark = get_spark(app_name="bench-scale10",
                      warehouse_dir=tempfile.mkdtemp())
    spark.sparkContext.setLogLevel("ERROR")
    scale_dir = ensure(spark)

    rows = {}
    for name in QUERY_SET:
        fn = QUERIES[name]
        try:
            fn(spark, WARM).count()  # codegen warm-up, untimed
        except Exception:
            pass
        t_small = timed(fn, spark, SF01)
        t_big = timed(fn, spark, scale_dir)
        rows[name] = {"sf01_sec": t_small, "scale10_sec": t_big,
                      "ratio": round(t_big / t_small, 2)}
        print(name, rows[name], flush=True)

    out = {
        "method": ("same process; codegen warmed at sf0.001; min-of-2 per "
                   "scale; cache cleared between queries; scale10 corpus = "
                   "tools/scale10.py deterministic 10x of sf0.1 "
                   "(documents/events/embeddings/orders/lineitem x10, dims "
                   "unchanged)"),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "queries": rows,
        "max_ratio": max(r["ratio"] for r in rows.values()),
    }
    with open("BENCH_scale10.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"max_ratio": out["max_ratio"]}))
    spark.stop()


if __name__ == "__main__":
    main()
