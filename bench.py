#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is forced end-to-end with a noop-sink write (full computation,
no driver collect bottleneck, no result materialization cost). One warm-up
of the flagship query amortizes session/JIT startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# the headline subset: one per operator family (inference, routing,
# relational agg/join/window, dedup exact+near, ANN, text)
BENCH_QUERIES = [
    "infer_props_schema",
    "route_json_validity",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "q6_revenue_delta",
    "events_topk_per_user",
    "events_sessionize",
    "exact_dedup_docs",
    "minhash_near_dup",
    "simhash_near_dup",
    "ann_cosine_topk",
    "token_stats_docs",
    "quality_scores_docs",
    "language_id_docs",
    "purchase_attribution_asof",
    "events_rollup",
    "embedding_near_dup",
    "media_features_docs",
    "ivf_ann_topk",
    "tfidf_top_terms_docs",
    "q4_priority_late_ship",
    "q10_returned_revenue",
    "q18_large_orders",
    "doc_word_counts",
    "q8_market_share",
    "q21_waiting_suppliers",
    "lineitem_price_stats",
    "redact_numbers_events",
    "quantized_ann_topk",
    "q2_best_price_supplier",
    "training_prep_pipeline",
]


def main() -> None:
    from nifi_hive_schema_generator_bundle_spark.session import get_session
    from nifi_hive_schema_generator_bundle_spark.plans.queries import QUERIES

    spark = get_session(
        "bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        start = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - start

    # warm-up: JVM/codegen/parquet-footer caches + the Arrow/Python-worker
    # pool used by the exact-inference path (steady-state numbers)
    run("q6_revenue_delta")
    run("infer_props_schema")

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        times[name] = round(run(name), 3)

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
