#!/usr/bin/env python
"""Round-9 high-SF scaling capture (VERDICT r8 #7): the top-10 headline
queries on the 10x key-shifted replica of sf0.1 (built by
scripts/scale_sweep.py — an sf1-equivalent volume), timed with the bench
protocol (1 cold + N warm, warm median, noop sink) at BOTH 32 and 8
cores, each core count in its own fresh python+JVM process. The point:
distinguish queries that parallelize (t8/t32 well above 1) from
floor-bound ones (ratio ~1) — at sf0.1 every 8c/32c ratio was <= ~1.2
and the r8 scaling block could not show parallelism at all.

Usage:  python scripts/scale_capture_r09.py            # parent: runs both
        SCALE_CAP_CPUS=32 python scripts/scale_capture_r09.py --child
Writes plans/r09/SCALE10X_r09.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TENX = os.environ.get("SCALE_SWEEP_DIR", "/tmp/scale10x")
RUNS = int(os.environ.get("SCALE_CAP_RUNS", "3"))
QUERIES_TOP10 = [
    "doc_incremental_near_dedup",
    "part_supplier_pagerank",
    "doc_containment_join",
    "doc_jaccard_join",
    "orders_join_size_estimate",
    "dedup_lsh_recall_eval",
    "doc_incremental_span_stats",
    "doc_semantic_dedup",
    "doc_quality_classifier_fit",
    "embedding_bitext_mine",
]
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans", "r09", "SCALE10X_r09.json",
)


def child(cpus: int) -> None:
    from nifi_hive_schema_generator_bundle_spark.plans.queries import QUERIES
    from nifi_hive_schema_generator_bundle_spark.session import get_session

    spark = get_session(
        "scale-capture",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, TENX).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    out = {}
    for name in QUERIES_TOP10:
        cold = run(name)
        reps = sorted(run(name) for _ in range(RUNS))
        out[name] = {
            "cold": round(cold, 2),
            "warm_median": round(reps[len(reps) // 2], 2),
            "min": round(reps[0], 2),
            "max": round(reps[-1], 2),
        }
    print(json.dumps(out))


def main() -> None:
    if "--child" in sys.argv:
        child(int(os.environ["SCALE_CAP_CPUS"]))
        return
    results = {"replica": TENX, "runs_per_query": RUNS,
               "loadavg_start": [round(x, 2) for x in os.getloadavg()]}
    for cpus in (32, 8):
        env = dict(os.environ, SCALE_CAP_CPUS=str(cpus))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            env=env, stdout=subprocess.PIPE, text=True, check=True,
        )
        results[f"c{cpus}"] = json.loads(
            proc.stdout.strip().splitlines()[-1]
        )
        print(f"-- {cpus} cores done", file=sys.stderr)
    ratios = {
        q: round(results["c8"][q]["warm_median"]
                 / max(results["c32"][q]["warm_median"], 1e-9), 2)
        for q in QUERIES_TOP10
    }
    results["t8_over_t32"] = ratios
    results["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
        fh.write("\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
