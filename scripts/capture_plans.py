#!/usr/bin/env python
"""Capture .explain('formatted') output for named queries into
plans/r08/<name>_<tag>.txt — the optimization round's plan-shape
evidence (guide §1: measure first; the judge checks plan claims
against these files).

Usage: python scripts/capture_plans.py <tag> <query> [<query> ...]
       python scripts/capture_plans.py <tag> --file <list.txt>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("PLANS_ROUND", "r09")
)


def main() -> None:
    tag = sys.argv[1]
    if sys.argv[2] == "--file":
        names = [
            ln.strip()
            for ln in open(sys.argv[3])
            if ln.strip() and not ln.startswith("#")
        ]
    else:
        names = sys.argv[2:]

    from nifi_hive_schema_generator_bundle_spark.session import get_session
    from nifi_hive_schema_generator_bundle_spark.plans.queries import QUERIES

    spark = get_session(
        "capture-plans",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
