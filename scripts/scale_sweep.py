"""10x scale sweep over the full bench roster.

Builds a 10x replica of sf0.1 under /tmp/scale10x (key-shifted copies so
join fan-outs and group counts scale linearly instead of creating
10-way duplicate clusters), times every bench query at 1x and 10x
(1 cold + N warm, warm median), and prints a markdown table with the
per-query scaling exponent log10(t10/t1) — 1.0 = data-linear, ~0 =
overhead-bound, >1 = super-linear (flagged).

Replica construction, per copy i in 0..9 (copy 0 = the original rows):
- region/nation: fixed dimensions, copied once, never replicated
- supplier/customer/part/orders/lineitem: every key column shifted by
  i * 10^9 so per-key cardinalities (orders per customer, lineitems per
  order) are preserved exactly
- events: event_id/user_id shifted — same sessions-per-user shape, 10x
  users over the same time range
- documents: doc_id shifted; copies > 0 mutate every 2nd token with a
  per-copy suffix so exact AND near-dup structure (set-based and
  shingle-based alike) is preserved per copy instead of creating
  corpus-wide 10-way (near-)duplicate clusters
- embeddings: vec_id shifted; copies > 0 rotate the vector by i
  positions — distinct, norm-preserving, uncorrelated directions

Usage: python scripts/scale_sweep.py [--rebuild] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SCALE_SWEEP_DIR", "/tmp/scale10x")
COPIES = 10
OFFSET = 10**9
N_WARM = int(os.environ.get("SCALE_SWEEP_RUNS", "2"))

KEY_SHIFTS = {
    "supplier": ["s_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build(con) -> None:
    os.makedirs(OUT, exist_ok=True)
    for t in ("region", "nation"):
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{BASE}/{t}.parquet')) "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, keys in KEY_SHIFTS.items():
        parts = []
        cols = [
            c[0]
            for c in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{BASE}/{t}.parquet')"
            ).fetchall()
        ]
        for i in range(COPIES):
            sel = []
            for c in cols:
                if c in keys:
                    sel.append(f"{c} + {i * OFFSET} AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    # MUTATE every 2nd token with a per-copy suffix: half
                    # the distinct-token set and nearly every 3-token
                    # shingle differ across copies, so cross-copy
                    # similarity collapses under BOTH set-based features
                    # (SimHash distinct-token votes) and sequence-based
                    # ones (MinHash shingles), while within-copy dup
                    # structure is preserved (same mutation per copy).
                    # Weaker constructions measured as false blowups:
                    # a plain appended suffix left all 10 copies mutual
                    # near-dups (minhash 45x); INSERTED salt tokens fixed
                    # shingles but left distinct-token sets one feature
                    # apart, so set-based buckets merged across copies
                    # (simhash 28x).
                    sel.append(
                        "array_to_string(list_transform("
                        "string_split(text, ' '), "
                        f"(x, j) -> CASE WHEN j % 2 = 0 THEN x || '_c{i}' "
                        "ELSE x END), ' ') AS text"
                    )
                elif t == "embeddings" and c == "embedding" and i > 0:
                    sel.append(
                        f"embedding[{i + 1}:] || embedding[1:{i}] AS embedding"
                    )
                else:
                    sel.append(c)
            parts.append(
                f"SELECT {', '.join(sel)} FROM read_parquet('{BASE}/{t}.parquet')"
            )
        union = " UNION ALL ".join(parts)
        con.sql(
            f"COPY ({union}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        n0 = con.sql(
            f"SELECT count(*) FROM read_parquet('{BASE}/{t}.parquet')"
        ).fetchone()[0]
        n1 = con.sql(
            f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')"
        ).fetchone()[0]
        assert n1 == COPIES * n0, (t, n0, n1)
        print(f"built {t}: {n0} -> {n1} rows", flush=True)


def main() -> None:
    import duckdb

    args = [a for a in sys.argv[1:] if a != "--rebuild"]
    rebuild = "--rebuild" in sys.argv[1:]
    if rebuild or not os.path.exists(os.path.join(OUT, "lineitem.parquet")):
        build(duckdb.connect())

    from bench import BENCH_QUERIES
    from nifi_hive_schema_generator_bundle_spark.plans.queries import QUERIES
    from nifi_hive_schema_generator_bundle_spark.session import get_session

    spark = get_session(
        "scale_sweep",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "48g"
            ),
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, sf_dir: str) -> float:
        start = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - start

    roster = args or BENCH_QUERIES
    rows = []
    for name in roster:
        times = {}
        for label, d in (("1x", BASE), ("10x", OUT)):
            run(name, d)  # cold (codegen for this plan shape at this dir)
            reps = sorted(run(name, d) for _ in range(N_WARM))
            times[label] = reps[len(reps) // 2]
        ratio = times["10x"] / max(times["1x"], 1e-9)
        exponent = math.log10(max(ratio, 1e-9))
        flag = "  <-- SUPER-LINEAR" if ratio > 10 else ""
        rows.append(
            {
                "query": name,
                "t1": round(times["1x"], 2),
                "t10": round(times["10x"], 2),
                "ratio": round(ratio, 2),
                "exponent": round(exponent, 2),
            }
        )
        print(
            f"| {name} | {times['1x']:.2f} | {times['10x']:.2f} "
            f"| {ratio:.2f}x | {exponent:.2f} |{flag}",
            flush=True,
        )
    with open("/tmp/scale_sweep.json", "w") as fh:
        json.dump(rows, fh, indent=1)
    worst = sorted(rows, key=lambda r: -r["ratio"])[:5]
    print("\nworst ratios:", [(r["query"], r["ratio"]) for r in worst])
    spark.stop()


if __name__ == "__main__":
    main()
