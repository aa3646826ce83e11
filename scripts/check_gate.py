"""Replicate the driver's correctness gate locally on the current
DRIVER_PRIORITY at a chosen SF (default sf0.01, matching the driver).

Usage: python scripts/check_gate.py [sf0.01] [name ...]
Prints one line per entry and a final OK/FAIL summary.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, columns):
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
                if math.isclose(v, 0.0, abs_tol=1e-12):
                    v = 0.0
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main() -> int:
    args = sys.argv[1:]
    sf = args[0] if args and args[0].startswith("sf") else "sf0.01"
    names = [a for a in args if not a.startswith("sf")]
    sf_dir = os.path.join("/root/testdata", sf)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .appName("check_gate")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    targets = names or entry_mod.DRIVER_PRIORITY
    failures = []
    for name in targets:
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"{name}: rows-only, {len(srows)} rows")
                continue
            rel = con.sql(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
            if sorted(scols) != sorted(dcols):
                raise AssertionError(f"columns differ: {sorted(scols)} vs {sorted(dcols)}")
            if len(srows) != len(drows):
                raise AssertionError(f"row count {len(srows)} != {len(drows)}")
            s_norm = normalize(srows, scols)
            d_norm = normalize(drows, dcols)
            bad = [i for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b]
            if bad:
                raise AssertionError(
                    f"{len(bad)} mismatched rows; first: spark={s_norm[bad[0]]} "
                    f"duckdb={d_norm[bad[0]]}"
                )
            print(f"{name}: OK ({len(srows)} rows)")
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"{name}: FAIL — {exc}")
    print(f"\n{len(targets) - len(failures)}/{len(targets)} passed")
    if failures:
        print("failures:", failures)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
