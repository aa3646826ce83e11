"""Local driver-gate replica for a subset of entries: run the Spark
query and its DuckDB oracle at $ORACLE_SF (default sf0.001) and compare
row count, column names, and values BIT-exactly (stricter than the
driver's round-6 hash — if this passes, the gate passes).

Usage: python scripts/check_entries.py name1 name2 ...
"""

from __future__ import annotations

import math
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_DIR = os.path.join(TESTDATA, os.environ.get("ORACLE_SF", "sf0.001"))
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return struct.pack("d", v).hex()
    try:  # duckdb Decimal → compare by exact value
        import decimal

        if isinstance(v, decimal.Decimal):
            return ("dec", str(v.normalize()))
    except Exception:
        pass
    return repr(v)


def main() -> int:
    names = sys.argv[1:]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as em

    qs, osql = em.queries(), em.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    rc = 0
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in osql:
                print(f"{name}: rows-only, {len(srows)} rows OK")
                continue
            rel = con.sql(osql[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as e:
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            rc = 1
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"{name}: COLS spark={scols} duck={dcols}")
            ok = False
        if len(srows) != len(drows):
            print(f"{name}: ROWS {len(srows)} vs {len(drows)}")
            ok = False
        if ok:
            sidx = sorted(range(len(scols)), key=lambda i: scols[i])
            didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
            s_n = sorted(tuple(canon(r[i]) for i in sidx) for r in srows)
            d_n = sorted(tuple(canon(r[i]) for i in didx) for r in drows)
            bad = [i for i, (a, b) in enumerate(zip(s_n, d_n)) if a != b]
            if bad:
                i = bad[0]
                print(
                    f"{name}: {len(bad)} value-mismatched rows; first:\n"
                    f"  spark={s_n[i]}\n  duck ={d_n[i]}"
                )
                ok = False
        print(f"{name}: {'BIT-GREEN' if ok else 'RED'} ({len(srows)} rows)")
        rc = rc or (0 if ok else 1)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
