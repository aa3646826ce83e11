"""Zero-row audit over every oracle at the DRIVER GATE's scale factor
(sf0.01): a hash gate that compares two empty result sets passes
vacuously — the r7 gate "verified" q11_top_value_parts as 0 == 0 rows
(VERDICT r7 #2), and r1-r7 did the same for customers_without_orders
and events_partition_completeness. Every oracle-backed entry must
return at least one row at the gate SF so its hash match means
something; an entry whose emptiness is genuinely by design must be
listed in ALLOWED_EMPTY with its reason.

DuckDB-only (no Spark): the engine side is covered by the sf0.001
replay in test_oracle.py — if the oracle is nonempty and the driver's
row-count check passes, the engine result is nonempty too. Oracles run
concurrently on per-thread cursors (DuckDB releases the GIL); the
multi-batch store-replay oracles dominate the wall clock.
"""

from __future__ import annotations

import os
import sys
from concurrent.futures import ThreadPoolExecutor

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
GATE_SF_DIR = os.path.join(TESTDATA, "sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# name -> declared reason its oracle may be empty at the gate SF
ALLOWED_EMPTY: dict[str, str] = {}


def test_no_oracle_is_empty_at_gate_sf():
    os.environ.setdefault("ORACLE_SF", "sf0.01")
    import __spark_entry__ as entry_mod

    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{GATE_SF_DIR}/{t}.parquet')"
        )

    def probe(item):
        name, sql = item
        cur = con.cursor()
        try:
            got = cur.sql(f"SELECT 1 FROM ({sql}) __t LIMIT 1").fetchall()
            return name, len(got), None
        except Exception as e:  # noqa: BLE001 — report, don't abort the pool
            return name, -1, str(e).splitlines()[0]
        finally:
            cur.close()

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(probe, sorted(oracles.items())))

    errs = [(n, e) for n, _, e in results if e]
    assert not errs, f"oracles failed to execute at sf0.01: {errs}"
    empty = [
        n for n, k, _ in results if k == 0 and n not in ALLOWED_EMPTY
    ]
    assert not empty, (
        "oracle-backed entries return ZERO rows at the gate SF — their "
        f"driver hash would pass vacuously: {empty}"
    )
