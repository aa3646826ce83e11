"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.001 (sf0.01 for
the real gate — kept small here for suite speed; set ORACLE_SF=sf0.01 to
match the driver exactly) and compare row counts + order-insensitive
values."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_DIR = os.path.join(TESTDATA, os.environ.get("ORACLE_SF", "sf0.001"))
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(rows, columns):
    """Order-insensitive canonical form: sort columns by name, normalize
    floats, sort rows."""
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
    return [c for _, c in sorted(zip(range(len(columns)), columns), key=lambda p: columns[p[0]])], out


ORACLES = entry_mod.oracle_sql()
ALL_QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, all_query_frames, name):
    # shared construction (conftest.all_query_frames): the store-replay
    # entries' multi-batch ingest ran once for the whole session; this
    # collect re-runs only the lazy readout over those stores
    sdf = all_query_frames[name]
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    rel = ddb.sql(ORACLES[name])
    dcols = [d[0] for d in rel.description]
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    _, s_norm = normalize(srows, scols)
    _, d_norm = normalize(drows, dcols)
    mismatches = [i for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={s_norm[mismatches[0]]} duckdb={d_norm[mismatches[0]]}"
    )


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, all_query_frames, name):
    df = all_query_frames[name]
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert df.columns == ["column_name", "hive_type"]
    assert len(rows) >= 1
