"""Pin the DuckDB output type of every oracle column.

The driver's value-hash canonicalizes DuckDB HUGEINT (int128 — what DuckDB
returns for sum() over integers) differently from Spark's BIGINT even when
the values are equal, so an un-cast integer sum() fails hash_match while the
local repr-based gate stays green (judge round 1: events_props_extract).
Every integer aggregate in an oracle must be CAST(... AS BIGINT); this test
makes the whole class of bug impossible to reintroduce.

Runs on sf0.001 regardless of ORACLE_SF: only the *types* matter, and DuckDB
type inference does not depend on the data volume.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_DIR = os.path.join(TESTDATA, "sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Types whose canonical hash is known to agree between Spark and the driver's
# DuckDB-side hasher. Anything else (HUGEINT, DECIMAL, unsigned ints, ...)
# must be cast in the oracle SQL before it reaches the output.
ALLOWED = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "VARCHAR[]",
           "DATE", "TIMESTAMP", "BOOLEAN"}


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_oracle_output_types_are_hash_safe(ddb, name):
    rel = ddb.sql(entry_mod.oracle_sql()[name])
    offending = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if str(typ) not in ALLOWED
    ]
    assert not offending, (
        f"{name}: oracle emits driver-hash-unsafe types {offending}; "
        f"wrap integer aggregates in CAST(... AS BIGINT)"
    )


def _kind(t: str) -> str:
    t = str(t).lower()
    if "decimal" in t:
        return "decimal"
    if any(x in t for x in ("tinyint", "smallint", "integer", "bigint",
                            "hugeint", "int", "long", "short", "byte",
                            "ubigint", "uinteger")):
        return "int"
    if any(x in t for x in ("double", "float", "real")):
        return "float"
    if any(x in t for x in ("varchar", "string", "char")):
        return "str"
    if "bool" in t:
        return "bool"
    if "timestamp" in t:
        return "ts"
    if "date" in t:
        return "date"
    if any(x in t for x in ("array", "list", "[]")):
        return "list"
    return t


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_spark_and_duckdb_column_kinds_agree(spark, ddb, all_query_frames, name):
    """Cross-engine type-KIND audit: a Spark int vs DuckDB double (or
    decimal vs float, ts vs date) hashes differently even when values
    are equal — the r1 HUGEINT episode generalized. The DuckDB-side
    allowlist above can't see this; comparing both engines' schemas
    kind-for-kind can. Frames come from the session-shared construction
    (conftest.all_query_frames) — only the schema is read here."""
    sdf = all_query_frames[name]
    stypes = {f.name: _kind(f.dataType.simpleString()) for f in sdf.schema}
    rel = ddb.sql(entry_mod.oracle_sql()[name])
    dtypes = dict(zip(rel.columns, [_kind(t) for t in rel.types]))
    mismatched = {
        c: (stypes[c], dtypes[c])
        for c in stypes
        if c in dtypes and stypes[c] != dtypes[c]
    }
    assert not mismatched, f"{name}: column kind mismatch {mismatched}"
