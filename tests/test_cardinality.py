"""Portable HLL + KMV sketches (operators/cardinality): exact-merge
property, accuracy envelopes, rho extraction, sub-k exactness, and the
theta-sketch set-algebra estimators on planted overlaps."""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.operators.cardinality import (
    HLL_RHO_CAP,
    KMV_HASH_BITS,
    hll_estimate,
    hll_linear_counting_table,
    hll_merge,
    hll_registers,
    kmv_estimate,
    kmv_pair_overlap,
    kmv_sketch,
)


def _keys(spark, n, prefix="k", group="g"):
    return spark.createDataFrame(
        [(group, f"{prefix}-{i}") for i in range(n)], "g string, k string"
    )


# ---------------------------------------------------------------- HLL


def test_hll_rho_is_first_one_bit_position(spark):
    """rho computed from the md5 hex tail must equal the definition:
    1 + leading zero BITS of the tail, computed independently here from
    the big-int value of the same hex slice."""
    df = _keys(spark, 64)
    regs = hll_registers(df, "k", ["g"], p=8).collect()
    # recompute expected registers/rho in pure python
    import hashlib

    expected: dict[int, int] = {}
    for i in range(64):
        h = hashlib.md5(f"k-{i}".encode()).hexdigest()
        reg = int(h[:2], 16)
        tail = h[2:]
        bits = bin(int(tail, 16))[2:].zfill(120)
        rho = min(bits.index("1") + 1 if "1" in bits else 121, HLL_RHO_CAP)
        expected[reg] = max(expected.get(reg, 0), rho)
    got = {r["register"]: r["rho"] for r in regs}
    assert got == expected


def test_hll_merge_equals_direct_build(spark):
    """Register max-merge is EXACT: building per-slice then merging
    yields identical registers (hence identical estimates) to one
    direct build — the rollup property the gate entry rides."""
    a = _keys(spark, 300, prefix="a")
    b = _keys(spark, 300, prefix="b")
    both = a.unionByName(b)
    direct = {
        (r["register"],): r["rho"]
        for r in hll_registers(both, "k", ["g"], p=8).collect()
    }
    merged = {
        (r["register"],): r["rho"]
        for r in hll_merge(
            hll_registers(a, "k", ["g"], p=8),
            hll_registers(b, "k", ["g"], p=8),
        ).collect()
    }
    assert merged == direct


@pytest.mark.parametrize("n", [5, 100, 2000])
def test_hll_estimate_accuracy_envelope(spark, n):
    """p=8 → σ ≈ 1.04/√256 = 6.5 %; assert a generous 4σ envelope
    (plus slack at tiny n where linear counting is near-exact)."""
    df = _keys(spark, n)
    est = hll_estimate(
        hll_registers(df, "k", ["g"], p=8), ["g"], p=8
    ).collect()[0]["est_distinct"]
    assert est == pytest.approx(n, rel=0.3)


def test_hll_linear_counting_small_range(spark):
    """A 3-key set must take the linear-counting branch and land on a
    literal-table value: m·ln(m/V) for V = 256 − occupied registers."""
    df = _keys(spark, 3)
    regs = hll_registers(df, "k", ["g"], p=8)
    nreg = regs.count()
    est = hll_estimate(regs, ["g"], p=8).collect()[0]["est_distinct"]
    table = hll_linear_counting_table(8)
    assert est == table[256 - nreg - 1]
    assert est == pytest.approx(3, abs=0.2)


def test_hll_empty_and_null_keys(spark):
    df = spark.createDataFrame([("g", None)], "g string, k string")
    regs = hll_registers(df, "k", ["g"], p=8)
    assert regs.count() == 0


# ---------------------------------------------------------------- KMV


def test_kmv_sub_k_is_exact(spark):
    """Fewer distinct keys than k → the sketch holds them all and the
    estimate is the exact count."""
    df = _keys(spark, 17)
    sk = kmv_sketch(df, "k", ["g"], k=64)
    assert sk.count() == 17
    est = kmv_estimate(sk, ["g"], k=64).collect()[0]["est_distinct"]
    assert est == 17.0


def test_kmv_estimate_accuracy(spark):
    """k=64 → relative stddev ≈ 1/√(k−2) ≈ 12.7 %; assert 4σ."""
    df = _keys(spark, 3000)
    sk = kmv_sketch(df, "k", ["g"], k=64)
    assert sk.count() == 64
    est = kmv_estimate(sk, ["g"], k=64).collect()[0]["est_distinct"]
    assert est == pytest.approx(3000, rel=0.5)


def test_kmv_sketch_keeps_k_smallest_distinct(spark):
    """The sketch must be exactly the k smallest distinct 52-bit hashes
    — recomputed independently in python."""
    import hashlib

    df = _keys(spark, 200)
    sk = sorted(r["h"] for r in kmv_sketch(df, "k", ["g"], k=16).collect())
    hashes = sorted(
        {int(hashlib.md5(f"k-{i}".encode()).hexdigest()[:13], 16)
         for i in range(200)}
    )
    assert sk == hashes[:16]
    assert all(h < (1 << KMV_HASH_BITS) for h in sk)


def test_kmv_pair_overlap_planted(spark):
    """Two groups sharing exactly half their keys: union/intersection
    estimates must land within the sketch's error envelope, and the
    sub-k regime must be exact."""
    rows = (
        [("a", f"s-{i}") for i in range(500)]       # shared
        + [("b", f"s-{i}") for i in range(500)]
        + [("a", f"a-{i}") for i in range(500)]     # a-only
        + [("b", f"b-{i}") for i in range(500)]     # b-only
    )
    df = spark.createDataFrame(rows, "g string, k string")
    sk = kmv_sketch(df, "k", ["g"], k=64)
    got = kmv_pair_overlap(sk, "g", k=64).collect()[0]
    assert (got["group_a"], got["group_b"]) == ("a", "b")
    assert got["est_union"] == pytest.approx(1500, rel=0.5)
    assert got["est_inter"] == pytest.approx(500, rel=0.9)

    # sub-k: tiny disjoint groups → exact zero intersection, exact union
    tiny = spark.createDataFrame(
        [("x", f"x-{i}") for i in range(10)]
        + [("y", f"y-{i}") for i in range(20)],
        "g string, k string",
    )
    tsk = kmv_sketch(tiny, "k", ["g"], k=64)
    t = kmv_pair_overlap(tsk, "g", k=64).collect()[0]
    assert t["est_union"] == 30.0
    assert t["est_inter"] == 0.0


def test_kmv_theta_exclusive_semantics(spark):
    """When saturated, θ is the k-th smallest of the merged set and the
    intersection counts only common hashes STRICTLY below θ — pinned by
    recomputing from the collected sketches."""
    rows = [("a", f"s-{i}") for i in range(400)] + [
        ("b", f"s-{i}") for i in range(200, 600)
    ]
    df = spark.createDataFrame(rows, "g string, k string")
    sk = kmv_sketch(df, "k", ["g"], k=32)
    got = kmv_pair_overlap(sk, "g", k=32).collect()[0]
    hs = {g: sorted(r["h"] for r in sk.collect() if r["g"] == g)
          for g in ("a", "b")}
    merged = sorted(set(hs["a"]) | set(hs["b"]))
    theta = merged[31]
    below = len([h for h in set(hs["a"]) & set(hs["b"]) if h < theta])
    unit = float(1 << KMV_HASH_BITS)
    assert got["est_union"] == 31 * unit / theta
    assert got["est_inter"] == below * (unit / theta)
