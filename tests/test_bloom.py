"""Distributed Bloom filter: no-false-negative guarantee, bounded FPR,
and exact anti-join equivalence of the pre-filtered incremental path."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.functions.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_prefiltered_anti_join,
)


def _probe(df, bloom_df, key="k"):
    n_bits = bloom_df.collect()[0]["n_bits"]
    n_hashes = bloom_df.collect()[0]["n_hashes"]
    return df.join(F.broadcast(bloom_df)).select(
        key,
        bloom_might_contain(
            F.col(key), F.col("bloom"), n_bits=n_bits, n_hashes=n_hashes
        ).alias("maybe"),
    )


def test_no_false_negatives(spark):
    keys = [(f"key-{i}",) for i in range(500)]
    df = spark.createDataFrame(keys, "k string")
    bloom = bloom_build(df, "k", n_bits=1 << 14)
    got = _probe(df, bloom).collect()
    assert all(r["maybe"] for r in got)  # every inserted key must hit


def test_false_positive_rate_bounded(spark):
    inserted = spark.createDataFrame(
        [(f"in-{i}",) for i in range(1000)], "k string"
    )
    fresh = spark.createDataFrame(
        [(f"out-{i}",) for i in range(4000)], "k string"
    )
    # m=8192, k=7, n=1000 -> theoretical fpr ~2.1%
    bloom = bloom_build(inserted, "k", n_bits=1 << 13)
    hits = _probe(fresh, bloom).filter("maybe").count()
    assert hits / 4000 < 0.06  # 3x theory: generous but catches breakage
    # and a roomy filter should be essentially clean
    bloom_big = bloom_build(inserted, "k", n_bits=1 << 20)
    assert _probe(fresh, bloom_big).filter("maybe").count() <= 4


def test_prefiltered_anti_join_equals_plain_anti_join(spark):
    old = spark.createDataFrame(
        [(f"k{i}", i) for i in range(0, 600, 2)], "key string, v int"
    )
    new = spark.createDataFrame(
        [(f"k{i}", -i) for i in range(300, 900)]
        + [(None, -9999)],  # null key must survive (null joins nothing)
        "key string, v int",
    )
    got = bloom_prefiltered_anti_join(new, old, "key", n_bits=1 << 13)
    want = new.join(old.select("key").distinct(), "key", "anti")
    keyfn = lambda t: (t[0] is None, t[0] or "", t[1])
    g = sorted(((r["key"], r["v"]) for r in got.collect()), key=keyfn)
    w = sorted(((r["key"], r["v"]) for r in want.collect()), key=keyfn)
    assert g == w
    assert (None, -9999) in g


def test_probe_is_jvm_only(spark):
    old = spark.createDataFrame([(f"k{i}",) for i in range(50)], "key string")
    new = spark.createDataFrame([(f"k{i}",) for i in range(100)], "key string")
    plan = (
        bloom_prefiltered_anti_join(new, old, "key")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_build_validates_params(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        bloom_build(df, "k", n_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        bloom_build(df, "k", n_hashes=0)


def test_semi_join_equals_plain_semi_join(spark):
    """bloom_prefiltered_semi_join must return EXACTLY df ⋉ keys —
    the filter only moves cost."""
    from nifi_hive_schema_generator_bundle_spark.functions.bloom import (
        bloom_prefiltered_semi_join,
    )

    df = spark.createDataFrame(
        [(i, f"row-{i}") for i in range(2000)], "k long, payload string"
    )
    keys = spark.createDataFrame(
        [(i,) for i in range(0, 2000, 13)], "k long"
    )
    got = sorted(
        tuple(r)
        for r in bloom_prefiltered_semi_join(
            df, keys, "k", n_bits=1 << 14
        ).collect()
    )
    want = sorted(tuple(r) for r in df.join(keys, "k", "semi").collect())
    assert got == want


def test_semi_join_drops_null_probe_keys(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.bloom import (
        bloom_prefiltered_semi_join,
    )

    df = spark.createDataFrame(
        [(None, "a"), (1, "b"), (2, "c")], "k int, payload string"
    )
    keys = spark.createDataFrame([(1,), (None,)], "k int")
    got = bloom_prefiltered_semi_join(df, keys, "k", n_bits=1 << 10).collect()
    assert [(r["k"], r["payload"]) for r in got] == [(1, "b")]


def test_semi_join_prefilter_actually_prunes(spark):
    """The bloom stage must reject (almost all) non-matching rows before
    the join: probe the filter directly and check the maybe-rate is
    near the key selectivity, not 100 %."""
    from nifi_hive_schema_generator_bundle_spark.functions.bloom import (
        bloom_build,
    )

    df = spark.createDataFrame(
        [(f"probe-{i}",) for i in range(5000)], "k string"
    )
    keys = spark.createDataFrame(
        [(f"probe-{i}",) for i in range(0, 5000, 100)], "k string"
    )
    bloom = bloom_build(keys, "k", n_bits=1 << 14)
    maybes = _probe(df, bloom).filter("maybe").count()
    # 50 true keys; FPR at m=16384,k=7,n=50 is ~0 — allow tiny slack
    assert 50 <= maybes <= 80
