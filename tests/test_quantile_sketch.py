"""Log-bucket quantile sketch (operators/quantile_sketch): relative
error bound, merge linearity, range clamps, and nearest-rank read-out
semantics."""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nifi_hive_schema_generator_bundle_spark.operators.quantile_sketch import (
    bucket_midpoints,
    histogram_merge,
    histogram_quantiles,
    log_bucket_boundaries,
    log_bucket_histogram,
)

BOUNDS = log_bucket_boundaries(1.0, 1000.0, 1.05)


def _vals(spark, vals, group="g"):
    return spark.createDataFrame(
        [(group, float(v)) for v in vals], "g string, x double"
    )


def test_boundaries_and_midpoints_shape():
    assert BOUNDS[0] == 1.0
    assert BOUNDS[-1] >= 1000.0
    assert all(b < c for b, c in zip(BOUNDS, BOUNDS[1:]))
    mids = bucket_midpoints(BOUNDS)
    assert len(mids) == len(BOUNDS) + 1
    # interior midpoints are geometric means → strictly inside
    for i in range(1, len(BOUNDS)):
        assert BOUNDS[i - 1] < mids[i] < BOUNDS[i]


def test_relative_error_bound(spark):
    """Every in-range value's sketch answer is within the DDSketch
    guarantee (γ−1)/(γ+1) of the exact nearest-rank answer."""
    vals = [1.5 * (1.13**i) for i in range(60)]  # spread across buckets
    df = _vals(spark, vals)
    hist = log_bucket_histogram(df, "x", ["g"], BOUNDS)
    qs = [0.1, 0.5, 0.9]
    got = {
        r["q"]: r["est"]
        for r in histogram_quantiles(hist, ["g"], BOUNDS, qs).collect()
    }
    gamma = 1.05
    bound = (gamma - 1) / (gamma + 1)
    svals = sorted(vals)
    for q in qs:
        exact = svals[math.ceil(q * len(vals)) - 1]
        assert abs(got[q] - exact) / exact <= bound + 1e-12, (q, got[q], exact)


def test_merge_linearity(spark):
    """Histogram of the union == per-bucket sum of slice histograms."""
    a = _vals(spark, [2, 3, 700, 41])
    b = _vals(spark, [2, 9, 350])
    whole = _vals(spark, [2, 3, 700, 41, 2, 9, 350])
    direct = {
        (r["g"], r["bucket"]): r["cnt"]
        for r in log_bucket_histogram(whole, "x", ["g"], BOUNDS).collect()
    }
    merged = {
        (r["g"], r["bucket"]): r["cnt"]
        for r in histogram_merge(
            log_bucket_histogram(a, "x", ["g"], BOUNDS),
            log_bucket_histogram(b, "x", ["g"], BOUNDS),
        ).collect()
    }
    assert merged == direct


def test_out_of_range_clamps(spark):
    """Below-range values land in bucket 0 and answer the low clamp;
    above-range land in the top bucket and answer the high clamp."""
    df = _vals(spark, [0.01, 0.02, 5000.0])
    hist = log_bucket_histogram(df, "x", ["g"], BOUNDS)
    buckets = {r["bucket"] for r in hist.collect()}
    assert 0 in buckets and len(BOUNDS) in buckets
    got = {
        r["q"]: r["est"]
        for r in histogram_quantiles(
            hist, ["g"], BOUNDS, [0.3, 1.0]
        ).collect()
    }
    mids = bucket_midpoints(BOUNDS)
    assert got[0.3] == mids[0] == BOUNDS[0]
    assert got[1.0] == mids[-1] == BOUNDS[-1]


def test_nearest_rank_readout(spark):
    """q=0.5 over an even count answers the lower-of-middle rank
    (r = ⌈q·n⌉), and n rides the output."""
    df = _vals(spark, [10.0, 10.0, 400.0, 400.0])
    hist = log_bucket_histogram(df, "x", ["g"], BOUNDS)
    row = histogram_quantiles(hist, ["g"], BOUNDS, [0.5]).collect()[0]
    assert row["n"] == 4
    # rank 2 → the 10.0 bucket's midpoint, not 400's
    gamma_bound = (1.05 - 1) / (1.05 + 1)
    assert abs(row["est"] - 10.0) / 10.0 <= gamma_bound + 1e-12


def test_null_values_skipped(spark):
    df = spark.createDataFrame(
        [("g", None), ("g", 7.0)], "g string, x double"
    )
    hist = log_bucket_histogram(df, "x", ["g"], BOUNDS)
    assert hist.agg({"cnt": "sum"}).collect()[0][0] == 1


def test_bucket_index_tree_equals_literal_fold(spark):
    """r8 optimization pin: the balanced-WHEN binary search emitted for
    strictly-increasing boundaries must agree with the reference
    literal-array fold on every edge class — below-range, exact
    boundary hits, interior, above-range, NaN (Spark orders NaN above
    every double → top bucket on both paths), and NULL (stays NULL)."""
    from pyspark.sql import functions as F

    from nifi_hive_schema_generator_bundle_spark.operators.quantile_sketch import (
        _bucket_index,
    )

    bounds = BOUNDS
    edge_vals = (
        [0.0, -5.0, bounds[0], bounds[-1], 5000.0, float("nan"), None]
        + bounds[:3]
        + [b + 1e-9 for b in bounds[40:43]]
        + [123.456, 1.0000001]
    )
    df = spark.createDataFrame([(v,) for v in edge_vals], "x double")

    def fold(val, bs):
        barr = F.array(*[F.lit(b) for b in bs])
        return F.aggregate(barr, F.lit(0), lambda acc, b: acc + (val >= b).cast("int"))

    rows = df.select(
        "x",
        _bucket_index(F.col("x"), bounds).alias("tree"),
        fold(F.col("x"), bounds).alias("ref"),
    ).collect()
    for r in rows:
        assert r["tree"] == r["ref"], (r["x"], r["tree"], r["ref"])
    nan_row = [r for r in rows if r["x"] is not None and r["x"] != r["x"]][0]
    assert nan_row["tree"] == len(bounds)  # NaN → top bucket, pinned
    null_row = [r for r in rows if r["x"] is None][0]
    assert null_row["tree"] is None and null_row["ref"] is None
    # non-monotonic boundary lists take the fold path and still agree
    wonky = [5.0, 1.0, 3.0]
    got = df.select(
        _bucket_index(F.col("x"), wonky).alias("a"),
        fold(F.col("x"), wonky).alias("b"),
    ).collect()
    for r in got:
        assert r["a"] == r["b"]
