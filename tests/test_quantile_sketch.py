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
