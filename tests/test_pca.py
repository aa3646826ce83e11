"""Distributed PCA (operators/pca) vs numpy ground truth."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def blob(spark):
    """120 points, 4-dim: variance concentrated along (1,1,0,0)/√2."""
    rng = random.Random(13)
    rows = []
    for i in range(120):
        t = rng.gauss(0, 3.0)  # dominant direction
        u = rng.gauss(0, 0.5)  # minor direction (0,0,1,-1)/√2
        noise = [rng.gauss(0, 0.05) for _ in range(4)]
        v = [
            5.0 + t / math.sqrt(2) + noise[0],
            -2.0 + t / math.sqrt(2) + noise[1],
            1.0 + u / math.sqrt(2) + noise[2],
            0.0 - u / math.sqrt(2) + noise[3],
        ]
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, ["id", "vec"]).repartition(4)
    x = np.array([r[1] for r in rows])
    return df, x


def test_covariance_matches_numpy(spark, blob):
    from nifi_hive_schema_generator_bundle_spark.operators.pca import (
        covariance_matrix,
    )

    df, x = blob
    got = {
        (r.i, r.j): r.cov for r in covariance_matrix(df, "vec").collect()
    }
    exp = np.cov(x, rowvar=False)  # n-1 denominator
    assert len(got) == 10  # upper triangle of 4x4
    for (i, j), v in got.items():
        assert v == pytest.approx(exp[i, j], abs=1e-6)


def test_covariance_bit_identical_across_partitionings(spark, blob):
    """The exact-integer moment pipeline is order-independent: any
    partitioning yields bit-equal doubles (the round-4 hash-red class)."""
    from nifi_hive_schema_generator_bundle_spark.operators.pca import (
        covariance_matrix,
    )

    df, _ = blob
    a = {
        (r.i, r.j): r.cov
        for r in covariance_matrix(df.coalesce(1), "vec").collect()
    }
    b = {
        (r.i, r.j): r.cov
        for r in covariance_matrix(df.repartition(13), "vec").collect()
    }
    assert a == b  # exact float equality, not approx


def test_fit_recovers_directions_and_variance(spark, blob):
    from nifi_hive_schema_generator_bundle_spark.operators.pca import pca_fit

    df, x = blob
    model = pca_fit(df, "vec", k=2)
    vals, vecs = np.linalg.eigh(np.cov(x, rowvar=False))
    assert model["explained_variance"][0] == pytest.approx(vals[-1], rel=1e-9)
    assert model["explained_variance"][1] == pytest.approx(vals[-2], rel=1e-9)
    # direction recovered up to the fixed sign
    got0 = np.array(model["components"][0])
    exp0 = vecs[:, -1]
    assert abs(float(np.dot(got0, exp0))) == pytest.approx(1.0, abs=1e-9)
    # sign convention: largest-|coeff| entry positive
    for comp in model["components"]:
        c = np.array(comp)
        assert c[int(np.argmax(np.abs(c)))] > 0
    assert model["mean"] == pytest.approx(x.mean(axis=0).tolist(), abs=1e-9)


def test_projection_variance_and_orthogonality(spark, blob):
    from nifi_hive_schema_generator_bundle_spark.operators.pca import (
        pca_fit,
        pca_project,
    )

    df, x = blob
    model = pca_fit(df, "vec", k=2)
    proj = pca_project(df, "vec", model)
    stats = proj.agg(
        F.var_samp("pc0").alias("v0"),
        F.var_samp("pc1").alias("v1"),
        F.covar_samp("pc0", "pc1").alias("c01"),
        F.avg("pc0").alias("m0"),
    ).collect()[0]
    # projection terms are quantized to 1e-8 per element (hash-exactness
    # contract), so moment identities hold to ~1e-6, not machine epsilon
    assert stats.v0 == pytest.approx(model["explained_variance"][0], rel=1e-6)
    assert stats.v1 == pytest.approx(model["explained_variance"][1], rel=1e-6)
    assert stats.c01 == pytest.approx(0.0, abs=1e-6)
    assert stats.m0 == pytest.approx(0.0, abs=1e-6)  # centered


def test_wrong_length_vectors_skipped_in_fit_null_in_project(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.pca import (
        covariance_matrix,
        pca_fit,
        pca_project,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0]),
            (2, [3.0, 5.0]),
            (3, [0.0, 1.0]),
            (4, [1.0, 2.0, 3.0]),  # wrong length
            (5, None),
        ],
        ["id", "vec"],
    )
    cov = {
        (r.i, r.j): r.cov
        for r in covariance_matrix(df, "vec", dim=2).collect()
    }
    exp = np.cov(
        np.array([[1.0, 2.0], [3.0, 5.0], [0.0, 1.0]]), rowvar=False
    )
    for (i, j), v in cov.items():
        assert v == pytest.approx(exp[i, j], abs=1e-9)
    model = pca_fit(df, "vec", k=1, dim=2)
    out = {r.id: r.pc0 for r in pca_project(df, "vec", model).collect()}
    assert out[4] is None and out[5] is None
    assert out[1] is not None


def test_fit_raises_on_empty_and_tiny(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.pca import pca_fit

    empty = spark.createDataFrame([], "id long, vec array<double>")
    with pytest.raises(ValueError):
        pca_fit(empty, "vec", k=1)
    one = spark.createDataFrame([(1, [1.0, 2.0])], ["id", "vec"])
    with pytest.raises(ValueError):
        pca_fit(one, "vec", k=1)
