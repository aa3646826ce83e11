"""Unit tests: k-means fit/assign on synthetic blobs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.operators.clustering import (
    assign_clusters,
    kmeans_fit,
)


def _blob(center, n, spread, start_id):
    # deterministic pseudo-noise from the row index (no RNG)
    rows = []
    for i in range(n):
        jitter = [
            spread * math.sin(7.3 * (start_id + i) + d) for d in range(len(center))
        ]
        rows.append((start_id + i, [c + j for c, j in zip(center, jitter)]))
    return rows


@pytest.fixture(scope="module")
def blobs(spark):
    rows = (
        _blob([0.0, 0.0, 0.0], 40, 0.3, 0)
        + _blob([10.0, 10.0, 10.0], 40, 0.3, 40)
        + _blob([-10.0, 5.0, 0.0], 40, 0.3, 80)
    )
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_assign_nearest_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [5.0, 5.0]), (2, [2.5, 2.5])],
        "vec_id long, embedding array<double>",
    )
    cents = [[0.0, 0.0], [5.0, 5.0]]
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_clusters(df, cents).collect()
    }
    assert got[0] == 0 and got[1] == 1
    assert got[2] == 0  # exact tie → lowest cluster id


def test_assign_is_narrow_no_shuffle(blobs):
    plan = (
        assign_clusters(blobs, [[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "PythonUDF" not in plan.replace(
        "ArrowEvalPython", ""
    )


def test_kmeans_recovers_blob_centers(blobs):
    cents = kmeans_fit(blobs, 3, max_iter=15)
    found = sorted(tuple(round(x) for x in c) for c in cents)
    assert found == [(-10, 5, 0), (0, 0, 0), (10, 10, 10)]


def test_kmeans_assignment_partitions_blobs(blobs):
    cents = kmeans_fit(blobs, 3, max_iter=15)
    assigned = assign_clusters(blobs, cents)
    # every blob's 40 points share one cluster id
    sizes = sorted(
        r["count"]
        for r in assigned.withColumn("blob", (F.col("vec_id") / 40).cast("int"))
        .groupBy("blob", "cluster_id")
        .count()
        .collect()
    )
    assert sizes == [40, 40, 40]


def test_kmeans_validates_inputs(blobs):
    with pytest.raises(ValueError):
        kmeans_fit(blobs, 0)
    with pytest.raises(ValueError):
        kmeans_fit(blobs.limit(2), 5)
    with pytest.raises(ValueError):
        assign_clusters(blobs, [])
