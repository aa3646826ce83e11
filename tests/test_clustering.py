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


# --------------------------------------------------------------------------
# semantic_dedup (SemDeDup)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def sem_docs(spark):
    # two well-separated cells; ids chosen so keep-lowest is observable
    rows = [
        (0, [1.0, 0.0, 0.0]),      # cell A representative
        (1, [0.999, 0.01, 0.0]),   # near-twin of 0 -> dropped
        (2, [0.8, 0.6, 0.0]),      # cell A but cosine(0,2)=0.8 < 0.95 -> kept
        (10, [0.0, 0.0, 1.0]),     # cell B representative
        (11, [0.0, 0.01, 0.999]),  # near-twin of 10 -> dropped
        (12, [0.0, 1.0, 0.0]),     # equidistant tie -> cell A, no near-twin -> kept
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


SEM_CENTROIDS = [[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]


def test_semantic_dedup_keeps_lowest_per_near_group(sem_docs):
    from nifi_hive_schema_generator_bundle_spark.operators.clustering import semantic_dedup

    # doc 12 lands in cell B (closer to [0,0,1]? no: [1,0,0.05] is closer
    # to [1,0,0]) — compute expectation from the operator's own assign
    out = semantic_dedup(sem_docs, SEM_CENTROIDS, threshold=0.95)
    kept = {r["vec_id"]: r["cluster_id"] for r in out.collect()}
    assert set(kept) == {0, 2, 10, 12}
    assert kept[0] == kept[2] == kept[12] == 0 and kept[10] == 1


def test_semantic_dedup_blocking_spares_cross_cell_twins(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.clustering import semantic_dedup

    # identical vectors equidistant? place twins in DIFFERENT cells by
    # construction: near-identical but assigned apart never compare
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.01, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, [[1.0, 0.0], [0.0, 1.0]], threshold=0.9)
    assert sorted(r["vec_id"] for r in out.collect()) == [0, 1]


def test_semantic_dedup_max_cluster_cap_spares_hot_cell(sem_docs):
    from nifi_hive_schema_generator_bundle_spark.operators.clustering import semantic_dedup

    # cap below cell-A size (4 members incl. 12): pair generation skips
    # cell A entirely -> all its rows survive; cell B (2) still dedups
    out = semantic_dedup(sem_docs, SEM_CENTROIDS, threshold=0.95, max_cluster=3)
    assert sorted(r["vec_id"] for r in out.collect()) == [0, 1, 2, 10, 12]


def test_semantic_dedup_threshold_boundary_rounds_to_6(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.clustering import semantic_dedup

    # cosine(a,b) just UNDER the threshold at full precision but equal
    # after 6-decimal rounding -> counts as a duplicate (oracle parity)
    import math
    theta = math.acos(0.95 - 2e-8)
    rows = [(0, [1.0, 0.0]), (1, [math.cos(theta), math.sin(theta)])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, [[1.0, 0.0]], threshold=0.95)
    assert sorted(r["vec_id"] for r in out.collect()) == [0]


class TestSimplifiedSilhouette:
    def test_hand_computed(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.clustering import (
            simplified_silhouette,
        )

        cents = [[0.0, 0.0], [10.0, 0.0]]
        rows = [
            (1, [1.0, 0.0]),    # a=1, b=9 -> s=(9-1)/9
            (2, [5.0, 0.0]),    # equidistant: a=b=5 -> s=0, tie -> cluster 0
            (3, [10.0, 0.0]),   # a=0, b=10 -> s=1
            (4, [0.0, 0.0]),    # a=0 at cluster 0
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = {r.vec_id: r for r in simplified_silhouette(df, cents).collect()}
        import pytest as _p

        assert got[1].cluster == 0
        assert got[1].silhouette == _p.approx(round(8 / 9, 6))
        assert got[2].cluster == 0 and got[2].silhouette == 0.0
        assert got[3].cluster == 1 and got[3].silhouette == 1.0
        assert got[4].cluster == 0 and got[4].silhouette == 1.0

    def test_validates_and_plan(self, spark):
        import pytest as _p

        from nifi_hive_schema_generator_bundle_spark.operators.clustering import (
            simplified_silhouette,
        )

        df = spark.createDataFrame(
            [(1, [0.0, 0.0])], "vec_id long, embedding array<double>"
        )
        with _p.raises(ValueError):
            simplified_silhouette(df, [[0.0, 0.0]])
        plan = (
            simplified_silhouette(df, [[0.0, 0.0], [1.0, 1.0]])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan and "Exchange" not in plan
