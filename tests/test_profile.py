"""Dataset profiling operator (operators/profile.py)."""

from __future__ import annotations

from nifi_hive_schema_generator_bundle_spark.operators.profile import profile


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], "id long, s string"
    )
    rows = {r.column: r for r in profile(df).collect()}
    assert rows["id"].n == 4 and rows["id"].n_null == 0
    assert rows["id"].n_distinct == 4
    assert rows["s"].n_null == 1
    assert rows["s"].n_distinct == 2  # countDistinct ignores nulls
    assert rows["s"].min_s == "a" and rows["s"].max_s == "b"


def test_profile_single_job(spark, sf_smoke_dir):
    """All columns profile in one aggregate — long format, one row per
    column, totals consistent."""
    from nifi_hive_schema_generator_bundle_spark.plans.queries import load_table

    docs = load_table(spark, sf_smoke_dir, "documents")
    out = profile(docs).collect()
    assert {r.column for r in out} == set(docs.columns)
    n = docs.count()
    assert all(r.n == n for r in out)


def test_profile_approx_same_shape(spark):
    from pyspark.sql import functions as F

    df = spark.range(1000).withColumn("k", F.col("id") % 7)
    exact = {r.column: r.n_distinct for r in profile(df).collect()}
    approx = {r.column: r.n_distinct for r in profile(df, approx=True).collect()}
    assert exact["k"] == 7
    # HLL estimate within its default ~5% rsd at this cardinality
    assert abs(approx["id"] - 1000) <= 60 and abs(approx["k"] - 7) <= 2
