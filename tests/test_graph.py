"""Unit tests: PageRank on known graph shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.operators.graph import pagerank


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_star_center_dominates(spark):
    # leaves all point at the hub
    edges = spark.createDataFrame(
        [(f"leaf{i}", "hub") for i in range(5)], "src string, dst string"
    )
    r = _ranks(pagerank(edges, iters=10))
    assert r["hub"] == max(r.values())
    leaf_ranks = [v for k, v in r.items() if k != "hub"]
    assert max(leaf_ranks) - min(leaf_ranks) < 1e-12  # symmetric leaves tie


def test_ranks_form_probability_vector(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        "src string, dst string",
    )
    r = _ranks(pagerank(edges, iters=15))
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)
    assert all(v > 0 for v in r.values())


def test_dangling_mass_redistributes(spark):
    # d has no out-edges: without the dangling fix total mass leaks
    edges = spark.createDataFrame(
        [("a", "d"), ("b", "d"), ("c", "d")], "src string, dst string"
    )
    r = _ranks(pagerank(edges, iters=10))
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)
    assert r["d"] == max(r.values())


def test_zero_iters_is_uniform(spark):
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    r = _ranks(pagerank(edges, iters=0))
    assert r == {"a": 0.5, "b": 0.5}


def test_validates_params(spark):
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(edges, iters=-1)
    with pytest.raises(ValueError):
        pagerank(edges, damping=1.5)
