"""Property tests: mixture reweighting and token-budget selection hold
their invariants for arbitrary targets/budgets (small example counts —
each example runs Spark jobs)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
    mixture_sample,
)
from nifi_hive_schema_generator_bundle_spark.operators.selection import (
    token_budget_select,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, ["en", "fr", "de"][i % 3], " ".join(f"w{i}x{j % (1 + i % 7)}" for j in range(12)))
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string").cache()


@given(
    w=st.tuples(
        st.floats(0.05, 1.0), st.floats(0.05, 1.0), st.floats(0.05, 1.0)
    )
)
@settings(**_SETTINGS)
def test_mixture_subset_and_rate_bound(corpus, w):
    targets = dict(zip(["en", "fr", "de"], w))
    kept = mixture_sample(corpus, "lang", targets, key="doc_id")
    counts = dict(
        kept.groupBy("lang").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    # kept set is a subset: per-stratum counts never exceed availability (100)
    assert all(v <= 100 for v in counts.values())
    # normalized target ordering is respected up to binomial noise:
    # the stratum with the largest target keeps the most docs
    if counts:
        total_w = sum(w)
        norm = {k: v / total_w for k, v in targets.items()}
        best = max(norm, key=norm.get)
        assert counts.get(best, 0) >= max(counts.values()) - 25


@given(budget=st.integers(0, 5000))
@settings(**_SETTINGS)
def test_budget_invariants(corpus, budget):
    kept = token_budget_select(corpus, budget)
    row = kept.agg(
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("total"),
        F.min("bucket").alias("floor_bucket"),
    ).collect()[0]
    # 1. never over-fills
    assert row["total"] <= budget
    # 2. kept set is bucket-downward-closed: nothing dropped outranks the floor
    if row["floor_bucket"] is not None:
        dropped_best = (
            token_budget_select(corpus, 10**9)
            .join(kept.select("doc_id"), "doc_id", "left_anti")
            .agg(F.max("bucket"))
            .collect()[0][0]
        )
        if dropped_best is not None:
            assert dropped_best <= row["floor_bucket"]
