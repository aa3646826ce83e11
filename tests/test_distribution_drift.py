"""Unit tests for operators/drift.distribution_drift (PSI)."""

from __future__ import annotations

import math

import pytest

from nifi_hive_schema_generator_bundle_spark.operators.drift import (
    distribution_drift,
)


def _df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "v double")


class TestDistributionDrift:
    def test_hand_computed_psi(self, spark):
        # 2 buckets over [0, 10): ref = 3 low / 1 high, cur = 1 low / 3 high
        ref = _df(spark, [1, 2, 3, 7])
        cur = _df(spark, [2, 6, 7, 8])
        out = distribution_drift(
            ref, cur, "v", bins=2, lo=0.0, hi=10.0, smoothing=0.5
        ).collect()
        assert [r.bucket for r in out] == [0, 1]
        assert [(r.n_ref, r.n_cur) for r in out] == [(3, 1), (1, 3)]
        s, n = 0.5, 2
        for r in out:
            p = (r.n_ref + s) / (4 + s * n)
            q = (r.n_cur + s) / (4 + s * n)
            assert r.psi_contrib == pytest.approx(
                round((p - q) * math.log(p / q), 6), abs=1e-9
            )
        total = sum(r.psi_contrib for r in out)
        assert total > 0.1  # a real shift registers

    def test_identical_snapshots_zero_psi(self, spark):
        ref = _df(spark, [1, 4, 9, 3, 7])
        out = distribution_drift(
            ref, ref, "v", bins=5, lo=0.0, hi=10.0
        ).collect()
        assert len(out) == 5  # empty buckets present
        assert all(r.psi_contrib == 0.0 for r in out)

    def test_empty_bucket_is_finite(self, spark):
        ref = _df(spark, [1, 1, 1])
        cur = _df(spark, [9, 9, 9])
        out = distribution_drift(
            ref, cur, "v", bins=2, lo=0.0, hi=10.0
        ).collect()
        for r in out:
            assert math.isfinite(r.psi_contrib)
        assert sum(r.psi_contrib for r in out) > 0.25  # "shifted" band

    def test_rejects_zero_smoothing(self, spark):
        ref = _df(spark, [1])
        with pytest.raises(ValueError):
            distribution_drift(
                ref, ref, "v", bins=2, lo=0.0, hi=10.0, smoothing=0.0
            )


class TestCategoricalDrift:
    def test_hand_computed(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.drift import (
            categorical_drift,
        )

        ref = spark.createDataFrame(
            [("en",), ("en",), ("en",), ("fr",)], "lang string"
        )
        cur = spark.createDataFrame(
            [("en",), ("fr",), ("fr",), ("de",), (None,)], "lang string"
        )
        out = {r.value: r for r in categorical_drift(ref, cur, "lang").collect()}
        assert set(out) == {"en", "fr", "de"}  # union; NULL excluded
        assert (out["en"].n_ref, out["en"].n_cur) == (3, 1)
        assert (out["de"].n_ref, out["de"].n_cur) == (0, 1)
        s, k = 0.5, 3
        tr, tc = 4, 4
        for v, r in out.items():
            p = (r.n_ref + s) / (tr + s * k)
            q = (r.n_cur + s) / (tc + s * k)
            assert r.psi_contrib == pytest.approx(
                round((p - q) * math.log(p / q), 6), abs=1e-9
            )

    def test_identical_zero(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.drift import (
            categorical_drift,
        )

        ref = spark.createDataFrame([("a",), ("b",), ("b",)], "v string")
        out = categorical_drift(ref, ref, "v").collect()
        assert all(r.psi_contrib == 0.0 for r in out)

    def test_rejects_zero_smoothing(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.drift import (
            categorical_drift,
        )

        ref = spark.createDataFrame([("a",)], "v string")
        with pytest.raises(ValueError):
            categorical_drift(ref, ref, "v", smoothing=0)
