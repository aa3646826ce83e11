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


# ---------------------------------------------------------------------------
# dataset_fingerprint
# ---------------------------------------------------------------------------

class TestDatasetFingerprint:
    def test_order_and_partitioning_invariant(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.profile import (
            dataset_fingerprint,
        )

        rows = [(1, "a"), (2, "b"), (3, None)]
        df = spark.createDataFrame(rows, "id long, v string")
        base = dataset_fingerprint(df).collect()[0]
        # reversed row order, different partition count -> same fingerprint
        alt = dataset_fingerprint(
            spark.createDataFrame(list(reversed(rows)), "id long, v string")
            .repartition(7)
        ).collect()[0]
        assert (base.n_rows, base.xor_fingerprint, base.sum_fingerprint) == (
            alt.n_rows, alt.xor_fingerprint, alt.sum_fingerprint,
        )

    def test_detects_changed_row_and_duplicate(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.profile import (
            dataset_fingerprint,
        )

        a = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        changed = spark.createDataFrame([(1, "a"), (2, "B")], "id long, v string")
        fa = dataset_fingerprint(a).collect()[0]
        fc = dataset_fingerprint(changed).collect()[0]
        assert fa.xor_fingerprint != fc.xor_fingerprint
        # xor blind spot: duplicating a pair of identical rows xors away;
        # the additive sum (and count) must still catch it
        dup = spark.createDataFrame(
            [(1, "a"), (2, "b"), (9, "x"), (9, "x")], "id long, v string"
        )
        fd = dataset_fingerprint(dup).collect()[0]
        assert fd.n_rows != fa.n_rows
        assert fd.sum_fingerprint != fa.sum_fingerprint

    def test_null_distinct_from_empty_and_col_subset(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.profile import (
            dataset_fingerprint,
        )

        withnull = spark.createDataFrame([(1, None)], "id long, v string")
        withempty = spark.createDataFrame([(1, "")], "id long, v string")
        fn_ = dataset_fingerprint(withnull).collect()[0]
        fe = dataset_fingerprint(withempty).collect()[0]
        assert fn_.xor_fingerprint != fe.xor_fingerprint
        # column subset ignores the differing column
        same = dataset_fingerprint(withnull, ["id"]).collect()[0]
        assert same.xor_fingerprint == dataset_fingerprint(
            withempty, ["id"]
        ).collect()[0].xor_fingerprint

    def test_rejects_empty_cols(self, spark):
        import pytest as _pytest

        from nifi_hive_schema_generator_bundle_spark.operators.profile import (
            dataset_fingerprint,
        )

        df = spark.createDataFrame([(1,)], "id long")
        with _pytest.raises(ValueError):
            dataset_fingerprint(df, [])

    def test_grouped_fingerprints_compose_to_global(self, spark):
        """Per-group (n, xor, sum mod 2^60) must fold back to the global
        triple — xor of xors, sum of ns, modular sum of sums. This is
        the property that lets a 100 TB replica diff recurse from
        per-partition fingerprints to the table-level one."""
        from nifi_hive_schema_generator_bundle_spark.operators.profile import (
            dataset_fingerprint,
        )

        rows = [(i, f"g{i % 3}", f"v{i * 7 % 11}") for i in range(50)]
        df = spark.createDataFrame(rows, "id long, g string, v string")
        per = dataset_fingerprint(df, ["id", "v"], group_by="g").collect()
        assert len(per) == 3
        glob = dataset_fingerprint(df, ["id", "v"]).collect()[0]
        n = sum(r.n_rows for r in per)
        x = 0
        for r in per:
            x ^= r.xor_fingerprint
        s = sum(r.sum_fingerprint for r in per) % 2**60
        assert (n, x, s) == (
            glob.n_rows, glob.xor_fingerprint, glob.sum_fingerprint,
        )

    def test_group_by_column_excluded_from_hash(self, spark):
        """The group key must not be hashed into its own rows' triple —
        otherwise two replicas partitioned by different key spellings
        could never be compared group-wise."""
        from nifi_hive_schema_generator_bundle_spark.operators.profile import (
            dataset_fingerprint,
        )

        a = spark.createDataFrame([("g1", "x"), ("g1", "y")], "g string, v string")
        per = {r.g: r for r in dataset_fingerprint(a, group_by="g").collect()}
        plain = dataset_fingerprint(
            spark.createDataFrame([("x",), ("y",)], "v string")
        ).collect()[0]
        assert per["g1"].xor_fingerprint == plain.xor_fingerprint


class TestConcentrationReport:
    def test_hand_computed_bands_and_gini(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.profile import (
            concentration_report,
        )

        # groups by count: a=6, b=2, c=1, d=1 -> W=10, desc ranks 1..4
        rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] + [("d",)]
        df = spark.createDataFrame(rows, "g string")
        out = {
            r.band: r for r in concentration_report(df, "g", n_bands=4).collect()
        }
        assert [out[b].n_groups for b in (1, 2, 3, 4)] == [1, 1, 1, 1]
        assert [out[b].band_share for b in (1, 2, 3, 4)] == [0.6, 0.2, 0.1, 0.1]
        assert [out[b].cum_share for b in (1, 2, 3, 4)] == [0.6, 0.8, 0.9, 1.0]
        # R = 1*6+2*2+3*1+4*1 = 17; G = 2*(5*10-17)/(4*10) - 5/4 = 0.4
        assert all(out[b].gini == 0.4 for b in (1, 2, 3, 4))

    def test_weight_col_and_tiebreak(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.profile import (
            concentration_report,
        )

        # equal weights tie-broken by group value ascending: x before y
        df = spark.createDataFrame(
            [("y", 3.0), ("x", 2.0), ("x", 1.0)], "g string, w double"
        )
        out = concentration_report(df, "g", weight_col="w", n_bands=2).collect()
        assert [(r.band, r.n_groups, r.cum_share) for r in out] == [
            (1, 1, 0.5),
            (2, 1, 1.0),
        ]
        # uniform two-group weights -> gini 0
        assert all(r.gini == 0.0 for r in out)

    def test_partition_layout_invariant(self, spark):
        """The distributed prefix sum must give the same answer no
        matter how the input is laid out."""
        from nifi_hive_schema_generator_bundle_spark.operators.profile import (
            concentration_report,
        )

        rows = [(f"g{i % 17}",) for i in range(500)]
        df = spark.createDataFrame(rows, "g string")
        a = concentration_report(df, "g").collect()
        b = concentration_report(df.repartition(13), "g").collect()
        c = concentration_report(df.coalesce(1), "g").collect()
        assert a == b == c
        assert abs(a[-1].cum_share - 1.0) < 1e-9

    def test_rejects_bad_bands(self, spark):
        import pytest

        from nifi_hive_schema_generator_bundle_spark.operators.profile import (
            concentration_report,
        )

        df = spark.createDataFrame([("a",)], "g string")
        with pytest.raises(ValueError):
            concentration_report(df, "g", n_bands=0)


class TestDatasetOverlapReport:
    def test_planted_overlap_and_zero_pair(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.profile import (
            dataset_overlap_report,
        )

        rows = [
            # A: x, y, z   B: x, y, w   C: disjoint
            ("A", "x"), ("A", "Y "), ("A", "z"), ("A", "x"),  # dup + norm
            ("B", "x"), ("B", "y"), ("B", "w"),
            ("C", "only c"),
        ]
        df = spark.createDataFrame(rows, "source string, text string")
        out = {
            (r.group_a, r.group_b): r
            for r in dataset_overlap_report(df).collect()
        }
        assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
        ab = out[("A", "B")]
        # 'Y ' normalizes to 'y' -> A∩B = {x, y}
        assert (ab.n_a, ab.n_b, ab.n_common) == (3, 3, 2)
        assert ab.jaccard == 0.5
        ac = out[("A", "C")]
        assert ac.n_common == 0 and ac.jaccard == 0.0  # reported, not dropped

    def test_single_group_empty_report(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.profile import (
            dataset_overlap_report,
        )

        df = spark.createDataFrame(
            [("A", "x"), ("A", "y")], "source string, text string"
        )
        assert dataset_overlap_report(df).count() == 0
