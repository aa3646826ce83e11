"""Units for operators/impute.py (per-group mean / mode null filling)."""

from __future__ import annotations

from nifi_hive_schema_generator_bundle_spark.operators.impute import (
    impute_mean,
    impute_mode,
)


def _frame(spark):
    rows = [
        # group "a": mean of non-nulls = (10 + 20) / 2 = 15
        ("a", 1, 10.0),
        ("a", 2, None),
        ("a", 3, 20.0),
        # group "b": entirely null -> global mean fallback
        ("b", 4, None),
        # group "c": single value
        ("c", 5, 40.0),
    ]
    return spark.createDataFrame(rows, "g string, id int, v double")


class TestImputeMean:
    def test_group_mean_fill_and_flag(self, spark):
        out = {
            r["id"]: (r["v"], r["v_was_null"])
            for r in impute_mean(_frame(spark), ["v"], group_cols=["g"]).collect()
        }
        assert out[2] == (15.0, True)
        assert out[1] == (10.0, False)
        assert out[5] == (40.0, False)

    def test_all_null_group_falls_back_to_global_mean(self, spark):
        out = {
            r["id"]: r["v"]
            for r in impute_mean(_frame(spark), ["v"], group_cols=["g"]).collect()
        }
        # global mean over non-nulls = (10+20+40)/3
        assert out[4] == round(70.0 / 3, 6)

    def test_global_strategy_without_groups(self, spark):
        out = {
            r["id"]: r["v"]
            for r in impute_mean(_frame(spark), ["v"]).collect()
        }
        assert out[2] == out[4] == round(70.0 / 3, 6)

    def test_all_null_column_stays_null(self, spark):
        df = spark.createDataFrame(
            [("a", 1, None), ("b", 2, None)], "g string, id int, v double"
        )
        rows = impute_mean(df, ["v"], group_cols=["g"]).collect()
        assert len(rows) == 2 and all(r["v"] is None for r in rows)

    def test_partition_layout_invariance(self, spark):
        a = sorted(map(tuple, impute_mean(_frame(spark), ["v"], group_cols=["g"]).collect()))
        b = sorted(
            map(
                tuple,
                impute_mean(
                    _frame(spark).repartition(7), ["v"], group_cols=["g"]
                ).collect(),
            )
        )
        assert a == b


class TestImputeMode:
    def _cat(self, spark):
        rows = [
            ("a", 1, "x"), ("a", 2, "x"), ("a", 3, "y"), ("a", 4, None),
            ("b", 5, None),               # all-null group -> global mode
            ("c", 6, "y"), ("c", 7, "y"),
        ]
        return spark.createDataFrame(rows, "g string, id int, v string")

    def test_group_mode_fill(self, spark):
        out = {
            r["id"]: (r["v"], r["v_was_null"])
            for r in impute_mode(self._cat(spark), "v", group_cols=["g"]).collect()
        }
        assert out[4] == ("x", True)
        assert out[3] == ("y", False)

    def test_all_null_group_gets_global_mode(self, spark):
        out = {
            r["id"]: r["v"]
            for r in impute_mode(self._cat(spark), "v", group_cols=["g"]).collect()
        }
        # corpus-wide counts: x=2, y=3 -> global mode y
        assert out[5] == "y"

    def test_tie_breaks_to_smallest_value(self, spark):
        df = spark.createDataFrame(
            [("a", 1, "z"), ("a", 2, "b"), ("a", 3, None)],
            "g string, id int, v string",
        )
        out = {r["id"]: r["v"] for r in impute_mode(df, "v", group_cols=["g"]).collect()}
        assert out[3] == "b"  # counts tie 1-1; smallest value wins

    def test_all_null_column_keeps_rows(self, spark):
        df = spark.createDataFrame(
            [("a", 1, None), ("b", 2, None)], "g string, id int, v string"
        )
        rows = impute_mode(df, "v", group_cols=["g"]).collect()
        assert len(rows) == 2 and all(r["v"] is None for r in rows)


class TestWinsorize:
    def _df(self, spark):
        # group "a": values 1..10; at p10/p90 the bound ranks are
        # ceil(1.0)=1 and ceil(9.0)=9 -> bounds [1.0, 9.0]
        rows = [("a", i, float(i)) for i in range(1, 11)]
        rows += [("b", 100, 5.0)]
        return spark.createDataFrame(rows, "g string, id int, v double")

    def _wins(self, spark, **kw):
        from nifi_hive_schema_generator_bundle_spark.operators.impute import (
            winsorize,
        )

        return {
            r["id"]: (r["v"], r["v_clipped"])
            for r in winsorize(
                self._df(spark), ["v"], group_cols=["g"], **kw
            ).collect()
        }

    def test_bounds_are_order_statistics(self, spark):
        out = self._wins(spark, lower_p=0.1, upper_p=0.9)
        assert out[10] == (9.0, True)   # clamped down to rank-9 value
        assert out[1] == (1.0, False)   # rank ceil(0.1*10)=1 -> lo=1, kept
        assert out[5] == (5.0, False)

    def test_single_value_group_untouched(self, spark):
        out = self._wins(spark, lower_p=0.1, upper_p=0.9)
        assert out[100] == (5.0, False)

    def test_degenerate_percentiles_clamp_everything(self, spark):
        out = self._wins(spark, lower_p=0.5, upper_p=0.5)
        # every value in group a clamps to the median rank value (5.0)
        assert out[1] == (5.0, True) and out[10] == (5.0, True)
        assert out[5] == (5.0, False)

    def test_nulls_pass_through(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.impute import (
            winsorize,
        )

        df = spark.createDataFrame(
            [("a", 1, 1.0), ("a", 2, None), ("a", 3, 100.0)],
            "g string, id int, v double",
        )
        out = {
            r["id"]: (r["v"], r["v_clipped"])
            for r in winsorize(
                df, ["v"], group_cols=["g"], lower_p=0.5, upper_p=0.5
            ).collect()
        }
        assert out[2] == (None, False)

    def test_bad_percentiles_raise(self, spark):
        import pytest

        from nifi_hive_schema_generator_bundle_spark.operators.impute import (
            winsorize,
        )

        with pytest.raises(ValueError):
            winsorize(self._df(spark), ["v"], lower_p=0.9, upper_p=0.1)
