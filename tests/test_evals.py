"""pass@k / majority-vote eval metric tests (operators/evals.py)."""

from __future__ import annotations

from math import comb

import pytest

from nifi_hive_schema_generator_bundle_spark.operators.evals import (
    majority_vote_accuracy,
    pass_at_k,
)


class TestPassAtK:
    def test_matches_comb_formula(self, spark):
        rows = []
        # problem A: 10 samples, 3 correct; B: 10 samples, 0 correct;
        # C: 10 samples, all correct; D: 4 samples, 2 correct
        for i in range(10):
            rows.append(("A", i < 3))
            rows.append(("B", False))
            rows.append(("C", True))
        for i in range(4):
            rows.append(("D", i < 2))
        df = spark.createDataFrame(rows, "problem_id string, correct boolean")
        got = {
            (r.problem_id, r.k): r.pass_at_k
            for r in pass_at_k(df, ks=(1, 5, 10)).collect()
        }

        def ref(n, c, k):
            if k > n:
                return None
            if n - c < k:
                return 1.0
            return round(1.0 - comb(n - c, k) / comb(n, k), 6)

        assert got[("A", 1)] == pytest.approx(ref(10, 3, 1))
        assert got[("A", 5)] == pytest.approx(ref(10, 3, 5))
        assert got[("A", 10)] == 1.0          # only 7 wrong, k=10 must hit
        assert got[("B", 1)] == 0.0 and got[("B", 10)] == 0.0
        assert got[("C", 1)] == 1.0
        assert got[("D", 5)] is None          # k > n undefined
        assert got[("D", 1)] == pytest.approx(ref(4, 2, 1))

    def test_validates_ks(self, spark):
        df = spark.createDataFrame(
            [("A", True)], "problem_id string, correct boolean"
        )
        with pytest.raises(ValueError):
            pass_at_k(df, ks=())
        with pytest.raises(ValueError):
            pass_at_k(df, ks=(0,))

    def test_plan_jvm_only(self, spark):
        df = spark.createDataFrame(
            [("A", True), ("A", False)], "problem_id string, correct boolean"
        )
        plan = pass_at_k(df)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "BatchEval" not in plan


class TestMajorityVote:
    def test_mode_and_tiebreak(self, spark):
        rows = [
            # P1: 'x' wins 2-1, gold 'x' -> correct
            ("P1", "x", "x"), ("P1", "x", "x"), ("P1", "y", "x"),
            # P2: tie 'a'/'b' -> smallest answer 'a'; gold 'b' -> wrong
            ("P2", "b", "b"), ("P2", "a", "b"),
            # P3: single sample, gold match
            ("P3", "z", "z"),
        ]
        df = spark.createDataFrame(rows, "problem_id string, answer string, gold string")
        got = {r.problem_id: r for r in majority_vote_accuracy(df).collect()}
        assert (got["P1"].vote_answer, got["P1"].is_correct) == ("x", True)
        assert (got["P1"].n_votes, got["P1"].n_samples) == (2, 3)
        assert (got["P2"].vote_answer, got["P2"].is_correct) == ("a", False)
        assert (got["P3"].vote_answer, got["P3"].is_correct) == ("z", True)

    def test_plan_jvm_only(self, spark):
        df = spark.createDataFrame(
            [("P", "a", "a")], "problem_id string, answer string, gold string"
        )
        plan = (
            majority_vote_accuracy(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan and "BatchEval" not in plan
