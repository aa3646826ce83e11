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


class TestCalibrationError:
    def test_hand_computed(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            calibration_error,
        )

        # two bins at n_bins=2: [0, .5) and [.5, 1]
        rows = [
            (0.2, True), (0.4, False),          # bin 0: avg conf .3, acc .5
            (0.9, True), (0.7, True), (1.0, False),  # bin 1: avg .866667, acc .666667
        ]
        df = spark.createDataFrame(rows, "confidence double, correct boolean")
        got = {r.bin: r for r in calibration_error(df, n_bins=2).collect()}
        assert got[0].bin_count == 2
        assert got[0].avg_confidence == pytest.approx(0.3)
        assert got[0].accuracy == pytest.approx(0.5)
        assert got[1].avg_confidence == pytest.approx(0.866667)
        assert got[1].accuracy == pytest.approx(0.666667)
        want_ece = (abs(0.5 - 0.3) * 2 + abs(0.666667 - 0.866667) * 3) / 5
        assert got[0].ece == pytest.approx(want_ece, abs=1e-6)
        assert got[1].ece == got[0].ece

    def test_grouped_and_conf_one_folds_into_last_bin(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            calibration_error,
        )

        rows = [("m1", 1.0, True), ("m1", 0.95, True), ("m2", 0.1, False)]
        df = spark.createDataFrame(
            rows, "model string, confidence double, correct boolean"
        )
        got = calibration_error(df, group_cols=("model",)).collect()
        by = {(r.model, r.bin): r for r in got}
        assert by[("m1", 9)].bin_count == 2       # 1.0 folded into bin 9
        assert by[("m1", 9)].ece == pytest.approx(abs(1.0 - 0.975))
        assert by[("m2", 1)].ece == pytest.approx(0.1)

    def test_out_of_range_raises(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            calibration_error,
        )

        df = spark.createDataFrame(
            [(1.2, True)], "confidence double, correct boolean"
        )
        with pytest.raises(Exception, match="outside"):
            calibration_error(df).collect()
        with pytest.raises(ValueError):
            calibration_error(df, n_bins=0)


class TestFleissKappa:
    def test_textbook_example(self, spark):
        # Fleiss (1971)-style fixture: 4 items, 3 raters each
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            fleiss_kappa,
        )

        ratings = [
            # item 1: all agree 'x'  -> P_i = 1
            (1, "x"), (1, "x"), (1, "x"),
            # item 2: 2 'x', 1 'y'   -> P_i = (4+1-3)/6 = 1/3
            (2, "x"), (2, "x"), (2, "y"),
            # item 3: all different  -> P_i = (1+1+1-3)/6 = 0
            (3, "x"), (3, "y"), (3, "z"),
            # item 4: all agree 'y'
            (4, "y"), (4, "y"), (4, "y"),
            # item 5: single rating -> dropped entirely
            (5, "z"),
        ]
        df = spark.createDataFrame(ratings, "item_id int, category string")
        r = fleiss_kappa(df).collect()[0]
        assert (r.n_items, r.n_ratings) == (4, 12)
        p_bar = (1 + 1 / 3 + 0 + 1) / 4
        px, py, pz = 6 / 12, 5 / 12, 1 / 12
        p_e = px * px + py * py + pz * pz
        kappa = (p_bar - p_e) / (1 - p_e)
        assert r.p_bar == pytest.approx(round(p_bar, 6))
        assert r.p_e == pytest.approx(round(p_e, 6))
        assert r.kappa == pytest.approx(round(kappa, 6), abs=2e-6)

    def test_unanimous_single_category_is_null(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            fleiss_kappa,
        )

        df = spark.createDataFrame(
            [(1, "x"), (1, "x"), (2, "x"), (2, "x")],
            "item_id int, category string",
        )
        r = fleiss_kappa(df).collect()[0]
        assert r.p_e == 1.0 and r.kappa is None

    def test_plan_jvm_only(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            fleiss_kappa,
        )

        df = spark.createDataFrame(
            [(1, "x"), (1, "y")], "item_id int, category string"
        )
        plan = fleiss_kappa(df)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "BatchEval" not in plan


class TestKrippendorffAlpha:
    def _alpha_reference(self, ratings):
        # independent closed-form computation from the coincidence
        # algebra (nominal metric), for cross-checking the Spark plan
        from collections import Counter, defaultdict

        per_item = defaultdict(Counter)
        for item, cat in ratings:
            per_item[item][cat] += 1
        kept = {u: c for u, c in per_item.items() if sum(c.values()) >= 2}
        n = sum(sum(c.values()) for c in kept.values())
        agree = sum(
            sum(v * (v - 1) for v in c.values()) / (sum(c.values()) - 1)
            for c in kept.values()
        )
        marg = Counter()
        for c in kept.values():
            marg.update(c)
        sq = sum(v * v for v in marg.values())
        d_o = n - agree
        d_e = (n * n - sq) / (n - 1)
        return n, agree, d_o, d_e, 1 - d_o / d_e

    def test_matches_reference_on_mixed_fixture(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            krippendorff_alpha,
        )

        # varying raters per item incl. a dropped single-rating item —
        # the missing-data shape alpha exists for
        ratings = [
            (1, "x"), (1, "x"), (1, "x"),
            (2, "x"), (2, "y"),
            (3, "x"), (3, "y"), (3, "z"), (3, "z"),
            (4, "y"), (4, "y"),
            (5, "z"),  # dropped
        ]
        df = spark.createDataFrame(ratings, "item_id int, category string")
        r = krippendorff_alpha(df).collect()[0]
        n, agree, d_o, d_e, alpha = self._alpha_reference(ratings)
        assert (r.n_items, r.n_ratings) == (4, n)
        assert r.d_o == pytest.approx(round(d_o, 6), abs=2e-6)
        assert r.d_e == pytest.approx(round(d_e, 6), abs=2e-6)
        assert r.alpha == pytest.approx(round(alpha, 6), abs=2e-6)

    def test_perfect_agreement_is_one(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            krippendorff_alpha,
        )

        df = spark.createDataFrame(
            [(1, "x"), (1, "x"), (2, "y"), (2, "y"), (2, "y")],
            "item_id int, category string",
        )
        r = krippendorff_alpha(df).collect()[0]
        assert r.d_o == 0.0 and r.alpha == 1.0

    def test_single_category_alpha_null(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            krippendorff_alpha,
        )

        df = spark.createDataFrame(
            [(1, "x"), (1, "x"), (2, "x"), (2, "x")],
            "item_id int, category string",
        )
        r = krippendorff_alpha(df).collect()[0]
        assert r.d_e == 0.0 and r.alpha is None

    def test_all_singletons_empty_frame(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            krippendorff_alpha,
        )

        df = spark.createDataFrame(
            [(1, "x"), (2, "y")], "item_id int, category string"
        )
        assert krippendorff_alpha(df).count() == 0

    def test_plan_jvm_only(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            krippendorff_alpha,
        )

        df = spark.createDataFrame(
            [(1, "x"), (1, "y")], "item_id int, category string"
        )
        plan = (
            krippendorff_alpha(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Python" not in plan and "BatchEval" not in plan


class TestFitPowerLaw:
    def test_recovers_exact_law(self, spark):
        from math import log

        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            fit_power_law,
        )

        rows = [(float(n), 3.0 * n ** -0.5) for n in (10, 100, 1000, 10000)]
        df = spark.createDataFrame(rows, "n_tokens double, loss double")
        r = fit_power_law(df, "n_tokens", "loss").collect()[0]
        assert r.n == 4
        assert r.slope == pytest.approx(-0.5, abs=1e-6)
        assert r.intercept == pytest.approx(log(3.0), abs=1e-6)
        assert r.r2 == pytest.approx(1.0, abs=1e-6)

    def test_grouped_and_domain_filter(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            fit_power_law,
        )

        rows = (
            [("a", float(n), 2.0 * n ** -1.0) for n in (10, 100, 1000)]
            + [("b", float(n), 5.0 * n ** 0.25) for n in (10, 100, 1000)]
            + [("a", -1.0, 1.0), ("a", 10.0, 0.0)]      # out of log domain
        )
        df = spark.createDataFrame(rows, "run string, x double, y double")
        got = {
            r.run: r for r in fit_power_law(df, "x", "y", group_cols=("run",)).collect()
        }
        assert got["a"].n == 3                          # bad rows dropped
        assert got["a"].slope == pytest.approx(-1.0, abs=1e-6)
        assert got["b"].slope == pytest.approx(0.25, abs=1e-6)

    def test_degenerate_group_null_slope(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            fit_power_law,
        )

        df = spark.createDataFrame(
            [(5.0, 2.0), (5.0, 3.0)], "x double, y double"
        )
        r = fit_power_law(df, "x", "y").collect()[0]
        assert r.slope is None                          # zero x-variance


class TestRankCorrelation:
    def test_matches_scipy_free_reference(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            rank_correlation,
        )

        # hand data with ties; reference = textbook average-rank Spearman
        a = [1.0, 2.0, 2.0, 3.0, 5.0, 4.0]
        b = [2.0, 1.0, 4.0, 3.0, 6.0, 6.0]

        def avg_ranks(xs):
            order = sorted(range(len(xs)), key=lambda i: xs[i])
            ranks = [0.0] * len(xs)
            i = 0
            while i < len(order):
                j = i
                while j + 1 < len(order) and xs[order[j + 1]] == xs[order[i]]:
                    j += 1
                r = (i + j) / 2 + 1
                for t in range(i, j + 1):
                    ranks[order[t]] = r
                i = j + 1
            return ranks

        ra, rb = avg_ranks(a), avg_ranks(b)
        n = len(a)
        ma, mb = sum(ra) / n, sum(rb) / n
        cov = sum((x - ma) * (y - mb) for x, y in zip(ra, rb)) / n
        va = sum((x - ma) ** 2 for x in ra) / n
        vb = sum((y - mb) ** 2 for y in rb) / n
        want = round(cov / (va * vb) ** 0.5, 6)

        df = spark.createDataFrame(list(zip(a, b)), "a double, b double")
        r = rank_correlation(df, "a", "b").collect()[0]
        assert r.n == 6
        assert r.spearman_rho == pytest.approx(want, abs=1e-6)

    def test_perfect_and_inverse_and_constant(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            rank_correlation,
        )

        rows = [(float(i), float(i * 2), float(10 - i), 1.0) for i in range(8)]
        df = spark.createDataFrame(rows, "x double, up double, down double, c double")
        assert rank_correlation(df, "x", "up").collect()[0].spearman_rho == 1.0
        assert rank_correlation(df, "x", "down").collect()[0].spearman_rho == -1.0
        assert rank_correlation(df, "x", "c").collect()[0].spearman_rho is None

    def test_grouped(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            rank_correlation,
        )

        rows = [("g1", float(i), float(i)) for i in range(5)] + [
            ("g2", float(i), float(-i)) for i in range(5)
        ]
        df = spark.createDataFrame(rows, "g string, a double, b double")
        got = {
            r.g: r.spearman_rho
            for r in rank_correlation(df, "a", "b", group_cols=("g",)).collect()
        }
        assert got == {"g1": 1.0, "g2": -1.0}


class TestBootstrapMeanCI:
    def test_matches_python_replica_and_brackets_mean(self, spark):
        import hashlib

        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            _POIS1_CDF,
            bootstrap_mean_ci,
        )

        vals = [float(v) for v in range(1, 41)]  # mean 20.5
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        r = bootstrap_mean_ci(df, "x", n_boot=32, seed="s").collect()[0]
        assert r.n == 40 and r.mean == 20.5 and r.n_boot == 32
        assert r.ci_lo <= 20.5 <= r.ci_hi
        assert r.ci_lo < r.ci_hi

        # pure-python replica of the deterministic weights + interval
        def weight(seed, b, k):
            # lane draw: uniform b is 8 hex chars of md5(seed|b//4|k)
            digest = hashlib.md5(f"{seed}|{b // 4}|{k}".encode()).hexdigest()
            u = int(digest[8 * (b % 4):8 * (b % 4) + 8], 16) / 4294967296.0
            for kk, t in enumerate(_POIS1_CDF):
                if u < t:
                    return kk
            return 7

        means = []
        for b in range(32):
            ws = [weight("s", b, f"{v:.1f}") for v in vals]
            means.append(sum(w * v for w, v in zip(ws, vals)) / sum(ws))
        means.sort()
        import math

        lo = round(means[max(1, math.ceil(0.025 * 32)) - 1], 6)
        hi = round(means[min(32, math.ceil(0.975 * 32)) - 1], 6)
        assert (r.ci_lo, r.ci_hi) == (pytest.approx(lo), pytest.approx(hi))

    def test_determinism_across_layouts(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            bootstrap_mean_ci,
        )

        vals = [(float(v),) for v in range(100)]
        a = bootstrap_mean_ci(
            spark.createDataFrame(vals, "x double"), "x", n_boot=16
        ).collect()[0]
        b = bootstrap_mean_ci(
            spark.createDataFrame(vals, "x double").repartition(13),
            "x", n_boot=16,
        ).collect()[0]
        assert tuple(a) == tuple(b)

    def test_validates(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            bootstrap_mean_ci,
        )

        df = spark.createDataFrame([(1.0,)], "x double")
        with pytest.raises(ValueError):
            bootstrap_mean_ci(df, "x", n_boot=1)
        with pytest.raises(ValueError):
            bootstrap_mean_ci(df, "x", alpha=0.0)


class TestBootstrapDiffCI:
    def test_clear_separation_is_significant(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            bootstrap_diff_ci,
        )

        rows = [("A", 10.0 + (i % 5) / 10, float(i)) for i in range(40)] + [
            ("B", 5.0 + (i % 5) / 10, float(100 + i)) for i in range(40)
        ]
        df = spark.createDataFrame(rows, "model string, score double, rid double")
        r = bootstrap_diff_ci(
            df, "score", "model", "A", "B", n_boot=32, id_col="rid"
        ).collect()[0]
        assert (r.n_a, r.n_b) == (40, 40)
        assert r.diff == pytest.approx(5.0, abs=0.01)
        assert r.ci_lo <= r.diff <= r.ci_hi
        assert r.significant and r.ci_lo > 0

    def test_identical_groups_not_significant(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            bootstrap_diff_ci,
        )

        rows = [(g, float(i % 10), float(i) + (0.5 if g == "B" else 0.0))
                for g in ("A", "B") for i in range(60)]
        df = spark.createDataFrame(rows, "model string, score double, rid double")
        r = bootstrap_diff_ci(
            df, "score", "model", "A", "B", n_boot=32, id_col="rid"
        ).collect()[0]
        assert r.diff == 0.0
        assert r.ci_lo <= 0.0 <= r.ci_hi
        assert not r.significant

    def test_other_groups_ignored_and_validation(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            bootstrap_diff_ci,
        )

        rows = [("A", 1.0, 1.0), ("B", 2.0, 2.0), ("C", 99.0, 3.0)]
        df = spark.createDataFrame(rows, "model string, score double, rid double")
        r = bootstrap_diff_ci(
            df, "score", "model", "A", "B", n_boot=4, id_col="rid"
        ).collect()[0]
        assert (r.n_a, r.n_b) == (1, 1)      # C excluded
        with pytest.raises(ValueError):
            bootstrap_diff_ci(df, "score", "model", "A", "B", n_boot=1)


class TestClassificationReport:
    def test_hand_computed(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            classification_report,
        )

        rows = [
            ("a", "a"), ("a", "a"), ("a", "b"),       # a: 2 tp of 3 gold
            ("b", "b"), ("b", "a"),                   # b: 1 tp of 2 gold
            ("c", "a"),                               # c never predicted
        ]
        df = spark.createDataFrame(rows, "gold string, pred string")
        got = {r.label: r for r in classification_report(df).collect()}
        a = got["a"]
        assert (a.n_gold, a.n_pred, a.tp) == (3, 4, 2)
        assert a.precision == pytest.approx(0.5)
        assert a.recall == pytest.approx(round(2 / 3, 6))
        p, r = 0.5, 2 / 3
        assert a.f1 == pytest.approx(round(2 * p * r / (p + r), 6))
        c = got["c"]
        assert (c.n_gold, c.n_pred, c.tp) == (1, 0, 0)
        assert c.precision is None and c.recall == 0.0 and c.f1 is None

    def test_pred_only_class_and_plan(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            classification_report,
        )

        df = spark.createDataFrame(
            [("x", "y")], "gold string, pred string"
        )
        got = {r.label: r for r in classification_report(df).collect()}
        y = got["y"]
        assert (y.n_gold, y.n_pred, y.tp) == (0, 1, 0)
        assert y.recall is None and y.precision == 0.0
        plan = (
            classification_report(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan


class TestChiSquare:
    def test_matches_python_replica(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            chi_square_independence,
        )

        # dependent table: outcome skews with group
        rows = (
            [("g1", "yes")] * 30 + [("g1", "no")] * 10
            + [("g2", "yes")] * 10 + [("g2", "no")] * 30
        )
        df = spark.createDataFrame(rows, "g string, y string")
        r = chi_square_independence(df, "g", "y").collect()[0]

        from collections import Counter

        obs = Counter(rows)
        rmarg = Counter(g for g, _ in rows)
        cmarg = Counter(y for _, y in rows)
        n = len(rows)
        chi2 = sum(
            (obs.get((g, y), 0) - rmarg[g] * cmarg[y] / n) ** 2
            / (rmarg[g] * cmarg[y] / n)
            for g in rmarg for y in cmarg
        )
        assert r.chi2 == pytest.approx(round(chi2, 6))
        assert (r.n, r.n_rows, r.n_cols, r.dof) == (80, 2, 2, 1)
        assert r.critical_95 == 3.841 and r.significant

    def test_independent_table_not_significant(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            chi_square_independence,
        )

        rows = [(g, y) for g in ("a", "b") for y in ("x", "z") for _ in range(25)]
        df = spark.createDataFrame(rows, "g string, y string")
        r = chi_square_independence(df, "g", "y").collect()[0]
        assert r.chi2 == 0.0 and r.significant is False

    def test_zero_cell_and_large_dof(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            chi_square_independence,
        )

        # g1 never produces 'no': the zero cell still contributes e
        rows = [("g1", "yes")] * 10 + [("g2", "yes")] * 5 + [("g2", "no")] * 5
        df = spark.createDataFrame(rows, "g string, y string")
        r = chi_square_independence(df, "g", "y").collect()[0]
        assert r.chi2 > 0 and r.dof == 1

        big = spark.createDataFrame(
            [(f"r{i}", f"c{j}") for i in range(8) for j in range(8)],
            "g string, y string",
        )
        rb = chi_square_independence(big, "g", "y").collect()[0]
        assert rb.dof == 49 and rb.critical_95 is None and rb.significant is None


class TestMannWhitneyU:
    def test_matches_python_replica_with_ties(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            mann_whitney_u,
        )

        a_vals = [1.0, 2.0, 2.0, 5.0, 7.0, 7.0]
        b_vals = [2.0, 3.0, 3.0, 4.0]
        rows = [("A", v) for v in a_vals] + [("B", v) for v in b_vals]
        df = spark.createDataFrame(rows, "g string, x double")
        r = mann_whitney_u(df, "x", "g", "A", "B").collect()[0]

        # textbook replica: pooled average ranks, tie-corrected variance
        pooled = sorted(a_vals + b_vals)
        from collections import Counter

        cnt = Counter(pooled)
        first = {}
        pos = 1
        for v in sorted(cnt):
            first[v] = pos
            pos += cnt[v]
        rank = {v: first[v] + (cnt[v] - 1) / 2 for v in cnt}
        ra = sum(rank[v] for v in a_vals)
        na, nb = len(a_vals), len(b_vals)
        n = na + nb
        u = ra - na * (na + 1) / 2
        tsum = sum(t ** 3 - t for t in cnt.values())
        var = na * nb / 12 * ((n + 1) - tsum / (n * (n - 1)))
        z = (u - na * nb / 2) / var ** 0.5
        assert (r.n_a, r.n_b) == (na, nb)
        assert r.u == pytest.approx(round(u, 6))
        assert r.z == pytest.approx(round(z, 6), abs=2e-6)

    def test_clear_shift_significant_direction(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            mann_whitney_u,
        )

        rows = [("A", 100.0 + i) for i in range(30)] + [
            ("B", float(i)) for i in range(30)
        ]
        df = spark.createDataFrame(rows, "g string, x double")
        r = mann_whitney_u(df, "x", "g", "A", "B").collect()[0]
        assert r.z > 1.96 and r.significant    # A stochastically larger

    def test_all_tied_and_empty_group(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.evals import (
            mann_whitney_u,
        )

        tied = spark.createDataFrame(
            [("A", 1.0), ("B", 1.0), ("A", 1.0)], "g string, x double"
        )
        r = mann_whitney_u(tied, "x", "g", "A", "B").collect()[0]
        assert r.z is None and r.significant is None   # zero variance

        one_sided = spark.createDataFrame(
            [("A", 1.0), ("A", 2.0)], "g string, x double"
        )
        r2 = mann_whitney_u(one_sided, "x", "g", "A", "B").collect()[0]
        assert r2.n_b == 0 and r2.u is None and r2.significant is None


# ---------------------------------------------------------------------------
# cuped_adjust
# ---------------------------------------------------------------------------


def test_cuped_matches_numpy_and_reduces_variance(spark):
    import numpy as np

    from nifi_hive_schema_generator_bundle_spark.operators.evals import (
        cuped_adjust,
    )

    rng = np.random.RandomState(11)
    x = rng.normal(100, 20, 400)
    y = 2.0 * x + rng.normal(0, 5, 400)  # strongly covariate-predicted
    arm = np.where(np.arange(400) % 2 == 0, "treat", "control")
    y = y + np.where(arm == "treat", 1.5, 0.0)  # small true effect
    df = spark.createDataFrame(
        [(str(a), float(yy), float(xx)) for a, yy, xx in zip(arm, y, x)],
        ["arm", "y", "x"],
    )
    out = {r.arm: r for r in cuped_adjust(df, "y", "x", "arm").collect()}
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    assert out["treat"].theta == pytest.approx(theta, abs=1e-6)
    y_adj = y - theta * (x - x.mean())
    for a in ("treat", "control"):
        m = arm == a
        assert out[a].n == int(m.sum())
        assert out[a].mean_adj == pytest.approx(y_adj[m].mean(), abs=1e-5)
        assert out[a].var_adj == pytest.approx(
            y_adj[m].var(ddof=1), rel=1e-6
        )
        # the point of CUPED: adjusted variance collapses
        assert out[a].var_adj < 0.1 * out[a].var_raw
    # effect estimate preserved (within noise)
    eff = out["treat"].mean_adj - out["control"].mean_adj
    assert eff == pytest.approx(1.5, abs=1.0)


def test_cuped_constant_covariate_is_noop(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.evals import (
        cuped_adjust,
    )

    df = spark.createDataFrame(
        [("a", 1.0, 7.0), ("a", 3.0, 7.0), ("b", 2.0, 7.0), ("b", None, 7.0)],
        ["arm", "y", "x"],
    )
    out = {r.arm: r for r in cuped_adjust(df, "y", "x", "arm").collect()}
    assert out["a"].theta == 0.0
    assert out["a"].mean_adj == out["a"].mean_raw == 2.0
    assert out["b"].n == 1  # NULL metric row dropped


# ---------------------------------------------------------------------------
# isotonic calibration
# ---------------------------------------------------------------------------


def _pav_brute(pairs):
    """Reference weighted PAV over (weight, mean) blocks."""
    blocks = [[w, m] for w, m in pairs]
    i = 0
    changed = True
    while changed:
        changed = False
        out = []
        for w, m in blocks:
            out.append([w, m])
            while len(out) >= 2 and out[-2][1] >= out[-1][1]:
                w2, m2 = out.pop()
                out[-1][1] = (out[-1][0] * out[-1][1] + w2 * m2) / (
                    out[-1][0] + w2
                )
                out[-1][0] += w2
                changed = True
        blocks = out
    return blocks


def test_isotonic_monotone_and_matches_hand_pav(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.evals import (
        isotonic_apply,
        isotonic_fit,
    )

    # scores quantize to bins 1, 3, 5, 7 of a 10-bin grid; bin means
    # 0.8, 0.2, 0.5, 1.0 -> PAV pools (0.8,0.2,0.5) into 0.5
    rows = (
        [(0.15, 1.0)] * 4 + [(0.15, 0.0)] * 1   # bin 1: mean 0.8, w 5
        + [(0.35, 1.0)] * 1 + [(0.35, 0.0)] * 4  # bin 3: mean 0.2, w 5
        + [(0.55, 1.0)] * 5 + [(0.55, 0.0)] * 5  # bin 5: mean 0.5, w 10
        + [(0.75, 1.0)] * 5                      # bin 7: mean 1.0, w 5
    )
    df = spark.createDataFrame(rows, ["score", "label"])
    model = isotonic_fit(df, "score", "label", bins=10)
    v = model["values"]
    assert all(a <= b + 1e-12 for a, b in zip(v, v[1:]))  # monotone
    exp = _pav_brute([(5, 0.8), (5, 0.2), (10, 0.5), (5, 1.0)])
    assert exp[0][1] == pytest.approx(0.5) and exp[1][1] == 1.0
    assert v[1] == pytest.approx(0.5)  # pooled block
    assert v[5] == pytest.approx(0.5)
    assert v[7] == 1.0
    assert v[0] == pytest.approx(0.5)  # left of first obs: first block
    assert v[10] == 1.0  # right tail: last block
    out = {r.score: r.calibrated for r in isotonic_apply(df, "score", model).collect()}
    assert out[0.15] == pytest.approx(0.5) and out[0.75] == 1.0


def test_isotonic_already_monotone_is_identityish(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.evals import (
        isotonic_fit,
    )

    rows = []
    for b, p in [(0.1, 0.1), (0.5, 0.5), (0.9, 0.9)]:
        rows += [(b, 1.0)] * int(p * 10) + [(b, 0.0)] * (10 - int(p * 10))
    df = spark.createDataFrame(rows, ["score", "label"])
    v = isotonic_fit(df, "score", "label", bins=10)["values"]
    assert v[1] == pytest.approx(0.1)
    assert v[5] == pytest.approx(0.5)
    assert v[9] == pytest.approx(0.9)


def test_isotonic_anti_monotone_pools_to_global_mean(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.evals import (
        isotonic_fit,
    )

    rows = [(0.1, 1.0)] * 3 + [(0.9, 0.0)] * 3 + [(0.9, 1.0)] * 0
    df = spark.createDataFrame(rows, ["score", "label"])
    v = isotonic_fit(df, "score", "label", bins=10)["values"]
    assert all(x == pytest.approx(0.5) for x in v)


def test_isotonic_empty_raises(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.evals import (
        isotonic_fit,
    )

    df = spark.createDataFrame([], "score double, label double")
    with pytest.raises(ValueError):
        isotonic_fit(df, "score", "label")
