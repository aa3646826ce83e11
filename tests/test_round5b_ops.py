"""Round-5 wave-3 operators: Kaplan-Meier survival (operators/survival),
Benford forensics (operators/profile.benford_report), market-basket
association rules + RA link prediction (operators/basket), and the
dyadic-EWMA forecast backtest (operators/forecast) — planted-answer
units hand-computing every exact-integer score."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.operators.basket import (
    association_rules,
    basket_pairs,
    ra_link_prediction,
)
from nifi_hive_schema_generator_bundle_spark.operators.forecast import (
    ewma_backtest,
)
from nifi_hive_schema_generator_bundle_spark.operators.profile import (
    BENFORD_PPM,
    benford_report,
)
from nifi_hive_schema_generator_bundle_spark.operators.survival import (
    SCALE,
    kaplan_meier,
    life_table,
    subject_durations,
)

# --------------------------------------------------------- survival


def _subjects(spark, rows):
    return spark.createDataFrame(rows, "duration int, observed int")


def test_life_table_at_risk_counts(spark):
    """4 subjects: events at t=1 (x2) and t=3, censored at t=2 —
    n_risk must count everyone with duration >= t."""
    subj = _subjects(spark, [(1, 1), (1, 1), (2, 0), (3, 1)])
    rows = {r["t_day"]: r for r in life_table(subj).collect()}
    assert rows[1]["n_risk"] == 4 and rows[1]["d"] == 2
    assert rows[2]["n_risk"] == 2 and rows[2]["d"] == 0
    assert rows[3]["n_risk"] == 1 and rows[3]["d"] == 1


def test_kaplan_meier_integer_recurrence(spark):
    """Hand-computed K-M: S(1) = 4->2/4, S(3) = that * 0/1 = 0; the
    censored subject at t=2 reduces risk but not survival. Hazard is
    the independent per-term quantization."""
    subj = _subjects(spark, [(1, 1), (1, 1), (2, 0), (3, 1)])
    out = {r["t_day"]: r for r in kaplan_meier(subj).collect()}
    assert set(out) == {1, 3}  # only event times
    s1 = SCALE * 2 // 4
    assert out[1]["survival_q"] == s1
    assert out[3]["survival_q"] == s1 * 0 // 1 == 0
    assert out[1]["hazard_q"] == 2 * SCALE // 4
    assert out[3]["hazard_q"] == 2 * SCALE // 4 + 1 * SCALE // 1


def test_subject_durations_censoring(spark):
    """Two orders for u1 (gap 3d, first observed, second censored at the
    horizon set by u2's late order), one order for u2 (censored, 0d)."""
    df = spark.createDataFrame(
        [
            (1, "2024-01-01", 10),
            (1, "2024-01-04", 11),
            (2, "2024-01-09", 12),
        ],
        "k long, d string, tb long",
    ).select("k", F.to_timestamp("d").alias("d"), "tb")
    subj = subject_durations(df, key="k", date_col="d", tiebreak="tb")
    got = sorted((r["duration"], r["observed"]) for r in subj.collect())
    assert got == [(0, 0), (3, 1), (5, 0)]


# ---------------------------------------------------------- benford


def test_benford_digits_and_ppm(spark):
    """Planted column: digits 1,1,2 (values 19.5, 150, 2.0) — 0.x and
    negative rows excluded; ppm exact-integer floor."""
    df = spark.createDataFrame(
        [(19.5,), (150.0,), (2.0,), (0.4,), (-7.0,)], "v double"
    )
    out = {r["digit"]: r for r in benford_report(df, "v").collect()}
    assert len(out) == 9
    assert out[1]["n_obs"] == 2 and out[2]["n_obs"] == 1
    assert out[3]["n_obs"] == 0
    assert out[1]["obs_ppm"] == 2 * 10**6 // 3
    assert out[1]["dev_ppm"] == 2 * 10**6 // 3 - BENFORD_PPM[1]
    assert out[9]["expected_ppm"] == 45757


# ----------------------------------------------------------- basket


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "b long, i long")


def test_association_rules_scores(spark):
    """3 baskets: {1,2}, {1,2,3}, {1,3}. Pair (1,2): co=2, c1=3, c2=2,
    N=3 -> conf 2/3 & 2/2, lift 2*3/(3*2)=1.0 (ppm floors)."""
    items = _baskets(
        spark, [(10, 1), (10, 2), (11, 1), (11, 2), (11, 3), (12, 1), (12, 3)]
    )
    out = {
        (r["item_a"], r["item_b"]): r
        for r in association_rules(items, "b", "i", min_support=2).collect()
    }
    r12 = out[(1, 2)]
    assert r12["support_n"] == 2
    assert r12["conf_ab_ppm"] == 2 * 10**6 // 3
    assert r12["conf_ba_ppm"] == 10**6
    assert r12["lift_ppm"] == 2 * 3 * 10**6 // (3 * 2)
    assert (1, 3) in out and (2, 3) not in out  # co(2,3)=1 < min_support


def test_basket_pairs_max_basket_guard(spark):
    """A degenerate 50-item basket is dropped by max_basket=10; the
    small basket's pair survives."""
    rows = [(99, i) for i in range(50)] + [(1, 1), (1, 2)]
    pairs = basket_pairs(_baskets(spark, rows), "b", "i", max_basket=10)
    got = [(r["item_a"], r["item_b"]) for r in pairs.collect()]
    assert got == [(1, 2)]


def test_ra_link_prediction_path_graph(spark):
    """Path A-B-C-D: open wedge pairs (A,C),(B,D) via degree-2 centers
    (term 10^9//2) and (A,D) has no common neighbor. Existing edges are
    excluded."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    out = {
        (r["item_a"], r["item_b"]): r
        for r in ra_link_prediction(edges).collect()
    }
    assert set(out) == {(1, 3), (2, 4)}
    assert out[(1, 3)]["common_neighbors"] == 1
    assert out[(1, 3)]["ra_q"] == 10**9 // 2


def test_ra_link_prediction_hub_cap(spark):
    """With max_degree=1 every wedge center is excluded — no candidates."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    assert ra_link_prediction(edges, max_degree=1).count() == 0


# --------------------------------------------------------- forecast


def test_ewma_backtest_constant_series_zero_mae(spark):
    """A constant daily count forecasts itself exactly: mae_ppm = 0,
    and the first `window` days produce no forecast."""
    rows = [
        ("g", f"2024-01-{d:02d} 00:00:00") for d in range(1, 13) for _ in range(5)
    ]
    df = spark.createDataFrame(rows, "g string, ts string").select(
        "g", F.to_timestamp("ts").alias("ts")
    )
    out = ewma_backtest(df, "g", "ts", window=8).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 12 and r["n_forecasts"] == 4 and r["mae_ppm"] == 0


def test_ewma_backtest_hand_computed_error(spark):
    """window=2 (weights 2,1 / den 3): days with counts 1,2,3,4 ->
    forecasts for day3 num=2*2+1*1=5 err=|9-5|=4; day4 num=2*3+2=8
    err=|12-8|=4; mae_ppm = 1e6*8 // (3*2)."""
    rows = (
        [("g", "2024-01-01 00:00:00")]
        + [("g", "2024-01-02 00:00:00")] * 2
        + [("g", "2024-01-03 00:00:00")] * 3
        + [("g", "2024-01-04 00:00:00")] * 4
    )
    df = spark.createDataFrame(rows, "g string, ts string").select(
        "g", F.to_timestamp("ts").alias("ts")
    )
    r = ewma_backtest(df, "g", "ts", window=2).collect()[0]
    assert r["n_forecasts"] == 2
    assert r["mae_ppm"] == 10**6 * 8 // (3 * 2)


# ------------------------------------------------- robust statistics

from nifi_hive_schema_generator_bundle_spark.operators.robust import (  # noqa: E402
    SLOPE_SCALE,
    mad_outlier_report,
    theil_sen_trend,
)


def _daily_events(spark, counts, g="g", start=1):
    """One event row per unit of count on consecutive January days."""
    rows = [
        (g, f"2024-01-{start + i:02d} 00:00:00")
        for i, c in enumerate(counts)
        for _ in range(c)
    ]
    return spark.createDataFrame(rows, "g string, ts string").select(
        "g", F.to_timestamp("ts").alias("ts")
    )


def test_theil_sen_exact_linear_series(spark):
    """Counts 2,4,6,8 on consecutive days: every pairwise slope is
    exactly 2/day -> median 2 * 10^6."""
    out = theil_sen_trend(_daily_events(spark, [2, 4, 6, 8]), "g", "ts").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 4 and r["n_pairs"] == 6
    assert r["slope_med_q"] == 2 * SLOPE_SCALE


def test_theil_sen_outlier_resistant_and_negative(spark):
    """Declining series 9,8,7,6 with one wild spike day (100): the
    median slope stays negative — OLS would be dragged positive."""
    out = theil_sen_trend(
        _daily_events(spark, [9, 8, 7, 100, 6]), "g", "ts"
    ).collect()[0]
    assert out["slope_med_q"] < 0


def test_mad_outlier_report_flags_spike(spark):
    """Counts 5,5,5,5,50: med=5, mad=0, the spike day (dev 45 > 0)
    flags; the equal days don't."""
    r = mad_outlier_report(
        _daily_events(spark, [5, 5, 5, 5, 50]), "g", "ts"
    ).collect()[0]
    assert r["med_cnt"] == 5 and r["mad_cnt"] == 0
    assert r["n_outliers"] == 1 and r["n_days"] == 5


# ------------------------------------------- point-in-time features

from nifi_hive_schema_generator_bundle_spark.operators.features import (  # noqa: E402
    churn_feature_snapshot,
)


def test_churn_snapshot_no_leakage(spark):
    """Horizon 2024-01-20, cutoff 13th. u1: 2 pre events (types a,b)
    + 1 post -> label 1, days_since_last = 13-10 = 3. u2: pre only ->
    label 0. u3: post only -> EXCLUDED (no pre history)."""
    rows = [
        (1, "2024-01-05 00:00:00", "a"),
        (1, "2024-01-10 00:00:00", "b"),
        (1, "2024-01-14 00:00:00", "a"),
        (2, "2024-01-06 00:00:00", "a"),
        (3, "2024-01-20 00:00:00", "a"),
    ]
    df = spark.createDataFrame(rows, "u long, ts string, et string").select(
        "u", F.to_timestamp("ts").alias("ts"), "et"
    )
    out = {
        r["user_key"]: r
        for r in churn_feature_snapshot(
            df, "u", "ts", label_days=7, type_col="et"
        ).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_events"] == 2 and out[1]["n_types"] == 2
    assert out[1]["days_since_last"] == 3 and out[1]["label_active"] == 1
    assert out[2]["label_active"] == 0 and out[2]["n_active_days"] == 1


# --------------------------------------------------------------- DiD

from nifi_hive_schema_generator_bundle_spark.operators.evals import (  # noqa: E402
    did_readout,
)


def test_did_recovers_planted_effect(spark):
    """Baselines: treat 10, ctrl 4; common time trend +3; planted
    treatment effect +7 on treat-post -> DiD must be exactly 7e6 ppm
    with the baseline gap and the trend netted out."""
    rows = []
    for t in (True, False):
        for p in (True, False):
            base = (10 if t else 4) + (3 if p else 0) + (7 if t and p else 0)
            rows += [(t, p, base * 10**6)] * 5
    df = spark.createDataFrame(rows, "t boolean, p boolean, y long")
    r = did_readout(df, "t", "p", "y").collect()[0]
    assert r["did_ppm"] == 7 * 10**6
    assert r["n_treat_post"] == 5
    assert r["mean_ctrl_pre_ppm"] == 4 * 10**6


# ------------------------------------------------- privacy / ladder

from nifi_hive_schema_generator_bundle_spark.operators.quality_checks import (  # noqa: E402
    k_anonymize_ladder,
)


def test_k_anonymize_ladder_picks_minimal_width(spark):
    """Group g: values 0..7 (k=4): width 1/2 leave classes of 1/2;
    width 4 gives bands {0,1} x4 each -> j_star=2. Monotone ladder."""
    df = spark.createDataFrame([("g", float(v)) for v in range(8)], "g string, v double")
    r = k_anonymize_ladder(df, ["g"], "v", k=4, max_j=8).collect()
    assert len(r) == 1
    assert r[0]["j_star"] == 2 and r[0]["width"] == 4
    assert r[0]["n_classes"] == 2 and r[0]["min_class_size"] == 4


def test_k_anonymize_ladder_infeasible_returns_empty(spark):
    """A 3-row group can never reach k=5 by value generalization."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 1.0)], "g string, v double"
    )
    assert k_anonymize_ladder(df, ["g"], "v", k=5, max_j=10).count() == 0


# --------------------------------------------------------- isotropy

from nifi_hive_schema_generator_bundle_spark.operators.pca import (  # noqa: E402
    ISO_SCALE,
    isotropy_report,
)


def test_isotropy_collapsed_space_is_1e9(spark):
    """All vectors identical: ||mean||^2 == mean(||v||^2) -> ppb 1e9
    (up to quantization floor)."""
    df = spark.createDataFrame([([0.5, 0.5],)] * 4, "embedding array<float>")
    r = isotropy_report(df, "embedding").collect()[0]
    assert r["n_vectors"] == 4 and r["dim"] == 2
    assert abs(r["isotropy_ppb"] - 10**9) <= 10  # quantization slack
    assert r["mean_sq_norm_q"] == 2 * int(0.25 * ISO_SCALE)


def test_isotropy_symmetric_space_is_0(spark):
    """+v and -v in equal measure: mean vector is 0 -> isotropy 0."""
    df = spark.createDataFrame(
        [([1.0, 0.0],), ([-1.0, 0.0],), ([0.0, 1.0],), ([0.0, -1.0],)],
        "embedding array<float>",
    )
    r = isotropy_report(df, "embedding").collect()[0]
    assert r["isotropy_ppb"] == 0
    assert r["mean_sq_norm_q"] == ISO_SCALE  # unit vectors


# ------------------------------------------------------ session paths

from nifi_hive_schema_generator_bundle_spark.operators.funnel import (  # noqa: E402
    session_paths,
)


def test_session_paths_split_and_truncate(spark):
    """u1: a,b,c,d within one session -> path a>b>c (depth 3). A 40-min
    gap then e -> second session path 'e'. u2: a,b -> 'a>b'."""
    rows = [
        (1, "2024-01-01 10:00:00", "a", 1),
        (1, "2024-01-01 10:01:00", "b", 2),
        (1, "2024-01-01 10:02:00", "c", 3),
        (1, "2024-01-01 10:03:00", "d", 4),
        (1, "2024-01-01 10:45:00", "e", 5),
        (2, "2024-01-01 09:00:00", "a", 6),
        (2, "2024-01-01 09:10:00", "b", 7),
    ]
    df = spark.createDataFrame(
        rows, "u long, ts string, et string, eid long"
    ).select("u", F.to_timestamp("ts").alias("ts"), "et", "eid")
    out = {
        r["path"]: r["n_sessions"]
        for r in session_paths(
            df, "u", "ts", "et", "eid", gap_seconds=1800, depth=3
        ).collect()
    }
    assert out == {"a>b>c": 1, "e": 1, "a>b": 1}


# ------------------------------------------------------------ ROC-AUC

from nifi_hive_schema_generator_bundle_spark.operators.evals import (  # noqa: E402
    roc_auc,
)


def test_roc_auc_perfect_and_random(spark):
    """Scores 1..4 with labels on the top half: perfect separation ->
    AUC 1e6; inverted labels -> 0."""
    df = spark.createDataFrame(
        [(1.0, False, 1), (2.0, False, 2), (3.0, True, 3), (4.0, True, 4)],
        "s double, y boolean, tb long",
    )
    r = roc_auc(df, "s", "y", "tb").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc_ppm"]) == (2, 2, 10**6)
    inv = df.select("s", (~F.col("y")).alias("y"), "tb")
    assert roc_auc(inv, "s", "y", "tb").collect()[0]["auc_ppm"] == 0


def test_roc_auc_ties_get_average_rank(spark):
    """All scores equal: AUC must be exactly 1/2 regardless of labels
    (textbook tie handling — naive row_number ranks would bias it)."""
    df = spark.createDataFrame(
        [(5.0, i % 2 == 0, i) for i in range(6)], "s double, y boolean, tb long"
    )
    r = roc_auc(df, "s", "y", "tb").collect()[0]
    assert r["auc_ppm"] == 500000


# ----------------------------------------------------------- log-rank

from nifi_hive_schema_generator_bundle_spark.operators.survival import (  # noqa: E402
    log_rank,
)


def _grp_subjects(spark, rows):
    return spark.createDataFrame(rows, "duration int, observed int, grp int")


def test_log_rank_identical_groups_zero_statistic(spark):
    """Mirror-image groups: O1 == E1 at every event time -> x2 = 0."""
    rows = [(t, 1, g) for t in (1, 2, 3) for g in (0, 1)]
    r = log_rank(_grp_subjects(spark, rows), "grp").collect()[0]
    assert r["o1"] * 10**6 == r["e1_q"]
    assert r["logrank_x2_ppm"] == 0
    assert r["n_event_times"] == 3


def test_log_rank_hand_computed(spark):
    """2 subjects: g1 dies at t=1 (n=2, n1=1), g0 dies at t=2 (n=1,
    n1=0). E1 = 1/2 + 0; V = 1*1*1*0/(2*2*1)=0 at t=1 (n-d=1... d=1,
    n=2: V = d*n1*(n-n1)*(n-d)/(n^2(n-1)) = 1*1*1*1/4 = 250000 ppm);
    t=2: n=1 -> no variance term. x2 = (1e6 - 5e5)^2 // 250000."""
    rows = [(1, 1, 1), (2, 1, 0)]
    r = log_rank(_grp_subjects(spark, rows), "grp").collect()[0]
    assert r["o1"] == 1
    assert r["e1_q"] == 500000
    assert r["v_q"] == 250000
    assert r["logrank_x2_ppm"] == (10**6 - 500000) ** 2 // 250000


def test_log_rank_degenerate_single_group_null(spark):
    """Everyone in group 1: n1 == n at every time -> V = 0 -> NULL
    statistic, no division by zero."""
    rows = [(1, 1, 1), (2, 1, 1)]
    r = log_rank(_grp_subjects(spark, rows), "grp").collect()[0]
    assert r["v_q"] == 0 and r["logrank_x2_ppm"] is None
