"""Property / differential tests for the round-5b analytics waves:
Spark results vs brute-force pure-Python models on hypothesis-generated
inputs (small example counts — each example runs Spark jobs)."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.functions.partitioning import (
    distributed_rank,
)
from nifi_hive_schema_generator_bundle_spark.operators.basket import (
    association_rules,
)
from nifi_hive_schema_generator_bundle_spark.operators.evals import (
    did_readout,
)
from nifi_hive_schema_generator_bundle_spark.operators.profile import (
    BENFORD_PPM,
    benford_report,
)
from nifi_hive_schema_generator_bundle_spark.operators.robust import (
    SLOPE_SCALE,
    theil_sen_trend,
)
from nifi_hive_schema_generator_bundle_spark.operators.survival import (
    SCALE,
    kaplan_meier,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# kaplan_meier ≡ the sequential integer recurrence over the brute life table
# ---------------------------------------------------------------------------

@given(
    subjects=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 1)),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_kaplan_meier_matches_brute_force(spark, subjects):
    df = spark.createDataFrame(subjects, "duration int, observed int")
    got = {
        r["t_day"]: (r["n_risk"], r["d"], r["survival_q"], r["hazard_q"])
        for r in kaplan_meier(df).collect()
    }
    # brute force
    want = {}
    s, h = SCALE, 0
    for t in sorted({d for d, _ in subjects}):
        n = sum(1 for d, _ in subjects if d >= t)
        dd = sum(1 for d, o in subjects if d == t and o == 1)
        if dd == 0:
            continue
        s = s * (n - dd) // n
        h += dd * SCALE // n
        want[t] = (n, dd, s, h)
    assert got == want
    # survival is monotone non-increasing over event times
    surv = [got[t][2] for t in sorted(got)]
    assert all(a >= b for a, b in zip(surv, surv[1:]))


# ---------------------------------------------------------------------------
# benford_report: digit counts ≡ Counter over string heads; ppm identity
# ---------------------------------------------------------------------------

@given(
    values=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e9,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_benford_matches_string_head_counter(spark, values):
    import math

    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    eligible = [int(math.floor(v)) for v in values if math.floor(v) >= 1]
    want = Counter(int(str(x)[0]) for x in eligible)
    rows = benford_report(df, "v").collect()
    if not eligible:
        # total = 0: every count must be 0 (report still has 9 rows)
        assert all(r["n_obs"] == 0 for r in rows)
        return
    got = {r["digit"]: r for r in rows}
    assert {d: r["n_obs"] for d, r in got.items() if r["n_obs"]} == dict(want)
    for d, r in got.items():
        assert r["obs_ppm"] == r["n_obs"] * 10**6 // len(eligible)
        assert r["dev_ppm"] == r["obs_ppm"] - BENFORD_PPM[d]


# ---------------------------------------------------------------------------
# association_rules ≡ brute-force pair counting + integer score formulas
# ---------------------------------------------------------------------------

@given(
    items=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 6)),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_association_rules_match_brute_force(spark, items):
    df = spark.createDataFrame(items, "b long, i long")
    got = {
        (r["item_a"], r["item_b"]): (
            r["support_n"], r["conf_ab_ppm"], r["conf_ba_ppm"], r["lift_ppm"]
        )
        for r in association_rules(
            df, "b", "i", min_support=1, top_k=1000
        ).collect()
    }
    baskets = {}
    for b, i in items:
        baskets.setdefault(b, set()).add(i)
    n_b = len(baskets)
    cnt = Counter(i for s in baskets.values() for i in s)
    co = Counter()
    for s in baskets.values():
        for a, b in combinations(sorted(s), 2):
            co[(a, b)] += 1
    want = {
        p: (
            c,
            c * 10**6 // cnt[p[0]],
            c * 10**6 // cnt[p[1]],
            c * n_b * 10**6 // (cnt[p[0]] * cnt[p[1]]),
        )
        for p, c in co.items()
    }
    assert got == want


# ---------------------------------------------------------------------------
# theil_sen: shift invariance (adding k events/day shifts counts, not slope
# ordering) and exact brute-force median on the quantized slopes
# ---------------------------------------------------------------------------

@given(
    counts=st.lists(st.integers(1, 6), min_size=2, max_size=8),
)
@settings(**_SETTINGS)
def test_theil_sen_matches_brute_force(spark, counts):
    rows = [
        ("g", f"2024-01-{d + 1:02d} 00:00:00")
        for d, c in enumerate(counts)
        for _ in range(c)
    ]
    df = spark.createDataFrame(rows, "g string, ts string").select(
        "g", F.to_timestamp("ts").alias("ts")
    )
    r = theil_sen_trend(df, "g", "ts").collect()[0]
    slopes = sorted(
        _trunc_div((counts[j] - counts[i]) * SLOPE_SCALE, j - i)
        for i in range(len(counts))
        for j in range(i + 1, len(counts))
    )
    assert r["n_pairs"] == len(slopes)
    assert r["slope_med_q"] == slopes[(len(slopes) + 1) // 2 - 1]


def _trunc_div(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


# ---------------------------------------------------------------------------
# did_readout ≡ the four cell means; exact on noise-free planted designs
# ---------------------------------------------------------------------------

@given(
    base_t=st.integers(0, 20),
    base_c=st.integers(0, 20),
    trend=st.integers(-5, 10),
    effect=st.integers(-10, 10),
    n=st.integers(1, 6),
)
@settings(**_SETTINGS)
def test_did_identity_on_planted_design(spark, base_t, base_c, trend, effect, n):
    rows = []
    for t in (True, False):
        for p in (True, False):
            y = (base_t if t else base_c) + (trend if p else 0) + (
                effect if t and p else 0
            )
            rows += [(t, p, y * 10**6)] * n
    df = spark.createDataFrame(rows, "t boolean, p boolean, y long")
    r = did_readout(df, "t", "p", "y").collect()[0]
    assert r["did_ppm"] == effect * 10**6


# ---------------------------------------------------------------------------
# distributed_rank ≡ global row_number for any data / partition interplay
# ---------------------------------------------------------------------------

@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=40),
)
@settings(**_SETTINGS)
def test_distributed_rank_matches_sorted_order(spark, vals):
    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "v int, idx int"
    )
    got = {
        r["idx"]: r["rnk"]
        for r in distributed_rank(
            df, [F.col("v").asc(), F.col("idx").asc()], "rnk"
        ).collect()
    }
    want = {
        idx: pos + 1
        for pos, (v, idx) in enumerate(
            sorted((v, i) for i, v in enumerate(vals))
        )
    }
    assert got == want


# ---------------------------------------------------------------------------
# roc_auc ≡ pairwise-comparison probability (the probabilistic definition)
# ---------------------------------------------------------------------------

from nifi_hive_schema_generator_bundle_spark.operators.evals import (  # noqa: E402
    roc_auc,
)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.booleans()),
        min_size=2,
        max_size=25,
    ).filter(
        lambda r: any(y for _, y in r) and any(not y for _, y in r)
    ),
)
@settings(**_SETTINGS)
def test_roc_auc_matches_pairwise_definition(spark, rows):
    df = spark.createDataFrame(
        [(float(s), y, i) for i, (s, y) in enumerate(rows)],
        "s double, y boolean, tb long",
    )
    got = roc_auc(df, "s", "y", "tb").collect()[0]
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    # AUC = P(pos > neg) + P(tie)/2, as an exact rational in halves
    num2 = sum(
        2 if p > n else (1 if p == n else 0) for p in pos for n in neg
    )
    assert got["auc_ppm"] == num2 * 10**6 // (2 * len(pos) * len(neg))


# ---------------------------------------------------------------------------
# k_anonymize_ladder: result is the MINIMAL feasible rung of a monotone ladder
# ---------------------------------------------------------------------------

from nifi_hive_schema_generator_bundle_spark.operators.quality_checks import (  # noqa: E402
    k_anonymize_ladder,
)


@given(
    vals=st.lists(st.integers(0, 30), min_size=1, max_size=25),
    k=st.integers(1, 5),
)
@settings(**_SETTINGS)
def test_k_anonymize_ladder_minimality(spark, vals, k):
    df = spark.createDataFrame([("g", float(v)) for v in vals], "g string, v double")
    rows = k_anonymize_ladder(df, ["g"], "v", k=k, max_j=8).collect()

    def min_class(j):
        c = Counter(v // (1 << j) for v in vals)
        return min(c.values())

    feasible = [j for j in range(9) if min_class(j) >= k]
    if not feasible:
        assert rows == []
        return
    assert len(rows) == 1 and rows[0]["j_star"] == feasible[0]
    # monotone: every rung above j_star is feasible too
    assert all(min_class(j) >= k for j in range(feasible[0], 9))
