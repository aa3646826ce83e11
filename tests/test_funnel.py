"""Unit tests: ordered funnel matching."""

from __future__ import annotations

import datetime as dt

import pytest

from nifi_hive_schema_generator_bundle_spark.operators.funnel import (
    funnel_counts,
    funnel_steps,
)


def _ev(spark, rows):
    base = dt.datetime(2026, 1, 1)
    data = [
        (u, t, base + dt.timedelta(minutes=m)) for (u, t, m) in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, event_type string, ts timestamp"
    )


def test_order_is_enforced(spark):
    # user 1: proper order; user 2: purchase BEFORE view+click — no conversion
    ev = _ev(
        spark,
        [
            (1, "view", 0), (1, "click", 5), (1, "purchase", 9),
            (2, "purchase", 0), (2, "view", 5), (2, "click", 9),
        ],
    )
    got = {
        r["user_id"]: r["step_reached"]
        for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {1: 3, 2: 2}  # user 2 stalls at click (no later purchase)


def test_counts_monotone_and_named(spark):
    ev = _ev(
        spark,
        [
            (1, "view", 0), (1, "click", 1), (1, "purchase", 2),
            (2, "view", 0), (2, "click", 1),
            (3, "view", 0),
            (4, "click", 0),  # never viewed: not in the funnel at all
        ],
    )
    rows = funnel_counts(ev, ["view", "click", "purchase"]).collect()
    assert [(r["step"], r["step_name"], r["n_users"]) for r in rows] == [
        (1, "view", 3),
        (2, "click", 2),
        (3, "purchase", 1),
    ]


def test_strictly_after_semantics(spark):
    # click at the SAME timestamp as view does not advance (strict >)
    ev = _ev(spark, [(1, "view", 0), (1, "click", 0)])
    got = funnel_steps(ev, ["view", "click"]).collect()[0]
    assert got["step_reached"] == 1


def test_greedy_prefix_finds_any_valid_matching(spark):
    # early click is unusable; the later one after view must match
    ev = _ev(spark, [(1, "click", 0), (1, "view", 1), (1, "click", 2)])
    got = funnel_steps(ev, ["view", "click"]).collect()[0]
    assert got["step_reached"] == 2


def test_rejects_empty_steps(spark):
    ev = _ev(spark, [(1, "view", 0)])
    with pytest.raises(ValueError):
        funnel_steps(ev, [])


def test_time_decay_recent_outweighs_old(spark):
    import datetime as _dt

    from nifi_hive_schema_generator_bundle_spark.functions.timeseries import (
        time_decay_sum,
    )

    base = _dt.datetime(2026, 1, 1)
    rows = [
        # user 1: 100 units today; user 2: 100 units 10 half-lives ago
        (1, 100.0, base),
        (2, 100.0, base - _dt.timedelta(days=70)),
        (9, 0.0, base),  # pins the reference date for both
    ]
    df = spark.createDataFrame(rows, "user_id long, value double, ts timestamp")
    got = {
        r["user_id"]: r["decayed_value"]
        for r in time_decay_sum(df, ["user_id"], half_life_days=7).collect()
    }
    assert got[1] == 100.0
    # floor-quantized to 4 decimals by design (engine-exact output)
    assert got[2] == int(100.0 * 0.5**10 * 10000) / 10000
    import pytest as _pytest

    with _pytest.raises(ValueError):
        time_decay_sum(df, ["user_id"], half_life_days=0)


def test_cohort_retention_shape(spark, sf_correct_dir):
    from nifi_hive_schema_generator_bundle_spark.plans.queries import QUERIES

    rows = QUERIES["events_cohort_retention"](spark, sf_correct_dir).collect()
    assert rows, "retention matrix must be non-empty"
    # every cohort has a week-0 row, offsets are non-negative, and no
    # later week exceeds its cohort's week-0 population
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r["n_users"]
    for cohort, weeks in by_cohort.items():
        assert 0 in weeks, f"cohort {cohort} missing week-0"
        assert all(off >= 0 for off in weeks)
        assert all(n <= weeks[0] for n in weeks.values())


class TestPositionAttribution:
    def _ev(self, spark, rows):
        base = dt.datetime(2026, 1, 1)
        data = [
            (u, t, base + dt.timedelta(minutes=m), float(v))
            for (u, t, m, v) in rows
        ]
        return spark.createDataFrame(
            data, "user_id long, event_type string, ts timestamp, value double"
        )

    def _run(self, spark, rows, **kw):
        from nifi_hive_schema_generator_bundle_spark.operators.funnel import (
            position_attribution,
        )

        out = position_attribution(self._ev(spark, rows), **kw).collect()
        return {r["channel"]: (r["n_touches"], r["credited_value"]) for r in out}

    def test_u_shape_weights(self, spark):
        # 4 touches before one 100.0 purchase: 0.4 / 0.1 / 0.1 / 0.4
        rows = [
            (1, "view", 0, 0),
            (1, "click", 1, 0),
            (1, "click", 2, 0),
            (1, "signup", 3, 0),
            (1, "purchase", 4, 100.0),
        ]
        got = self._run(spark, rows)
        assert got["view"] == (1, 40.0)
        assert got["click"] == (2, 20.0)
        assert got["signup"] == (1, 40.0)

    def test_single_and_pair_journeys(self, spark):
        rows = [
            (1, "view", 0, 0), (1, "purchase", 1, 50.0),   # single -> 1.0
            (2, "view", 0, 0), (2, "click", 1, 0),
            (2, "purchase", 2, 80.0),                       # pair -> 0.5/0.5
        ]
        got = self._run(spark, rows)
        assert got["view"] == (2, 50.0 + 40.0)
        assert got["click"] == (1, 40.0)

    def test_touches_after_last_purchase_dropped(self, spark):
        rows = [
            (1, "view", 0, 0), (1, "purchase", 1, 10.0),
            (1, "click", 2, 0),  # orphan: no later purchase
        ]
        got = self._run(spark, rows)
        assert got == {"view": (1, 10.0)}

    def test_journeys_split_at_each_purchase(self, spark):
        rows = [
            (1, "view", 0, 0), (1, "purchase", 1, 10.0),
            (1, "click", 2, 0), (1, "purchase", 3, 30.0),
        ]
        got = self._run(spark, rows)
        assert got == {"view": (1, 10.0), "click": (1, 30.0)}

    def test_touch_type_filter_and_validation(self, spark):
        rows = [
            (1, "view", 0, 0), (1, "error", 1, 0),
            (1, "purchase", 2, 100.0),
        ]
        got = self._run(spark, rows, touch_types=["view"])
        assert got == {"view": (1, 100.0)}
        with pytest.raises(ValueError):
            self._run(spark, rows, touch_types=[])

    def test_same_instant_touch_sees_purchase(self, spark):
        # RANGE frame: a touch at the purchase's exact timestamp joins
        # that journey instead of silently dropping
        rows = [(1, "view", 5, 0), (1, "purchase", 5, 60.0)]
        got = self._run(spark, rows)
        assert got == {"view": (1, 60.0)}


# ---------------------------------------------------------------------------
# transition_matrix
# ---------------------------------------------------------------------------


def _seq_events(spark):
    rows = [
        # user 1: A -> B -> A
        (1, 1, 10, "A"), (2, 1, 20, "B"), (3, 1, 30, "A"),
        # user 2: A -> A
        (4, 2, 10, "A"), (5, 2, 20, "A"),
        # user 3: single event, only a terminal transition
        (6, 3, 10, "B"),
    ]
    return spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type"]
    )


def test_transition_matrix_counts_and_rows_sum_to_one(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.funnel import (
        transition_matrix,
    )

    out = transition_matrix(
        _seq_events(spark), "user_id", ["ts", "event_id"], "event_type",
        terminal="END",
    ).collect()
    got = {(r.from_state, r.to_state): (r.n_transitions, r.p) for r in out}
    # A: A->B (u1), A->A (u1? no: u1 A@10->B, B->A, A@30->END; u2 A->A, A->END)
    assert got[("A", "B")][0] == 1
    assert got[("A", "A")][0] == 1
    assert got[("A", "END")][0] == 2
    assert got[("B", "A")][0] == 1
    assert got[("B", "END")][0] == 1
    # row-normalization: each from_state's p sums to 1
    sums: dict = {}
    for (f, _t), (_n, p) in got.items():
        sums[f] = round(sums.get(f, 0.0) + p, 6)
    assert set(sums.values()) == {1.0}
    assert got[("A", "END")][1] == 0.5


def test_transition_matrix_without_terminal_drops_ends(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.funnel import (
        transition_matrix,
    )

    out = transition_matrix(
        _seq_events(spark), "user_id", ["ts", "event_id"], "event_type"
    ).collect()
    got = {(r.from_state, r.to_state) for r in out}
    assert got == {("A", "B"), ("B", "A"), ("A", "A")}


def test_transition_matrix_tiebreak_is_deterministic(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.funnel import (
        transition_matrix,
    )

    # two events at the SAME ts: event_id tiebreak orders 7 before 8
    df = spark.createDataFrame(
        [(7, 1, 10, "X"), (8, 1, 10, "Y")],
        ["event_id", "user_id", "ts", "event_type"],
    )
    out = transition_matrix(
        df, "user_id", ["ts", "event_id"], "event_type", terminal="END"
    ).collect()
    got = {(r.from_state, r.to_state) for r in out}
    assert got == {("X", "Y"), ("Y", "END")}
