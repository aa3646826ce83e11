"""Unit tests for the round-4b operators: linear classifier scoring,
SCD2 history, keep-best near-dedup, per-group caps, rolling distinct
counts, n-gram novelty."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))


# ---------------------------------------------------------------------------
# linear_text_score
# ---------------------------------------------------------------------------

def test_linear_score_hand_computed(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.classify import (
        linear_text_score,
    )

    df = spark.createDataFrame(
        [(1, "spark spark slow"), (2, ""), (3, "unknown words here")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in linear_text_score(
            df, {"spark": 1.0, "slow": -1.0}, bias=0.0
        ).collect()
    }
    assert out[1]["n_tokens"] == 3
    assert float(out[1]["weight_sum"]) == 1.0
    assert out[1]["quality_prob"] == round(sigmoid(1.0 / 3.0), 6)
    # no tokens → sigmoid(bias)
    assert out[2]["n_tokens"] == 0
    assert out[2]["quality_prob"] == 0.5
    # all-unknown tokens weigh zero
    assert float(out[3]["weight_sum"]) == 0.0
    assert out[3]["quality_prob"] == 0.5


def test_linear_score_bias_shifts(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.classify import (
        linear_text_score,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    out = linear_text_score(df, {}, bias=-2.0).collect()[0]
    assert out["quality_prob"] == round(sigmoid(-2.0), 6)


def test_linear_score_map_join_equivalent(spark, sf_smoke_dir):
    from nifi_hive_schema_generator_bundle_spark.operators.classify import (
        linear_text_score,
    )

    docs = spark.read.parquet(f"{sf_smoke_dir}/documents.parquet")
    weights = {"the": -0.25, "spark": 1.5, "fast": 1.0, "slow": -1.0}
    cols = ["doc_id", "n_tokens", "weight_sum", "quality_prob"]
    a = sorted(
        linear_text_score(docs, weights, bias=0.25, how="map")
        .select(*cols)
        .collect()
    )
    b = sorted(
        linear_text_score(docs, weights, bias=0.25, how="join")
        .select(*cols)
        .collect()
    )
    assert a == b


def test_linear_score_rejects_bad_strategy(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.classify import (
        linear_text_score,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    try:
        linear_text_score(df, {}, how="magic")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# scd2_build
# ---------------------------------------------------------------------------

def _ts(day: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, day)


def test_scd2_collapses_runs_and_chains_validity(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.cdc import scd2_build

    feed = spark.createDataFrame(
        [
            ("u1", "x", _ts(1), 1),
            ("u1", "x", _ts(2), 2),   # same state → collapsed
            ("u1", "y", _ts(3), 3),
            ("u1", "x", _ts(4), 4),   # state can recur → new version
            ("u2", "z", _ts(1), 5),
        ],
        "k string, attr string, ts timestamp, id long",
    )
    hist = scd2_build(feed, "k", ["attr"], "ts", tiebreak_col="id")
    rows = sorted(
        hist.collect(), key=lambda r: (r["k"], r["valid_from"])
    )
    u1 = [r for r in rows if r["k"] == "u1"]
    assert [(r["attr"], r["valid_from"], r["valid_to"]) for r in u1] == [
        ("x", _ts(1), _ts(3)),
        ("y", _ts(3), _ts(4)),
        ("x", _ts(4), None),
    ]
    assert [r["is_current"] for r in u1] == [False, False, True]
    u2 = [r for r in rows if r["k"] == "u2"]
    assert len(u2) == 1 and u2[0]["is_current"]


def test_scd2_same_ts_ordered_by_tiebreak(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.cdc import scd2_build

    feed = spark.createDataFrame(
        [("u", "a", _ts(1), 2), ("u", "b", _ts(1), 1)],
        "k string, attr string, ts timestamp, id long",
    )
    hist = sorted(
        scd2_build(feed, "k", ["attr"], "ts", tiebreak_col="id").collect(),
        key=lambda r: (r["valid_from"], r["is_current"]),
    )
    # id=1 ('b') comes first, id=2 ('a') is current
    assert [r["attr"] for r in hist] == ["b", "a"]
    assert [r["is_current"] for r in hist] == [False, True]


def test_scd2_null_attr_is_a_state(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.cdc import scd2_build

    feed = spark.createDataFrame(
        [("u", None, _ts(1), 1), ("u", "x", _ts(2), 2), ("u", None, _ts(3), 3)],
        "k string, attr string, ts timestamp, id long",
    )
    hist = scd2_build(feed, "k", ["attr"], "ts", tiebreak_col="id")
    assert hist.count() == 3  # null → x → null are three versions


# ---------------------------------------------------------------------------
# dedup_keep_best
# ---------------------------------------------------------------------------

def test_keep_best_prefers_quality_then_min_id(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.dedup import (
        dedup_keep_best,
    )

    df = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 7), (4, 3), (5, 6), (6, 6)],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup_keep_best(df, pairs, "doc_id", quality_col="n_chars")
        .collect()
    )
    # cluster {1,2,3}: 2 wins (n_chars 10); {5,6}: tie → min id 5;
    # 4 untouched (no pairs)
    assert kept == [2, 4, 5]


# ---------------------------------------------------------------------------
# per_group_cap
# ---------------------------------------------------------------------------

def test_per_group_cap_keeps_best_n(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.selection import (
        per_group_cap,
    )

    df = spark.createDataFrame(
        [("a", i, 100 - i) for i in range(10)]
        + [("b", 100, 1), ("b", 101, 2)],
        "source string, doc_id long, n_chars long",
    )
    out = per_group_cap(
        df, "source", [F.col("n_chars").desc(), F.col("doc_id")], 3
    )
    rows = sorted(out.collect(), key=lambda r: (r["source"], r["group_rank"]))
    a = [r for r in rows if r["source"] == "a"]
    assert [r["doc_id"] for r in a] == [0, 1, 2]  # highest n_chars
    assert [r["group_rank"] for r in a] == [1, 2, 3]
    b = [r for r in rows if r["source"] == "b"]
    assert [r["doc_id"] for r in b] == [101, 100]  # under cap: all kept


# ---------------------------------------------------------------------------
# rolling_distinct_count
# ---------------------------------------------------------------------------

def test_rolling_wau_hand_computed(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.timeseries import (
        rolling_distinct_count,
    )

    rows = [
        # day 1: users 1,2; day 3: user 2; day 10: user 3
        (1, _ts(1)), (2, _ts(1)), (2, _ts(1)),  # dup event same day
        (2, _ts(3)),
        (3, _ts(10)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        r["day"]: r["wau_7d"]
        for r in rolling_distinct_count(df, out_col="wau_7d").collect()
    }
    assert out == {
        datetime.date(2024, 1, 1): 2,   # users 1,2
        datetime.date(2024, 1, 3): 2,   # users 1,2 within [Dec 28, Jan 3]
        datetime.date(2024, 1, 10): 1,  # day-3 activity expired (7-day window)
    }
    # only days present in the data are reported
    assert len(out) == 3


# ---------------------------------------------------------------------------
# ngram_novelty
# ---------------------------------------------------------------------------

def test_ngram_novelty_copy_scores_zero(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.text import (
        ngram_novelty,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),  # verbatim copy
            (3, "zeta eta theta iota"),
            (4, "one two"),  # < 3 tokens → no grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(df, n=3).collect()}
    assert out[1]["novelty"] == 1.0
    assert out[2]["novelty"] == 0.0  # every gram first seen in doc 1
    assert out[3]["novelty"] == 1.0
    assert out[4]["n_distinct_grams"] == 0
    assert out[4]["novelty"] is None


def test_ngram_novelty_partial_overlap(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.text import (
        ngram_novelty,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d"),          # grams: abc, bcd
            (2, "a b c x y"),        # grams: abc (seen), bcx, cxy → 2/3 novel
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(df, n=3).collect()}
    assert out[1]["n_distinct_grams"] == 2 and out[1]["novelty"] == 1.0
    assert out[2]["n_distinct_grams"] == 3
    assert out[2]["n_novel_grams"] == 2
    assert out[2]["novelty"] == round(2 / 3, 6)


# ---------------------------------------------------------------------------
# centroid_outlier_scores
# ---------------------------------------------------------------------------

def test_outlier_scores_flag_planted_outlier(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.clustering import (
        centroid_outlier_scores,
    )

    rows = [(i, [float(i % 3) * 0.01, 1.0]) for i in range(20)]
    rows.append((99, [50.0, -50.0]))  # far off-manifold
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in centroid_outlier_scores(df).collect()}
    assert out[99]["is_outlier"]
    assert out[99]["z_score"] > 2.0
    # inliers: none flagged (the planted point owns the variance)
    assert not any(out[i]["is_outlier"] for i in range(20))


def test_outlier_scores_requires_two_vectors(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.clustering import (
        centroid_outlier_scores,
    )

    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<float>")
    try:
        centroid_outlier_scores(df)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# trailing_zscore
# ---------------------------------------------------------------------------

def test_trailing_zscore_flags_spike(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.timeseries import (
        trailing_zscore,
    )

    rows = []
    # 7 quiet days of 10 events, then a 100-event spike
    for d in range(1, 8):
        rows += [(i, _ts(d)) for i in range(10)]
    rows += [(i, _ts(8)) for i in range(100)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r["day"]: r for r in trailing_zscore(df).collect()}
    spike = out[datetime.date(2024, 1, 8)]
    # zero-variance baseline → std 0 → no z, no flag (NULL-safe)
    assert spike["z_score"] is None and not spike["is_anomaly"]


def test_trailing_zscore_hand_computed(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.timeseries import (
        trailing_zscore,
    )

    counts = {1: 10, 2: 12, 3: 8, 4: 11, 5: 60}
    rows = [(d * 1000 + i, _ts(d)) for d, c in counts.items() for i in range(c)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r["day"]: r for r in trailing_zscore(df).collect()}
    d5 = out[datetime.date(2024, 1, 5)]
    hist = [10, 12, 8, 11]
    mean = sum(hist) / 4
    var = sum((x - mean) ** 2 for x in hist) / 3
    assert d5["n_history"] == 4
    assert d5["z_score"] == round((60 - mean) / math.sqrt(var), 6)
    assert d5["is_anomaly"]
    # first day has no history
    assert out[datetime.date(2024, 1, 1)]["z_score"] is None
    assert not out[datetime.date(2024, 1, 1)]["is_anomaly"]


# ---------------------------------------------------------------------------
# ann_recall
# ---------------------------------------------------------------------------

def test_ann_recall_hand_computed(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.similarity import (
        ann_recall,
    )

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)],
        "query_id long, vec_id long",
    )
    approx = spark.createDataFrame(
        [(1, 11), (1, 99), (1, 12)],  # query 2 entirely missing
        "query_id long, vec_id long",
    )
    out = {r["query_id"]: r for r in ann_recall(exact, approx).collect()}
    assert out[1]["n_exact"] == 3 and out[1]["n_hit"] == 2
    assert out[1]["recall"] == round(2 / 3, 6)
    assert out[2]["n_hit"] == 0 and out[2]["recall"] == 0.0


def test_ann_recall_full_probe_ivf_is_one(spark, sf_smoke_dir):
    from pyspark.sql import functions as F
    from nifi_hive_schema_generator_bundle_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{sf_smoke_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, q, k=5)
    full = ivf_topk(emb, q, k=5, n_centroids=4, nprobe=4)  # probe everything
    rows = ann_recall(exact, full).collect()
    assert all(r["recall"] == 1.0 for r in rows)


# ---------------------------------------------------------------------------
# sliding windows (batch mode)
# ---------------------------------------------------------------------------

def test_sliding_window_counts_overlap(spark):
    from nifi_hive_schema_generator_bundle_spark.streaming.windows import (
        windowed_event_counts,
    )

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 7), "a", 1.0)],
        "ts timestamp, event_type string, value double",
    )
    tumbling = windowed_event_counts(df, window="10 minutes")
    sliding = windowed_event_counts(df, window="10 minutes", slide="5 minutes")
    assert tumbling.count() == 1
    # 00:07 lands in [00:00,00:10) and [00:05,00:15)
    starts = sorted(r["window_start"] for r in sliding.collect())
    assert starts == [
        datetime.datetime(2024, 1, 1, 0, 0),
        datetime.datetime(2024, 1, 1, 0, 5),
    ]


# ---------------------------------------------------------------------------
# HLL sketch rolling distinct
# ---------------------------------------------------------------------------

def test_rolling_wau_sketch_tracks_exact(spark, sf_smoke_dir):
    from nifi_hive_schema_generator_bundle_spark.functions.timeseries import (
        rolling_distinct_count,
        rolling_distinct_count_approx,
    )

    ev = spark.read.parquet(f"{sf_smoke_dir}/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":  # raw nanos fallback
        ev = ev.selectExpr("user_id", "cast(ts div 1000 as timestamp) as ts")
    exact = {r["day"]: r["n"] for r in rolling_distinct_count(ev, out_col="n").collect()}
    approx = {
        r["day"]: r["n"]
        for r in rolling_distinct_count_approx(ev, out_col="n").collect()
    }
    assert set(exact) == set(approx)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(2, 0.05 * n), (day, n, approx[day])


def test_daily_sketches_merge_across_partitions(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.timeseries import (
        daily_distinct_sketches,
    )

    rows = [(i % 50, _ts(1 + (i % 3))) for i in range(500)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = daily_distinct_sketches(df).collect()
    assert len(out) == 3
    assert all(r["sketch"] is not None for r in out)
    # estimate on a re-union of the stored sketches matches re-aggregation
    est = (
        daily_distinct_sketches(df)
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sketch, true))").alias("n"))
        .collect()[0]["n"]
    )
    assert abs(est - 50) <= 3


# ---------------------------------------------------------------------------
# value_histogram
# ---------------------------------------------------------------------------

def test_value_histogram_exact_counts(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.profile import (
        value_histogram,
    )

    df = spark.createDataFrame(
        [(float(x),) for x in [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10]] + [(None,)],
        "value double",
    )
    out = {r["bucket"]: r for r in value_histogram(df, "value", bins=5).collect()}
    # range [0,10], w=2: buckets 0..4; 10 clamps into bucket 4; NULL dropped
    assert sum(r["n"] for r in out.values()) == 11
    assert out[0]["n"] == 2 and out[4]["n"] == 3  # {8,9,10} in the last
    assert out[0]["bucket_lo"] == 0.0 and out[4]["bucket_lo"] == 8.0


def test_value_histogram_pinned_range_clamps_strays(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.profile import (
        value_histogram,
    )

    df = spark.createDataFrame(
        [(-5.0,), (0.5,), (1.5,), (99.0,)], "value double"
    )
    out = {
        r["bucket"]: r["n"]
        for r in value_histogram(df, "value", bins=2, lo=0.0, hi=2.0).collect()
    }
    assert out == {0: 2, 1: 2}  # -5 clamps low, 99 clamps high


def test_value_histogram_rejects_degenerate_range(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.profile import (
        value_histogram,
    )

    df = spark.createDataFrame([(1.0,), (1.0,)], "value double")
    try:
        value_histogram(df, "value", bins=4)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# shuffle_shards
# ---------------------------------------------------------------------------

def test_shuffle_shards_deterministic_and_partition_invariant(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
        shuffle_shards,
    )

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = sorted(map(tuple, shuffle_shards(df, "doc_id", n_shards=4).collect()))
    b = sorted(
        map(
            tuple,
            shuffle_shards(df.repartition(13), "doc_id", n_shards=4).collect(),
        )
    )
    assert a == b  # layout-independent
    rows = shuffle_shards(df, "doc_id", n_shards=4).collect()
    # positions within each shard are 1..|shard| with no gaps
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    assert set(by_shard) <= set(range(4))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_shuffle_shards_seed_changes_order(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
        shuffle_shards,
    )

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    e0 = {r["doc_id"]: (r["shard"], r["shard_pos"])
          for r in shuffle_shards(df, "doc_id", n_shards=4, seed="e0").collect()}
    e1 = {r["doc_id"]: (r["shard"], r["shard_pos"])
          for r in shuffle_shards(df, "doc_id", n_shards=4, seed="e1").collect()}
    assert e0 != e1  # a new epoch seed is a new order
    assert set(e0) == set(e1)  # over the same corpus


# ---------------------------------------------------------------------------
# quality checks
# ---------------------------------------------------------------------------

def test_quality_report_counts_violations(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.quality_checks import (
        quality_report,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 5.0),
            (1, "b", -1.0),     # dup id, range violation
            (None, "z", 50.0),  # null id, bad status, range violation
            (3, "a", 2.0),
        ],
        "id long, status string, v double",
    )
    rep = {
        (r["rule"], r["column"]): r
        for r in quality_report(
            df,
            not_null=["id"],
            unique=["id"],
            accepted_values={"status": ["a", "b"]},
            ranges={"v": (0.0, 10.0)},
        ).collect()
    }
    assert rep[("not_null", "id")]["violations"] == 1
    assert not rep[("not_null", "id")]["passed"]
    assert rep[("unique", "id")]["violations"] == 1  # two 1s → one extra
    assert rep[("accepted_values", "status")]["violations"] == 1  # 'z'
    assert rep[("range", "v")]["violations"] == 2  # -1 and 50
    assert all(r["n_rows"] == 4 for r in rep.values())


def test_quality_report_all_pass(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.quality_checks import (
        quality_report,
    )

    df = spark.createDataFrame([(1,), (2,)], "id long")
    rep = quality_report(df, not_null=["id"], unique=["id"]).collect()
    assert all(r["passed"] and r["violations"] == 0 for r in rep)


def test_quality_report_requires_rules(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.quality_checks import (
        quality_report,
    )

    df = spark.createDataFrame([(1,)], "id long")
    try:
        quality_report(df)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_ref_integrity_counts_orphans(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.quality_checks import (
        ref_integrity_violations,
    )

    child = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = ref_integrity_violations(child, "fk", parent, "pk").collect()[0]
    assert r["violations"] == 1  # 9 is the only orphan; NULL exempt
    assert r["n_rows"] == 4 and not r["passed"]


def test_partition_completeness_finds_gaps(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.quality_checks import (
        partition_completeness,
    )

    # days 1,2,5,6 present → 3,4 missing, both after day 2
    rows = [(i, _ts(d)) for i, d in enumerate([1, 2, 5, 6])]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = partition_completeness(df).collect()
    assert [(str(r["missing_day"]), str(r["prev_present_day"])) for r in out] == [
        ("2024-01-03", "2024-01-02"),
        ("2024-01-04", "2024-01-02"),
    ]
    # complete range → empty report
    full = spark.createDataFrame(
        [(i, _ts(d)) for i, d in enumerate([1, 2, 3])], "id long, ts timestamp"
    )
    assert partition_completeness(full).count() == 0


def test_schema_contract(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.quality_checks import (
        schema_contract_violations,
    )

    df = spark.createDataFrame([(1, "x")], "id long, name string")
    assert schema_contract_violations(df, {"id": "bigint", "name": "string"}) == []
    probs = schema_contract_violations(
        df, {"id": "int", "missing": "string"}
    )
    assert any("expected int" in p for p in probs)
    assert any("missing column missing" in p for p in probs)
    strict = schema_contract_violations(df, {"id": "bigint"}, allow_extra=False)
    assert any("unexpected column name" in p for p in strict)


# ---------------------------------------------------------------------------
# fit_linear_classifier
# ---------------------------------------------------------------------------

class TestFitLinearClassifier:
    @pytest.fixture(scope="class")
    def labeled(self, spark):
        rows = []
        for i in range(30):
            rows.append((i, f"good clean prose filler{i % 5}", True))
            rows.append((100 + i, f"spam junk noise filler{i % 5}", False))
        return spark.createDataFrame(rows, "doc_id long, text string, label boolean")

    def test_learns_separable_data(self, spark, labeled):
        from nifi_hive_schema_generator_bundle_spark.operators.classify import (
            fit_linear_classifier,
            linear_text_score,
        )

        m = fit_linear_classifier(labeled, "label", iters=12, lr=2.0)
        w = m["weights"]
        # signal tokens signed correctly, shared token ~neutral
        assert min(w["good"], w["clean"], w["prose"]) > 0
        assert max(w["spam"], w["junk"], w["noise"]) < 0
        assert abs(w["filler0"]) < 1e-6
        # and the fitted model feeds the serving path to 100% train acc
        scored = linear_text_score(labeled, w, bias=m["bias"])
        acc = scored.select(
            F.avg(
                ((F.col("quality_prob") > 0.5) == F.col("label")).cast("double")
            ).alias("a")
        ).collect()[0]["a"]
        assert acc == 1.0
        assert m["log_loss"] < 0.69  # better than the p=0.5 baseline

    def test_partitioning_independent(self, labeled):
        from nifi_hive_schema_generator_bundle_spark.operators.classify import (
            fit_linear_classifier,
        )

        a = fit_linear_classifier(labeled.coalesce(1), "label", iters=5, lr=1.0)
        b = fit_linear_classifier(
            labeled.repartition(16), "label", iters=5, lr=1.0
        )
        assert a["weights"] == b["weights"]
        assert a["bias"] == b["bias"]

    def test_null_labels_excluded_and_imbalance_biases(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.classify import (
            fit_linear_classifier,
        )

        rows = [(1, "aa bb", True), (2, "aa bb", True), (3, "aa bb", None)]
        m = fit_linear_classifier(
            spark.createDataFrame(rows, "doc_id long, text string, label boolean"),
            "label",
            iters=5,
        )
        assert m["n_docs"] == 2  # NULL row dropped
        assert m["bias"] > 0  # all-positive corpus pushes the bias up

    def test_explicit_vocab_and_l2(self, labeled):
        from nifi_hive_schema_generator_bundle_spark.operators.classify import (
            fit_linear_classifier,
        )

        m = fit_linear_classifier(
            labeled, "label", iters=8, lr=2.0, vocab=["good", "spam"], l2=0.1
        )
        assert set(m["weights"]) == {"good", "spam"}
        m0 = fit_linear_classifier(
            labeled, "label", iters=8, lr=2.0, vocab=["good", "spam"], l2=0.0
        )
        # L2 shrinks toward zero
        assert abs(m["weights"]["good"]) < abs(m0["weights"]["good"])

    def test_rejects_bad_params(self, spark, labeled):
        from nifi_hive_schema_generator_bundle_spark.operators.classify import (
            fit_linear_classifier,
        )

        with pytest.raises(ValueError):
            fit_linear_classifier(labeled, "label", iters=-1)
        with pytest.raises(ValueError):
            fit_linear_classifier(labeled, "label", lr=0.0)
        with pytest.raises(ValueError):
            fit_linear_classifier(labeled, "label", vocab=[])
        empty = labeled.filter(F.col("doc_id") < 0)
        with pytest.raises(ValueError):
            fit_linear_classifier(empty, "label")


# ---------------------------------------------------------------------------
# k_anonymity_report
# ---------------------------------------------------------------------------

class TestKAnonymity:
    def test_counts_and_flags(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.quality_checks import (
            k_anonymity_report,
        )

        rows = (
            [("a", 1)] * 5      # class of 5: safe at k=5
            + [("a", 2)] * 3    # class of 3: risky
            + [("b", 1)] * 1    # class of 1: risky
            + [(None, 1)] * 5   # NULL forms its own (safe) class
        )
        df = spark.createDataFrame(rows, "seg string, nat int")
        r = k_anonymity_report(df, ["seg", "nat"], k=5).collect()[0]
        assert r["k"] == 5 and r["n_rows"] == 14 and r["n_classes"] == 4
        assert r["n_risky_classes"] == 2 and r["n_risky_rows"] == 4
        assert r["min_class_size"] == 1 and r["anonymous"] is False

    def test_anonymous_when_all_classes_big(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.quality_checks import (
            k_anonymity_report,
        )

        df = spark.createDataFrame([("a",)] * 4 + [("b",)] * 4, "seg string")
        r = k_anonymity_report(df, ["seg"], k=3).collect()[0]
        assert r["anonymous"] is True and r["n_risky_classes"] == 0

    def test_rejects_bad_params(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.quality_checks import (
            k_anonymity_report,
        )

        df = spark.createDataFrame([("a",)], "seg string")
        with pytest.raises(ValueError):
            k_anonymity_report(df, [], k=5)
        with pytest.raises(ValueError):
            k_anonymity_report(df, ["seg"], k=0)


# ---------------------------------------------------------------------------
# split_leakage_report
# ---------------------------------------------------------------------------

class TestSplitLeakage:
    def test_planted_leak_found_clean_split_empty(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.quality_checks import (
            split_leakage_report,
        )

        rows = [
            # "dup" text on both sides -> leaked (2 train, 1 holdout)
            (1, "dup", "train"), (2, "dup", "train"), (3, "dup", "holdout"),
            # train-only and holdout-only texts -> clean
            (4, "only train", "train"), (5, "only train", "train"),
            (6, "only holdout", "holdout"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, split string")
        got = split_leakage_report(df).collect()
        assert len(got) == 1
        assert (got[0].n_train, got[0].n_holdout) == (2, 1)
        clean = df.filter(F.col("text") != "dup")
        assert split_leakage_report(clean).count() == 0

    def test_custom_columns_and_holdout_value(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.quality_checks import (
            split_leakage_report,
        )

        rows = [("x", "a"), ("x", "b"), ("y", "a")]
        df = spark.createDataFrame(rows, "body string, part string")
        got = split_leakage_report(
            df, split_col="part", content_col="body", holdout_value="b"
        ).collect()
        assert len(got) == 1
        assert (got[0].n_train, got[0].n_holdout) == (1, 1)


class TestDpNoisyCounts:
    def test_noise_bounded_and_deterministic(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.quality_checks import (
            dp_noisy_counts,
        )

        rows = [("en",)] * 40 + [("fr",)] * 10 + [(None,)] * 5
        df = spark.createDataFrame(rows, "lang string")
        out = {r.lang: r.noisy_count for r in dp_noisy_counts(df, ["lang"]).collect()}
        true = {"en": 40, "fr": 10, None: 5}
        assert set(out) == set(true)
        for lang, n in true.items():
            # Laplace(b=1): |noise| > 14 has probability ~8e-7
            assert abs(out[lang] - n) < 14.0
            assert out[lang] != n  # noise actually applied
        # same seed -> bit-identical release, regardless of layout
        again = {
            r.lang: r.noisy_count
            for r in dp_noisy_counts(df.repartition(7), ["lang"]).collect()
        }
        assert again == out
        # different seed -> different release
        other = {
            r.lang: r.noisy_count
            for r in dp_noisy_counts(df, ["lang"], seed="dp2").collect()
        }
        assert other != out

    def test_epsilon_scales_noise(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.quality_checks import (
            dp_noisy_counts,
        )

        df = spark.createDataFrame([("en",)] * 100, "lang string")
        n1 = dp_noisy_counts(df, ["lang"], epsilon=1.0).collect()[0].noisy_count
        n01 = dp_noisy_counts(df, ["lang"], epsilon=0.1).collect()[0].noisy_count
        # identical uniform draw, b scales 10x -> noise scales 10x exactly
        assert abs((n01 - 100) - 10 * (n1 - 100)) < 1e-4

    def test_guards(self, spark):
        import pytest

        from nifi_hive_schema_generator_bundle_spark.operators.quality_checks import (
            dp_noisy_counts,
        )

        df = spark.createDataFrame([("a",)], "g string")
        with pytest.raises(ValueError):
            dp_noisy_counts(df, [])
        with pytest.raises(ValueError):
            dp_noisy_counts(df, ["g"], epsilon=0)
        with pytest.raises(ValueError):
            dp_noisy_counts(df, ["g"], sensitivity=0)


# ---------------------------------------------------------------------------
# seasonal_zscore (day-of-week leave-one-out)
# ---------------------------------------------------------------------------

def test_seasonal_zscore_hand_computed_loo(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.timeseries import (
        seasonal_zscore,
    )

    # 5 Mondays (Jan 2024: 1, 8, 15, 22, 29): four quiet, one spiking;
    # interleave quiet Tuesdays so other weekdays exist
    mon = {1: 10, 8: 12, 15: 11, 22: 9, 29: 55}
    rows = [
        (d * 1000 + i, _ts(d)) for d, c in mon.items() for i in range(c)
    ]
    rows += [(90000 + d * 100 + i, _ts(d)) for d in (2, 9, 16, 23) for i in range(7)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r["day"]: r for r in seasonal_zscore(df).collect()}
    spike = out[datetime.date(2024, 1, 29)]
    peers = [10, 12, 11, 9]  # the OTHER Mondays — leave-one-out
    mean = sum(peers) / 4
    var = sum((x - mean) ** 2 for x in peers) / 3
    assert spike["dow"] == 1 and spike["n_peers"] == 4
    assert spike["z_score"] == round((55 - mean) / math.sqrt(var), 6)
    assert spike["is_anomaly"]
    # a quiet Monday is NOT anomalous against its peers
    assert not out[datetime.date(2024, 1, 8)]["is_anomaly"]


def test_seasonal_zscore_min_history_and_zero_variance(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.timeseries import (
        seasonal_zscore,
    )

    # 3 Wednesdays of identical counts: n_peers = 2 < 3 -> NULL z; and
    # even with min_history=1 the zero variance keeps z NULL
    rows = [(d * 1000 + i, _ts(d)) for d in (3, 10, 17) for i in range(5)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = seasonal_zscore(df).collect()
    assert all(r["z_score"] is None and not r["is_anomaly"] for r in out)
    out2 = seasonal_zscore(df, min_history=1).collect()
    assert all(r["z_score"] is None for r in out2)


def test_seasonal_zscore_dow_pinned_to_sunday_zero(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.timeseries import (
        seasonal_zscore,
    )

    # 2024-01-07 was a Sunday; 2024-01-01 a Monday
    rows = [(i, _ts(7)) for i in range(3)] + [(100 + i, _ts(1)) for i in range(3)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r["day"]: r["dow"] for r in seasonal_zscore(df).collect()}
    assert out[datetime.date(2024, 1, 7)] == 0
    assert out[datetime.date(2024, 1, 1)] == 1
