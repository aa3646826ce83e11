"""Round-5 wave-2 operators: CUSUM changepoints (operators/drift),
single-scan curation audit (operators/quality_checks), and the
streaming quantile accumulator (streaming/quantile_stream)."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.operators.drift import (
    cusum_changepoints,
)
from nifi_hive_schema_generator_bundle_spark.operators.quality_checks import (
    curation_audit,
)
from nifi_hive_schema_generator_bundle_spark.operators.quantile_sketch import (
    histogram_quantiles,
    log_bucket_boundaries,
    log_bucket_histogram,
)
from nifi_hive_schema_generator_bundle_spark.streaming.quantile_stream import (
    compact_histogram_store,
    histogram_batch_update,
    histogram_store,
    histogram_store_quantiles,
    run_histogram_stream,
)

# ------------------------------------------------------------- CUSUM


def _series(spark, rows):
    return spark.createDataFrame(rows, "g string, t int, value double")


def test_cusum_detects_sub_sigma_shift(spark):
    """A +0.8σ mean shift after day 30 — invisible to a 3σ pointwise
    monitor — must raise the positive CUSUM above the h=4σ band within
    the shifted window, with no alarms before the shift."""
    base = [("g", t, float(10 + (t * 7) % 5)) for t in range(30)]  # σ≈1.4
    shifted = [("g", t, float(11.2 + (t * 7) % 5)) for t in range(30, 60)]
    out = cusum_changepoints(
        _series(spark, base + shifted),
        "t",
        "value",
        group_cols=["g"],
        baseline_periods=14,
        k_sigmas=0.5,
        h_sigmas=4.0,
    ).collect()
    alarms = {r["period"] for r in out if r["alarm"]}
    assert alarms, "shift never detected"
    assert min(alarms) >= 30, f"false alarm before the shift: {min(alarms)}"
    assert min(alarms) <= 45, "detection too slow for a 0.8σ shift"


def test_cusum_no_alarm_on_stationary_series(spark):
    rows = [("g", t, float(10 + (t * 7) % 5)) for t in range(60)]
    out = cusum_changepoints(
        _series(spark, rows), "t", "value", group_cols=["g"],
        baseline_periods=14, h_sigmas=5.0,
    ).collect()
    assert not any(r["alarm"] for r in out)


def test_cusum_negative_shift_hits_s_neg(spark):
    base = [("g", t, float(10 + (t * 7) % 5)) for t in range(30)]
    shifted = [("g", t, float(8.8 + (t * 7) % 5)) for t in range(30, 60)]
    out = cusum_changepoints(
        _series(spark, base + shifted), "t", "value", group_cols=["g"],
        baseline_periods=14, h_sigmas=4.0,
    ).collect()
    hit = [r for r in out if r["alarm"]]
    assert hit and all(r["s_neg"] > r["s_pos"] for r in hit)


def test_cusum_short_or_flat_groups_dropped_or_null(spark):
    """Groups under the baseline length produce no rows; zero-variance
    baselines report NULL statistics."""
    short = [("s", t, 1.0) for t in range(5)]
    flat = [("f", t, 3.0) for t in range(30)]
    out = cusum_changepoints(
        _series(spark, short + flat), "t", "value", group_cols=["g"],
        baseline_periods=14,
    ).collect()
    assert {r["g"] for r in out} == {"f"}
    assert all(r["s_pos"] is None and r["alarm"] is None for r in out)


def test_cusum_statistic_matches_sequential_reference(spark):
    """The prefix-sum − prefix-min closed form equals the textbook
    reset-at-zero recursion, replayed here in python over the same
    quantized integers."""
    vals = [10.0, 12.5, 9.0, 14.0, 8.0, 15.5, 10.0, 13.0, 9.5, 11.0,
            12.0, 10.5, 13.5, 9.0, 16.0, 17.0, 18.0, 19.0, 20.0, 21.0]
    rows = [("g", t, v) for t, v in enumerate(vals)]
    out = {
        r["period"]: r
        for r in cusum_changepoints(
            _series(spark, rows), "t", "value", group_cols=["g"],
            baseline_periods=10, k_sigmas=0.5,
        ).collect()
    }
    # python reference on the same integer plan
    import math

    q = [int(math.floor(v * 10**6)) for v in vals]
    means = q  # one row per period → per-period mean is the value itself
    b = means[:10]
    mu0 = sum(b) // len(b)
    var = (sum(m * m for m in b) - (sum(b) * sum(b)) / len(b)) / len(b)
    sigma0 = math.sqrt(max(var, 0.0))
    ks = int(math.floor(0.5 * sigma0))
    sp = 0
    for t, m in enumerate(means):
        sp = max(0, sp + (m - mu0 - ks))
        assert out[t]["s_pos"] == pytest.approx(sp / sigma0, abs=1e-12)


# ---------------------------------------------------- curation audit


def test_curation_audit_funnel_accounting(spark):
    df = spark.createDataFrame(
        [(1, "a" * 10, 5), (2, "b" * 100, 1), (3, "c" * 100, 5),
         (4, "d" * 100, 5), (5, "e" * 100, 5)],
        "id long, text string, score int",
    )
    rep = curation_audit(
        df,
        [
            ("len", F.length("text") >= 50),     # removes id 1
            ("score", F.col("score") >= 3),      # removes id 2
        ],
    ).collect()
    assert [tuple(r) for r in rep] == [
        (0, "len", 5, 1, 4),
        (1, "score", 4, 1, 3),
    ]


def test_curation_audit_first_fail_attribution(spark):
    """A row failing BOTH stages counts only against the first."""
    df = spark.createDataFrame(
        [(1, "x", 0), (2, "y" * 99, 9)], "id long, text string, score int"
    )
    rep = {r["stage"]: r for r in curation_audit(
        df,
        [("len", F.length("text") >= 50), ("score", F.col("score") >= 3)],
    ).collect()}
    assert rep["len"]["n_removed"] == 1
    assert rep["score"]["n_removed"] == 0


def test_curation_audit_null_predicate_removes(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "ok")], "id long, text string"
    )
    rep = curation_audit(
        df, [("len", F.length("text") >= 1)]
    ).collect()[0]
    assert (rep["n_removed"], rep["n_out"]) == (1, 1)


def test_curation_audit_empty_stage_list_raises(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        curation_audit(df, [])


# ------------------------------------------------- quantile streaming

BOUNDS = log_bucket_boundaries(1.0, 1000.0, 1.1)


def test_store_accumulates_and_matches_direct(spark, tmp_path):
    store = str(tmp_path / "hstore")
    all_rows = []
    for b in range(3):
        rows = [("g", float(1.5 + 7 * b + i)) for i in range(20)]
        all_rows += rows
        df = spark.createDataFrame(rows, "g string, x double")
        n = histogram_batch_update(
            df, b, store_dir=store, val_col="x",
            group_cols=["g"], boundaries=BOUNDS,
        )
        assert n > 0
    got = {
        r["q"]: r
        for r in histogram_store_quantiles(
            spark, store, ["g"], BOUNDS, [0.5, 0.9]
        ).collect()
    }
    direct = {
        r["q"]: r
        for r in histogram_quantiles(
            log_bucket_histogram(
                spark.createDataFrame(all_rows, "g string, x double"),
                "x", ["g"], BOUNDS,
            ),
            ["g"], BOUNDS, [0.5, 0.9],
        ).collect()
    }
    for q in (0.5, 0.9):
        assert got[q]["est"] == direct[q]["est"]
        assert got[q]["n"] == direct[q]["n"] == 60


def test_replayed_batch_overwrites_not_doubles(spark, tmp_path):
    store = str(tmp_path / "hstore")
    df = spark.createDataFrame(
        [("g", float(i + 1)) for i in range(10)], "g string, x double"
    )
    histogram_batch_update(df, 0, store_dir=store, val_col="x",
                           group_cols=["g"], boundaries=BOUNDS)
    histogram_batch_update(df, 0, store_dir=store, val_col="x",
                           group_cols=["g"], boundaries=BOUNDS)  # replay
    hist = histogram_store(spark, store, ["g"])
    assert hist.agg(F.sum("cnt")).collect()[0][0] == 10  # not 20


def test_behind_store_batch_raises(spark, tmp_path):
    store = str(tmp_path / "hstore")
    df = spark.createDataFrame([("g", 2.0)], "g string, x double")
    histogram_batch_update(df, 5, store_dir=store, val_col="x",
                           group_cols=["g"], boundaries=BOUNDS)
    with pytest.raises(ValueError, match="behind the store"):
        histogram_batch_update(df, 3, store_dir=store, val_col="x",
                               group_cols=["g"], boundaries=BOUNDS)


def test_compaction_preserves_answers(spark, tmp_path):
    store = str(tmp_path / "hstore")
    for b in range(4):
        df = spark.createDataFrame(
            [("g", float(2 * b + i + 1)) for i in range(8)],
            "g string, x double",
        )
        histogram_batch_update(df, b, store_dir=store, val_col="x",
                               group_cols=["g"], boundaries=BOUNDS)
    before = sorted(
        tuple(r) for r in histogram_store(spark, store, ["g"]).collect()
    )
    compact_histogram_store(spark, store, ["g"], keep_last=1)
    after = sorted(
        tuple(r) for r in histogram_store(spark, store, ["g"]).collect()
    )
    assert before == after
    ids = {
        r[0]
        for r in spark.read.parquet(store).select("batch_id")
        .distinct().collect()
    }
    assert len(ids) == 2  # folded + live max


def test_stream_path_foreachbatch(spark, tmp_path):
    """run_histogram_stream drives the same accumulator from a real
    file stream (availableNow)."""
    src = str(tmp_path / "src")
    store = str(tmp_path / "hstore")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("g", float(i + 1)) for i in range(30)], "g string, x double"
    ).write.parquet(src)
    stream = spark.readStream.schema("g string, x double").parquet(src)
    q = run_histogram_stream(
        stream, store_dir=store, checkpoint_dir=ckpt,
        val_col="x", group_cols=["g"], boundaries=BOUNDS,
    )
    q.awaitTermination(120)
    got = histogram_store_quantiles(
        spark, store, ["g"], BOUNDS, [0.5]
    ).collect()[0]
    assert got["n"] == 30


# ------------------------------------------------- HLL streaming store


def test_hll_store_accumulates_and_matches_direct(spark, tmp_path):
    from nifi_hive_schema_generator_bundle_spark.operators.cardinality import (
        hll_estimate,
        hll_registers,
    )
    from nifi_hive_schema_generator_bundle_spark.streaming.hll_stream import (
        hll_batch_update,
        hll_store_estimate,
        hll_store_registers,
    )

    store = str(tmp_path / "hllstore")
    all_rows = []
    for b in range(3):
        rows = [("g", f"user-{b * 80 + i}") for i in range(100)]  # overlap
        all_rows += rows
        df = spark.createDataFrame(rows, "g string, k string")
        assert hll_batch_update(
            df, b, store_dir=store, key_col="k", group_cols=["g"], p=8
        ) > 0
    merged = {
        (r["register"],): r["rho"]
        for r in hll_store_registers(spark, store, ["g"]).collect()
    }
    direct = {
        (r["register"],): r["rho"]
        for r in hll_registers(
            spark.createDataFrame(all_rows, "g string, k string"),
            "k", ["g"], p=8,
        ).collect()
    }
    assert merged == direct  # max-merge EXACT, not approximate
    est = hll_store_estimate(spark, store, ["g"], p=8).collect()[0][
        "est_distinct"
    ]
    want = hll_estimate(
        hll_registers(
            spark.createDataFrame(all_rows, "g string, k string"),
            "k", ["g"], p=8,
        ),
        ["g"], p=8,
    ).collect()[0]["est_distinct"]
    assert est == want


def test_hll_store_replay_idempotent_and_behind_raises(spark, tmp_path):
    from nifi_hive_schema_generator_bundle_spark.streaming.hll_stream import (
        hll_batch_update,
        hll_store_registers,
    )

    store = str(tmp_path / "hllstore")
    df = spark.createDataFrame(
        [("g", f"u{i}") for i in range(50)], "g string, k string"
    )
    hll_batch_update(df, 2, store_dir=store, key_col="k",
                     group_cols=["g"], p=8)
    before = sorted(
        tuple(r)
        for r in hll_store_registers(spark, store, ["g"]).collect()
    )
    hll_batch_update(df, 2, store_dir=store, key_col="k",
                     group_cols=["g"], p=8)  # replay
    after = sorted(
        tuple(r)
        for r in hll_store_registers(spark, store, ["g"]).collect()
    )
    assert before == after
    import pytest as _pytest

    with _pytest.raises(ValueError, match="behind the store"):
        hll_batch_update(df, 1, store_dir=store, key_col="k",
                         group_cols=["g"], p=8)


def test_hll_store_compaction_and_stream_path(spark, tmp_path):
    from nifi_hive_schema_generator_bundle_spark.streaming.hll_stream import (
        compact_hll_store,
        hll_batch_update,
        hll_store_registers,
        run_hll_stream,
        hll_store_estimate,
    )

    store = str(tmp_path / "hllstore")
    for b in range(4):
        df = spark.createDataFrame(
            [("g", f"u{b * 30 + i}") for i in range(40)],
            "g string, k string",
        )
        hll_batch_update(df, b, store_dir=store, key_col="k",
                         group_cols=["g"], p=8)
    before = sorted(
        tuple(r)
        for r in hll_store_registers(spark, store, ["g"]).collect()
    )
    compact_hll_store(spark, store, ["g"], keep_last=1)
    after = sorted(
        tuple(r)
        for r in hll_store_registers(spark, store, ["g"]).collect()
    )
    assert before == after

    src = str(tmp_path / "src")
    store2 = str(tmp_path / "hllstore2")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("g", f"u{i}") for i in range(60)], "g string, k string"
    ).write.parquet(src)
    stream = spark.readStream.schema("g string, k string").parquet(src)
    q = run_hll_stream(stream, store_dir=store2, checkpoint_dir=ckpt,
                       key_col="k", group_cols=["g"], p=8)
    q.awaitTermination(120)
    est = hll_store_estimate(spark, store2, ["g"], p=8).collect()[0][
        "est_distinct"
    ]
    assert est == __import__("pytest").approx(60, rel=0.3)
