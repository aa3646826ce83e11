"""Streaming daily-count store: cross-batch additive exactness (merged
store == single-pass daily counts == batch ewma_backtest), replay
idempotency, behind-store guard, compaction invariance, and the
streaming wiring."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.operators.forecast import (
    ewma_backtest,
)
from nifi_hive_schema_generator_bundle_spark.streaming.forecast_stream import (
    compact_count_store,
    count_batch_update,
    count_store_daily,
    count_store_forecast,
    run_count_stream,
)


def _events(spark, rows):
    """rows: (g, 'YYYY-MM-DD') one event each."""
    return spark.createDataFrame(rows, "g string, d string").select(
        "g", F.to_timestamp("d").alias("ts")
    )


def _daily(spark, store):
    return {
        (r["g"], str(r["day"])): r["cnt"]
        for r in count_store_daily(spark, store).collect()
    }


def test_counts_accumulate_and_match_single_pass(spark, tmp_path):
    store = str(tmp_path / "cnt")
    rows = [("g", f"2024-01-{d:02d}") for d in range(1, 11) for _ in range(d)]
    count_batch_update(
        _events(spark, rows[::2]), 0, store_dir=store,
        group_col="g", ts_col="ts",
    )
    count_batch_update(
        _events(spark, rows[1::2]), 1, store_dir=store,
        group_col="g", ts_col="ts",
    )
    got = _daily(spark, store)
    assert got == {("g", f"2024-01-{d:02d}"): d for d in range(1, 11)}
    # merged-store forecast == batch backtest over the union
    want = ewma_backtest(_events(spark, rows), "g", "ts", window=3).collect()
    have = count_store_forecast(spark, store, window=3).collect()
    assert [tuple(r) for r in have] == [tuple(r) for r in want]


def test_replay_of_same_batch_converges(spark, tmp_path):
    store = str(tmp_path / "cnt")
    b = _events(spark, [("g", "2024-01-01")] * 3)
    count_batch_update(b, 0, store_dir=store, group_col="g", ts_col="ts")
    count_batch_update(b, 0, store_dir=store, group_col="g", ts_col="ts")
    assert _daily(spark, store) == {("g", "2024-01-01"): 3}


def test_stale_batch_id_raises(spark, tmp_path):
    store = str(tmp_path / "cnt")
    b = _events(spark, [("g", "2024-01-01")])
    count_batch_update(b, 5, store_dir=store, group_col="g", ts_col="ts")
    with pytest.raises(ValueError, match="behind the store"):
        count_batch_update(b, 4, store_dir=store, group_col="g", ts_col="ts")


def test_compaction_preserves_daily_counts(spark, tmp_path):
    store = str(tmp_path / "cnt")
    for b in range(4):
        count_batch_update(
            _events(spark, [("g", "2024-01-01"), ("h", f"2024-01-0{b + 1}")]),
            b, store_dir=store, group_col="g", ts_col="ts",
        )
    before = _daily(spark, store)
    assert compact_count_store(spark, store, keep_last=1) > 0
    assert _daily(spark, store) == before
    ids = {
        r[0]
        for r in spark.read.parquet(store).select("batch_id").distinct().collect()
    }
    assert ids == {2, 3}


def test_streaming_two_drains(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    store, ckpt = str(tmp_path / "cnt"), str(tmp_path / "ckpt")
    (src / "a.json").write_text(
        "".join(
            json.dumps({"g": "g", "ts": "2024-01-01 00:00:00"}) + "\n"
            for _ in range(3)
        )
    )

    def drain():
        stream = spark.readStream.schema("g string, ts timestamp").json(
            str(src)
        )
        q = run_count_stream(
            stream, store_dir=store, checkpoint_dir=ckpt,
            group_col="g", ts_col="ts",
        )
        q.awaitTermination(120)

    drain()
    assert _daily(spark, store) == {("g", "2024-01-01"): 3}
    (src / "b.json").write_text(
        json.dumps({"g": "g", "ts": "2024-01-02 00:00:00"}) + "\n"
    )
    drain()
    assert _daily(spark, store) == {
        ("g", "2024-01-01"): 3,
        ("g", "2024-01-02"): 1,
    }
