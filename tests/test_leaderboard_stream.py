"""Streaming Bradley-Terry leaderboard tests (streaming/leaderboard.py)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql.types import StringType, StructField, StructType

BATTLE_SCHEMA = StructType(
    [
        StructField("model_a", StringType()),
        StructField("model_b", StringType()),
        StructField("winner", StringType()),
    ]
)


def _write_battles(path, battles):
    path.write_text(
        "\n".join(
            json.dumps({"model_a": a, "model_b": b, "winner": w})
            for a, b, w in battles
        )
        + "\n"
    )


def test_streaming_fit_equals_batch_fit(spark, tmp_path):
    """The store keeps sufficient statistics only, so the streamed fit
    must equal the batch operator run on all battles at once."""
    from nifi_hive_schema_generator_bundle_spark.operators.ranking import (
        bradley_terry,
    )
    from nifi_hive_schema_generator_bundle_spark.streaming.leaderboard import (
        leaderboard_from_store,
        run_streaming_leaderboard,
    )

    battles = (
        [("A", "B", "a")] * 6
        + [("A", "B", "b")] * 2
        + [("B", "C", "a")] * 5
        + [("A", "C", "tie")]
        + [("A", "C", "a")] * 3
    )
    src = tmp_path / "src"
    src.mkdir()
    # two source files -> micro-batches may split arbitrarily; totals fold
    _write_battles(src / "one.json", battles[:7])
    _write_battles(src / "two.json", battles[7:])

    stream = spark.readStream.schema(BATTLE_SCHEMA).json(str(src))
    q = run_streaming_leaderboard(
        stream,
        store_dir=str(tmp_path / "store"),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    assert q.awaitTermination(120)

    streamed = sorted(
        tuple(r)
        for r in leaderboard_from_store(
            spark, str(tmp_path / "store"), iters=10
        ).collect()
    )
    batch = sorted(
        tuple(r)
        for r in bradley_terry(
            spark.createDataFrame(
                battles, "model_a string, model_b string, winner string"
            ),
            iters=10,
        ).collect()
    )
    assert streamed == batch


def test_replayed_batch_converges(spark, tmp_path):
    """Re-running a batch id overwrites its own partition — counts don't
    double."""
    from nifi_hive_schema_generator_bundle_spark.streaming.leaderboard import (
        leaderboard_from_store,
        update_leaderboard_store,
    )

    df = spark.createDataFrame(
        [("A", "B", "a")] * 4 + [("A", "B", "b")],
        "model_a string, model_b string, winner string",
    )
    update_leaderboard_store(df, 0, store_dir=str(tmp_path / "store"))
    update_leaderboard_store(df, 0, store_dir=str(tmp_path / "store"))  # replay
    lb = {
        r.model: r
        for r in leaderboard_from_store(spark, str(tmp_path / "store")).collect()
    }
    assert lb["A"].n_battles == 5 and lb["A"].n_wins == 4
    assert lb["B"].n_wins == 1


def test_empty_store_is_empty_leaderboard(spark, tmp_path):
    from nifi_hive_schema_generator_bundle_spark.streaming.leaderboard import (
        leaderboard_from_store,
    )

    out = leaderboard_from_store(spark, str(tmp_path / "absent"))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "model", "n_battles", "n_wins", "rating", "elo",
    ]
