"""Streaming CMS accumulation: cross-batch sums, replay idempotency,
compaction invariance, and the streaming wiring."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.streaming.cms_stream import (
    cms_batch_update,
    cms_store_estimate,
    cms_store_grid,
    compact_cms_store,
    run_cms_stream,
)

DW = dict(depth=3, width=32)


def _batch(spark, toks):
    return spark.createDataFrame([(t,) for t in toks], "tok string")


def _keys(spark, toks):
    return spark.createDataFrame([(t,) for t in toks], "tok string")


def _est(spark, store, toks):
    return {
        r.tok: r.est_count
        for r in cms_store_estimate(
            spark, store, _keys(spark, toks), "tok", **DW
        ).collect()
    }


def test_counts_accumulate_across_batches(spark, tmp_path):
    store = str(tmp_path / "cms")
    cms_batch_update(
        _batch(spark, ["a"] * 3 + ["b"]), 0, store_dir=store, key_col="tok", **DW
    )
    cms_batch_update(
        _batch(spark, ["a"] * 2 + ["c"]), 1, store_dir=store, key_col="tok", **DW
    )
    got = _est(spark, store, ["a", "b", "c"])
    assert got["a"] >= 5 and got["b"] >= 1 and got["c"] >= 1
    # total mass is exact: both batches contributed every occurrence
    total = cms_store_grid(spark, store).groupBy("hash_row").agg(
        F.sum("cnt").alias("s")
    ).collect()
    assert all(r.s == 7 for r in total)  # 4 + 3 tokens across batches


def test_replay_of_same_batch_converges(spark, tmp_path):
    store = str(tmp_path / "cms")
    rows = ["x"] * 4 + ["y"]
    cms_batch_update(_batch(spark, rows), 0, store_dir=store, key_col="tok", **DW)
    before = _est(spark, store, ["x", "y"])
    # crash-replay: same batch id again — must overwrite, not double
    cms_batch_update(_batch(spark, rows), 0, store_dir=store, key_col="tok", **DW)
    assert _est(spark, store, ["x", "y"]) == before


def test_stale_batch_id_raises(spark, tmp_path):
    store = str(tmp_path / "cms")
    cms_batch_update(_batch(spark, ["a"]), 5, store_dir=store, key_col="tok", **DW)
    with pytest.raises(ValueError, match="behind the store"):
        cms_batch_update(
            _batch(spark, ["b"]), 3, store_dir=store, key_col="tok", **DW
        )


def test_compaction_preserves_every_estimate(spark, tmp_path):
    store = str(tmp_path / "cms")
    toks = ["a", "b", "c", "d"]
    for i in range(4):
        cms_batch_update(
            _batch(spark, [toks[i]] * (i + 1) + ["common"]),
            i,
            store_dir=store,
            key_col="tok",
            **DW,
        )
    before = _est(spark, store, toks + ["common"])
    n = compact_cms_store(spark, store)
    assert n > 0
    assert _est(spark, store, toks + ["common"]) == before
    parts = spark.read.parquet(store).select("batch_id").distinct().count()
    assert parts == 2  # folded history + live max


def test_streaming_two_drains(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    store, ckpt = str(tmp_path / "cms"), str(tmp_path / "ckpt")
    (src / "a.json").write_text(
        "".join(json.dumps({"tok": t}) + "\n" for t in ["p", "p", "q"])
    )

    def drain():
        stream = spark.readStream.schema("tok string").json(str(src))
        q = run_cms_stream(
            stream, store_dir=store, checkpoint_dir=ckpt, key_col="tok", **DW
        )
        q.awaitTermination(120)

    drain()
    assert _est(spark, store, ["p", "q"])["p"] >= 2
    (src / "b.json").write_text(
        "".join(json.dumps({"tok": t}) + "\n" for t in ["p", "r"])
    )
    drain()
    got = _est(spark, store, ["p", "q", "r"])
    assert got["p"] >= 3 and got["q"] >= 1 and got["r"] >= 1
