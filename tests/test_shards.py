"""Training-shard exporter tests (sources/shards.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.sources.shards import (
    read_training_shards,
    write_training_shards,
)


@pytest.fixture()
def docs(spark):
    rows = [(i, f"doc {i} text", 10 + i % 5) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string, n_tok int")


def test_roundtrip_manifest_and_order(spark, docs, tmp_path):
    path = str(tmp_path / "out")
    manifest = write_training_shards(
        docs, path, key="doc_id", n_shards=4, token_col="n_tok"
    ).collect()
    assert [m.shard for m in manifest] == [0, 1, 2, 3]
    assert sum(m.n_rows for m in manifest) == 200
    assert sum(m.n_tokens for m in manifest) == sum(10 + i % 5 for i in range(200))

    back = read_training_shards(spark, path)
    assert back.count() == 200
    assert set(back.columns) >= {"doc_id", "text", "n_tok", "shard", "shard_pos"}
    # positions are dense 1..n within each shard
    per = (
        back.groupBy("shard")
        .agg(F.count("*").alias("n"), F.max("shard_pos").alias("mx"),
             F.min("shard_pos").alias("mn"))
        .collect()
    )
    for r in per:
        assert (r.mn, r.mx) == (1, r.n)

    # one data file per shard directory
    import glob

    for s in range(4):
        files = glob.glob(f"{path}/data/shard={s}/*.parquet")
        assert len(files) == 1, files


def test_determinism_across_layouts_and_pruned_read(spark, docs, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_training_shards(docs, a, key="doc_id", n_shards=3)
    write_training_shards(
        docs.repartition(7), b, key="doc_id", n_shards=3
    )
    ra = sorted(
        (r.shard, r.shard_pos, r.doc_id)
        for r in read_training_shards(spark, a).collect()
    )
    rb = sorted(
        (r.shard, r.shard_pos, r.doc_id)
        for r in read_training_shards(spark, b).collect()
    )
    assert ra == rb                       # layout-independent assignment

    pruned = read_training_shards(spark, a, shards=[1])
    assert pruned.select("shard").distinct().collect()[0].shard == 1
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "shard" in plan  # partition filter reaches the scan


def test_reexport_converges(spark, docs, tmp_path):
    path = str(tmp_path / "o")
    m1 = [tuple(r) for r in write_training_shards(docs, path, key="doc_id", n_shards=2).collect()]
    m2 = [tuple(r) for r in write_training_shards(docs, path, key="doc_id", n_shards=2).collect()]
    assert m1 == m2
    assert read_training_shards(spark, path).count() == 200
