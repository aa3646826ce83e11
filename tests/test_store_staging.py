"""streaming/_store.durable_fold staging contract: the fold is written
durably BEFORE the store mutation, and the temp directory never
outlives the call (success or failure)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.sources.formats import (
    overwrite_partitions,
)
from nifi_hive_schema_generator_bundle_spark.streaming._store import (
    _TMP_SUFFIX,
    durable_fold,
)


def _mk_store(spark, path, n_batches=3):
    for b in range(n_batches):
        df = spark.createDataFrame(
            [(f"k{i}", 10 * b + i, b) for i in range(4)],
            "k string, cnt long, batch_id int",
        )
        overwrite_partitions(df, path, ["batch_id"], fmt="parquet")


def test_durable_fold_replaces_partition_and_cleans_tmp(spark, tmp_path):
    store = str(tmp_path / "store")
    _mk_store(spark, store)
    folded = (
        spark.read.parquet(store)
        .filter(F.col("batch_id") < 2)
        .groupBy("k")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("batch_id", F.lit(1))
    )
    n = durable_fold(folded, store)
    assert n == 4
    assert not os.path.exists(store + _TMP_SUFFIX)
    # batch 1 now holds the fold; batch 0 untouched (caller deletes it);
    # batch 2 (outside the fold) untouched
    got = {
        (r.k, r.batch_id): r.cnt
        for r in spark.read.parquet(store).collect()
        if r.batch_id == 1
    }
    assert got == {(f"k{i}", 1): (i) + (10 + i) for i in range(4)}
    b2 = spark.read.parquet(store).filter(F.col("batch_id") == 2).count()
    assert b2 == 4


def test_durable_fold_cleans_tmp_on_failure(spark, tmp_path):
    store = str(tmp_path / "store")
    _mk_store(spark, store)
    # a frame whose evaluation fails at write time (division by zero
    # under ANSI, via a column that raises on materialization)
    bad = spark.createDataFrame([(1,)], "x int").select(
        F.raise_error(F.lit("boom")).alias("k"),
        F.lit(0).alias("cnt"),
        F.lit(0).alias("batch_id"),
    )
    with pytest.raises(Exception, match="boom"):
        durable_fold(bad, store)
    assert not os.path.exists(store + _TMP_SUFFIX)
    # the store is untouched by the failed fold
    assert spark.read.parquet(store).count() == 12


def test_durable_fold_clobbers_stale_tmp(spark, tmp_path):
    store = str(tmp_path / "store")
    _mk_store(spark, store)
    stale = store + _TMP_SUFFIX
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "junk"), "w") as f:
        f.write("leftover from a crashed fold")
    folded = (
        spark.read.parquet(store)
        .filter(F.col("batch_id") < 2)
        .groupBy("k")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("batch_id", F.lit(1))
    )
    assert durable_fold(folded, store) == 4
    assert not os.path.exists(stale)


def test_store_max_batch_id_listing_and_fallback(spark, tmp_path):
    from nifi_hive_schema_generator_bundle_spark.streaming._store import (
        store_max_batch_id,
    )

    # missing store
    assert store_max_batch_id(spark, str(tmp_path / "nope")) is None
    # hive layout: answered from directory names
    store = str(tmp_path / "store")
    _mk_store(spark, store, n_batches=4)
    assert store_max_batch_id(spark, store) == 3
    # non-hive layout (plain parquet with a batch_id COLUMN): falls back
    # to the data scan and still answers
    flat = str(tmp_path / "flat")
    spark.createDataFrame(
        [(1, 7), (2, 9)], "x int, batch_id int"
    ).write.parquet(flat)
    assert store_max_batch_id(spark, flat) == 9
