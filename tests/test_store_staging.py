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


def test_durable_fold_owns_stale_deletes_and_removes_marker(spark, tmp_path):
    """The delete step is part of the durable protocol (ADVICE r6): one
    durable_fold call folds, overwrites, deletes the stale partitions,
    and leaves neither marker nor temp dir behind."""
    from nifi_hive_schema_generator_bundle_spark.streaming._store import (
        read_fold_marker,
    )

    store = str(tmp_path / "store")
    _mk_store(spark, store)
    folded = (
        spark.read.parquet(store)
        .filter(F.col("batch_id") < 2)
        .groupBy("k")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("batch_id", F.lit(1))
    )
    assert durable_fold(folded, store, stale_ids=[0]) == 4
    assert not os.path.exists(store + _TMP_SUFFIX)
    assert not os.path.exists(os.path.join(store, "batch_id=0"))
    assert read_fold_marker(spark, store) is None
    # total is exactly the pre-fold total: no loss, no double count
    total = spark.read.parquet(store).agg(F.sum("cnt")).collect()[0][0]
    assert total == sum(10 * b + i for b in range(3) for i in range(4))


def test_finish_pending_fold_replays_from_commit_marker(spark, tmp_path):
    """Crash simulation: the fold was staged and COMMITTED (marker
    written) but the process died before the overwrite — recovery must
    complete overwrite + stale deletes + cleanup from the staged files
    alone, landing on exactly the state durable_fold would have left."""
    from nifi_hive_schema_generator_bundle_spark.streaming._store import (
        _write_marker,
        finish_pending_fold,
        read_fold_marker,
    )

    store = str(tmp_path / "store")
    _mk_store(spark, store)
    tmp = store + _TMP_SUFFIX
    folded = (
        spark.read.parquet(store)
        .filter(F.col("batch_id") < 2)
        .groupBy("k")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("batch_id", F.lit(1))
    )
    folded.write.mode("overwrite").parquet(tmp)
    _write_marker(
        spark,
        store,
        {"staged": tmp, "partition_col": "batch_id", "stale_ids": [0]},
    )
    assert finish_pending_fold(spark, store) is True
    assert read_fold_marker(spark, store) is None
    assert not os.path.exists(tmp)
    assert not os.path.exists(os.path.join(store, "batch_id=0"))
    got = {
        (r.k, r.batch_id): r.cnt for r in spark.read.parquet(store).collect()
    }
    expect = {(f"k{i}", 1): i + (10 + i) for i in range(4)}
    expect.update({(f"k{i}", 2): 20 + i for i in range(4)})
    assert got == expect
    # idempotent: a second call is a no-op
    assert finish_pending_fold(spark, store) is False


def test_reader_heals_overwrite_before_delete_crash(spark, tmp_path):
    """THE round-6 ADVICE window: crash after the fold_to overwrite but
    before the stale deletes. The stale pre-cut partitions then hold
    redundant copies of every folded count — any readout that binds the
    listing raw double-counts. _read_store must complete the pending
    fold first and return exactly the true totals."""
    from nifi_hive_schema_generator_bundle_spark.streaming._store import (
        _write_marker,
    )
    from nifi_hive_schema_generator_bundle_spark.streaming.cms_stream import (
        _read_store,
    )

    store = str(tmp_path / "store")
    _mk_store(spark, store)
    tmp = store + _TMP_SUFFIX
    folded = (
        spark.read.parquet(store)
        .filter(F.col("batch_id") < 2)
        .groupBy("k")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("batch_id", F.lit(1))
    )
    folded.write.mode("overwrite").parquet(tmp)
    staged = spark.read.parquet(tmp)
    _write_marker(
        spark,
        store,
        {"staged": tmp, "partition_col": "batch_id", "stale_ids": [0]},
    )
    overwrite_partitions(staged, store, ["batch_id"], fmt="parquet")
    # crash here: batch_id=0 still present AND folded into batch_id=1 —
    # a raw read would double-count batch 0's 0+1+2+3 = 6
    true_total = sum(10 * b + i for b in range(3) for i in range(4))
    healed = _read_store(spark, store)
    assert healed.agg(F.sum("cnt")).collect()[0][0] == true_total
    assert not os.path.exists(os.path.join(store, "batch_id=0"))


def test_fs_delete_uses_hadoop_api_scheme_paths(spark, tmp_path):
    """Cleanup goes through the Hadoop FS API: a scheme-qualified
    ('file:/...') store_dir — which shutil.rmtree cannot even address —
    folds, deletes its stale partitions, and cleans its temp dir."""
    from nifi_hive_schema_generator_bundle_spark.streaming._store import (
        fs_delete,
    )

    d = tmp_path / "doomed"
    d.mkdir()
    (d / "f.txt").write_text("x")
    assert fs_delete(spark, "file:" + str(d)) is True
    assert not d.exists()
    assert fs_delete(spark, "file:" + str(d)) is False  # already gone

    store = "file:" + str(tmp_path / "store")
    _mk_store(spark, store)
    folded = (
        spark.read.parquet(store)
        .filter(F.col("batch_id") < 2)
        .groupBy("k")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("batch_id", F.lit(1))
    )
    assert durable_fold(folded, store, stale_ids=[0]) == 4
    local = str(tmp_path / "store")
    assert not os.path.exists(local + _TMP_SUFFIX)
    assert not os.path.exists(os.path.join(local, "batch_id=0"))


def test_finish_pending_fold_refuses_missing_staged_dir(spark, tmp_path):
    """Marker present but staged dir gone is out-of-band tampering (the
    protocol removes the marker first) — recovery must refuse loudly
    rather than guess which partitions are authoritative."""
    from nifi_hive_schema_generator_bundle_spark.streaming._store import (
        _write_marker,
        finish_pending_fold,
    )

    store = str(tmp_path / "store")
    _mk_store(spark, store)
    _write_marker(
        spark,
        store,
        {
            "staged": str(tmp_path / "gone"),
            "partition_col": "batch_id",
            "stale_ids": [0],
        },
    )
    with pytest.raises(RuntimeError, match="missing"):
        finish_pending_fold(spark, store)


def test_heal_converges_from_partial_delete_crash(spark, tmp_path):
    """The last un-simulated crash state: marker present, overwrite
    done, SOME stale partitions already deleted. Heal must finish the
    remaining deletes idempotently and land on the durable_fold end
    state."""
    from nifi_hive_schema_generator_bundle_spark.streaming._store import (
        _write_marker,
        finish_pending_fold,
        read_fold_marker,
    )

    store = str(tmp_path / "store")
    _mk_store(spark, store, n_batches=4)
    tmp = store + _TMP_SUFFIX
    folded = (
        spark.read.parquet(store)
        .filter(F.col("batch_id") < 3)
        .groupBy("k")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("batch_id", F.lit(2))
    )
    folded.write.mode("overwrite").parquet(tmp)
    staged = spark.read.parquet(tmp)
    _write_marker(
        spark,
        store,
        {"staged": tmp, "partition_col": "batch_id", "stale_ids": [0, 1]},
    )
    overwrite_partitions(staged, store, ["batch_id"], fmt="parquet")
    import shutil as _sh

    _sh.rmtree(os.path.join(store, "batch_id=0"))  # crash mid-deletes
    assert finish_pending_fold(spark, store) is True
    assert read_fold_marker(spark, store) is None
    assert not os.path.exists(os.path.join(store, "batch_id=1"))
    total = spark.read.parquet(store).agg(F.sum("cnt")).collect()[0][0]
    assert total == sum(10 * b + i for b in range(4) for i in range(4))


def _staged_crash_state(spark, store, tmp_path, *, after_overwrite):
    """Build the canonical mid-fold crash state: fold of batches 0-1
    into batch 1 staged + marker committed (optionally overwrite also
    done), stale batch 0 NOT yet deleted."""
    from nifi_hive_schema_generator_bundle_spark.streaming._store import (
        _write_marker,
    )

    _mk_store(spark, store)
    tmp = store + _TMP_SUFFIX
    folded = (
        spark.read.parquet(store)
        .filter(F.col("batch_id") < 2)
        .groupBy("k")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("batch_id", F.lit(1))
    )
    folded.write.mode("overwrite").parquet(tmp)
    _write_marker(
        spark,
        store,
        {"staged": tmp, "partition_col": "batch_id", "stale_ids": [0]},
    )
    if after_overwrite:
        staged = spark.read.parquet(tmp)
        overwrite_partitions(staged, store, ["batch_id"], fmt="parquet")
    return tmp


def test_crashed_claimed_marker_is_reclaimed_and_replayed(spark, tmp_path):
    """Exclusive healing (ADVICE r7): a healer that died AFTER claiming
    the marker (rename to _fold_commit.claimed.<token>.json) but before
    finishing leaves the claim behind; the next healer must claim THAT
    marker and finish the fold — the replay is idempotent."""
    from nifi_hive_schema_generator_bundle_spark.streaming._store import (
        _CLAIM_PREFIX,
        finish_pending_fold,
        read_fold_marker,
    )

    store = str(tmp_path / "store")
    tmp = _staged_crash_state(spark, store, tmp_path, after_overwrite=True)
    # simulate the crashed healer's claim
    marker = os.path.join(store, "_fold_commit.json")
    claimed = os.path.join(store, _CLAIM_PREFIX + "deadbeef.json")
    os.rename(marker, claimed)
    assert read_fold_marker(spark, store) is not None  # still pending
    assert finish_pending_fold(spark, store) is True
    assert read_fold_marker(spark, store) is None
    assert not os.path.exists(claimed)
    assert not os.path.exists(tmp)
    assert not os.path.exists(os.path.join(store, "batch_id=0"))
    total = spark.read.parquet(store).agg(F.sum("cnt")).collect()[0][0]
    assert total == sum(10 * b + i for b in range(3) for i in range(4))


def test_read_store_heal_false_never_mutates(spark, tmp_path):
    """The read-only mode (ADVICE r7): with a pending fold in the WORST
    state (overwrite done, stale partition still present — a raw read
    double-counts), read_store(heal=False) must return the exact
    post-fold totals while leaving marker, staged dir, and stale
    partition untouched."""
    from nifi_hive_schema_generator_bundle_spark.streaming._store import (
        read_fold_marker,
        read_store,
    )

    store = str(tmp_path / "store")
    tmp = _staged_crash_state(spark, store, tmp_path, after_overwrite=True)
    true_total = sum(10 * b + i for b in range(3) for i in range(4))
    view = read_store(spark, store, heal=False)
    assert view.agg(F.sum("cnt")).collect()[0][0] == true_total
    # no FS mutation happened
    assert read_fold_marker(spark, store) is not None
    assert os.path.exists(tmp)
    assert os.path.exists(os.path.join(store, "batch_id=0"))
    # pre-overwrite crash state serves the same view (fold not yet
    # applied to the store, staged rows substitute the folded range)
    store2 = str(tmp_path / "store2")
    _staged_crash_state(spark, store2, tmp_path, after_overwrite=False)
    view2 = read_store(spark, store2, heal=False)
    assert view2.agg(F.sum("cnt")).collect()[0][0] == true_total
    # and with no marker at all it is a plain read
    store3 = str(tmp_path / "store3")
    _mk_store(spark, store3)
    assert (
        read_store(spark, store3, heal=False)
        .agg(F.sum("cnt"))
        .collect()[0][0]
        == true_total
    )


def test_torn_marker_claim_is_dropped_not_replayed(spark, tmp_path):
    """A torn (unparseable) marker reads as 'no marker' — the claim
    protocol must drop it rather than replay garbage, and report no
    fold completed."""
    from nifi_hive_schema_generator_bundle_spark.streaming._store import (
        finish_pending_fold,
        read_fold_marker,
    )

    store = str(tmp_path / "store")
    _mk_store(spark, store)
    with open(os.path.join(store, "_fold_commit.json"), "w") as f:
        f.write('{"staged": "/x", "truncat')  # torn S3A-style write
    assert read_fold_marker(spark, store) is None
    assert finish_pending_fold(spark, store) is False
    assert not os.path.exists(os.path.join(store, "_fold_commit.json"))
    total = spark.read.parquet(store).agg(F.sum("cnt")).collect()[0][0]
    assert total == sum(10 * b + i for b in range(3) for i in range(4))


def test_store_batch_ids_listing_and_fallback(spark, tmp_path):
    """Batch-id discovery is ONE partition-directory LIST on hive-layout
    stores (VERDICT r7 #8) and falls back to the authoritative distinct
    scan on non-hive layouts; non-data files are ignored."""
    from nifi_hive_schema_generator_bundle_spark.streaming._store import (
        store_batch_ids,
        store_batch_ids_or_scan,
    )

    store = str(tmp_path / "store")
    _mk_store(spark, store, n_batches=3)
    with open(os.path.join(store, "_store_config.json"), "w") as f:
        f.write("{}")
    assert store_batch_ids(spark, store) == [0, 1, 2]
    assert store_batch_ids_or_scan(spark, store) == [0, 1, 2]
    # missing store: listing says None, or_scan says []
    gone = str(tmp_path / "missing")
    assert store_batch_ids(spark, gone) is None
    assert store_batch_ids_or_scan(spark, gone) == []
    # non-hive layout (flat files with a batch_id COLUMN): listing
    # refuses, or_scan answers from the data
    flat = str(tmp_path / "flat")
    spark.createDataFrame(
        [(1, 7), (2, 9)], "x int, batch_id int"
    ).write.parquet(flat)
    assert store_batch_ids(spark, flat) is None
    assert store_batch_ids_or_scan(spark, flat) == [7, 9]
