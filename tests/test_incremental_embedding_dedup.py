"""Incremental cross-run EMBEDDING near-dedup: history-store semantics,
replay idempotency, exact-cosine verification, compaction invariance,
and the streaming wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.streaming.incremental_embedding_dedup import (
    compact_embedding_dedup_store,
    embedding_dedup_batch_against_store,
    run_incremental_embedding_dedup,
)

DIM = 16
BASE = [1.0] + [0.0] * (DIM - 1)
NEAR = [0.98, 0.199] + [0.0] * (DIM - 2)  # cos ~0.98 with BASE
ORTHO = [0.0, 0.0, 1.0] + [0.0] * (DIM - 3)
NEAR_ORTHO = [0.0, 0.199, 0.98] + [0.0] * (DIM - 3)  # cos ~0.98 w/ ORTHO


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_cross_batch_embedding_dups_dropped(spark, tmp_path):
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    n0 = embedding_dedup_batch_against_store(
        _batch(spark, [(1, BASE), (2, NEAR), (3, ORTHO)]),
        0, store_dir=store, out_dir=out, threshold=0.9, dim=DIM,
    )
    assert n0 == 2  # 2 is a within-batch near-dup of 1
    n1 = embedding_dedup_batch_against_store(
        _batch(spark, [(4, NEAR_ORTHO), (5, [0.25] * DIM)]),
        1, store_dir=store, out_dir=out, threshold=0.9, dim=DIM,
    )
    assert n1 == 1  # 4 matches history vector 3 on exact cosine
    kept = {r.vec_id for r in spark.read.parquet(out).collect()}
    assert kept == {1, 3, 5}


def test_replay_converges_and_guard_raises(spark, tmp_path):
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    rows = [(1, BASE), (2, ORTHO)]
    embedding_dedup_batch_against_store(
        _batch(spark, rows), 0, store_dir=store, out_dir=out, dim=DIM
    )
    n = embedding_dedup_batch_against_store(
        _batch(spark, rows), 0, store_dir=store, out_dir=out, dim=DIM
    )
    assert n == 2  # replay never collides with its own stored rows
    assert spark.read.parquet(f"{store}/vecs").count() == 2
    with pytest.raises(ValueError, match="behind the store"):
        embedding_dedup_batch_against_store(
            _batch(spark, [(9, BASE)]),
            -1, store_dir=store, out_dir=out, dim=DIM,
        )


def test_compaction_invisible_to_dedup_decisions(spark, tmp_path):
    import os

    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    for b, vec in enumerate([BASE, ORTHO, [0.25] * DIM]):
        embedding_dedup_batch_against_store(
            _batch(spark, [(b * 10, vec)]),
            b, store_dir=store, out_dir=out, dim=DIM,
        )
    n_bands, n_vecs = compact_embedding_dedup_store(spark, store)
    assert n_vecs == 2 and n_bands > 0
    for sub in ("bands", "vecs"):
        parts = sorted(
            d for d in os.listdir(f"{store}/{sub}")
            if d.startswith("batch_id=")
        )
        assert parts == ["batch_id=1", "batch_id=2"]
    # a near-dup of a FOLDED history vector is still caught
    n3 = embedding_dedup_batch_against_store(
        _batch(spark, [(40, NEAR), (41, [-1.0] + [0.0] * (DIM - 1))]),
        3, store_dir=store, out_dir=out, threshold=0.9, dim=DIM,
    )
    assert n3 == 1
    kept = sorted(r.vec_id for r in spark.read.parquet(out).collect())
    assert kept == [0, 10, 20, 41]
    assert compact_embedding_dedup_store(spark, str(tmp_path / "none")) == (0, 0)


def test_streaming_wiring_two_drains(spark, tmp_path):
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _batch(spark, [(1, BASE), (2, ORTHO)]).write.parquet(src)
    schema = "vec_id long, embedding array<double>"
    q = run_incremental_embedding_dedup(
        spark.readStream.schema(schema).parquet(src),
        store_dir=store, out_dir=out, checkpoint_dir=ckpt, threshold=0.9,
    )
    q.awaitTermination(120)
    _batch(spark, [(3, NEAR), (4, [0.25] * DIM)]).write.mode(
        "append"
    ).parquet(src)
    q2 = run_incremental_embedding_dedup(
        spark.readStream.schema(schema).parquet(src),
        store_dir=store, out_dir=out, checkpoint_dir=ckpt, threshold=0.9,
    )
    q2.awaitTermination(120)
    kept = sorted(r.vec_id for r in spark.read.parquet(out).collect())
    assert kept == [1, 2, 4]  # 3 is a cross-drain near-dup of 1


def test_banding_config_pinned_per_store(spark, tmp_path):
    """VERDICT r7 #3: changed banding params against an existing store
    would not fail — history keys would just never collide again and
    matching would silently return nothing. The store records its
    geometry on first use and refuses mismatched params loudly."""
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    embedding_dedup_batch_against_store(
        _batch(spark, [(1, BASE)]), 0,
        store_dir=store, out_dir=out, dim=DIM,
        n_planes=32, band_bits=16,
    )
    with pytest.raises(ValueError, match="fixed for the life"):
        embedding_dedup_batch_against_store(
            _batch(spark, [(2, ORTHO)]), 1,
            store_dir=store, out_dir=out, dim=DIM,
            n_planes=8, band_bits=4,
        )
    # original geometry still accepted
    n = embedding_dedup_batch_against_store(
        _batch(spark, [(2, ORTHO)]), 1,
        store_dir=store, out_dir=out, dim=DIM,
        n_planes=32, band_bits=16,
    )
    assert n == 1


def test_history_lookup_stats_readout(spark, tmp_path):
    """The per-batch banding-health readout (VERDICT r7 #3): candidates
    per kept id, zero-candidate starvation, and hot-bucket drops are
    reported instead of letting undersized banding degrade silently."""
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    first: dict = {}
    embedding_dedup_batch_against_store(
        _batch(spark, [(1, BASE), (2, ORTHO)]), 0,
        store_dir=store, out_dir=out, threshold=0.9, dim=DIM,
        stats=first,
    )
    assert first["n_kept_batch"] == 2 and first["n_candidates"] == 0
    stats: dict = {}
    n = embedding_dedup_batch_against_store(
        _batch(spark, [(3, NEAR), (4, [0.0] * (DIM - 1) + [1.0])]), 1,
        store_dir=store, out_dir=out, threshold=0.9, dim=DIM,
        stats=stats,
    )
    assert n == 1  # 3 matches history BASE; 4 survives
    assert stats["n_kept_batch"] == 2
    assert stats["n_dup_vs_history"] == 1
    assert stats["n_candidates"] >= 1
    # vector 4 is orthogonal to all history: with only 2 history rows
    # it may still band-collide or not; the invariants are structural
    assert stats["starved_ids"] + (stats["n_candidates"] > 0) >= 1
    assert 0 <= stats["starved_ppm"] <= 1_000_000
    assert stats["hot_buckets_dropped"] == 0
    # a max_bucket of 0 drops EVERY occupied history bucket: full
    # starvation must be visible, and nothing matches history
    choked: dict = {}
    n2 = embedding_dedup_batch_against_store(
        _batch(spark, [(5, BASE)]), 2,
        store_dir=store, out_dir=out, threshold=0.9, dim=DIM,
        max_bucket=0, stats=choked,
    )
    assert n2 == 1  # duplicate of history BASE slips through...
    assert choked["hot_buckets_dropped"] > 0  # ...but NOT silently
    assert choked["starved_ppm"] == 1_000_000
    assert choked["n_candidates"] == 0
