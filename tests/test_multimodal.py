"""Multimodal plumbing tests: binary columns, metadata, Arrow UDF paths.
The decode step is the documented deterministic stub — these tests pin the
distributed plumbing (schema, batching, explode shape), not codec output."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.operators.multimodal import (
    attach_media_metadata,
    decode_features,
    frame_sample,
    repartition_by_bytes,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x89PNG" + b"a" * 100),
        (2, b"RIFF" + b"b" * 2000),
        (3, None),
        (4, b""),
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_metadata_struct(spark, media):
    got = {r.media_id: r.meta for r in attach_media_metadata(media, mime="image/png").collect()}
    assert got[1].n_bytes == 104
    assert got[1].mime == "image/png"
    assert got[1].sha256 == hashlib.sha256(b"\x89PNG" + b"a" * 100).hexdigest()
    assert got[3].n_bytes is None
    assert got[4].n_bytes == 0


def test_decode_features_deterministic(spark, media):
    f1 = {r.media_id: r.features for r in decode_features(media, dim=16).collect()}
    f2 = {r.media_id: r.features for r in decode_features(media, dim=16).collect()}
    assert f1 == f2                      # deterministic across runs
    assert len(f1[1]) == 16
    assert all(0.0 <= v <= 1.0 for v in f1[1])
    assert f1[3] is None                 # NULL payload → NULL features
    assert f1[1] != f1[2]


def test_decode_features_pluggable(spark, media):
    got = {
        r.media_id: r.features
        for r in decode_features(
            media, dim=2, decode_fn=lambda b: [float(len(b)), 1.0]
        ).collect()
    }
    assert got[1] == [104.0, 1.0]
    assert got[4] == [0.0, 1.0]


def test_frame_sample_shape(spark, media):
    rows = frame_sample(media, n_frames=4, frame_bytes=8).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert 3 not in by_id                 # NULL payload skipped
    assert [r.frame_idx for r in sorted(by_id[1], key=lambda r: r.frame_idx)] == [0, 1, 2, 3]
    assert all(len(r.frame) == 8 for r in by_id[2])


def test_repartition_by_bytes(spark):
    df = spark.range(100).select(
        F.col("id").alias("media_id"),
        F.expr("cast(repeat('x', 100000) as binary)").alias("payload"),
    )
    out = repartition_by_bytes(df, target_mb=1)
    # ~10 MB of payload at 1 MB target → ~10 partitions
    assert 5 <= out.rdd.getNumPartitions() <= 15


def test_resize_media_stub_contract(spark, sf_smoke_dir):
    from pyspark.sql import functions as F

    from nifi_hive_schema_generator_bundle_spark.operators.multimodal import (
        resize_media,
    )
    from nifi_hive_schema_generator_bundle_spark.plans.queries import load_table

    d = load_table(spark, sf_smoke_dir, "documents").limit(20).select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    out = resize_media(d, width=8, height=4).collect()
    assert len(out) == 20
    # exact size contract: every payload is w*h bytes
    assert all(len(r.payload) == 32 for r in out)
    assert all((r.width, r.height) == (8, 4) for r in out)
    # deterministic: same input -> same resized bytes
    out2 = resize_media(d, width=8, height=4).collect()
    assert {r.media_id: bytes(r.payload) for r in out} == {
        r.media_id: bytes(r.payload) for r in out2
    }


def test_resize_media_custom_fn(spark):
    from pyspark.sql import functions as F

    from nifi_hive_schema_generator_bundle_spark.operators.multimodal import (
        resize_media,
    )

    d = spark.createDataFrame([(1, b"abcdef")], "media_id long, payload binary")
    got = resize_media(
        d, width=2, height=1, resize_fn=lambda p, w, h: p[: w * h]
    ).collect()[0]
    assert bytes(got.payload) == b"ab"
