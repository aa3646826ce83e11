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


# ---------------------------------------------------------------------------
# perceptual hashing + image near-dup
# ---------------------------------------------------------------------------

def _grad_png(seed: int, w: int = 24, h: int = 16) -> bytes:
    from nifi_hive_schema_generator_bundle_spark.operators.png_codec import (
        png_encode,
    )

    px = bytes(
        ((x * seed + y * 3) % 256) for y in range(h) for x in range(w) for _ in range(3)
    )
    return png_encode(px, w, h, 3)


def test_average_hash_invariances():
    from nifi_hive_schema_generator_bundle_spark.operators.png_codec import (
        average_hash,
        png_encode,
        resize,
    )

    base = _grad_png(10)
    a = average_hash(base)
    # re-encode identical pixels -> identical hash
    assert average_hash(_grad_png(10)) == a
    # integer-factor nearest-neighbor upscale preserves block means
    assert average_hash(resize(base, 48, 32)) == a
    # brightness inversion flips all 64 bits
    inv_px = bytes(
        (255 - ((x * 10 + y * 3) % 256)) for y in range(16) for x in range(24)
        for _ in range(3)
    )
    ih = average_hash(png_encode(inv_px, 24, 16, 3))
    ham = bin(ih[0] ^ a[0]).count("1") + bin(ih[1] ^ a[1]).count("1")
    assert ham == 64
    # halves fit 32 bits
    assert 0 <= a[0] < 2**32 and 0 <= a[1] < 2**32


def test_average_hash_rejects_bad_size():
    import pytest

    from nifi_hive_schema_generator_bundle_spark.operators.png_codec import (
        average_hash,
    )

    with pytest.raises(ValueError):
        average_hash(_grad_png(5), hash_size=0)
    with pytest.raises(ValueError):
        average_hash(_grad_png(5), hash_size=9)


def test_image_near_dup_planted(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.multimodal import (
        image_near_dup,
    )
    from nifi_hive_schema_generator_bundle_spark.operators.png_codec import (
        png_encode,
        resize,
    )

    base = _grad_png(10)
    inv_px = bytes(
        (255 - ((x * 10 + y * 3) % 256)) for y in range(16) for x in range(24)
        for _ in range(3)
    )
    rows = [
        (1, bytearray(base)),
        (2, bytearray(resize(base, 48, 32))),          # visual copy
        (3, bytearray(png_encode(inv_px, 24, 16, 3))),  # inverted: far away
        (4, None),                                      # NULL payload
        (5, bytearray(b"not a png")),                   # undecodable
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {(r.id_a, r.id_b): r.hamming for r in image_near_dup(df).collect()}
    assert pairs == {(1, 2): 0}  # copy found; inverse/null/garbage excluded


class TestPngDimensionsGate:
    def _png(self, w, h):
        from nifi_hive_schema_generator_bundle_spark.operators.png_codec import (
            png_encode,
        )

        px = bytes(bytearray((w * h * 3) % 256 for _ in range(1))) * 0
        raw = bytes(bytearray(range(256)) * ((w * h * 3) // 256 + 1))[: w * h * 3]
        return png_encode(raw, w, h, 3)

    def test_jvm_parse_matches_encoded_sizes(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.multimodal import (
            png_dimensions,
        )
        from pyspark.sql import functions as F

        rows = [
            (1, self._png(16, 12)),
            (2, self._png(300, 200)),
            (3, b"not a png at all........."),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "media_id int, payload binary")
        out = {
            r.media_id: r
            for r in df.select(
                "media_id", png_dimensions("payload").alias("d")
            ).collect()
        }
        assert (out[1].d.width, out[1].d.height) == (16, 12)
        assert (out[2].d.width, out[2].d.height) == (300, 200)
        assert out[3].d is None and out[4].d is None

    def test_min_resolution_gate_and_plan(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.multimodal import (
            filter_min_resolution,
        )

        rows = [
            (1, self._png(16, 12)),
            (2, self._png(64, 64)),
            (3, b"garbage"),
        ]
        df = spark.createDataFrame(rows, "media_id int, payload binary")
        kept = filter_min_resolution(df, min_width=32, min_height=32)
        assert [r.media_id for r in kept.collect()] == [2]
        flagged = filter_min_resolution(
            df, min_width=32, min_height=32, action="flag"
        )
        got = {r.media_id: r.keep for r in flagged.collect()}
        assert got == {1: False, 2: True, 3: False}
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan and "BatchEval" not in plan
        import pytest as _pytest

        with _pytest.raises(ValueError):
            filter_min_resolution(df, action="nope")


class TestWavDurationGate:
    def _wav(self, n_samples, rate=8000):
        import math

        from nifi_hive_schema_generator_bundle_spark.operators.wav_codec import (
            wav_encode,
        )

        return wav_encode(
            [math.sin(i / 10.0) for i in range(n_samples)], rate
        )

    def test_jvm_parse_matches_encoder(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.multimodal import (
            wav_duration,
        )

        rows = [
            (1, self._wav(8000)),           # exactly 1000 ms @ 8 kHz
            (2, self._wav(4000, 16000)),    # 250 ms @ 16 kHz
            (3, b"RIFFgarbage............................."),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "media_id int, payload binary")
        out = {
            r.media_id: r.d
            for r in df.select(
                "media_id", wav_duration("payload").alias("d")
            ).collect()
        }
        assert (out[1].sample_rate, out[1].duration_ms) == (8000, 1000)
        assert (out[2].sample_rate, out[2].duration_ms) == (16000, 250)
        assert out[3] is None and out[4] is None

    def test_duration_gate_and_plan(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.multimodal import (
            filter_audio_duration,
        )

        rows = [
            (1, self._wav(800)),    # 100 ms
            (2, self._wav(8000)),   # 1000 ms
            (3, self._wav(24000)),  # 3000 ms
            (4, b"noise"),
        ]
        df = spark.createDataFrame(rows, "media_id int, payload binary")
        kept = filter_audio_duration(df, min_ms=500, max_ms=2000)
        assert [r.media_id for r in kept.collect()] == [2]
        flagged = filter_audio_duration(
            df, min_ms=500, max_ms=2000, action="flag"
        )
        got = {r.media_id: r.keep for r in flagged.collect()}
        assert got == {1: False, 2: True, 3: False, 4: False}
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan and "BatchEval" not in plan
