"""Property-based checks for the stdlib codecs and sequence packing —
pure Python (no Spark session), so hypothesis can run many examples
cheaply.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from nifi_hive_schema_generator_bundle_spark.operators.wav_codec import (
    clip_fn,
    resample,
    wav_decode,
    wav_encode,
    wav_info,
)

finite_samples = st.lists(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
    min_size=1,
    max_size=400,
)


@settings(max_examples=60, deadline=None)
@given(finite_samples, st.sampled_from([8000, 16000, 44100]),
       st.sampled_from([8, 16]))
def test_wav_roundtrip_within_quantization(samples, rate, bits):
    wav = wav_encode(samples, rate, 1, bits)
    r, ch, out = wav_decode(wav)
    assert (r, ch, len(out)) == (rate, 1, len(samples))
    tol = 1 / 64 if bits == 8 else 1 / 15000
    assert all(abs(a - b) <= tol for a, b in zip(samples, out))
    # header agrees with payload
    n_ch, r2, b2, n_frames, dur_ms = wav_info(wav)
    assert (n_ch, r2, b2, n_frames) == (1, rate, bits, len(samples))
    assert dur_ms == len(samples) * 1000 // rate


@settings(max_examples=30, deadline=None)
@given(finite_samples, st.integers(min_value=2, max_value=5))
def test_wav_clips_are_decodable_and_sized(samples, n):
    wav = wav_encode(samples, 8000, 1, 16)
    clip_frames = max(1, len(samples) // 2)
    for c in clip_fn(clip_frames=clip_frames)(wav, n):
        # shorter inputs yield truncated (but valid) clips
        assert wav_info(c)[3] == min(clip_frames, len(samples))


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=1, max_value=200),
       st.sampled_from([4000, 8000, 16000]),
       st.sampled_from([4000, 8000, 16000]))
def test_wav_resample_frame_count(n_frames, src_rate, dst_rate):
    wav = wav_encode(
        [math.sin(i * 0.1) for i in range(n_frames)], src_rate, 1, 16
    )
    out = resample(wav, dst_rate)
    _, rate, _, frames, _ = wav_info(out)
    assert rate == dst_rate
    assert frames == max(1, n_frames * dst_rate // src_rate)
