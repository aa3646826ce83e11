"""Real-codec tests: the stdlib WAV decoder/encoder, standalone and wired
through the multimodal operators' hooks on actual audio bytes.

The fixture WAV is constructed by hand (struct straight from the RIFF
spec), NOT with the module's own encoder, so decode is tested against an
independent byte source — same strategy as test_png_codec.
"""

from __future__ import annotations

import math
import struct

import pytest

from nifi_hive_schema_generator_bundle_spark.operators.multimodal import (
    decode_features,
    frame_sample,
)
from nifi_hive_schema_generator_bundle_spark.operators.wav_codec import (
    clip_fn,
    feature_fn,
    resample,
    wav_decode,
    wav_encode,
    wav_info,
)


def _handmade_wav(
    frames: list[tuple[int, ...]], rate: int = 8000, bits: int = 16
) -> bytes:
    """RIFF/WAVE bytes assembled by hand from raw integer PCM frames."""
    n_ch = len(frames[0]) if frames else 1
    if bits == 16:
        data = b"".join(struct.pack(f"<{n_ch}h", *f) for f in frames)
    else:
        data = b"".join(bytes(f) for f in frames)
    frame_bytes = n_ch * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * frame_bytes, frame_bytes, bits)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _sine_wav(n_frames: int = 800, rate: int = 8000, freq: float = 440.0) -> bytes:
    return wav_encode(
        [math.sin(2 * math.pi * freq * i / rate) for i in range(n_frames)], rate
    )


def test_decode_handmade_16bit_stereo():
    wav = _handmade_wav([(0, 16384), (-16384, 32767), (-32768, 0)])
    n_ch, rate, bits, n_frames, dur = wav_info(wav)
    assert (n_ch, rate, bits, n_frames) == (2, 8000, 16, 3)
    assert dur == 3 * 1000 // 8000
    r, ch, samples = wav_decode(wav)
    assert (r, ch) == (8000, 2)
    expect = [0.0, 0.5, -0.5, 32767 / 32768, -1.0, 0.0]
    assert samples == pytest.approx(expect, abs=1e-4)


def test_decode_handmade_8bit_mono():
    wav = _handmade_wav([(128,), (255,), (0,)], bits=8)
    n_ch, rate, bits, n_frames, _ = wav_info(wav)
    assert (n_ch, bits, n_frames) == (1, 8, 3)
    _, _, samples = wav_decode(wav)
    assert samples == pytest.approx([0.0, 127 / 128, -1.0], abs=1e-4)


@pytest.mark.parametrize("n_ch,bits", [(1, 16), (2, 16), (1, 8), (3, 16)])
def test_roundtrip_encoder(n_ch, bits):
    vals = [math.sin(i * 0.37) * 0.9 for i in range(60 * n_ch)]
    wav = wav_encode(vals, 16000, n_ch, bits)
    rate, ch, out = wav_decode(wav)
    assert (rate, ch) == (16000, n_ch)
    # scale mismatch (127/128, 32767/32768) + rounding = ~1 LSB
    tol = 1 / 64 if bits == 8 else 1 / 15000
    assert out == pytest.approx(vals, abs=tol)


def test_odd_data_length_pad_byte_parses():
    # 3 frames of 8-bit mono = odd data chunk; encoder must pad, parser
    # must word-align past it (spec: chunks are 2-byte aligned)
    wav = wav_encode([0.0, 0.5, -0.5], 8000, 1, 8)
    assert len(wav) % 2 == 0
    assert wav_info(wav)[3] == 3


def test_unsupported_shapes_raise():
    with pytest.raises(ValueError):
        wav_info(b"RIFFxxxxJUNK")
    # mu-law format tag (7)
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 2) + b"\x00\x00"
    )
    with pytest.raises(NotImplementedError):
        wav_info(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_resample_halves_frames():
    wav = _sine_wav(n_frames=800, rate=8000)
    out = resample(wav, 4000)
    n_ch, rate, bits, n_frames, _ = wav_info(out)
    assert (n_ch, rate, bits, n_frames) == (1, 4000, 16, 400)
    # frame i of output == frame 2i of input (nearest-neighbor)
    _, _, src = wav_decode(wav)
    _, _, dst = wav_decode(out)
    assert dst[:5] == pytest.approx([src[2 * i] for i in range(5)], abs=1e-3)


def test_clip_fn_produces_valid_wavs():
    wav = _sine_wav(n_frames=1600)
    clips = clip_fn(clip_frames=200)(wav, 4)
    assert len(clips) == 4
    for c in clips:
        n_ch, rate, bits, n_frames, _ = wav_info(c)
        assert (n_ch, rate, bits, n_frames) == (1, 8000, 16, 200)
    # first clip starts at frame 0, last starts at n_frames - clip_frames
    _, _, src = wav_decode(wav)
    assert wav_decode(clips[0])[2] == pytest.approx(src[:200], abs=1e-4)
    assert wav_decode(clips[-1])[2] == pytest.approx(src[1400:1600], abs=1e-4)


def test_feature_fn_loudness_envelope():
    # first half silence, second half full-scale square → envelope
    # features split cleanly near 0 and near 1
    samples = [0.0] * 400 + [1.0 if i % 2 else -1.0 for i in range(400)]
    feats = feature_fn(8)(wav_encode(samples, 8000))
    assert len(feats) == 8
    assert all(f < 0.01 for f in feats[:4])
    assert all(f > 0.9 for f in feats[4:])


def test_decode_features_on_real_wav(spark):
    rows = [(1, _sine_wav(freq=220.0)), (2, _sine_wav(freq=880.0)), (3, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = decode_features(df, dim=8, decode_fn=feature_fn(8)).collect()
    got = {r.media_id: r.features for r in out}
    assert got[3] is None
    assert len(got[1]) == 8
    # mean |sin| = 2/pi regardless of frequency; envelope should sit there
    for f in got[1] + got[2]:
        assert f == pytest.approx(2 / math.pi, abs=0.1)


def test_frame_sample_with_audio_clips(spark):
    df = spark.createDataFrame(
        [(7, _sine_wav(n_frames=1600))], "media_id long, payload binary"
    )
    out = frame_sample(df, n_frames=3, extract_fn=clip_fn(clip_frames=160)).collect()
    assert [r.frame_idx for r in out] == [0, 1, 2]
    for r in out:
        assert wav_info(bytes(r.frame))[3] == 160


# ---------------------------------------------------------------------------
# audio_hash + audio near-dup
# ---------------------------------------------------------------------------

def _envelope_ints(seed: int, n: int = 650) -> list[int]:
    """Even int16 samples with a strongly varying loudness envelope."""
    return [
        round(
            32000
            * math.sin(0.07 * seed * t)
            * (0.2 + 0.8 * abs(math.sin(0.003 * (seed + 5) * t)))
        )
        & ~1
        for t in range(n)
    ]


def _wav_from_ints(ints: list[int]) -> bytes:
    return wav_encode([v / 32767.0 for v in ints], 8000, 1, 16)


def test_int_domain_roundtrip_exact():
    # the v/32767.0 -> encode(round(x*32767)) path must round-trip every
    # int16 value exactly, or the gain-exactness argument collapses
    ints = list(range(-32767, 32768, 97)) + [32767, -32767, 0]
    _, _, samples = wav_decode(_wav_from_ints(ints))
    assert samples == [v / 32768.0 for v in ints]


def test_audio_hash_gain_invariance_and_shape():
    from nifi_hive_schema_generator_bundle_spark.operators.wav_codec import (
        audio_hash,
    )

    ints = _envelope_ints(9)
    a = audio_hash(_wav_from_ints(ints))
    assert 0 <= a[0] < 2**32 and 0 <= a[1] < 2**32
    # exact half volume in the int domain -> identical hash, guaranteed
    assert audio_hash(_wav_from_ints([v // 2 for v in ints])) == a
    # quarter volume too
    assert audio_hash(_wav_from_ints([v // 4 for v in ints])) == a
    # a different envelope seed lands far away
    b = audio_hash(_wav_from_ints(_envelope_ints(83)))
    ham = bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")
    assert ham > 10
    # silence: no window louder than the previous -> all-zero bits
    assert audio_hash(_wav_from_ints([0] * 650)) == (0, 0)


def test_audio_hash_rejects_empty():
    from nifi_hive_schema_generator_bundle_spark.operators.wav_codec import (
        audio_hash,
    )

    with pytest.raises(ValueError):
        audio_hash(_wav_from_ints([]))


def test_audio_near_dup_planted(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.multimodal import (
        audio_near_dup,
    )

    ints = _envelope_ints(12)
    rows = [
        (1, bytearray(_wav_from_ints(ints))),
        (2, bytearray(_wav_from_ints([v // 2 for v in ints]))),  # half gain
        (3, bytearray(_wav_from_ints(_envelope_ints(77)))),      # different
        (4, None),                                               # NULL
        (5, bytearray(b"RIFFgarbage")),                          # undecodable
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {(r.id_a, r.id_b): r.hamming for r in audio_near_dup(df).collect()}
    assert pairs == {(1, 2): 0}


def test_direct_packed_wav_matches_encoder():
    """The media_audio_near_dup synth packs RIFF bytes directly (numpy
    int16 + struct header) to keep scaffolding cost out of the decode
    measurement — pin that recipe byte-identical to wav_encode."""
    ints = _envelope_ints(21, n=130)
    via_encoder = _wav_from_ints(ints)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = b"".join(struct.pack("<h", v) for v in ints)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    direct = b"RIFF" + struct.pack("<I", len(body)) + body
    assert direct == via_encoder
