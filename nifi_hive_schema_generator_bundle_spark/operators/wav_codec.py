"""Stdlib-only WAV (RIFF PCM) codec — the real audio codec behind the
multimodal hooks.

The container ships no audio libraries, so the audio half of the
multimodal brief would otherwise stay stubbed. WAV is simple enough to do
honestly from the public RIFF/WAVE spec with ``struct`` alone: parse the
``fmt `` chunk, slice the ``data`` chunk, decode 8-bit-unsigned /
16-bit-signed-LE PCM to floats, and re-encode. That makes decode /
feature-extract / clip-sample / resample run on REAL audio bytes end to
end (mirror of ``png_codec`` for images).

Scope: uncompressed PCM (format tag 1), 8- or 16-bit, any channel count,
non-extensible headers. Compressed formats (µ-law, ADPCM, float,
WAVE_FORMAT_EXTENSIBLE) raise ``NotImplementedError`` loudly rather than
decoding wrong.

The hooks (``feature_fn``, ``clip_fn``, ``resample``) slot into the
multimodal operators' ``decode_fn`` / ``extract_fn`` parameters unchanged
— the Arrow/mapInPandas plumbing is identical for fake and real codecs by
design.
"""

from __future__ import annotations

import struct

__all__ = [
    "wav_info",
    "wav_decode",
    "wav_encode",
    "resample",
    "clip_fn",
    "feature_fn",
    "audio_hash",
]


def _fmt_and_data(payload: bytes) -> tuple[tuple[int, int, int, int], bytes]:
    """Walk the RIFF chunk list → (fmt fields, data bytes).

    fmt fields = (audio_format, n_channels, sample_rate, bits_per_sample).
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    fmt = None
    data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid, ln = struct.unpack("<4sI", payload[pos : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            if ln < 16:
                raise ValueError("fmt chunk too short")
            audio_format, n_ch, rate, _byte_rate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            fmt = (audio_format, n_ch, rate, bits)
        elif cid == b"data":
            data = body
        # chunks are word-aligned: odd lengths carry a pad byte
        pos += 8 + ln + (ln & 1)
    if fmt is None:
        raise ValueError("WAV has no fmt chunk")
    if data is None:
        raise ValueError("WAV has no data chunk")
    return fmt, data


def wav_info(payload: bytes) -> tuple[int, int, int, int, int]:
    """(n_channels, sample_rate, bits_per_sample, n_frames, duration_ms).

    Header-only parse — does not decode samples; cheap enough to fill the
    ``duration_ms`` metadata column for every row.
    """
    (audio_format, n_ch, rate, bits), data = _fmt_and_data(payload)
    if audio_format != 1:
        raise NotImplementedError(
            f"audio format {audio_format} (only PCM=1 supported)"
        )
    if bits not in (8, 16):
        raise NotImplementedError(f"{bits}-bit samples (only 8/16 supported)")
    if n_ch < 1:
        raise ValueError("WAV declares zero channels")
    frame_bytes = n_ch * (bits // 8)
    n_frames = len(data) // frame_bytes
    duration_ms = n_frames * 1000 // rate if rate else 0
    return n_ch, rate, bits, n_frames, duration_ms


def wav_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """payload → (sample_rate, n_channels, interleaved floats in [-1, 1]).

    8-bit PCM is unsigned (midpoint 128), 16-bit is signed little-endian,
    per the RIFF spec.
    """
    n_ch, rate, bits, n_frames, _ = wav_info(payload)
    _, data = _fmt_and_data(payload)
    n = n_frames * n_ch
    if bits == 8:
        samples = [(b - 128) / 128.0 for b in data[:n]]
    else:
        ints = struct.unpack(f"<{n}h", data[: n * 2])
        samples = [v / 32768.0 for v in ints]
    return rate, n_ch, samples


def wav_encode(
    samples: list[float],
    sample_rate: int,
    n_channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Interleaved floats in [-1, 1] → WAV bytes (PCM, canonical header)."""
    if bits not in (8, 16):
        raise ValueError(f"unsupported bit depth {bits}")
    if n_channels < 1 or len(samples) % n_channels:
        raise ValueError("sample count must be a multiple of n_channels")

    def clamp(v: float) -> float:
        return -1.0 if v < -1.0 else (1.0 if v > 1.0 else v)

    if bits == 8:
        data = bytes(round(clamp(v) * 127) + 128 for v in samples)
    else:
        data = struct.pack(
            f"<{len(samples)}h", *(round(clamp(v) * 32767) for v in samples)
        )
    frame_bytes = n_channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        n_channels,
        sample_rate,
        sample_rate * frame_bytes,
        frame_bytes,
        bits,
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def resample(payload: bytes, target_rate: int) -> bytes:
    """Nearest-neighbor resample: WAV in, WAV at ``target_rate`` out.

    The audio analog of ``png_codec.resize`` — frame i of the output maps
    to frame ``i * src_rate // target_rate`` of the input, channels kept.
    """
    rate, n_ch, samples = wav_decode(payload)
    _, _, bits, n_frames, _ = wav_info(payload)
    out_frames = max(1, n_frames * target_rate // rate) if n_frames else 0
    out: list[float] = []
    for i in range(out_frames):
        src = i * rate // target_rate
        out.extend(samples[src * n_ch : (src + 1) * n_ch])
    return wav_encode(out, target_rate, n_ch, bits)


def clip_fn(clip_frames: int = 1600):
    """Build a ``frame_sample``-compatible extractor: WAV → n evenly
    spaced clips, EACH a standalone valid WAV (header + clip frames) —
    the audio analog of video frame sampling.
    """

    def extract(payload: bytes, n: int) -> list[bytes]:
        rate, n_ch, samples = wav_decode(payload)
        _, _, bits, n_frames, _ = wav_info(payload)
        span = max(0, n_frames - clip_frames)
        clips: list[bytes] = []
        for i in range(n):
            start = span * i // max(1, n - 1) if n > 1 else 0
            seg = samples[start * n_ch : (start + clip_frames) * n_ch]
            clips.append(wav_encode(seg, rate, n_ch, bits))
        return clips

    return extract


def feature_fn(dim: int = 64):
    """Build a ``decode_features``-compatible hook: WAV → ``dim`` floats.

    Mean absolute amplitude pooled into ``dim`` equal time buckets — a
    real (if simple) loudness-envelope signature, deterministic, any
    length/rate/channel count.
    """

    def features(payload: bytes) -> list[float]:
        _rate, _n_ch, samples = wav_decode(payload)
        n = len(samples)
        if n == 0:
            return [0.0] * dim
        out = []
        for b in range(dim):
            lo = b * n // dim
            hi = max(lo + 1, (b + 1) * n // dim)
            seg = samples[lo:hi]
            out.append(sum(abs(v) for v in seg) / len(seg))
        return out

    return features


def audio_hash(payload: bytes) -> tuple[int, int]:
    """64-bit perceptual audio fingerprint of a WAV: loudness envelope
    over 65 equal time windows, bit i = "window i+1 louder than window
    i" — a differential (dHash-style) envelope signature, packed
    little-endian into TWO 32-bit ints ``(lo, hi)``, the
    ``dedup.packed_hamming_pairs`` layout shared with
    ``png_codec.average_hash``.

    The differential form makes the hash EXACTLY invariant to uniform
    volume scaling by any power of two (binary-float multiplication is
    exact, so every strict comparison is preserved — unit-pinned at
    0.5×) and stable under other gains / re-encoding / nearest-neighbor
    resampling up to float-rounding ties on near-equal windows. Time
    reversal reverses + negates the difference chain; silence hashes to
    all-zero bits. Raises ``ValueError`` on empty audio.
    """
    windows = 65
    env = None
    try:  # numpy fast path: same sample values (power-of-two divides
        # are exact); window sums use reduceat, whose accumulation
        # order may differ from the stdlib loop by an ulp on near-tie
        # windows — the comparison semantics are unchanged
        import numpy as np

        n_ch, _rate, bits, n_frames, _ = wav_info(payload)
        _, data = _fmt_and_data(payload)
        n = n_frames * n_ch
        if n >= windows:
            if bits == 8:
                s = (
                    np.frombuffer(data[:n], dtype=np.uint8).astype(np.float64)
                    - 128.0
                ) / 128.0
            else:
                s = (
                    np.frombuffer(data[: n * 2], dtype="<i2").astype(
                        np.float64
                    )
                    / 32768.0
                )
            bounds = np.arange(windows, dtype=np.int64) * n // windows
            sums = np.add.reduceat(np.abs(s), bounds)
            lens = np.diff(np.append(bounds, n))
            env = (sums / lens).tolist()
    except ImportError:
        pass
    if env is None:  # stdlib path (and the overlapping-window n < 65 case)
        _rate, _n_ch, samples = wav_decode(payload)
        n = len(samples)
        if n == 0:
            raise ValueError("empty audio")
        env = []
        for b in range(windows):
            lo_i = b * n // windows
            hi_i = max(lo_i + 1, (b + 1) * n // windows)
            seg = samples[lo_i:hi_i]
            env.append(sum(abs(v) for v in seg) / len(seg))
    lo = hi = 0
    for i in range(64):
        if env[i + 1] > env[i]:
            if i < 32:
                lo |= 1 << i
            else:
                hi |= 1 << (i - 32)
    return lo, hi
