"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media travel as opaque ``binary`` columns next to a typed metadata struct
(SURVEY north-star). The Spark-side plumbing — schemas, Arrow batch shape,
``mapInPandas`` signatures, partition sizing — is real and tested; the
DEFAULT codec is a deterministic fake (this container ships no image/audio
libs), and a real decoder (PIL/librosa/ffmpeg) drops in as a one-argument
callable without touching the plumbing. One real codec IS bundled:
``png_codec`` (stdlib zlib+struct PNG decode/encode) — its ``feature_fn``
and ``resize`` hooks plug straight into ``decode_features`` /
``resize_media`` and are tested on real image bytes.

Scale notes: media rows are large — the module keeps them in Arrow batches
(``spark.sql.execution.arrow.maxRecordsPerBatch`` should be lowered for
>1 MB payloads), never collects, and repartitions by byte budget rather
than row count (``repartition_by_bytes``).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "decode_features",
    "frame_sample",
    "resize_media",
    "repartition_by_bytes",
    "perceptual_hashes",
    "media_near_dup",
    "image_near_dup",
    "audio_near_dup",
    "png_dimensions",
    "filter_min_resolution",
    "wav_duration",
    "filter_audio_duration",
]

# the canonical media column group: payload + typed metadata struct
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType(), True),
                    StructField("n_bytes", LongType(), True),
                    StructField("sha256", StringType(), True),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def attach_media_metadata(
    df: DataFrame, payload_col: str = "payload", mime: str | None = None
) -> DataFrame:
    """Derive the metadata struct from the raw payload — JVM-side only
    (length/sha2); pixel/sample dimensions stay NULL until decode."""
    p = F.col(payload_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(p).cast("long").alias("n_bytes"),
            F.sha2(p, 256).alias("sha256"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real feature extractor: fold the
    sha256 digest into ``dim`` floats in [0, 1). NOT a real decoder —
    replace via ``decode_fn`` (see module docstring)."""
    out: list[float] = []
    seed = payload or b""
    h = hashlib.sha256(seed)
    while len(out) < dim:
        d = h.digest()
        out.extend(b / 255.0 for b in d)
        h = hashlib.sha256(d)
    return out[:dim]


def decode_features(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 64,
    decode_fn: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """payload → fixed-dim feature vector via ``mapInPandas`` (Arrow).

    The UDF ships only (id, payload) — column pruning keeps other columns
    out of the Python worker; features join back by id downstream if
    needed. ``decode_fn`` is the pluggable real decoder; default is the
    deterministic fake (see module docstring).
    """
    fn = decode_fn or (lambda b: _fake_decode(b, dim))
    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("features", ArrayType(FloatType(), False), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [
                        None if b is None else fn(bytes(b))
                        for b in pdf[payload_col]
                    ],
                }
            )

    # Arrow batch sizing for large payloads is a session conf
    # (spark.sql.execution.arrow.maxRecordsPerBatch), not a plan property.
    # Fan the narrow projection to session parallelism before the Arrow
    # decode stage (guide §2.5 input parallelism; see perceptual_hashes).
    from ..functions.partitioning import ensure_min_partitions

    return ensure_min_partitions(df.select(id_col, payload_col)).mapInPandas(
        batches, schema=out_schema
    )


def frame_sample(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_frames: int = 4,
    frame_bytes: int = 32,
    extract_fn: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Video → sampled frames, exploded one row per frame.

    Stub extractor slices the payload into ``n_frames`` evenly-spaced
    ``frame_bytes`` windows (deterministic); a real ffmpeg-based
    ``extract_fn(payload, n) -> list[frame_bytes]`` drops in unchanged.
    """
    fn = extract_fn or (
        lambda b, n: [
            b[(i * max(1, (len(b) - frame_bytes)) // max(1, n - 1)) if n > 1 else 0:][
                :frame_bytes
            ]
            for i in range(n)
        ]
    )
    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                for i, fr in enumerate(fn(bytes(payload), n_frames)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame": frames}
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def repartition_by_bytes(
    df: DataFrame, *, bytes_col_expr=None, target_mb: int = 128
) -> DataFrame:
    """Repartition a media DataFrame so each partition holds roughly
    ``target_mb`` of payload — row-count partitioning is wrong when rows
    range from 10 KB thumbnails to 100 MB videos."""
    expr = bytes_col_expr if bytes_col_expr is not None else F.length("payload")
    total = df.agg(F.sum(expr.cast("long"))).collect()[0][0] or 0
    n = max(1, int(total / (target_mb * 1024 * 1024)) + 1)
    return df.repartition(n)


def resize_media(
    df: DataFrame,
    *,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Image resize plumbing: payload → resized payload + updated meta
    dims. Output schema ``(media_id, payload, width, height)``.

    ``resize_fn(payload, w, h) -> bytes`` is the codec hook (PIL's
    ``Image.resize`` in a real deployment); the stub produces a
    deterministic ``w*h``-byte payload derived from the input (sha256
    keystream) so size contracts and batch shape are exercised without
    an image lib. Arrow-batched ``mapInPandas`` like the decoder —
    resizing is per-row CPU work with a large-payload row, exactly the
    shape where Arrow batching beats row-at-a-time by an order of
    magnitude."""

    def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
        need = w * h
        out = bytearray()
        counter = 0
        seed = hashlib.sha256(payload).digest()
        while len(out) < need:
            out += hashlib.sha256(seed + counter.to_bytes(4, "big")).digest()
            counter += 1
        return bytes(out[:need])

    fn = resize_fn or _fake_resize
    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField(payload_col, BinaryType(), True),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [
                fn(bytes(p), width, height) if p is not None else None
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    payload_col: resized,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema)


def perceptual_hashes(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    hash_fn: Callable[[bytes], tuple[int, int]] | None = None,
) -> DataFrame:
    """payload → 64-bit perceptual hash as packed (lo, hi) 32-bit
    halves via one Arrow stage — the signature step of image near-dup.
    Default ``hash_fn`` is the stdlib PNG average-hash
    (``png_codec.average_hash``); plug in a pHash/dHash over a real
    imaging stack in production. NULL payloads and undecodable images
    yield NULL halves (and so never reach the banding join).
    """
    if hash_fn is None:
        from .png_codec import average_hash as hash_fn  # type: ignore[assignment]
    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("lo", LongType(), True),
            StructField("hi", LongType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            los, his = [], []
            for b in pdf[payload_col]:
                if b is None:
                    los.append(None)
                    his.append(None)
                    continue
                try:
                    lo, hi = hash_fn(bytes(b))
                except (ValueError, NotImplementedError):
                    lo = hi = None
                los.append(lo)
                his.append(hi)
            yield pd.DataFrame({id_col: pdf[id_col], "lo": los, "hi": his})

    # Fan the (id, payload) projection to session parallelism before the
    # Arrow decode stage (guide §2.5 input parallelism): the hash pass is
    # decode-bound and inherits the scan's split count — a single-split
    # media table decoded everything on one core (image near-dup measured
    # 3.0 s vs 1.7 s fanned at sf0.1). No-op when the scan is already
    # well-split (the at-scale case, where payloads never re-shuffle).
    from ..functions.partitioning import ensure_min_partitions

    return ensure_min_partitions(df.select(id_col, payload_col)).mapInPandas(
        batches, schema=out_schema
    )


def media_near_dup(
    df: DataFrame,
    hash_fn: Callable[[bytes], tuple[int, int]],
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate MEDIA pairs for any 64-bit perceptual ``hash_fn``
    — the shared engine behind ``image_near_dup`` and
    ``audio_near_dup``: one Arrow hash pass over (id, payload) — bodies
    never shuffle — then ``dedup.packed_hamming_pairs``'s 4×16-bit
    pigeonhole banding + ``bit_count(xor)`` verify (complete for
    Hamming ≤ 3, same degenerate-bucket cap). Returns
    (id_a, id_b, hamming).

    Everything after the hash is signature-only: the banding shuffle
    carries (id, two longs) per item regardless of payload size, so the
    100 TB profile is identical to text SimHash dedup.
    """
    from .dedup import packed_hamming_pairs

    sig = perceptual_hashes(
        df, payload_col=payload_col, id_col=id_col, hash_fn=hash_fn
    ).filter(F.col("lo").isNotNull())
    sh = sig.select(F.col(id_col).alias("id"), "lo", "hi")
    return packed_hamming_pairs(
        sh, max_hamming=max_hamming, max_bucket=max_bucket
    )


def image_near_dup(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 3,
    max_bucket: int = 1000,
    hash_fn: Callable[[bytes], tuple[int, int]] | None = None,
) -> DataFrame:
    """Near-duplicate IMAGE pairs — the multimodal mirror of SimHash
    text dedup (the LAION-style visual dedup stage). Default signature
    is the stdlib PNG average-hash (``png_codec.average_hash``); see
    ``media_near_dup`` for the banding/verify plan shape.
    """
    if hash_fn is None:
        from .png_codec import average_hash as hash_fn  # type: ignore[assignment]
    return media_near_dup(
        df,
        hash_fn,
        payload_col=payload_col,
        id_col=id_col,
        max_hamming=max_hamming,
        max_bucket=max_bucket,
    )


def audio_near_dup(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 3,
    max_bucket: int = 1000,
    hash_fn: Callable[[bytes], tuple[int, int]] | None = None,
) -> DataFrame:
    """Near-duplicate AUDIO pairs — the audio mirror of
    ``image_near_dup`` (the fingerprint-and-band stage a Shazam-style
    or dataset-dedup audio pipeline runs). Default signature is the
    stdlib WAV loudness-envelope dHash (``wav_codec.audio_hash``, gain-
    robust); see ``media_near_dup`` for the banding/verify plan shape.
    """
    if hash_fn is None:
        from .wav_codec import audio_hash as hash_fn  # type: ignore[assignment]
    return media_near_dup(
        df,
        hash_fn,
        payload_col=payload_col,
        id_col=id_col,
        max_hamming=max_hamming,
        max_bucket=max_bucket,
    )


# PNG wire-format constants for the JVM-side header parse: the 8-byte
# signature and the ASCII "IHDR" chunk type, both as F.hex() renders
# them (uppercase).
_PNG_SIG_HEX = "89504E470D0A1A0A"
_PNG_IHDR_HEX = "49484452"


def png_dimensions(payload) -> "Column":
    """Parse a PNG payload's pixel dimensions ENTIRELY JVM-side — no
    Python, no decompression, no decode: the IHDR chunk is at a fixed
    offset (8-byte signature, 4-byte length, 4-byte type, then
    big-endian width and height), so ``substring``/``hex``/``conv`` on
    the binary column read both ints in one codegen'd projection.
    This is how a 100 TB media gate should check resolution — the
    payload bytes never leave the JVM and only 24 bytes of each are
    looked at. Returns a (width, height) struct; NULL when the payload
    is not a PNG (signature or IHDR type mismatch) or is NULL.
    """
    c = F.col(payload) if isinstance(payload, str) else payload
    is_png = (F.hex(F.substring(c, 1, 8)) == _PNG_SIG_HEX) & (
        F.hex(F.substring(c, 13, 4)) == _PNG_IHDR_HEX
    )
    w = F.conv(F.hex(F.substring(c, 17, 4)), 16, 10).cast("int")
    h = F.conv(F.hex(F.substring(c, 21, 4)), 16, 10).cast("int")
    return F.when(
        is_png, F.struct(w.alias("width"), h.alias("height"))
    ).otherwise(F.lit(None))


def filter_min_resolution(
    df: DataFrame,
    payload_col: str = "payload",
    *,
    min_width: int = 1,
    min_height: int = 1,
    action: str = "drop",
) -> DataFrame:
    """Minimum-resolution media gate (the standard multimodal-pipeline
    floor — LAION-style pipelines drop tiny images before any costly
    decode): appends ``width``/``height`` from the JVM header parse
    and ``keep`` = both dimensions at or above the floor; non-PNG /
    unparseable payloads FAIL the gate (NULL dims → keep false).
    ``action='drop'`` removes failing rows, ``'flag'`` keeps them with
    the verdict column. One narrow codegen'd projection + an optional
    filter — zero Python, zero shuffle, payloads never move."""
    if action not in ("drop", "flag"):
        raise ValueError("action must be 'drop' or 'flag'")
    dims = png_dimensions(payload_col)
    out = df.withColumn("__dims", dims).select(
        "*",
        F.col("__dims.width").alias("width"),
        F.col("__dims.height").alias("height"),
        (
            (F.col("__dims.width") >= min_width)
            & (F.col("__dims.height") >= min_height)
        ).alias("keep"),
    ).drop("__dims")
    out = out.withColumn("keep", F.coalesce(F.col("keep"), F.lit(False)))
    if action == "drop":
        return out.filter(F.col("keep")).drop("keep")
    return out


def _le_uint(c, start: int, n: int):
    """Little-endian unsigned int from ``n`` bytes at 1-based ``start``
    of a binary column — the bytes' hex digits concatenated in reverse
    order, then one base-16 conv. Pure JVM expressions."""
    parts = [F.hex(F.substring(c, start + i, 1)) for i in range(n - 1, -1, -1)]
    return F.conv(F.concat(*parts), 16, 10).cast("long")


_RIFF_HEX = "52494646"          # "RIFF"
_WAVE_FMT_HEX = "57415645666D7420"  # "WAVEfmt "
_DATA_HEX = "64617461"          # "data"


def wav_duration(payload) -> "Column":
    """Parse a canonical-header PCM WAV payload's (sample_rate,
    duration_ms) ENTIRELY JVM-side — no Python, no sample decode: the
    RIFF layout puts byte rate and the data-chunk size at fixed
    offsets (little-endian, read via per-byte ``hex`` reversal +
    ``conv``), so duration = data_size / byte_rate. Only the 44-byte
    header is examined; payloads never leave the JVM. Returns a
    (sample_rate, duration_ms) struct; NULL for payloads that are not
    canonical-header WAVs ("RIFF"/"WAVEfmt "/"data" markers checked —
    extra-chunk files are outside the supported envelope, like the
    codec module's other guards) or NULL."""
    c = F.col(payload) if isinstance(payload, str) else payload
    is_wav = (
        (F.hex(F.substring(c, 1, 4)) == _RIFF_HEX)
        & (F.hex(F.substring(c, 9, 8)) == _WAVE_FMT_HEX)
        & (F.hex(F.substring(c, 37, 4)) == _DATA_HEX)
    )
    rate = _le_uint(c, 25, 4)
    byte_rate = _le_uint(c, 29, 4)
    data_size = _le_uint(c, 41, 4)
    dur = F.when(
        byte_rate > 0,
        F.round(data_size * 1000.0 / byte_rate).cast("long"),
    )
    return F.when(
        is_wav,
        F.struct(
            rate.cast("int").alias("sample_rate"),
            dur.alias("duration_ms"),
        ),
    ).otherwise(F.lit(None))


def filter_audio_duration(
    df: DataFrame,
    payload_col: str = "payload",
    *,
    min_ms: int = 0,
    max_ms: int | None = None,
    action: str = "drop",
) -> DataFrame:
    """Audio duration gate (the standard speech-pipeline floor/ceiling
    — sub-second fragments and hour-long recordings both leave before
    any costly decode): appends ``sample_rate``/``duration_ms`` from
    the JVM header parse and ``keep`` = duration within [min_ms,
    max_ms]; unparseable payloads fail the gate. ``action='drop'``
    removes failing rows, ``'flag'`` keeps them with the verdict.
    One narrow codegen'd projection — zero Python, zero shuffle."""
    if action not in ("drop", "flag"):
        raise ValueError("action must be 'drop' or 'flag'")
    info = wav_duration(payload_col)
    cond = F.col("__info.duration_ms") >= min_ms
    if max_ms is not None:
        cond = cond & (F.col("__info.duration_ms") <= max_ms)
    out = df.withColumn("__info", info).select(
        "*",
        F.col("__info.sample_rate").alias("sample_rate"),
        F.col("__info.duration_ms").alias("duration_ms"),
        F.coalesce(cond, F.lit(False)).alias("keep"),
    ).drop("__info")
    if action == "drop":
        return out.filter(F.col("keep")).drop("keep")
    return out
