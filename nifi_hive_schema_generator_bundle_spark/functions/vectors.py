"""Vector math over ``array<float|double>`` columns — pure JVM expressions.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic inside whole-stage
codegen; at 100 TB this is the difference between a scan-bound job and a
Python-serialization-bound one. Casts to double first so local results
match a DuckDB/duckdb-oracle double computation bit-for-bit per element.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "l2_norm",
    "l2_normalize",
    "cosine_similarity",
    "quantize_int8",
    "dequantize_int8",
    "random_projection",
    "random_projection_signs",
]


def _as_double_array(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length array columns."""
    a, b = _as_double_array(a), _as_double_array(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = _as_double_array(a)
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def l2_normalize(a: Column | str) -> Column:
    a = _as_double_array(a)
    n = l2_norm(a)
    return F.transform(a, lambda x: x / n)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe on zero vectors (returns NULL, matching
    SQL division-by-zero semantics so oracles agree)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def quantize_int8(c: Column | str) -> Column:
    """Symmetric per-vector int8 quantization:
    ``struct(scale double, q array<tinyint>)`` with
    ``x ≈ q * scale / 127``.

    The storage lever for 100 TB embedding columns — 4 bytes/dim float
    → 1 byte/dim plus one scale, a 4× scan-volume cut for ANN
    candidate generation (re-rank on the full-precision column). All
    higher-order functions, no Python. Zero vectors get scale 0 and
    all-zero codes (x/0 would be NULL; the guard keeps them
    round-trippable)."""
    a = _as_double_array(c)
    scale = F.array_max(F.transform(a, F.abs))
    q = F.transform(
        a,
        lambda x: F.when(scale == 0.0, F.lit(0))
        .otherwise(F.round(x / scale * 127.0, 0))
        .cast("tinyint"),
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(c: Column | str) -> Column:
    """Inverse of ``quantize_int8``: array<double> with per-element
    error ≤ scale/254 (half a quantization step)."""
    c = F.col(c) if isinstance(c, str) else c
    scale = c.getField("scale")
    return F.transform(
        c.getField("q"), lambda q: q.cast("double") * scale / 127.0
    )


def random_projection_signs(
    in_dims: int, out_dims: int, *, seed_tag: str = "rp"
) -> list[list[float]]:
    """The deterministic Rademacher (±1) projection matrix used by
    ``random_projection``, materialized driver-side: ``out_dims`` rows
    of ``in_dims`` signs, sign(j, i) = +1 iff the first hex nibble of
    ``md5("{seed_tag}:{j}:{i}")`` is 0-7. md5 rather than a seeded RNG
    for the same reason the sampling module hashes keys: every engine
    that agrees on md5 agrees on the matrix, so a SQL oracle (or a
    later re-run on different hardware) replays it exactly."""
    import hashlib

    return [
        [
            1.0
            if hashlib.md5(
                f"{seed_tag}:{j}:{i}".encode()
            ).hexdigest()[0] in "01234567"
            else -1.0
            for i in range(in_dims)
        ]
        for j in range(out_dims)
    ]


def random_projection(
    vec: Column | str,
    *,
    in_dims: int,
    out_dims: int,
    seed_tag: str = "rp",
) -> Column:
    """Johnson-Lindenstrauss dimensionality reduction as a pure JVM
    expression: project an ``in_dims`` embedding onto ``out_dims``
    deterministic Rademacher directions, scaled by 1/√out_dims (the
    Achlioptas database-friendly construction — ±1 entries preserve
    pairwise distances with the same JL guarantee as Gaussians, and
    cost additions instead of multiplications).

    The workhorse in front of every quadratic-ish embedding stage:
    shrink 1024-dim vectors to 16-64 dims before LSH banding, k-means,
    SemDeDup or coarse ANN, then verify survivors at full width. Purely
    narrow — the sign matrix rides the plan as ``out_dims`` array
    literals (no broadcast join, no shuffle, no Python), so at 100 TB
    it fuses into whatever scan feeds it.

    Each output component folds the input ONCE via zip_with against its
    literal sign row — out_dims independent O(in_dims) expressions, not
    a nested HOF over both axes (the inlining trap SCALE.md documents).
    Vectors shorter than ``in_dims`` yield NULL components (zip_with
    pads, null propagates through the fold) — surfaced, not silently
    truncated."""
    v = _as_double_array(vec)
    signs = random_projection_signs(in_dims, out_dims, seed_tag=seed_tag)
    scale = 1.0 / (out_dims ** 0.5)
    comps = [
        (
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(s) for s in row]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            * F.lit(scale)
        ).alias(f"p{j}")
        for j, row in enumerate(signs)
    ]
    return F.array(*comps)
