"""Distributed PCA over embedding columns.

The data-side heavy lifting of principal-component analysis is a d×d
covariance matrix — a bounded-size aggregate no matter how many rows
flow in, the same "reduce 100 TB to something the driver can hold"
shape as the CMS grid (`sketches.py`) and the k-means partials
(`clustering.py`). The d×d eigendecomposition itself is O(d³) driver
work (numpy, d ≤ a few thousand) — the textbook split for tall-skinny
X (Halko et al. 2011 notwithstanding: no randomized sketching needed
while d² fits one machine).

Spark shape:
- **Gram partials** run in ONE Arrow-batched ``mapInPandas`` stage:
  each batch contributes the quantized upper-triangle cross terms,
  the column sums and the row count, emitted as ≤ d(d+1)/2 + d + 1
  tiny rows per flush and summed by a map-side-combinable aggregate.
  Python appears only in this declared stage (the blocked-matmul
  contract from `similarity.py`).
- **Projection** is pure JVM: each principal component rides the plan
  as a literal array folded once per row via zip_with (the
  `functions/vectors.random_projection` pattern) — narrow, zero
  shuffle, fuses into the consuming scan.

Determinism (the `user_decayed_value` exact-accumulation discipline,
`functions/timeseries.py`): float addition is not associative, so a
float64 Gram accumulated per-partition and re-summed hashes
differently from a SQL engine summing the same products in its own
order — exactly the round-4 `embedding_covariance` gate failure.
The fix is to make every SUMMED term an exact integer:

* per row, the product ``x_i·x_j`` of two float32-widened values is
  EXACT in float64 (24+24 mantissa bits < 53);
* ``floor((x_i·x_j)·1e10)`` applies one IEEE multiply and one floor —
  bit-identical in numpy, Spark codegen, and DuckDB for the same
  inputs — yielding an int64 term;
* integer sums are order-independent; across partitions they are
  carried as DECIMAL(38,0), exact at any scale.

The covariance is then ONE float64 expression over those exact
integers, written with identical parenthesization in the engine and
the oracle, so both compute the identical IEEE operation sequence
and the result is bit-equal with NO rounding step at all. The same
trick quantizes the projection fold (scale 1e8), so the full
fit→project chain is hash-verifiable against any SQL engine.

Reference parity note: the reference bundle (CreateHQL.scala) has no
linear algebra; PCA is part of this engine's LLM-data-pipeline
extension surface (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["covariance_matrix", "pca_fit", "pca_project", "MOMENT_SCALE", "isotropy_report", "ISO_SCALE"]

# Quantization unit for moment terms: term = floor(value * 10^MOMENT_SCALE).
# 1e10 keeps |term| ≤ ~1e10 for unit-scale embeddings, so an int64 batch
# accumulator is safe past 10^8 rows per flush (flushing is adaptive: the
# accumulator tracks a running worst-case bound and flushes long before
# int64 could overflow, so wide-magnitude inputs stay exact too).
MOMENT_SCALE = 10
_CHUNK_ROWS = 1024  # rows per vectorized quantize step (bounds temp memory)
_TERM_BOUND = 2.0e15  # max |term| per chunk: 1024 · 2e15 < 2^63 with margin
_ACC_BOUND = 4.0e18  # flush accumulators before worst-case sum passes this


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    row = df.filter(F.col(vec_col).isNotNull()).select(
        F.size(vec_col).alias("d")
    ).head()
    if row is None:
        raise ValueError(f"no non-null vectors in {vec_col!r}")
    return row.d


def _moment_rows(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """(i, j, val) EXACT-integer moment partials, val in units of
    10^-MOMENT_SCALE: upper-triangle cross terms at (i, j ≥ 0), column
    sums at (i, -1), the row count at (-1, -1) (count in raw units).
    Sums are int64 inside a flush window and DECIMAL(38,0) across
    partitions — order-independent at any scale."""
    import numpy as np
    import pandas as pd

    iu0, iu1 = np.triu_indices(dim)
    unit = float(10**MOMENT_SCALE)

    def gram(batches):
        def fresh():
            return (
                np.zeros(len(iu0), dtype=np.int64),
                np.zeros(dim, dtype=np.int64),
                0,
                0.0,
            )

        def emit(s_xy, s_x, n):
            return pd.DataFrame(
                {
                    "i": np.concatenate([iu0, np.arange(dim), [-1]]),
                    "j": np.concatenate([iu1, np.full(dim, -1), [-1]]),
                    "val": np.concatenate([s_xy, s_x, [n]]),
                }
            )

        s_xy, s_x, n, bound = fresh()
        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None and len(v) == dim]
            if not vecs:
                continue
            x_all = np.asarray(vecs, dtype=np.float64)
            for lo in range(0, x_all.shape[0], _CHUNK_ROWS):
                x = x_all[lo : lo + _CHUNK_ROWS]
                mx = float(np.max(np.abs(x))) if x.size else 0.0
                term_bound = max(mx * mx, mx, 1.0) * unit + 1.0
                if term_bound > _TERM_BOUND:
                    raise ValueError(
                        "covariance_matrix exact-quantized path needs "
                        f"|x| <= ~4e2 at scale {MOMENT_SCALE}; got "
                        f"max |x| = {mx:g} — rescale the input"
                    )
                if bound + x.shape[0] * term_bound > _ACC_BOUND:
                    yield emit(s_xy, s_x, n)
                    s_xy, s_x, n, bound = fresh()
                # per-row quantized terms: float32·float32 products are
                # exact in float64; ×unit + floor is one IEEE op each,
                # identical in every engine → int64 terms whose sums are
                # order-independent.
                s_xy += np.floor(x[:, iu0] * x[:, iu1] * unit).astype(
                    np.int64
                ).sum(axis=0)
                s_x += np.floor(x * unit).astype(np.int64).sum(axis=0)
                n += x.shape[0]
                bound += x.shape[0] * term_bound
        if n:
            yield emit(s_xy, s_x, n)

    partials = df.select(vec_col).mapInPandas(gram, "i int, j int, val long")
    return partials.groupBy("i", "j").agg(
        F.sum(F.col("val").cast("decimal(38,0)")).alias("val")
    )


def covariance_matrix(
    df: DataFrame, vec_col: str, *, dim: int | None = None
) -> DataFrame:
    """(i, j, cov) for 0 ≤ i ≤ j < d: the sample covariance (n−1
    denominator) of the vector components, computed on moments
    quantized to 10^-MOMENT_SCALE. Vectors that are NULL or the wrong
    length are skipped. Everything after the Arrow Gram stage is a
    d²-row equi-join — the 1-row count broadcasts as a scalar.

    Hash-determinism contract: ``cov`` is ONE float64 expression over
    exact DECIMAL integers —
    ``((sxy/u) - ((sxi/u)*(sxj/u))/n) / (n-1)`` with u = 10^scale —
    evaluated with this exact parenthesization. Any engine replaying
    the same expression over the same integers produces bit-identical
    doubles (IEEE 754 ops are fully specified), so no rounding step
    is needed or wanted."""
    dim = dim or _infer_dim(df, vec_col)
    m = _moment_rows(df, vec_col, dim)
    n = m.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("val").cast("double").alias("__n")
    )
    sx = m.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("__si"), F.col("val").cast("double").alias("__sx")
    )
    xy = m.filter(F.col("j") >= 0).select(
        "i", "j", F.col("val").cast("double").alias("__sxy")
    )
    u = F.lit(float(10**MOMENT_SCALE))
    cov = (
        (F.col("__sxy") / u)
        - ((F.col("__sx_i") / u) * (F.col("__sx_j") / u)) / F.col("__n")
    ) / (F.col("__n") - F.lit(1.0))
    return (
        xy.join(F.broadcast(n))  # 1-row scalar broadcast
        .join(sx.withColumnRenamed("__sx", "__sx_i"), xy.i == sx.__si)
        .drop("__si")
        .join(
            sx.withColumnRenamed("__sx", "__sx_j").withColumnRenamed(
                "__si", "__sj"
            ),
            xy.j == F.col("__sj"),
        )
        .select("i", "j", cov.alias("cov"))
    )


def fit_from_moments(s_xy, s_x, n: float, k: int):
    """Driver-side eigendecomposition from EXACT integer moments
    (units 10^-MOMENT_SCALE for s_xy/s_x). Shared by `pca_fit` and the
    oracle-literal generator in `plans/queries.py` so both sides run
    the identical float64 sequence → identical components.
    Component sign fixed: the largest-|coefficient| entry is positive."""
    import numpy as np

    if n < 2:
        raise ValueError("PCA needs at least 2 vectors")
    unit = float(10**MOMENT_SCALE)
    s_xy = np.asarray(s_xy, dtype=np.float64) / unit
    s_x = np.asarray(s_x, dtype=np.float64) / unit
    cov = (s_xy - np.outer(s_x, s_x) / n) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append(v.tolist())
    return {
        "mean": (s_x / n).tolist(),
        "components": comps,
        "explained_variance": [float(vals[i]) for i in order],
        "dim": int(s_x.shape[0]),
    }


def pca_fit(
    df: DataFrame, vec_col: str, *, k: int = 2, dim: int | None = None
) -> dict:
    """Fit PCA: returns {"mean": [d], "components": [k][d],
    "explained_variance": [k], "dim": d}. The driver collects exactly
    d(d+1)/2 + d + 1 moment rows (control-path, bounded by d² — the
    ≤100 K quantizer-fit contract from `similarity.py`), rebuilds the
    covariance with numpy, and eigendecomposes via
    `fit_from_moments` (deterministic: exact-integer inputs)."""
    import numpy as np

    dim = dim or _infer_dim(df, vec_col)
    rows = _moment_rows(df, vec_col, dim).collect()
    s_xy = np.zeros((dim, dim), dtype=np.float64)
    s_x = np.zeros(dim, dtype=np.float64)
    n = 0.0
    for r in rows:
        val = float(r.val)
        if r.i == -1:
            n = val
        elif r.j == -1:
            s_x[r.i] = val
        else:
            s_xy[r.i, r.j] = val
            s_xy[r.j, r.i] = val
    # fit_from_moments divides by the unit itself; hand it raw integers
    return fit_from_moments(s_xy, s_x, n, k)


def pca_project(
    df: DataFrame,
    vec_col: str,
    model: dict,
    *,
    prefix: str = "pc",
    quantize_scale: int = 8,
) -> DataFrame:
    """Append ``prefix0..prefix{k−1}``: the mean-centered input folded
    against each literal component row — pure JVM, narrow, zero
    shuffle (the `random_projection` literal-fold shape). Vectors of
    the wrong length yield NULL components.

    Each per-element term is quantized to an exact integer —
    ``floor(((x−m)·w)·10^quantize_scale)`` as long — so the per-row
    sum is order-independent and any SQL engine replaying the same
    per-element expression (same float64 literals, same
    parenthesization) hash-matches bit-for-bit. The reported value is
    the integer sum divided by the scale (one IEEE division)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    q = F.lit(float(10**quantize_scale))
    out = df
    for c_idx, comp in enumerate(model["components"]):
        mean_arr = F.array(*[F.lit(m) for m in model["mean"]])
        comp_arr = F.array(*[F.lit(w) for w in comp])
        terms = F.zip_with(
            F.zip_with(v, mean_arr, lambda x, m: x - m),
            comp_arr,
            lambda c, w: F.floor((c * w) * q).cast("long"),
        )
        fold = F.aggregate(
            terms, F.lit(0).cast("long"), lambda acc, t: acc + t
        )
        out = out.withColumn(
            f"{prefix}{c_idx}",
            F.when(F.size(vec_col) == model["dim"], fold / q),
        )
    return out


ISO_SCALE = 10**6


def isotropy_report(df: DataFrame, vec_col: str) -> DataFrame:
    """Embedding-space isotropy diagnostic: the ratio
    ||mean vector||^2 / mean(||v||^2) — ~0 for a healthy centered
    embedding space, approaching 1 when the space collapses toward a
    shared direction (the anisotropy problem of contextual embedding
    models, Ethayarajh 2019; a collapsed space makes cosine
    similarity, ANN recall and clustering quality degrade silently).

    Exact-integer construction (the covariance_matrix discipline, JVM
    only — no Python stage): per-position terms floor(v*10^6) and
    floor(v*v*10^6) are each ONE IEEE double op (identical in every
    engine after the explicit float->double cast), summed as
    DECIMAL(38,0) by dimension — order-independent. The d-row moment
    table is folded on the driver with arbitrary-precision ints
    (bounded state, the pca.py contract):

        mean_sq_norm_q = S2 // n                    (10^-6 units)
        isotropy_ppb   = (sum_d s_x_d^2) * 10^9 // (n * S2 * 10^6)

    Scale: one posexplode scan (d-way narrow fan-out) + a d-row
    aggregate; nothing else touches data rows.
    """
    ex = df.filter(F.col(vec_col).isNotNull()).select(
        F.posexplode(vec_col).alias("d", "v")
    )
    q = F.col("v").cast("double") * ISO_SCALE
    byd = ex.groupBy("d").agg(
        F.sum(F.floor(q).cast("decimal(38,0)")).alias("s_x"),
        F.sum(
            F.floor(
                F.col("v").cast("double") * F.col("v").cast("double")
                * ISO_SCALE
            ).cast("decimal(38,0)")
        ).alias("s_sq"),
        F.count(F.lit(1)).alias("n_terms"),
    )
    rows = byd.collect()
    if not rows:
        return df.sparkSession.createDataFrame(
            [], "n_vectors long, dim int, mean_sq_norm_q long, isotropy_ppb long"
        )
    dim = len(rows)
    # max over positions mirrors the oracle's max(n): with ragged
    # vectors the tail positions see fewer terms, and silently trusting
    # an arbitrary rows[0] could under-count n_vectors
    n = max(int(r["n_terms"]) for r in rows)
    s2 = sum(int(r["s_sq"]) for r in rows)
    num = sum(int(r["s_x"]) ** 2 for r in rows)
    if s2 == 0:
        # all-zero vectors: mean-sq-norm is 0 and the isotropy ratio is
        # undefined — report the degenerate corpus instead of dividing
        return df.sparkSession.createDataFrame(
            [(n, dim, 0, None)],
            "n_vectors long, dim int, mean_sq_norm_q long, isotropy_ppb long",
        )
    return df.sparkSession.createDataFrame(
        [
            (
                n,
                dim,
                s2 // n,
                num * 10**9 // (n * s2 * ISO_SCALE),
            )
        ],
        "n_vectors long, dim int, mean_sq_norm_q long, isotropy_ppb long",
    )
