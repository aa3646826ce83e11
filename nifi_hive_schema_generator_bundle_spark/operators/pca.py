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
  each batch contributes ``XᵀX`` (BLAS, float64), the column sums and
  the row count, emitted as ≤ d(d+1)/2 + d + 1 tiny rows per batch and
  summed by a map-side-combinable aggregate. Python appears only in
  this declared stage (the blocked-matmul contract from
  `similarity.py`) — per-row outer products through the JVM would
  codegen n·d² tuples; BLAS does the same flops ~100× faster.
- **Projection** is pure JVM: each principal component rides the plan
  as a literal array folded once per row via zip_with (the
  `functions/vectors.random_projection` pattern) — narrow, zero
  shuffle, fuses into the consuming scan.

Determinism: covariance entries are exact-formula moments (rounding
only at the reported 6th decimal), so a SQL engine replays them; eigen
vectors get a sign convention (largest-|coefficient| entry positive)
so reruns and library versions agree up to eigenvalue ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["covariance_matrix", "pca_fit", "pca_project"]


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    row = df.filter(F.col(vec_col).isNotNull()).select(
        F.size(vec_col).alias("d")
    ).head()
    if row is None:
        raise ValueError(f"no non-null vectors in {vec_col!r}")
    return row.d


def _moment_rows(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """(i, j, val) moment partials: upper-triangle cross sums at
    (i, j ≥ 0), column sums at (i, -1), the count at (-1, -1)."""
    import numpy as np
    import pandas as pd

    iu0, iu1 = np.triu_indices(dim)

    def gram(batches):
        s_xy = np.zeros((dim, dim))
        s_x = np.zeros(dim)
        n = 0
        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None and len(v) == dim]
            if not vecs:
                continue
            x = np.asarray(vecs, dtype=np.float64)
            s_xy += x.T @ x
            s_x += x.sum(axis=0)
            n += x.shape[0]
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "i": np.concatenate([iu0, np.arange(dim), [-1]]),
                "j": np.concatenate([iu1, np.full(dim, -1), [-1]]),
                "val": np.concatenate([s_xy[iu0, iu1], s_x, [float(n)]]),
            }
        )

    partials = df.select(vec_col).mapInPandas(gram, "i int, j int, val double")
    return partials.groupBy("i", "j").agg(F.sum("val").alias("val"))


def covariance_matrix(
    df: DataFrame, vec_col: str, *, dim: int | None = None, decimals: int = 6
) -> DataFrame:
    """(i, j, cov) for 0 ≤ i ≤ j < d: the sample covariance (n−1
    denominator) of the vector components, rounded to ``decimals``.
    Vectors that are NULL or the wrong length are skipped. Everything
    after the Arrow Gram stage is a d²-row equi-join — the 1-row count
    broadcasts as a scalar."""
    dim = dim or _infer_dim(df, vec_col)
    m = _moment_rows(df, vec_col, dim)
    n = m.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("val").alias("__n")
    )
    sx = m.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("__si"), F.col("val").alias("__sx")
    )
    xy = m.filter(F.col("j") >= 0)
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
        .select(
            "i",
            "j",
            F.round(
                (
                    F.col("val")
                    - F.col("__sx_i") * F.col("__sx_j") / F.col("__n")
                )
                / (F.col("__n") - 1),
                decimals,
            ).alias("cov"),
        )
    )


def pca_fit(
    df: DataFrame, vec_col: str, *, k: int = 2, dim: int | None = None
) -> dict:
    """Fit PCA: returns {"mean": [d], "components": [k][d],
    "explained_variance": [k], "dim": d}. The driver collects exactly
    d(d+1)/2 + d + 1 moment rows (control-path, bounded by d² — the
    ≤100 K quantizer-fit contract from `similarity.py`), builds the
    covariance with numpy, and eigendecomposes. Component sign fixed:
    the largest-|coefficient| entry is positive."""
    import numpy as np

    dim = dim or _infer_dim(df, vec_col)
    rows = _moment_rows(df, vec_col, dim).collect()
    s_xy = np.zeros((dim, dim))
    s_x = np.zeros(dim)
    n = 0.0
    for r in rows:
        if r.i == -1:
            n = r.val
        elif r.j == -1:
            s_x[r.i] = r.val
        else:
            s_xy[r.i, r.j] = r.val
            s_xy[r.j, r.i] = r.val
    if n < 2:
        raise ValueError("PCA needs at least 2 vectors")
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
        "dim": dim,
    }


def pca_project(
    df: DataFrame, vec_col: str, model: dict, *, prefix: str = "pc"
) -> DataFrame:
    """Append ``prefix0..prefix{k−1}``: the mean-centered input folded
    against each literal component row — pure JVM, narrow, zero
    shuffle (the `random_projection` literal-fold shape). Vectors of
    the wrong length yield NULL components."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    centered = F.zip_with(
        v,
        F.array(*[F.lit(m) for m in model["mean"]]),
        lambda x, m: x - m,
    )
    out = df
    for c_idx, comp in enumerate(model["components"]):
        fold = F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(w) for w in comp]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out.withColumn(
            f"{prefix}{c_idx}",
            F.when(F.size(vec_col) == model["dim"], fold),
        )
    return out
