"""Embedding clustering: Lloyd's k-means on a DataFrame of vectors.

Semantic organization of a corpus — topic bucketing, semantic dedup
blocking, IVF coarse quantizers — all reduce to "assign every embedding
to the nearest of k centroids, maybe iterate". The Spark-first shape:

* **assign**: centroids are a k×d literal (a few KB — an expression-level
  broadcast); the distance argmin is one narrow projection over the
  vector column. No shuffle, no UDF, no collect of data rows.
* **fit** (Lloyd iteration): re-estimating centroids is a posexplode to
  (cluster, dim, value) + groupBy(cluster, dim) partial-agg — Spark's
  map-side combine reduces each partition to ≤ k·d rows before the
  shuffle, so the wire cost per iteration is executors·k·d, independent
  of row count. The driver only ever holds k·d doubles.

Determinism: init centroids are the first k vectors by id (not a random
sample), ties in the argmin break to the lowest cluster id, so the same
data + params give the same model on any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["assign_clusters", "kmeans_fit", "semantic_dedup",
    "centroid_outlier_scores", "simplified_silhouette",
]


def simplified_silhouette(
    df: DataFrame,
    centroids: list[list[float]],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector simplified silhouette — the standard cluster-quality
    score with the cluster means standing in for the pairwise terms:
    ``s = (b − a) / max(a, b)`` where ``a`` is the distance to the
    nearest centroid (the assignment) and ``b`` to the runner-up.
    s → 1 means tight and well-separated, s → 0 means the vector sits
    on a boundary; the per-cluster mean is the usual health report for
    a k-means/SemDeDup blocking model. Returns (id, cluster, dist,
    silhouette); the degenerate a = b = 0 case scores 0.

    Determinism discipline (the ``centroid_outlier_scores`` recipe):
    per-centroid distances round to 6dp BEFORE the argmin and the
    ratio, ties break to the lower cluster id, and the ratio rounds to
    6dp — cross-engine reproducible.

    Scale shape: centroids are k×d literals riding the plan (the
    ``assign_clusters`` contract), the whole score is ONE narrow
    codegen'd projection — no join, no shuffle, no UDF; callers
    aggregate the result however they like."""
    if len(centroids) < 2:
        raise ValueError("simplified_silhouette needs >= 2 centroids")
    v = F.col(vec_col).cast("array<double>")
    cells = []
    for j, ctr in enumerate(centroids):
        d = F.round(F.sqrt(_sq_dist(v, ctr)), 6)
        cells.append(
            F.struct(d.alias("d"), F.lit(j).alias("c"))
        )
    srt = F.sort_array(F.array(*cells))  # (dist, cluster) lexicographic
    a, b = srt[0]["d"], srt[1]["d"]
    sil = F.when(F.greatest(a, b) == 0, F.lit(0.0)).otherwise(
        F.round((b - a) / F.greatest(a, b), 6)
    )
    return df.select(
        F.col(id_col),
        srt[0]["c"].alias("cluster"),
        a.alias("dist"),
        sil.alias("silhouette"),
    )


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a literal centroid, folded in index order
    (deterministic IEEE sum — an SQL oracle summing in the same order
    reproduces it bit-for-bit)."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(
            vec,
            lit,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    *,
    vec_col: str = "embedding",
    keep_cols: list[str] | None = None,
    out_col: str = "cluster_id",
) -> DataFrame:
    """Tag each row with the index of its nearest centroid (squared-L2;
    ties → lowest index via ``array_position`` first-match). Narrow
    projection; centroid literals ride the plan."""
    if not centroids:
        raise ValueError("centroids must be non-empty")
    dists = F.array(*[_sq_dist(F.col(vec_col), c) for c in centroids])
    cluster = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    cols = keep_cols if keep_cols is not None else df.columns
    return df.select(*cols, cluster.alias(out_col))


def kmeans_fit(
    df: DataFrame,
    k: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iter: int = 10,
    tol: float = 1e-6,
) -> list[list[float]]:
    """Lloyd's k-means; returns the k×d centroid list (driver-small).

    Init = the first ``k`` vectors ordered by ``id_col`` (deterministic
    across partitionings; callers wanting k-means++ pass their own init
    via repeated ``assign_clusters``). Each iteration is one job: assign
    (narrow) → posexplode → (cluster, dim) partial-agg; empty clusters
    keep their previous centroid.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    # the loop re-scans the source once per iteration (the posexplode agg
    # reads the assign projection, which reads the input); cache the
    # pruned (id, vector) projection once so a 10-iteration fit costs 10
    # cached-scan jobs, not 10 full lineage recomputations — same
    # loop-invariant-caching reason pagerank caches its edge/degree tables
    vecs = df.select(id_col, vec_col).cache()
    try:
        first = vecs.orderBy(id_col).select(vec_col).limit(k).collect()
        if len(first) < k:
            raise ValueError(f"need at least {k} rows to fit {k} clusters")
        centroids = [[float(x) for x in r[0]] for r in first]

        for _ in range(max_iter):
            assigned = assign_clusters(
                vecs, centroids, vec_col=vec_col, keep_cols=[vec_col]
            )
            rows = (
                assigned.select(
                    "cluster_id", F.posexplode(F.col(vec_col)).alias("dim", "v")
                )
                .groupBy("cluster_id", "dim")
                .agg(
                    F.sum(F.col("v").cast("double")).alias("s"),
                    F.count("*").alias("n"),
                )
                .collect()
            )
            new = [list(c) for c in centroids]
            for r in rows:
                new[r["cluster_id"]][r["dim"]] = r["s"] / r["n"]
            shift = max(
                abs(a - b) for row_new, row_old in zip(new, centroids)
                for a, b in zip(row_new, row_old)
            )
            centroids = new
            if shift < tol:
                break
    finally:
        vecs.unpersist()
    return centroids


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_cluster: int | None = 100_000,
    n_blocks: int = 4,
) -> DataFrame:
    """SemDeDup: drop every row whose cluster holds a LOWER-id row with
    cosine ≥ ``threshold``; returns survivors with a ``cluster_id``
    column appended.

    The cluster assignment is the blocking step that makes semantic
    dedup sub-quadratic: pairwise cosine runs only WITHIN a centroid
    cell, so total comparison work is Σ|cell|² instead of N² — the
    caller sizes k so cells stay small (the paper's design point:
    k grows with N, cell size stays ~constant). Plan shape: narrow
    centroid-literal assign (no shuffle) → per-cell task-gridded GEMM
    (``_blocked_cosine_pairs`` with ``cell_col``: each cell fans out to
    ``n_blocks·(n_blocks+1)/2`` Arrow tasks whose n² work is one dense
    ``A @ B.T`` BLAS kernel, not per-pair expression trees) → 16-byte
    id anti-join. The earlier self-equi-join + interpreted HOF dot fold
    measured 7.3 s warm at sf0.1 (2 K × 64-dim, 8 cells) because AQE
    coalesces the byte-small/compute-heavy pair stage to ONE task; the
    gridded GEMM keeps every core busy and the kernel vectorized.

    ``max_cluster`` guards the degenerate case (a collapsed centroid
    owning a huge cell would make one straggler task do |cell|² work):
    cells larger than the cap are excluded from pair generation — ALL
    their rows survive — the same explicit recall-for-boundedness trade
    as ``minhash_lsh_pairs``'s ``max_bucket``. The cap comparison rides
    a ≤k-row broadcast. Cosine is rounded to 6 decimals before the
    threshold test so replaying engines agree at the boundary.

    Keep-lowest-id (not transitive closure): a surviving doc is one with
    no smaller-id near-twin in its cell — deterministic on any
    partitioning, and exactly replayable in SQL via EXISTS.
    """
    from ..functions.partitioning import ensure_min_partitions
    from ..functions.vectors import l2_normalize
    from .dedup import _blocked_cosine_pairs

    # Fan the input to session parallelism before the assign+normalize
    # chain (guide §2.5 input parallelism): both are compute-bound
    # narrow transforms that inherit the scan's split count, and
    # `assigned` is consumed twice (pair generation + the survivor
    # anti-join), so a single-split embedding table paid two
    # one-core passes (measured 3.5 s vs 2.7 s fanned at sf0.1).
    # No-op when the scan is already well-split (the at-scale case).
    assigned = assign_clusters(
        ensure_min_partitions(df), centroids, vec_col=vec_col,
        out_col="cluster_id",
    )
    # normalize ONCE per row (O(N·d), JVM-side — same index-ordered fold
    # the oracle replays) so the GEMM is a plain matmul of unit vectors
    slim = assigned.select(
        F.col(id_col).alias("id"),
        l2_normalize(F.col(vec_col)).alias("v"),
        "cluster_id",
    )
    pair_base = slim
    if max_cluster is not None:
        ok = (
            slim.groupBy("cluster_id")
            .count()
            .filter(F.col("count") <= max_cluster)
            .select("cluster_id")
        )
        pair_base = slim.join(F.broadcast(ok), "cluster_id")
    dup_ids = (
        _blocked_cosine_pairs(
            pair_base,
            threshold=threshold,
            n_blocks=n_blocks,
            cell_col="cluster_id",
        )
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return assigned.join(
        dup_ids.withColumnRenamed("id", id_col), id_col, "anti"
    )


def centroid_outlier_scores(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-space outlier scoring: each vector's L2 distance to
    the corpus centroid, z-scored against the corpus distance
    distribution — the cheap "is this embedding off-manifold" signal
    (corrupt inputs, wrong-language text, encoder failures) that runs
    before any clustering.

    Determinism discipline (cross-engine hash gate): the centroid is a
    per-dimension DECIMAL-exact sum (order-independent) divided once;
    per-row distances are a single left-fold over the literal centroid;
    the distance distribution's mean/std come from DECIMAL moment sums
    of the quantized distances (the ``lineitem_price_stats`` recipe) so
    every engine computes identical scalars.

    Scale shape: one posexplode pass for the centroid (narrow (dim,
    decimal) partial agg, dim-count rows out), a bounded driver collect
    of the dim-count centroid (same contract as the k-means centroid
    literals), then one narrow scan computing distances + a 1-row
    moment aggregate broadcast back. Bodies/vectors never shuffle.
    Output: (id, centroid_dist, z_score, is_outlier at |z| > 2).
    """
    n_total = df.count()
    if n_total < 2:
        raise ValueError("centroid_outlier_scores needs >= 2 vectors")
    sums = (
        df.select(F.posexplode(vec_col).alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.sum(F.col("x").cast("double").cast("decimal(20,12)")).alias("s")
        )
        .collect()
    )
    mu = [0.0] * (max(r["dim"] for r in sums) + 1)
    for r in sums:
        mu[r["dim"]] = float(r["s"]) / n_total
    mu_lit = F.array(*[F.lit(v) for v in mu])

    vecs = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    diff2 = F.zip_with(F.col("__v"), mu_lit, lambda x, m: (x - m) * (x - m))
    # quantize ONCE at the cross-engine comparison grain (6 decimals)
    # and feed the SAME quantized value to both the output and the
    # moment sums: per-row double folds differ across engines below
    # ~1e-8, and unquantized moments leak that noise into the z-score
    # (measured: 9e-5 z drift at sf0.001)
    dist = F.round(
        F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda a, b: a + b)), 6
    )
    with_d = vecs.select(F.col(id_col), dist.alias("__d"))
    ddec = F.col("__d").cast("decimal(18,6)")
    m = with_d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(ddec).alias("s"),
        F.sum(ddec * ddec).alias("ss"),
    )
    stats = m.select(
        F.col("n"),
        (F.col("s").cast("double") / F.col("n")).alias("__mean"),
        F.sqrt(
            (
                F.col("ss").cast("double")
                - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("__std"),
    )
    # z at 4 decimals: a 1e-6 flip in one row's quantized distance moves
    # its own z by ~3e-5 — invisible at this grain, visible at 6
    z = F.when(
        F.col("__std") > 0, F.round((F.col("__d") - F.col("__mean")) / F.col("__std"), 4)
    )
    return (
        with_d.join(F.broadcast(stats.select("__mean", "__std")))
        .select(
            F.col(id_col),
            F.col("__d").alias("centroid_dist"),
            z.alias("z_score"),
            F.coalesce(F.abs(z) > 2.0, F.lit(False)).alias("is_outlier"),
        )
    )
