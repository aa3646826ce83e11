"""Incremental cross-run EMBEDDING near-dedup — new batches of vectors
against a persistent cosine-LSH band store + vector store.

The text sibling (`incremental_near_dedup`) answers "have we ingested
something ~this document?" on MinHash signatures; this module answers
the same question in embedding space — the streaming flavor of
semantic dedup (SemDeDup's signal without the per-run k-means fit,
whose centroids would drift across runs and invalidate old
assignments). Cosine-LSH over PINNED Rademacher hyperplanes
(`operators/bitext.rademacher_planes` — md5 literals, identical on
every run and in any engine) gives stable band keys forever, so
history never needs re-indexing. Two durable parquet stores:

* ``<store>/bands`` — (id, band, bucket, batch_id): the candidate
  index, ``bands`` rows per vector.
* ``<store>/vecs``  — (id, vec, batch_id): the verification side —
  exact quantized cosine against candidates only.

Per micro-batch: (1) within-batch near-dup (banded pairs → exact
cosine ≥ threshold → connected components, min-id wins), (2) the
survivors' band keys join the band store (strictly earlier batches),
(3) candidates verify on exact quantized cosine against the stored
vectors, (4) matches drop, (5) survivors append to the corpus and
BOTH stores, partitioned by ``batch_id``.

Replay safety and scale shape are inherited wholesale from
`incremental_near_dedup`: strictly-earlier history filters, dynamic
partition overwrite so retries converge, hot-bucket caps on candidate
generation, vectors shipped per CANDIDATE (never per history row),
and crash-safe store compaction via `_store.durable_fold`. Everything
is deterministic (pinned planes + exact-integer quantized cosine), so
a SQL engine can replay the full multi-batch run — the gate entry
``embedding_incremental_dedup`` does exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.bitext import (
    lsh_band_buckets,
    quantized_cosine,
    rademacher_planes,
)
from ..operators.dedup import dedup_keep_min
from ..sources.formats import overwrite_partitions
from ._store import (
    check_store_config,
    durable_fold,
    read_store,
    store_batch_ids_or_scan,
    store_max_batch_id,
)

__all__ = [
    "embedding_dedup_batch_against_store",
    "compact_embedding_dedup_store",
    "run_incremental_embedding_dedup",
]


# heal-then-read shared by every store module
_read_store = read_store


def embedding_dedup_batch_against_store(
    batch_df: DataFrame,
    batch_id: int,
    *,
    store_dir: str,
    out_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    n_planes: int = 32,
    band_bits: int = 16,
    seed: int = 42,
    max_bucket: int = 100_000,
    dim: int | None = None,
    fmt: str = "parquet",
    stats: dict | None = None,
) -> int:
    """One micro-batch of the incremental embedding dedup; returns
    survivors kept. Reusable from any ``foreachBatch`` or a batch loop
    with its own monotonic batch numbering. Banding params must stay
    FIXED for the life of a store (the band keys are the index) — the
    store records them on first use and every later batch raises on a
    mismatch (``_store.check_store_config``), because mismatched keys
    would not fail: they would silently never collide with history
    again. ``threshold`` may vary per batch (verification is exact).

    Defaults are the SCALE.md production sizing (2 bands × 16 bits =
    65 536 buckets/band), not the sub-toy geometry the sf0.01 gate
    pins explicitly — at corpus scale a 4-bit band puts every vector
    in one of 16 buckets, all of which blow past any sane
    ``max_bucket`` and get dropped, silently degrading history
    matching to zero candidates (VERDICT r7 #3).

    Pass a dict as ``stats`` to get the banding-health readout of this
    batch's history lookup filled in (the
    ``candidate_neighborhood_stats`` discipline, applied per batch):
    ``n_kept_batch`` (within-batch survivors that did the history
    lookup), ``n_candidates`` (distinct (id, hist_id) verify pairs),
    ``candidates_per_id_avg``, ``starved_ids``/``starved_ppm`` (kept
    ids with ZERO history candidates — at healthy banding and
    occupancy this stays near 0 ppm once history is populated),
    ``hot_buckets_dropped`` (band buckets anti-joined away by
    ``max_bucket``), and ``n_dup_vs_history``. Starvation alongside
    non-zero ``hot_buckets_dropped`` is the silent-degradation
    signature: undersized bands, not genuinely novel data."""
    spark = batch_df.sparkSession
    if batch_df.isEmpty():
        return 0
    bands_dir = f"{store_dir}/bands"
    vecs_dir = f"{store_dir}/vecs"
    check_store_config(
        spark,
        store_dir,
        {
            "n_planes": int(n_planes),
            "band_bits": int(band_bits),
            "seed": int(seed),
        },
    )
    vec_store = _read_store(spark, vecs_dir)
    # monotonic-id guard from partition directory names (one FS LIST)
    top = store_max_batch_id(spark, vecs_dir)
    if top is not None and batch_id < top:
        raise ValueError(
            f"batch_id {batch_id} is behind the store's max {top}: "
            "the streaming checkpoint was reset against an existing "
            "store. Resume with the original checkpoint, or point "
            "store_dir/out_dir at fresh locations."
        )
    if dim is None:
        first = batch_df.select(F.size(vec_col).alias("n")).limit(1).collect()
        dim = int(first[0]["n"]) if first else 0
    planes = rademacher_planes(n_planes, dim, seed)

    my = batch_df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).persist()
    my_bands = lsh_band_buckets(
        my, id_col="id", vec_col="vec", planes=planes, band_bits=band_bits
    ).persist()

    # (1) within-batch: banded pairs → exact cosine → CC keep-min
    other = my_bands.select(
        F.col("band"), F.col("bucket"), F.col("id").alias("id_b")
    )
    pair_ids = (
        my_bands.join(other, ["band", "bucket"])
        .filter(F.col("id") < F.col("id_b"))
        .select(F.col("id").alias("id_a"), "id_b")
        .distinct()
    )
    va = my.select(F.col("id").alias("id_a"), F.col("vec").alias("__va"))
    vb = my.select(F.col("id").alias("id_b"), F.col("vec").alias("__vb"))
    edges = (
        pair_ids.join(va, "id_a")
        .join(vb, "id_b")
        .filter(
            quantized_cosine(F.col("__va"), F.col("__vb"))
            >= F.lit(threshold)
        )
        .select("id_a", "id_b")
    )
    batch_kept = dedup_keep_min(my, edges, "id")

    # (2)+(3) candidates vs strictly-earlier history, verified on exact
    # cosine — history vectors ship per candidate, never per row
    survivors = batch_kept
    band_store = _read_store(spark, bands_dir)
    if band_store is not None and vec_store is not None:
        kept_bands = my_bands.join(
            batch_kept.select("id"), "id", "semi"
        )
        hist_bands = band_store.filter(
            F.col("batch_id") < batch_id
        ).select("band", "bucket", F.col("id").alias("hist_id"))
        hot = (
            hist_bands.groupBy("band", "bucket")
            .count()
            .filter(F.col("count") > max_bucket)
            .select("band", "bucket")
        )
        if stats is not None:
            hot = hot.persist()
            stats["hot_buckets_dropped"] = hot.count()
        hist_bands = hist_bands.join(hot, ["band", "bucket"], "anti")
        cand = (
            kept_bands.join(hist_bands, ["band", "bucket"])
            .select("id", "hist_id")
            .distinct()
        )
        if stats is not None:
            cand = cand.persist()
            per_id = (
                batch_kept.select("id")
                .join(
                    cand.groupBy("id").agg(
                        F.count(F.lit(1)).alias("c")
                    ),
                    "id",
                    "left",
                )
                .select(F.coalesce(F.col("c"), F.lit(0)).alias("c"))
            )
            row = per_id.agg(
                F.count(F.lit(1)).alias("n_ids"),
                F.coalesce(F.sum("c"), F.lit(0)).alias("n_cand"),
                F.coalesce(
                    F.sum(F.when(F.col("c") == 0, 1).otherwise(0)),
                    F.lit(0),
                ).alias("starved"),
            ).collect()[0]
            n_ids = int(row["n_ids"])
            stats["n_kept_batch"] = n_ids
            stats["n_candidates"] = int(row["n_cand"])
            stats["candidates_per_id_avg"] = (
                round(int(row["n_cand"]) / n_ids, 2) if n_ids else 0.0
            )
            stats["starved_ids"] = int(row["starved"])
            stats["starved_ppm"] = (
                int(row["starved"]) * 1_000_000 // n_ids if n_ids else 0
            )
        hist_vecs = vec_store.filter(F.col("batch_id") < batch_id).select(
            F.col("id").alias("hist_id"), F.col("vec").alias("__hv")
        )
        dup_ids = (
            cand.join(batch_kept.select("id", "vec"), "id")
            .join(hist_vecs, "hist_id")
            .filter(
                quantized_cosine(F.col("vec"), F.col("__hv"))
                >= F.lit(threshold)
            )
            .select("id")
            .distinct()
        )
        if stats is not None:
            dup_ids = dup_ids.persist()
            stats["n_dup_vs_history"] = dup_ids.count()
        survivors = batch_kept.join(dup_ids, "id", "anti")
        if stats is not None:
            # release the instrumentation persists after the anti-join
            # below materializes survivors (count() in the try block);
            # unpersist is lazy-safe: blocks drop once unused
            for frame in (hot, cand, dup_ids):
                frame.unpersist()
    elif stats is not None:
        # first batch: no history yet — report an explicitly empty
        # lookup rather than leaving the caller's dict half-filled
        n_ids = batch_kept.count()
        stats.update(
            n_kept_batch=n_ids, n_candidates=0,
            candidates_per_id_avg=0.0, starved_ids=0, starved_ppm=0,
            hot_buckets_dropped=0, n_dup_vs_history=0,
        )

    survivors = survivors.persist()
    try:
        n = survivors.count()
        out = survivors.select(
            F.col("id").alias(id_col), F.col("vec").alias(vec_col)
        ).withColumn("ingest_batch", F.lit(batch_id))
        overwrite_partitions(out, out_dir, ["ingest_batch"], fmt=fmt)
        new_bands = (
            my_bands.join(survivors.select("id"), "id", "semi")
            .withColumn("batch_id", F.lit(batch_id))
        )
        overwrite_partitions(
            new_bands, bands_dir, ["batch_id"], fmt="parquet"
        )
        new_vecs = survivors.select("id", "vec").withColumn(
            "batch_id", F.lit(batch_id)
        )
        overwrite_partitions(new_vecs, vecs_dir, ["batch_id"], fmt="parquet")
    finally:
        survivors.unpersist()
        my_bands.unpersist()
        my.unpersist()
    return n


def compact_embedding_dedup_store(
    spark, store_dir: str, *, target_files: int = 4
) -> tuple[int, int]:
    """Fold both sub-stores' per-batch partitions into one — identical
    contract and safety argument to
    ``incremental_near_dedup.compact_near_dedup_store`` (set stores,
    monotonic ids, crash-safe via the durable_fold commit marker).
    Returns (band_rows, vec_rows) folded."""
    counts = []
    for sub in ("bands", "vecs"):
        path = f"{store_dir}/{sub}"
        store = _read_store(spark, path)  # heals any pending fold itself
        if store is None:
            counts.append(0)
            continue
        ids = store_batch_ids_or_scan(spark, path)
        if len(ids) < 3:  # nothing worth folding
            counts.append(0)
            continue
        top = ids[-1]
        fold_to = top - 1
        folded = (
            store.filter(F.col("batch_id") < top)
            .drop("batch_id")
            .repartition(target_files)
            .withColumn("batch_id", F.lit(fold_to))
        )
        counts.append(
            durable_fold(
                folded, path, stale_ids=[i for i in ids if i < fold_to]
            )
        )
    return counts[0], counts[1]


def run_incremental_embedding_dedup(
    stream_df: DataFrame,
    *,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    n_planes: int = 32,
    band_bits: int = 16,
    seed: int = 42,
    max_bucket: int = 100_000,
    compact_every: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the streaming query: each micro-batch is embedding-deduped
    against all prior history and appended to the corpus + stores.
    Banding params default to the production sizing and are recorded
    in (and checked against) the store's config on every batch.
    ``compact_every=N`` folds the
    store's accumulated per-batch partitions every N batches (after
    the batch-id-N update commits its partition), bounding partition
    count for unbounded drains — the SCALE.md 30-batch sweeps price
    the cadence: ~10 for the sketch-grid stores, 50-100 for the dedup
    stores, where per-batch partials are larger and folds dearer. A
    crash between the fold and the checkpoint commit is safe: the
    replayed batch rewrites only its own (live, kept) partition, and
    the fold itself is crash-safe via the durable_fold commit marker."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        embedding_dedup_batch_against_store(
            batch_df,
            batch_id,
            store_dir=store_dir,
            out_dir=out_dir,
            vec_col=vec_col,
            id_col=id_col,
            threshold=threshold,
            n_planes=n_planes,
            band_bits=band_bits,
            seed=seed,
            max_bucket=max_bucket,
        )
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact_embedding_dedup_store(batch_df.sparkSession, store_dir)

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
