"""Batch-count scaling sweep for the cross-run streaming stores.

The gate entries measure 3 micro-batches; this sweep answers VERDICT r5
#4: does wall-clock stay ≤ linear in BATCH COUNT (store growth is one
partition per batch), and what compaction cadence keeps the per-batch
cost flat? Total data volume is held CONSTANT while batch count varies
(batch b = rows with id % n_batches == b), so any super-linear growth is
store overhead — exactly the thing a 1000-batch production run cares
about and a 3-batch gate can't see.

Per (family, n_batches, cadence) we record: total seconds, mean of the
first 3 and last 3 per-batch times (drift = late batches paying for
store size), the final merged-readout seconds, and the store partition
count at the end. Families:

- hll       — streaming/hll_stream   (register max-merge store)
- histogram — streaming/quantile_stream (bucket count-sum store)
- neardup   — streaming/incremental_near_dedup (band + sig stores)
- spanstats — streaming/span_stream (gram-hash count-sum store, r7)
- embdedup  — streaming/incremental_embedding_dedup (band + vec stores, r7)
- embdedup_prod — same store at PRODUCTION banding/θ (32 planes x 16-bit
  bands, θ=0.9 — the SCALE.md sizing rule, now the operator defaults),
  recording the final batch's candidate/starvation readout (r8)

Usage: python scripts/batch_sweep.py [--quick]
  --quick: 3/10 batches only (CI smoke); default 3/10/30.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def sweep_family(spark, family: str, n_batches: int, cadence: int) -> dict:
    """cadence=0: never compact; k>0: compact every k batches (and once
    at the end so the readout sees the compacted store)."""
    from pyspark.sql import functions as F

    from nifi_hive_schema_generator_bundle_spark.streaming.hll_stream import (
        compact_hll_store,
        hll_batch_update,
        hll_store_estimate,
    )
    from nifi_hive_schema_generator_bundle_spark.streaming.incremental_near_dedup import (
        near_dedup_batch_against_store,
    )
    from nifi_hive_schema_generator_bundle_spark.streaming.quantile_stream import (
        compact_histogram_store,
        histogram_batch_update,
        histogram_store_quantiles,
    )
    from nifi_hive_schema_generator_bundle_spark.streaming.span_stream import (
        compact_span_store,
        span_gram_batch_update,
        span_store_coverage,
    )
    from nifi_hive_schema_generator_bundle_spark.streaming.incremental_embedding_dedup import (
        embedding_dedup_batch_against_store,
    )

    root = tempfile.mkdtemp(prefix=f"bsweep_{family}_")
    store = os.path.join(root, "store")
    out = os.path.join(root, "out")
    per_batch: list[float] = []
    compact_s = 0.0
    last_stats: dict = {}

    if family in ("hll", "histogram"):
        ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        ev = ev.select("event_id", "user_id", "event_type", "value")

    try:
        for b in range(n_batches):
            t0 = time.perf_counter()
            if family == "hll":
                batch = ev.filter(F.col("event_id") % n_batches == b)
                hll_batch_update(
                    batch, b, store_dir=store, key_col="user_id",
                    group_cols=["event_type"],
                )
            elif family == "histogram":
                batch = ev.filter(F.col("event_id") % n_batches == b)
                histogram_batch_update(
                    batch, b, store_dir=store, val_col="value",
                    group_cols=["event_type"],
                    boundaries=[2.0 ** (i / 2.0) for i in range(-10, 30)],
                )
            elif family == "spanstats":
                docs = spark.read.parquet(
                    os.path.join(SF_DIR, "documents.parquet")
                )
                batch = docs.filter(F.col("doc_id") % n_batches == b)
                span_gram_batch_update(batch, b, store_dir=store, k=5)
            elif family == "embdedup":
                emb = spark.read.parquet(
                    os.path.join(SF_DIR, "embeddings.parquet")
                ).filter(
                    F.col("embedding").isNotNull()
                    & (F.size("embedding") == 64)
                )
                batch = emb.filter(F.col("vec_id") % n_batches == b)
                embedding_dedup_batch_against_store(
                    batch, b, store_dir=store, out_dir=out,
                    threshold=0.3, n_planes=8, band_bits=4, dim=64,
                )
            elif family == "embdedup_prod":
                emb = spark.read.parquet(
                    os.path.join(SF_DIR, "embeddings.parquet")
                ).filter(
                    F.col("embedding").isNotNull()
                    & (F.size("embedding") == 64)
                )
                batch = emb.filter(F.col("vec_id") % n_batches == b)
                last_stats = {}
                embedding_dedup_batch_against_store(
                    batch, b, store_dir=store, out_dir=out,
                    threshold=0.9, n_planes=32, band_bits=16, dim=64,
                    stats=last_stats if b == n_batches - 1 else None,
                )
            else:
                docs = spark.read.parquet(
                    os.path.join(SF_DIR, "documents.parquet")
                )
                batch = docs.filter(F.col("doc_id") % n_batches == b)
                near_dedup_batch_against_store(
                    batch, b, store_dir=store, out_dir=out, hash_fn="xxhash64"
                )
            per_batch.append(time.perf_counter() - t0)
            if cadence and (b + 1) % cadence == 0 and family != "neardup":
                t0 = time.perf_counter()
                if family == "hll":
                    compact_hll_store(spark, store, ["event_type"])
                elif family == "spanstats":
                    compact_span_store(spark, store)
                elif family == "embdedup_prod":
                    from nifi_hive_schema_generator_bundle_spark.streaming.incremental_embedding_dedup import (
                        compact_embedding_dedup_store,
                    )

                    compact_embedding_dedup_store(spark, store)
                else:
                    compact_histogram_store(spark, store, ["event_type"])
                compact_s += time.perf_counter() - t0

        t0 = time.perf_counter()
        if family == "hll":
            n_rows = hll_store_estimate(
                spark, store, ["event_type"]
            ).count()
        elif family == "histogram":
            n_rows = histogram_store_quantiles(
                spark, store, ["event_type"],
                [2.0 ** (i / 2.0) for i in range(-10, 30)],
                [0.5, 0.9, 0.99],
            ).count()
        elif family == "spanstats":
            docs = spark.read.parquet(
                os.path.join(SF_DIR, "documents.parquet")
            )
            n_rows = span_store_coverage(
                spark, store, docs, k=5, min_docs=2
            ).count()
        elif family in ("embdedup", "embdedup_prod"):
            n_rows = spark.read.parquet(out).count()
        else:
            n_rows = spark.read.parquet(out).count()
        readout_s = time.perf_counter() - t0

        store_for_parts = store
        if family == "neardup":
            store_for_parts = os.path.join(store, "sigs")
        elif family in ("embdedup", "embdedup_prod"):
            store_for_parts = os.path.join(store, "vecs")
        parts = (
            len([d for d in os.listdir(store_for_parts)
                 if d.startswith("batch_id=")])
            if os.path.isdir(store_for_parts) else 0
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)

    k = min(3, len(per_batch))
    return {
        "family": family,
        "n_batches": n_batches,
        "cadence": cadence,
        "total_s": round(sum(per_batch), 2),
        "first3_s": round(sum(per_batch[:k]) / k, 2),
        "last3_s": round(sum(per_batch[-k:]) / k, 2),
        "compact_s": round(compact_s, 2),
        "readout_s": round(readout_s, 2),
        "readout_rows": n_rows,
        "store_parts": parts,
        **(
            {"last_batch_stats": last_stats} if last_stats else {}
        ),
    }


def main() -> None:
    from nifi_hive_schema_generator_bundle_spark.session import get_session

    quick = "--quick" in sys.argv
    counts = [3, 10] if quick else [3, 10, 30]
    wanted = [a for a in sys.argv[1:] if not a.startswith("--")]
    spark = get_session(
        "batch_sweep",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for family in wanted or ("hll", "histogram", "spanstats", "embdedup", "neardup"):
        for nb in counts:
            cadences = (
                [0]
                if family in ("neardup", "embdedup") or nb < 30
                else [0, 10]
            )
            for cad in cadences:
                r = sweep_family(spark, family, nb, cad)
                rows.append(r)
                print(json.dumps(r), flush=True)
    print("| family | batches | cadence | total s | first3 s | last3 s | "
          "compact s | readout s | parts |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['family']} | {r['n_batches']} | "
            f"{r['cadence'] or '—'} | {r['total_s']} | {r['first3_s']} | "
            f"{r['last3_s']} | {r['compact_s'] or '—'} | {r['readout_s']} | "
            f"{r['store_parts']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
