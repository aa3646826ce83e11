"""Bitext ANN banding sweep on a planted-parallel fixture (VERDICT r6 #5).

The gate entry (`embedding_bitext_mine_ann`) runs a deliberately tiny
2 bands × 4 bits so its DuckDB oracle stays readable; its docstring
documents the production sizing rule (grow band_bits with the corpus so
per-bucket occupancy stays bounded, add bands to recover recall). This
script demonstrates that rule EMPIRICALLY: a planted-parallel fixture —
every source vector gets one deterministic noisy copy on the target
side (its true translation) among all the other copies as distractors —
swept over bands × bits, reporting candidate volume, candidate-stage
recall of the planted pairs, end-to-end mined recall/precision (margin
1.05 + mutual-best), and wall time. Unit-norm 64-dim sf0.1 embeddings
(2000 vectors per side).

Usage: python scripts/bitext_band_sweep.py [noise ...]
Writes /tmp/bitext_band_sweep.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFFSET = 10**6
# (bands, bits): gate shape, then the documented production shapes
GRID = [(2, 4), (4, 4), (4, 8), (8, 8), (2, 16), (4, 16)]


def main() -> None:
    from nifi_hive_schema_generator_bundle_spark.operators.bitext import (
        lsh_bitext_candidates,
        mine_bitext_pairs,
        quantized_cosine,
    )
    from nifi_hive_schema_generator_bundle_spark.session import get_session

    noise = float(sys.argv[1]) if len(sys.argv) > 1 else 0.05
    spark = get_session(
        "bitext_band_sweep",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    src = (
        spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
        .filter(F.col("embedding").isNotNull() & (F.size("embedding") == 64))
        .select("vec_id", "embedding")
        .persist()
    )
    n_src = src.count()
    # deterministic per-(id, component) hash noise in [-noise, +noise]:
    # the planted translation — same direction plus bounded jitter.
    # pmod, not %: Spark's % keeps the dividend's sign, which would
    # skew the jitter to [-3·noise, +noise] and mislabel the fixture
    jitter = F.transform(
        F.col("embedding"),
        lambda x, i: x
        + (
            F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(10_000)).cast(
                "double"
            )
            / 10_000.0
            - 0.5
        )
        * F.lit(2.0 * noise),
    )
    tgt = src.select(
        (F.col("vec_id") + F.lit(OFFSET)).alias("vec_id"),
        jitter.alias("embedding"),
    ).persist()
    planted_cos = (
        src.alias("a")
        .join(
            tgt.alias("b"),
            F.col("a.vec_id") + OFFSET == F.col("b.vec_id"),
        )
        .select(
            quantized_cosine(F.col("a.embedding"), F.col("b.embedding")).alias(
                "c"
            )
        )
        .agg(F.avg("c"), F.min("c"))
        .collect()[0]
    )
    print(
        f"fixture: {n_src} planted pairs, noise ±{noise}, "
        f"avg planted cosine {planted_cos[0]:.4f} (min {planted_cos[1]:.4f})",
        flush=True,
    )

    rows = []
    for bands, bits in GRID:
        t0 = time.perf_counter()
        cand = lsh_bitext_candidates(
            src, tgt, n_planes=bands * bits, band_bits=bits, dim=64
        ).persist()
        vol = cand.count()
        cand_hits = cand.filter(
            F.col("tgt_id") == F.col("src_id") + OFFSET
        ).count()
        mined = mine_bitext_pairs(
            src, tgt, threshold=1.05, candidates=cand
        ).persist()
        mined_n = mined.count()
        mined_true = mined.filter(
            F.col("tgt_id") == F.col("src_id") + OFFSET
        ).count()
        dt = time.perf_counter() - t0
        cand.unpersist()
        mined.unpersist()
        row = {
            "bands": bands,
            "bits": bits,
            "cand_volume": vol,
            "cand_frac_of_allpairs": round(vol / (n_src * n_src), 4),
            "cand_recall": round(cand_hits / n_src, 3),
            "mined_pairs": mined_n,
            "mined_recall": round(mined_true / n_src, 3),
            "mined_precision": round(mined_true / max(mined_n, 1), 3),
            "sec": round(dt, 2),
        }
        rows.append(row)
        print(
            f"| {bands}×{bits} | {vol} | {row['cand_frac_of_allpairs']:.4f} "
            f"| {row['cand_recall']:.3f} | {row['mined_recall']:.3f} "
            f"| {row['mined_precision']:.3f} | {dt:.1f} |",
            flush=True,
        )
    with open("/tmp/bitext_band_sweep.json", "w") as fh:
        json.dump({"noise": noise, "n_src": n_src, "rows": rows}, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
