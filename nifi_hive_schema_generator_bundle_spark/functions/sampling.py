"""Deterministic content-hash sampling and dataset splitting.

Training-data pipelines need splits that are (a) stable across runs and
cluster layouts — a document must land in the same split tomorrow, on any
partitioning — and (b) computable without a shuffle or a stored
assignment table. ``df.sample``/``TABLESAMPLE`` give neither (seeded
per-partition RNG changes with the partition layout). Hashing a stable
key does: the assignment is a pure narrow projection, embarrassingly
parallel at any scale, and every engine that agrees on md5 agrees on the
split (which is what lets the DuckDB oracle replay it bit-for-bit).

md5 rather than Spark's ``hash``/``xxhash64`` precisely because the
latter are engine-private; the first hex nibble gives 16 even buckets,
enough resolution for the holdout fractions these pipelines use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_bucket", "hash_split", "hash_sample", "stratified_hash_sample"]

_NIBBLES = "0123456789abcdef"


def hash_bucket(key: Column | str) -> Column:
    """0-15 bucket from the first md5 nibble of the key's string form."""
    key = F.col(key) if isinstance(key, str) else key
    nib = F.substring(F.md5(key.cast("string")), 1, 1)
    # position in the hex alphabet; instr is 1-based
    return F.instr(F.lit(_NIBBLES), nib) - 1


def hash_split(
    df: DataFrame,
    key: str,
    *,
    holdout_sixteenths: int = 2,
    split_col: str = "split",
) -> DataFrame:
    """Tag each row 'holdout' or 'train' by content hash of ``key``.

    ``holdout_sixteenths``/16 of rows (in expectation) become holdout;
    2/16 = 12.5% is the default. Deterministic per key value: duplicate
    keys always co-locate in one split (no train/test leakage)."""
    if not 0 <= holdout_sixteenths <= 16:
        raise ValueError("holdout_sixteenths must be in [0, 16]")
    return df.withColumn(
        split_col,
        F.when(
            hash_bucket(key) < holdout_sixteenths, F.lit("holdout")
        ).otherwise(F.lit("train")),
    )


def hash_sample(df: DataFrame, key: str, *, sixteenths: int = 1) -> DataFrame:
    """Keep a deterministic ~``sixteenths``/16 fraction of rows by key
    hash. Unlike ``df.sample`` this survives re-runs, repartitioning,
    and engine changes unchanged — the contract a reproducible eval
    subset needs."""
    if not 0 <= sixteenths <= 16:
        raise ValueError("sixteenths must be in [0, 16]")
    return df.filter(hash_bucket(key) < sixteenths)


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    sixteenths: dict[str, int],
    *,
    default_sixteenths: int = 16,
) -> DataFrame:
    """Per-stratum deterministic downsampling (e.g. rebalance a corpus
    dominated by one language: keep 4/16 of 'en', all of the rest).

    Same md5-bucket mechanics as ``hash_sample`` — stable across runs
    and engines — with the keep-threshold chosen per stratum value.
    Still a pure narrow filter: no shuffle, no per-stratum pass; one
    scan handles every stratum."""
    for v in list(sixteenths.values()) + [default_sixteenths]:
        if not 0 <= v <= 16:
            raise ValueError("sixteenths values must be in [0, 16]")
    thr = F.lit(default_sixteenths)
    for value, k in sorted(sixteenths.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(k)).otherwise(thr)
    return df.filter(hash_bucket(key) < thr)
