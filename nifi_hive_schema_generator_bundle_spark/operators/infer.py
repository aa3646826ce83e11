"""Distributed schema inference (SURVEY §2 O5/O6/O7/O8).

Two execution paths over the same lattice semantics:

* **native** (the 100 TB default): ``spark.read.option("primitivesAsString",
  "true").json(...)`` — Spark's built-in distributed JSON inference is the
  same shape as the reference fold (per-record infer + associative
  ``compatibleType`` merge with a ``StringType`` conflict fallback), runs
  entirely JVM-side, and scales linearly with executors. The result is
  post-canonicalized into the lattice universe (NullType→String handled by
  ``finalize_type`` at render time; Spark sorts struct fields by name —
  order differences are accepted per SURVEY §1.4 rule 6).

* **exact** (reference-parity): per-partition fold of the pure-Python
  lattice merge via ``mapInPandas`` — each Arrow batch is collapsed to ONE
  serialized partial schema row, so at most ``numPartitions`` tiny rows
  cross the executor→driver boundary (combiner-style, **no shuffle**).
  This preserves first-seen field order and the exact conflict rules.
  It pays one Python parse per record, so it's the differential-testing /
  golden-parity path, not the default at scale.

Both paths are single-scan; there is no whole-content buffering anywhere
(the reference's ``IOUtils.toString`` double-read at
HiveSchemaGenerator.scala:75,98,116 is fixed by design — SURVEY §4).
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, StructType

from ..plans.lattice import infer_raw, merge_raw, merge_types, type_from_dict

__all__ = ["infer_schema_native", "infer_schema_exact", "infer_schema_df"]


def infer_schema_native(
    spark: SparkSession, path: str, *, primitives_as_string: bool = True
) -> StructType:
    """Built-in distributed inference over NDJSON file(s) at ``path``.

    ``primitivesAsString=true`` maps every scalar to STRING, matching the
    reference lattice's scalar rule; conflicts fall back to StringType in
    Spark's ``compatibleType`` just like CreateHQL.scala:63-64.
    """
    reader = spark.read.option("primitivesAsString", str(primitives_as_string).lower())
    return reader.json(path).schema


def _fold_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Collapse every Arrow batch of JSON lines into one partial-schema row.

    Folds in the raw-shape lattice (plain dict/list/str) — pyspark type
    objects never appear in the per-record loop (~10× faster; see
    lattice.infer_raw)."""
    loads = json.loads
    schema = _SENTINEL = object()
    for pdf in batches:
        for line in pdf.iloc[:, 0]:
            if line is None or line == "":
                continue
            try:
                t = infer_raw(loads(line))
            except ValueError:
                continue  # malformed rows are routed by operators.routing, not here
            schema = t if schema is _SENTINEL else merge_raw(schema, t)
    if schema is not _SENTINEL:
        yield pd.DataFrame({"part": [json.dumps(schema)]})


def infer_schema_df(df: DataFrame, column: str = "value") -> DataType:
    """Reference-exact inference over a DataFrame's JSON-string column.

    Plan shape: scan → mapInPandas (per-partition fold → 1 row each) →
    driver merge of ≤ numPartitions partials. No shuffle, no collect of
    data rows; the driver sees only serialized schema trees.
    """
    from ..functions.partitioning import ensure_min_partitions

    partials = (
        ensure_min_partitions(
            df.select(F.col(column).cast("string").alias("value"))
        )
        .mapInPandas(_fold_batches, schema="part string")
        .collect()
    )
    schema: DataType = StructType([])
    for row in partials:
        schema = merge_types(schema, type_from_dict(json.loads(row["part"])))
    return schema


def infer_schema_exact(spark: SparkSession, path: str) -> DataType:
    """Reference-exact inference over NDJSON file(s): one text scan
    (``spark.read.text`` splits lines for free) + the partial-fold plan."""
    return infer_schema_df(spark.read.text(path), "value")


def _fold_batches_keyed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Keyed variant of ``_fold_batches``: one partial schema per
    (partition, key) instead of per partition."""
    loads = json.loads
    schemas: dict = {}
    for pdf in batches:
        for key, line in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
            if line is None or line == "":
                continue
            try:
                t = infer_raw(loads(line))
            except ValueError:
                continue
            prev = schemas.get(key)
            schemas[key] = t if key not in schemas else merge_raw(prev, t)
    if schemas:
        yield pd.DataFrame(
            {
                "key": list(schemas.keys()),
                "part": [json.dumps(v) for v in schemas.values()],
            }
        )


def infer_schema_by_key(
    df: DataFrame, json_col: str, key_col: str
) -> dict[str, DataType]:
    """Reference-exact inference per routing key in ONE pass.

    Plan shape: scan → mapInPandas (per-partition dict of key → partial
    schema, ≤ |keys| rows out per partition) → driver merge. No shuffle
    at all — the per-key fold happens inside each partition and the
    driver sees ``partitions × keys`` tiny serialized trees, never rows.
    The key cardinality is assumed driver-small (it is a DDL list)."""
    from ..functions.partitioning import ensure_min_partitions

    partials = (
        ensure_min_partitions(
            df.select(
                F.col(key_col).cast("string").alias("key"),
                F.col(json_col).cast("string").alias("value"),
            )
        )
        .mapInPandas(_fold_batches_keyed, schema="key string, part string")
        .collect()
    )
    out: dict[str, DataType] = {}
    for row in partials:
        t = type_from_dict(json.loads(row["part"]))
        out[row["key"]] = (
            merge_types(out[row["key"]], t) if row["key"] in out else t
        )
    return out
