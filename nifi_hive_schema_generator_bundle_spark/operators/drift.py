"""Per-group schema drift reporting over a JSON column.

The reference infers ONE schema per flowfile (CreateHQL.scala:12-20);
a production pipeline wants the per-source/per-day view: which fields
does this partition add, miss, or type-conflict relative to the corpus?
``schema_drift_report`` reuses the engine's keyed reference-lattice
inference (operators.infer.infer_schema_by_key — one scan, zero
shuffle, per-partition keyed fold) and diffs every group's top-level
fields against the merge of all groups.

Type classes are the lattice universe at the top level: STRUCT (JSON
object), ARRAY, STRING (every scalar, every conflict — the demotion rule
of CreateHQL.scala:63-64); JSON null absorbs (an all-null field renders
STRING). The report is driver-built from the tiny per-group schema trees
— the data path never shuffles, bodies never leave executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import ArrayType, DataType, StructType

from .infer import infer_schema_by_key
from ..plans.lattice import merge_types

__all__ = ["schema_drift_report", "distribution_drift", "categorical_drift"]


def _type_class(t: DataType) -> str:
    if isinstance(t, StructType):
        return "STRUCT"
    if isinstance(t, ArrayType):
        return "ARRAY"
    return "STRING"  # scalars, NullType (all-null renders STRING)


def schema_drift_report(
    spark: SparkSession,
    df: DataFrame,
    json_col: str,
    key_col: str,
) -> DataFrame:
    """(group, field, group_class, global_class, drift) for every
    top-level field in the merged schema × every group.

    drift ∈ {'same', 'retyped', 'absent'}: 'absent' = no record of the
    group has the key at all; 'retyped' = the group's lattice class
    differs from the corpus-wide class (after conflict demotion).
    Non-object group schemas (e.g. a group whose rows are top-level
    arrays — the reference's "ERROR" case, CreateHQL.scala:91) report
    every field 'absent'.
    """
    per_key = infer_schema_by_key(df, json_col, key_col)
    if not per_key:
        return spark.createDataFrame(
            [],
            "group_key string, field string, group_class string, "
            "global_class string, drift string",
        )
    # Global view = FIELD-WISE merge over the groups whose root is an
    # object. A strict whole-root merge would let one non-object group
    # demote the entire corpus schema to STRING (the reference's "ERROR"
    # case) and erase the field-level report — the report instead keeps
    # field resolution and shows such groups as all-'absent'. Field-wise
    # merge_types still applies the full conflict lattice per field, and
    # matches a per-record class derivation (merge is associative).
    merged_fields: dict[str, DataType] = {}
    for t in per_key.values():
        if isinstance(t, StructType):
            for f in t.fields:
                merged_fields[f.name] = (
                    merge_types(merged_fields[f.name], f.dataType)
                    if f.name in merged_fields
                    else f.dataType
                )
    global_fields = {n: _type_class(t) for n, t in merged_fields.items()}

    rows = []
    for key in sorted(per_key):
        schema = per_key[key]
        group_fields = (
            {f.name: _type_class(f.dataType) for f in schema.fields}
            if isinstance(schema, StructType)
            else {}
        )
        for field in sorted(global_fields):
            gcls = global_fields[field]
            if field not in group_fields:
                rows.append((key, field, "ABSENT", gcls, "absent"))
            elif group_fields[field] != gcls:
                rows.append((key, field, group_fields[field], gcls, "retyped"))
            else:
                rows.append((key, field, gcls, gcls, "same"))
    return spark.createDataFrame(
        rows,
        "group_key string, field string, group_class string, "
        "global_class string, drift string",
    )


def distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    *,
    bins: int = 10,
    lo: float,
    hi: float,
    smoothing: float = 0.5,
) -> DataFrame:
    """Population Stability Index per bucket between a reference and a
    current snapshot of a numeric column — the VALUE-distribution half
    of drift monitoring (``schema_drift_report`` is the structural
    half): PSI < 0.1 is stable, 0.1-0.25 drifting, > 0.25 shifted, the
    standard model-monitoring thresholds.

    Binning is ``value_histogram`` with a PINNED [lo, hi] — mandatory
    here, because drift is only meaningful against fixed bucket edges
    (and the pinned form skips the min/max scan: one pass per
    snapshot, counts shuffle as |bins| rows, bodies never move).
    Empty buckets participate through Laplace smoothing (``smoothing``
    pseudo-count per bucket) so a bucket present in one snapshot and
    absent in the other contributes finite, not infinite, PSI.

    Returns (bucket, bucket_lo, n_ref, n_cur, psi_contrib) — one row
    per bucket including empty ones; total PSI = sum(psi_contrib).
    ``psi_contrib`` is rounded to 6 decimals (the engine's float
    oracle-parity convention).
    """
    from pyspark.sql import Window, functions as F

    from .profile import value_histogram

    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (it guards empty buckets)")
    spark = ref.sparkSession
    w = (float(hi) - float(lo)) / bins
    spine = spark.range(bins).select(F.col("id").cast("int").alias("bucket"))
    hr = value_histogram(ref, col, bins=bins, lo=lo, hi=hi).select(
        "bucket", F.col("n").alias("n_ref")
    )
    hc = value_histogram(cur, col, bins=bins, lo=lo, hi=hi).select(
        "bucket", F.col("n").alias("n_cur")
    )
    j = (
        spine.join(hr, "bucket", "left")
        .join(hc, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
        )
    )
    # totals over the |bins|-row frame: a window on a handful of rows,
    # not a data-side shuffle
    everything = Window.partitionBy(F.lit(1))
    s = float(smoothing)
    p = (F.col("n_ref") + F.lit(s)) / (
        F.sum("n_ref").over(everything) + F.lit(s * bins)
    )
    q = (F.col("n_cur") + F.lit(s)) / (
        F.sum("n_cur").over(everything) + F.lit(s * bins)
    )
    return j.select(
        "bucket",
        F.round(F.lit(float(lo)) + F.col("bucket") * F.lit(w), 6).alias(
            "bucket_lo"
        ),
        "n_ref",
        "n_cur",
        F.round((p - q) * F.log(p / q), 6).alias("psi_contrib"),
    )


def categorical_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    *,
    smoothing: float = 0.5,
) -> DataFrame:
    """PSI over a categorical column (language mix, source mix, label
    mix — the usual "did this crawl's composition shift" check),
    completing ``distribution_drift``'s numeric half. Categories are the
    union observed in either snapshot (NULLs excluded, matching the
    numeric form); a category present on one side only still gets a
    finite contribution through the same Laplace smoothing.

    Scale shape: one count-aggregate per snapshot (shuffle payload =
    |categories| rows), a full-outer join of the two count tables, and
    the two totals ride a 1-row broadcast (the scalar cross-join
    pattern) — deliberately NOT a single-partition window, so a
    high-cardinality column doesn't serialize on one task. Returns
    (value, n_ref, n_cur, psi_contrib); total PSI = sum.
    """
    from pyspark.sql import functions as F

    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (it guards one-sided categories)")
    c = F.col(col)
    nr = (
        ref.filter(c.isNotNull())
        .groupBy(c.cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("n_ref"))
    )
    nc = (
        cur.filter(c.isNotNull())
        .groupBy(c.cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("n_cur"))
    )
    j = (
        nr.join(nc, "value", "full_outer")
        .select(
            "value",
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
        )
    )
    totals = j.agg(
        F.sum("n_ref").cast("double").alias("__tr"),
        F.sum("n_cur").cast("double").alias("__tc"),
        F.count(F.lit(1)).cast("double").alias("__k"),
    )
    s = float(smoothing)
    p = (F.col("n_ref") + F.lit(s)) / (F.col("__tr") + F.lit(s) * F.col("__k"))
    q = (F.col("n_cur") + F.lit(s)) / (F.col("__tc") + F.lit(s) * F.col("__k"))
    return j.crossJoin(F.broadcast(totals)).select(
        "value",
        "n_ref",
        "n_cur",
        F.round((p - q) * F.log(p / q), 6).alias("psi_contrib"),
    )
