"""Dataset profiling: the per-column data-quality report every ingest
pipeline runs before trusting a new drop.

One wide aggregation computes every column's stats in a single scan —
n, nulls, distincts, min/max (rendered as strings so heterogeneous
column types stack into one long-format frame). The exact distinct
count is the oracle-checkable default at test scale; at 100 TB pass
``approx=True`` to swap in the HLL sketch (same report shape, constant
memory), which is why the report schema keeps the column name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile"]


def profile(
    df: DataFrame, cols: list[str] | None = None, *, approx: bool = False
) -> DataFrame:
    """Long-format profile: (column, n, n_null, n_distinct, min_s, max_s).

    All columns' statistics come out of ONE aggregate (a single scan +
    a 1-row shuffle) and are unpivoted driver-side from that scalar row
    — profiling never becomes per-column jobs."""
    cols = cols or df.columns
    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            distinct(c).alias(f"__dist_{c}"),
            F.min(F.col(c).cast("string")).alias(f"__min_{c}"),
            F.max(F.col(c).cast("string")).alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = [
        (
            c,
            row["__n"],
            row[f"__null_{c}"],
            row[f"__dist_{c}"],
            row[f"__min_{c}"],
            row[f"__max_{c}"],
        )
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        out,
        "column string, n bigint, n_null bigint, n_distinct bigint, "
        "min_s string, max_s string",
    )
