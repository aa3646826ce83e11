"""2-D Pareto frontier (skyline): non-dominated rows under
(minimize cost, maximize benefit).

The multi-objective selection primitive — "cheapest part for its
size", "best quality score for its token budget" — that naive SQL
writes as a quadratic NOT EXISTS anti-join (which is exactly how the
DuckDB oracle replays it). The engine computes it in O(n log n):

1. collapse to one row per cost level (max benefit at that cost) —
   a map-side-combinable aggregate over *distinct costs*;
2. running max of benefit over strictly-cheaper levels — a window
   over the (small) cost-level table, range-partitioned sort;
3. join rows back to their level: a row is dominated iff a strictly
   cheaper level already reaches its benefit, or its own level holds
   a strictly better benefit.

Identical (cost, benefit) duplicates don't dominate each other
(domination requires strict improvement in at least one axis), so
both survive — matching the textbook skyline definition.

Scale: nothing quadratic anywhere; the window runs over distinct cost
levels (≪ rows for any real price-like column), and the join back is
an equi-join AQE broadcasts when the level table is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pareto_frontier"]


def pareto_frontier(
    df: DataFrame,
    cost_col: str,
    benefit_col: str,
    *,
    keep_col: str | None = None,
) -> DataFrame:
    """Rows not dominated under (min ``cost_col``, max ``benefit_col``).

    Dominated ⇔ some other row has cost ≤ and benefit ≥ with at least
    one strict. NULL cost or benefit rows are dropped (no order).
    With ``keep_col`` set, returns all rows with a boolean flag of
    that name instead of filtering."""
    pts = df.filter(
        F.col(cost_col).isNotNull() & F.col(benefit_col).isNotNull()
    )
    levels = pts.groupBy(cost_col).agg(
        F.max(benefit_col).alias("__lvl_best")
    )
    w = (
        Window.orderBy(cost_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    levels = levels.withColumn("__cheaper_best", F.max("__lvl_best").over(w))
    flagged = pts.join(levels, cost_col).withColumn(
        "__dominated",
        (
            F.col("__cheaper_best").isNotNull()
            & (F.col("__cheaper_best") >= F.col(benefit_col))
        )
        | (F.col("__lvl_best") > F.col(benefit_col)),
    )
    if keep_col is not None:
        return flagged.withColumn(keep_col, ~F.col("__dominated")).drop(
            "__lvl_best", "__cheaper_best", "__dominated"
        )
    return flagged.filter(~F.col("__dominated")).drop(
        "__lvl_best", "__cheaper_best", "__dominated"
    )
