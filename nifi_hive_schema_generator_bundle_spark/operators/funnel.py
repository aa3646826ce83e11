"""Ordered-sequence funnel analysis over event streams.

"How many users viewed, then clicked, then purchased — in that order?"
is the MATCH_RECOGNIZE-shaped question every event pipeline asks and the
reference has no analog for. The implementation is deliberately NOT a
per-user sorted-array fold: it is ``len(steps)`` chained per-key
aggregations, each a partial-agg + join on the user key, so event bodies
never collect into per-user arrays (a whale user with 10⁸ events would
OOM an array-based fold; a min() aggregate doesn't care).

Each stage k computes t_k = min(ts of step-k events strictly after
t_{k-1}) — the earliest completion of the prefix, which is the standard
greedy funnel semantics (if any ordered matching exists, matching each
step as early as possible finds one).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_steps", "funnel_counts"]


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user funnel progress: (user, step_reached, t_first, t_last)
    where step_reached ∈ [0, len(steps)] counts the longest prefix of
    ``steps`` completed in strict timestamp order; t_first/t_last bound
    the matched span (NULL when step_reached == 0).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    # ts as comparable micros (robust to TIMESTAMP vs TIMESTAMP_NTZ)
    e = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
    )
    cur = e.filter(F.col("et") == steps[0]).groupBy("u").agg(
        F.min("t").alias("t1")
    )
    for k, step in enumerate(steps[1:], start=2):
        nxt = (
            e.filter(F.col("et") == step)
            .join(cur, "u")
            .filter(F.col("t") > F.col(f"t{k - 1}"))
            .groupBy("u", *[f"t{j}" for j in range(1, k)])
            .agg(F.min("t").alias(f"t{k}"))
        )
        # left join keeps users stuck at earlier steps
        cur = cur.join(nxt.select("u", f"t{k}"), "u", "left")
    reached = reduce(
        lambda acc, k: acc + F.col(f"t{k}").isNotNull().cast("int"),
        range(2, len(steps) + 1),
        F.lit(1),
    )
    lasts = [F.col(f"t{k}") for k in range(len(steps), 1, -1)]
    return cur.select(
        F.col("u").alias(user_col),
        reached.alias("step_reached"),
        F.col("t1").alias("t_first"),
        (F.coalesce(*lasts, F.col("t1")) if lasts else F.col("t1")).alias(
            "t_last"
        ),
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic funnel report: for each step k (1-based), how many users
    completed the ordered prefix steps[0..k-1]. Monotonically
    non-increasing by construction."""
    per_user = funnel_steps(
        events, steps, user_col=user_col, type_col=type_col, ts_col=ts_col
    )
    spark = events.sparkSession
    step_df = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step int, step_name string"
    )
    # aggregate FIRST (≤ len(steps) rows), then resolve the >= fan-out
    # between two bounded literal-sized frames — the user-level frame
    # never enters a non-equi join
    by_reached = per_user.groupBy("step_reached").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        F.broadcast(step_df)
        .join(by_reached, F.col("step_reached") >= F.col("step"))
        .groupBy("step", "step_name")
        .agg(F.sum("n").alias("n_users"))
        .orderBy("step")
    )
