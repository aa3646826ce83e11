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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "funnel_steps",
    "funnel_counts",
    "position_attribution",
    "transition_matrix",
    "session_paths",
]


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


def position_attribution(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    touch_types: list[str] | None = None,
    purchase_type: str = "purchase",
    first_weight: float = 0.4,
    last_weight: float = 0.4,
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: every touch
    event is assigned to the user's NEXT purchase (the journey), and the
    purchase's value is split across the journey's touches — ``first_
    weight`` to the first touch, ``last_weight`` to the last, the
    remainder evenly over the middle (a single touch takes 1.0, a pair
    splits first/last proportionally). The marketing-analytics sibling
    of the as-of join: asof_join answers "which single touch preceded
    this purchase", this answers "how much credit does each CHANNEL get
    for it".

    Returns (channel, n_touches, credited_value) per touch type.

    Scale shape — no touch × purchase pair join anywhere: the
    journey key is a FORWARD conditional window (min purchase
    timestamp over the following frame per user), so each touch maps
    to exactly one journey in the same single per-user sort the
    sessionizer uses. Position/count ride one more window over the
    (user, journey) partition, purchase values come back via an
    equi-join on (user, purchase_ts), and the final rollup is a
    |channels|-row aggregate. Whale users cost a big sort partition,
    never a quadratic pair set — the funnel module's rule.
    """
    if touch_types is not None and not touch_types:
        raise ValueError("touch_types must be None or non-empty")
    tw = F.unix_micros(F.col(ts_col).cast("timestamp"))
    is_purchase = F.col(type_col) == purchase_type
    ev = events.select(
        F.col(user_col).alias("__u"),
        tw.alias("__t"),
        F.col(type_col).alias("__c"),
        F.col(value_col).cast("double").alias("__v"),
        is_purchase.alias("__p"),
    )
    if touch_types is not None:
        ev = ev.filter(
            F.col("__p") | F.col("__c").isin(*touch_types)
        )
    # journey id: earliest purchase at-or-after this event (a purchase
    # belongs to its own journey, closing it). RANGE frame, not ROWS: a
    # touch and a purchase sharing a timestamp must see each other
    # regardless of how the sort broke the tie
    w_fwd = (
        Window.partitionBy("__u")
        .orderBy("__t")
        .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ev = ev.withColumn(
        "__j", F.min(F.when(F.col("__p"), F.col("__t"))).over(w_fwd)
    ).filter(F.col("__j").isNotNull())
    touches = ev.filter(~F.col("__p")).select("__u", "__t", "__c", "__j")
    purchases = ev.filter(F.col("__p")).select(
        F.col("__u"), F.col("__t").alias("__j"), F.col("__v")
    )
    # channel tiebreak: same-instant touches order deterministically;
    # same-(ts, channel) dupes may swap positions but their weights land
    # in the same channel bucket either way
    w_j = Window.partitionBy("__u", "__j").orderBy("__t", "__c")
    w_jn = Window.partitionBy("__u", "__j")
    mid = F.lit(1.0 - first_weight - last_weight)
    credit = (
        F.when(F.col("__k") == 1, F.lit(1.0))
        .when(
            F.col("__k") == 2,
            F.when(
                F.col("__pos") == 1,
                F.lit(first_weight / (first_weight + last_weight)),
            ).otherwise(F.lit(last_weight / (first_weight + last_weight))),
        )
        .when(F.col("__pos") == 1, F.lit(first_weight))
        .when(F.col("__pos") == F.col("__k"), F.lit(last_weight))
        .otherwise(mid / (F.col("__k") - 2))
    )
    credited = (
        touches.withColumn("__pos", F.row_number().over(w_j))
        .withColumn("__k", F.count(F.lit(1)).over(w_jn))
        .join(purchases, ["__u", "__j"])
        .select(
            F.col("__c").alias("channel"),
            (credit * F.col("__v")).alias("__cv"),
        )
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(F.sum("__cv"), 4).alias("credited_value"),
        )
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
    *,
    terminal: str | None = None,
) -> DataFrame:
    """First-order Markov transition statistics over per-key event
    sequences: (from_state, to_state, n_transitions, p), where ``p``
    row-normalizes the counts over each from_state (rounded to 6).

    ``to_state`` comes from ONE ``lead()`` within the key's ordered
    window — the whole sequence model costs a single shuffle on
    ``key_col`` (the window sort), then a map-side-combinable pair
    count whose output is bounded by |states|², never by events. Pass
    ``order_cols`` with a total-order tiebreak (e.g. ``["ts",
    "event_id"]``) or equal timestamps make lead() nondeterministic.
    Each key's last event transitions to ``terminal`` if given (so
    rows(p) sums to 1 including sequence ends) or is dropped if None.
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    nxt = F.lead(state_col).over(w)
    pairs = df.select(
        F.col(state_col).alias("from_state"),
        (
            F.coalesce(nxt, F.lit(terminal)) if terminal is not None else nxt
        ).alias("to_state"),
    ).filter(F.col("to_state").isNotNull())
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    row_tot = Window.partitionBy("from_state")
    return counts.withColumn(
        "p",
        F.round(
            F.col("n_transitions")
            / F.sum("n_transitions").over(row_tot),
            6,
        ),
    )


def session_paths(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak: str,
    gap_seconds: int = 1800,
    depth: int = 3,
    top_k: int = 10,
) -> DataFrame:
    """Top-k session-opening journey paths: sessionize (gaps-and-
    islands, ``gap_seconds`` timeout), take each session's first
    ``depth`` events in (ts, tiebreak) order, and count sessions per
    '>'-joined path string — the "how do sessions start" readout
    behind landing-flow design, one level deeper than the 1-step
    ``transition_matrix``.

    Determinism: the within-session order carries a total tiebreak;
    paths shorter than ``depth`` render their actual length (both
    engines' concat_ws skips the NULL step slots identically); output
    carries (n_sessions DESC, path) ordering. Counting is exact
    integers.

    Scale: one shuffle on the user key covers sessionization AND the
    per-session pivot (same partitioning, no second shuffle of data
    rows); the path table is bounded by |types|^depth, never rows."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak)
    prev = F.lag(ts_col).over(w)
    new_s = F.when(
        prev.isNull()
        | (F.unix_timestamp(ts_col) - F.unix_timestamp(prev) > gap_seconds),
        1,
    ).otherwise(0)
    sess = df.withColumn("__sid", F.sum(new_s).over(w))
    ws = Window.partitionBy(user_col, "__sid").orderBy(ts_col, tiebreak)
    stepped = sess.withColumn("__step", F.row_number().over(ws)).filter(
        F.col("__step") <= depth
    )
    slots = [
        F.max(F.when(F.col("__step") == i, F.col(type_col))).alias(f"__s{i}")
        for i in range(1, depth + 1)
    ]
    per_session = stepped.groupBy(user_col, "__sid").agg(*slots)
    path = F.concat_ws(">", *[f"__s{i}" for i in range(1, depth + 1)])
    return (
        per_session.groupBy(path.alias("path"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(top_k)
    )
