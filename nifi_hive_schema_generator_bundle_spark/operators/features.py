"""Point-in-time feature engineering: the leakage-safe churn snapshot —
per-user features computed ONLY from history before a cutoff, labeled
ONLY by activity at-or-after it. This is the contract every training-
set builder must honor (a feature that peeks past the cutoff is label
leakage, the classic silent model-eval inflation), expressed as one
conditional aggregation so the cutoff discipline is structural, not a
convention the caller must remember.

Layout: cutoff = corpus horizon minus ``label_days``. For each user
with >= 1 pre-cutoff event:

* ``n_events``        — pre-cutoff event count
* ``n_active_days``   — distinct pre-cutoff activity days
* ``n_types``         — distinct pre-cutoff event types
* ``days_since_last`` — cutoff minus last pre-cutoff activity day
* ``label_active``    — 1 iff any event lands in [cutoff, horizon]

Determinism: counts and day differences are integers; the horizon is
an in-data scalar (1-row broadcast, the user_decayed_value "now"
class); no float anywhere.

Scale shape: ONE scan + ONE groupBy(user) with conditional aggregates
— features and labels come out of the same shuffle, so there is no
second pass over 100 TB and no features-vs-labels join to skew. The
output is |users|-bounded.

Reference parity note: no analytics in the reference bundle
(CreateHQL.scala); SURVEY.md §2 extension surface (training-data
pipelines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def churn_feature_snapshot(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    label_days: int = 7,
    type_col: str | None = None,
) -> DataFrame:
    """Leakage-safe per-user feature/label table (see module doc)."""
    day = F.to_date(ts_col)
    horizon = df.agg(F.max(day).alias("__horizon")).select(
        "__horizon",
        F.date_sub(F.col("__horizon"), label_days).alias("__cutoff"),
    )
    staged = df.select(
        F.col(user_col).alias("user_key"),
        day.alias("__day"),
        *([F.col(type_col).alias("__type")] if type_col else []),
    ).join(F.broadcast(horizon))
    pre = F.col("__day") < F.col("__cutoff")
    aggs = [
        F.sum(F.when(pre, 1).otherwise(0)).cast("long").alias("n_events"),
        F.countDistinct(F.when(pre, F.col("__day"))).cast("long").alias(
            "n_active_days"
        ),
        F.max(F.when(pre, F.col("__day"))).alias("__last_pre"),
        F.max(F.col("__cutoff")).alias("__cut"),
        F.max(F.when(~pre, 1).otherwise(0)).cast("int").alias("label_active"),
    ]
    if type_col:
        aggs.insert(
            2,
            F.countDistinct(F.when(pre, F.col("__type")))
            .cast("long")
            .alias("n_types"),
        )
    out = staged.groupBy("user_key").agg(*aggs).filter(F.col("n_events") > 0)
    cols = ["user_key", "n_events", "n_active_days"]
    if type_col:
        cols.append("n_types")
    return out.select(
        *cols,
        F.datediff(F.col("__cut"), F.col("__last_pre"))
        .cast("int")
        .alias("days_since_last"),
        "label_active",
    )
