"""Survival analysis: Kaplan-Meier / Nelson-Aalen over right-censored
durations — the "how long until a user re-engages / churns" readout
a data-curation or product-analytics pipeline asks of event logs.

Model: each subject contributes a ``duration`` (integer days) and an
``observed`` flag (1 = the terminal event happened, 0 = right-censored
at the corpus horizon). The life table groups subjects by duration:

* ``n_risk(t)``  — subjects with duration >= t (at risk just before t)
* ``d(t)``       — observed events at exactly t
* Kaplan-Meier   — S(t) = prod_{u<=t, d(u)>0} (n_risk(u)-d(u))/n_risk(u)
* Nelson-Aalen   — H(t) = sum_{u<=t, d(u)>0} d(u)/n_risk(u)

Determinism ledger (the exact-integer discipline of ``operators/pca.py``
and ``functions/timeseries.user_decayed_value``, so the DuckDB twin
hash-matches bit-for-bit):

- durations are integer day differences between DATEs — exact.
- the life table is pure integer counting — exact.
- the K-M product is a SEQUENTIAL integer recurrence at scale 10^12:
  ``s := s * (n_risk - d) // n_risk`` folded over event times in
  ascending order. Integer floor-division at every step, no float
  anywhere; the oracle replays the identical recurrence with a
  recursive CTE over HUGEINTs.
- the N-A hazard quantizes each term independently
  (``d * 10^12 // n_risk``) and sums — order-independent, exact.

Scale shape: the per-subject reduction is one shuffle on the subject
key; the life table is bounded by the number of DISTINCT integer
durations — at most the day-span of the corpus (thousands), never the
row count — so collecting it to the driver for the sequential K-M fold
is a bounded scalar-state move (the ``pca.py`` moment-rows contract),
not a data materialization. 100 TB of orders still folds over <= ~10^4
life-table rows.

Reference parity note: the reference bundle (CreateHQL.scala) has no
analytics operators; this is LLM-pipeline extension surface
(SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 10**12


def subject_durations(
    df: DataFrame,
    key: str,
    date_col: str,
    tiebreak: str,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Per-observation time-to-next-event table (repeat-event survival).

    Every row of ``df`` becomes one subject: duration = days until the
    SAME key's next event (observed=1), or days until the corpus's last
    date (observed=0, right-censored). ``tiebreak`` makes the
    within-key ordering total so lead() is engine-independent.
    ``extra_cols`` pass through unchanged (e.g. a treatment-group flag
    for ``log_rank``).
    """
    extra_cols = extra_cols or []
    d = F.to_date(date_col)
    # corpus horizon: 1-row scalar aggregate broadcast-crossed onto the
    # fact table (the allowlisted scalar-broadcast pattern) — NOT an
    # unpartitioned window, which would single-partition the data.
    horizon = df.agg(F.max(d).alias("__horizon"))
    staged = df.select(
        d.alias("__d"), F.col(tiebreak).alias("__tb"), key, *extra_cols
    )
    nxt = F.lead("__d").over(
        Window.partitionBy(key).orderBy("__d", "__tb")
    )
    return (
        staged.withColumn("__nxt", nxt)
        .join(F.broadcast(horizon))
        .select(
            F.when(F.col("__nxt").isNotNull(), F.datediff("__nxt", "__d"))
            .otherwise(F.datediff("__horizon", "__d"))
            .alias("duration"),
            F.when(F.col("__nxt").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("observed"),
            *extra_cols,
        )
    )


def life_table(subjects: DataFrame) -> DataFrame:
    """Aggregate (duration, observed) subjects into the classic life
    table: one row per distinct duration with event/censor counts and
    the at-risk count. One shuffle on ``duration``; output is bounded
    by the corpus day-span."""
    total = subjects.count()
    by_t = subjects.groupBy(F.col("duration").alias("t_day")).agg(
        F.sum("observed").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("leaving"),
    )
    w = Window.orderBy("t_day").rowsBetween(Window.unboundedPreceding, -1)
    return by_t.select(
        "t_day",
        (F.lit(total) - F.coalesce(F.sum("leaving").over(w), F.lit(0)))
        .cast("long")
        .alias("n_risk"),
        "d",
    )


def kaplan_meier(subjects: DataFrame) -> DataFrame:
    """Quantized Kaplan-Meier + Nelson-Aalen curve over event times.

    Returns one row per duration with d > 0: ``t_day, n_risk, d,
    survival_q, hazard_q`` where survival_q is the scale-10^12 integer
    K-M recurrence and hazard_q the scale-10^12 N-A sum. The life table
    (bounded by day-span) is folded on the driver — exact Python ints,
    no float, no overflow."""
    spark = subjects.sparkSession
    rows = life_table(subjects).filter(F.col("d") > 0).orderBy("t_day").collect()
    out = []
    s = SCALE
    h = 0
    for r in rows:
        n, d = int(r["n_risk"]), int(r["d"])
        s = s * (n - d) // n
        h += d * SCALE // n
        out.append((int(r["t_day"]), n, d, s, h))
    return spark.createDataFrame(
        out,
        "t_day int, n_risk long, d long, survival_q long, hazard_q long",
    )


def log_rank(subjects: DataFrame, group_col: str) -> DataFrame:
    """Two-group log-rank test (Mantel-Cox) over right-censored
    durations — "do these two segments churn at different rates",
    the canonical survival A/B companion to ``kaplan_meier``.

    At each event time t the group-1 event count O1 is compared with
    its hypergeometric expectation under H0 (equal hazards):

        E1(t) = d·n1/n        V(t) = d·(n1/n)·(1−n1/n)·(n−d)/(n−1)

    and the statistic is (ΣO1 − ΣE1)² / ΣV ~ χ²(1). Every per-time
    term quantizes independently at scale 10^6 with integer floor
    division (order-independent sums, the pca.py discipline); the
    bounded life table (day-span rows) folds on the driver with
    arbitrary-precision ints, so no int64 headroom concern at any
    scale — the DuckDB twin replays the same per-term integer
    divisions on HUGEINTs.

    Output ONE row: n_event_times, o1, e1_q (scale 10^6), v_q
    (scale 10^6), logrank_x2_ppm = (o1·10^6 − e1_q)² // v_q
    (χ² in millionths; ≥ 3.84e6 ⇒ p < 0.05). Zero-variance
    degenerate tables (every subject in one group) return v_q = 0 and
    a NULL statistic rather than dividing by zero.
    """
    g = F.col(group_col).cast("int")
    by_t = subjects.groupBy(F.col("duration").alias("t_day")).agg(
        F.sum("observed").cast("long").alias("d"),
        F.sum(F.col("observed") * g).cast("long").alias("d1"),
        F.count(F.lit(1)).cast("long").alias("leaving"),
        F.sum(g).cast("long").alias("leaving1"),
    )
    total = subjects.count()
    total1 = subjects.agg(F.sum(g)).collect()[0][0] or 0
    w = Window.orderBy("t_day").rowsBetween(Window.unboundedPreceding, -1)
    life = by_t.select(
        "t_day",
        "d",
        "d1",
        (F.lit(total) - F.coalesce(F.sum("leaving").over(w), F.lit(0)))
        .cast("long")
        .alias("n"),
        (F.lit(total1) - F.coalesce(F.sum("leaving1").over(w), F.lit(0)))
        .cast("long")
        .alias("n1"),
    ).filter(F.col("d") > 0)
    rows = life.collect()
    Q = 10**6
    n_times = 0
    o1 = 0
    e1_q = 0
    v_q = 0
    for r in rows:
        n, n1, d, d1 = int(r["n"]), int(r["n1"]), int(r["d"]), int(r["d1"])
        n_times += 1
        o1 += d1
        e1_q += d * n1 * Q // n
        if n > 1:
            v_q += d * n1 * (n - n1) * (n - d) * Q // (n * n * (n - 1))
    x2 = (o1 * Q - e1_q) ** 2 // v_q if v_q > 0 else None
    spark = subjects.sparkSession
    return spark.createDataFrame(
        [(n_times, o1, e1_q, v_q, x2)],
        "n_event_times long, o1 long, e1_q long, v_q long, "
        "logrank_x2_ppm long",
    )
