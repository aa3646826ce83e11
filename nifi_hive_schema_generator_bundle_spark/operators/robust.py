"""Robust statistics over grouped daily series: Theil-Sen trend
estimation and median-absolute-deviation (MAD) outlier detection — the
monitoring pair that survives the heavy-tailed, spike-ridden volume
series ordinary least squares and z-scores choke on.

* **Theil-Sen** (Theil 1950; Sen 1968): the median of all pairwise
  slopes (y2-y1)/(x2-x1) — a 29%-breakdown-point trend estimator. Each
  slope quantizes EXACTLY as ``(y2-y1) * 10^6 div (x2-x1)`` (both
  engines truncate integer division toward zero — verified for
  negative slopes), and the median is a RANK SELECTION (the lower
  median, row (n+1) div 2 of the ordered slope list), not an average —
  so the estimate is an exact integer both engines agree on.
* **MAD**: med = lower-median of the daily counts, mad = lower-median
  of |cnt - med|; a day is an outlier when |cnt - med| > k * mad
  (k=3, the classic Hampel rule, as an integer comparison). All rank
  selections, no float.

Determinism ledger: every value is an integer; medians are values AT a
rank (ties collapse to the same value regardless of tie order, and the
ordering carries day/pair tiebreaks anyway); division is `div`
(truncation) on both engines.

Scale shape: both operate on the (group, day) count table —
dimension-bounded (|groups| x |days|), never row-bounded. Theil-Sen's
pair fan-out is C(days, 2) PER GROUP, bounded by the calendar
(365 days -> 66k pairs — trivial); the raw-event reduction before it
is one map-side-combinable shuffle. Nothing here touches data rows
after the first aggregate.

Reference parity note: no analytics in the reference bundle
(CreateHQL.scala); SURVEY.md §2 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SLOPE_SCALE = 10**6


def daily_counts(df: DataFrame, group_col: str, ts_col: str) -> DataFrame:
    """(g, day, x=epoch-day int, cnt) — the shared reduction."""
    return df.groupBy(
        F.col(group_col).alias("g"), F.to_date(ts_col).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt")).select(
        "g",
        "day",
        F.datediff(F.col("day"), F.lit("1970-01-01")).cast("long").alias("x"),
        "cnt",
    )


def theil_sen_trend(
    df: DataFrame, group_col: str, ts_col: str
) -> DataFrame:
    """Per-group Theil-Sen daily-volume trend: ``g, n_days, n_pairs,
    slope_med_q`` (median pairwise slope in millionths of a count per
    day, exact integer)."""
    d = daily_counts(df, group_col, ts_col)
    b = d.select(
        F.col("g"),
        F.col("x").alias("x2"),
        F.col("cnt").alias("y2"),
    )
    pairs = (
        d.join(b, "g")
        .filter(F.col("x") < F.col("x2"))
        .select(
            "g",
            "x",
            "x2",
            F.expr(f"(y2 - cnt) * {SLOPE_SCALE} div (x2 - x)").alias(
                "slope_q"
            ),
        )
    )
    w = Window.partitionBy("g").orderBy("slope_q", "x", "x2")
    ranked = pairs.select(
        "g",
        "slope_q",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("g")).alias("n_pairs"),
    )
    med = ranked.filter(
        F.col("rn") == F.expr("(n_pairs + 1) div 2")
    ).select("g", F.col("slope_q").alias("slope_med_q"), "n_pairs")
    ndays = d.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return ndays.join(med, "g").select(
        "g", "n_days", F.col("n_pairs").cast("long").alias("n_pairs"),
        "slope_med_q",
    )


def mad_outlier_report(
    df: DataFrame, group_col: str, ts_col: str, k: int = 3
) -> DataFrame:
    """Per-group MAD summary: ``g, n_days, med_cnt, mad_cnt,
    n_outliers`` with the Hampel rule |cnt - med| > k * mad as a pure
    integer comparison (constant series => mad 0 => every unequal day
    flags, the strictest consistent reading)."""
    d = daily_counts(df, group_col, ts_col)
    wm = Window.partitionBy("g").orderBy("cnt", "day")
    ranked = d.withColumn("rn", F.row_number().over(wm)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    med = ranked.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "g", F.col("cnt").alias("med_cnt")
    )
    dev = d.join(med, "g").withColumn(
        "dev", F.abs(F.col("cnt") - F.col("med_cnt"))
    )
    wd = Window.partitionBy("g").orderBy("dev", "day")
    dranked = dev.withColumn("rn", F.row_number().over(wd)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    mad = dranked.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "g", F.col("dev").alias("mad_cnt")
    )
    return (
        dev.join(mad, "g")
        .groupBy("g", "med_cnt", "mad_cnt")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(
                F.when(F.col("dev") > k * F.col("mad_cnt"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select("g", "n_days", "med_cnt", "mad_cnt", "n_outliers")
    )
