"""Time-decayed aggregation — recency-weighted scoring over event data.

"Total engagement, but recent activity counts more" is the standard
freshness-aware ranking signal (user activity scores, trending content,
data-source liveness). The closed form Σ value·2^(−age/half_life) needs
no window, no sort, and no state: it is one narrow projection (age →
weight) plus an ordinary partial-aggregated sum, so it scales exactly
like a plain groupBy-sum at 100 TB.

Determinism note: with integer age units the weight is 2^(−k) — exactly
representable in binary — so every IEEE-754 engine computes the same
per-row weight and cross-engine comparison reduces to float-sum
rounding (handled by round(), like every other float oracle here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "time_decay_sum",
    "rolling_distinct_count",
    "trailing_zscore",
    "seasonal_zscore",
    "daily_distinct_sketches",
    "rolling_distinct_count_approx",
    "forward_fill",
    "daily_spine_fill",
]


def time_decay_sum(
    df: DataFrame,
    group_cols: list[str],
    *,
    value_col: str = "value",
    ts_col: str = "ts",
    half_life_days: int = 7,
    out_col: str = "decayed_value",
) -> DataFrame:
    """Per-group Σ value · 0.5^(age_periods) where age is measured in
    whole ``half_life_days`` periods before the dataset's max timestamp
    (a 1-row broadcast scalar — the deterministic in-data "now").

    Returns group_cols + (n_events, ``out_col``). Whole-period decay
    keeps the weight an exact power of two (see module docstring);
    callers wanting continuous decay can pass fractional ages at the
    cost of engine-exactness.
    """
    if half_life_days < 1:
        raise ValueError("half_life_days must be >= 1")
    ts = F.col(ts_col).cast("timestamp")
    ref = df.agg(F.max(ts).alias("__ref"))
    periods = (
        F.datediff(F.to_date(F.col("__ref")), F.to_date(ts))
        / F.lit(half_life_days)
    ).cast("long")
    # Exact-decimal accumulation (the same recipe as every money
    # aggregate here): cap the exponent at 12 half-lives so
    # 0.5^k is an exact 12-digit decimal, quantize the value to 6
    # decimals, and sum in DECIMAL — order-independent, so partial
    # aggregation and any SQL oracle agree bit-for-bit. A plain double
    # sum differed from DuckDB in the 4th decimal on 2/150 groups
    # (sum-order rounding on a round boundary). Ages ≥ 12 half-lives
    # keep the 2^-12 floor weight (≤ 0.025 % of the value — the decay's
    # own statement that such events no longer matter).
    weight = F.pow(F.lit(0.5), F.least(periods, F.lit(12))).cast(
        "decimal(16,12)"
    )
    val = F.col(value_col).cast("decimal(18,6)")
    # quantize the EXACT decimal sum to 4 decimals with floor(), then
    # cast: round-after-double-cast diverges across engines when the
    # exact sum lands on a half (Spark rounds the shortest decimal
    # rendering, DuckDB the binary value — observed ±1 ulp on 4/150
    # groups), and decimal-cast rounding modes differ too (Spark
    # HALF_UP, DuckDB truncates). floor on the exact decimal is the
    # same integer everywhere. The ×10000 scaling happens per-row BEFORE
    # the sum: val·weight is decimal(35,18); summing first gives
    # decimal(38,18) whose product with 10000 exceeds precision 38, and
    # Spark's allowPrecisionLoss would then round ahead of floor().
    # Casting the row product to decimal(32,18) is exact (|val·weight| <
    # 10^12 ≪ 10^14 headroom) and 32+5+1 = 38, so the scaled product,
    # the sum, and the floor are all computed without any rounding.
    term = (val * weight).cast("decimal(32,18)") * F.lit(10000).cast(
        "decimal(5,0)"
    )
    quantized = F.floor(F.sum(term)).cast("long") / F.lit(10000.0)
    return (
        df.join(F.broadcast(ref))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            quantized.alias(out_col),
        )
    )


def rolling_distinct_count(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_days: int = 7,
    out_col: str = "rolling_distinct",
) -> DataFrame:
    """Trailing-window distinct-key count per day — the WAU/MAU
    family: for every day present in the data, how many distinct keys
    were active in the ``window_days`` days ending on it (inclusive).

    COUNT(DISTINCT) cannot ride a sliding window frame (distinct
    aggregation needs the raw values, not a running total), so the
    textbook plan is a day×day range self-join — quadratic in the
    window. This instead EXPLODES each (day, key) activity fact onto
    the ``window_days`` report days it covers, then distinct-counts per
    report day:

    1. distinct (day, key) — one partial-agg shuffle, collapses any
       number of events per key-day to one row;
    2. explode to (report_day, key) for report days day..day+W-1,
       semi-joined to the days actually present — ×W row growth on the
       collapsed pairs, narrow columns;
    3. distinct count per report day (two-phase distinct aggregate).

    At 100 TB of events the expensive step is (1), which is the minimal
    pass any WAU definition needs; W is a small constant multiplier on
    the collapsed pair table, never on raw events.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    pairs = df.select(day.alias("__day"), F.col(key_col).alias("__key")).distinct()
    days = pairs.select(F.col("__day").alias("__report_day")).distinct()
    covered = pairs.select(
        F.explode(
            F.sequence(
                F.col("__day"),
                F.date_add(F.col("__day"), window_days - 1),
            )
        ).alias("__report_day"),
        "__key",
    ).join(days, "__report_day", "left_semi")
    return (
        covered.groupBy("__report_day")
        .agg(F.count_distinct("__key").alias(out_col))
        .select(F.col("__report_day").alias("day"), out_col)
    )


def forward_fill(
    df: DataFrame,
    cols: list[str],
    *,
    key_cols: list[str],
    order_col: str,
) -> DataFrame:
    """Last-observation-carried-forward per key: every null in ``cols``
    takes the latest non-null value at or before this row's
    ``order_col`` within its key group (leading nulls stay null).

    One window = one shuffle on the key; all fills ride the same
    Exchange+Sort. Keys are the partition unit, so this scales to any
    number of series; a single series with billions of rows is the
    degenerate case (same as any per-key window — split such series
    upstream).
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def daily_spine_fill(
    df: DataFrame,
    *,
    key_col: str,
    day_col: str,
    count_cols: list[str] | None = None,
    ffill_cols: list[str] | None = None,
) -> DataFrame:
    """Regularize a sparse per-(key, day) table onto a dense daily spine:
    each key gets one row for EVERY calendar day between its own first
    and last observed day. ``count_cols`` gap-fill with 0 (additive
    measures), ``ffill_cols`` carry the last observed value forward
    (state-like measures). The standard pre-step for window features,
    anomaly baselines, and chart-ready exports, where "no row" must
    become an explicit zero/carried value instead of a silent hole.

    Plan: one per-key min/max aggregate (partial-agg shuffle on the
    key), spine = ``sequence(first, last)`` exploded — row growth is
    exactly the output size — then a (key, day) left join back and one
    per-key window for the forward-fill. Input rows are assumed already
    collapsed to one per (key, day) (it composes after a daily rollup);
    nothing here scans raw events.
    """
    spans = df.groupBy(key_col).agg(
        F.min(day_col).alias("__d0"), F.max(day_col).alias("__d1")
    )
    spine = spans.select(
        key_col, F.explode(F.sequence("__d0", "__d1")).alias(day_col)
    )
    out = spine.join(df, [key_col, day_col], "left")
    for c in count_cols or []:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    if ffill_cols:
        out = forward_fill(
            out, list(ffill_cols), key_cols=[key_col], order_col=day_col
        )
    return out


def trailing_zscore(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    lookback: int = 7,
    min_history: int = 3,
    threshold: float = 2.0,
) -> DataFrame:
    """Daily-count anomaly detection: each day's event count z-scored
    against the trailing ``lookback`` days (exclusive of the day
    itself — the day under test must not contaminate its own
    baseline). |z| > ``threshold`` flags traffic spikes/drops; days
    with fewer than ``min_history`` trailing days get NULL z (no
    baseline, not an anomaly).

    Determinism: the window sums are integer counts (exact); mean/std
    derive from (n, Σx, Σx²) with the explicit sample-variance formula
    so every engine computes identical doubles — built-in stddev
    implementations differ in both formula and accumulation order.

    Scale shape: the raw scan collapses to ONE ROW PER DAY before the
    analytic window, so the unpartitioned ORDER BY day window runs
    over a bounded table (years → thousands of rows), the same
    contract as ``daily_revenue_moving_avg``. Per-key variants should
    add the key to partitionBy and keep the same frame.
    """
    from pyspark.sql import Window

    daily = (
        df.groupBy(
            F.date_trunc("day", F.col(ts_col)).cast("date").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.orderBy("day").rowsBetween(-lookback, -1)
    hist_n = F.count(F.lit(1)).over(w)
    s = F.sum("n_events").over(w)
    ss = F.sum(F.col("n_events") * F.col("n_events")).over(w)
    mean = s.cast("double") / hist_n
    var = (ss.cast("double") - s.cast("double") * s.cast("double") / hist_n) / (
        hist_n - 1
    )
    std = F.sqrt(var)
    z = F.when(
        (hist_n >= min_history) & (std > 0),
        F.round((F.col("n_events") - mean) / std, 6),
    )
    return daily.select(
        "day",
        "n_events",
        hist_n.cast("int").alias("n_history"),
        z.alias("z_score"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_anomaly"),
    )


def daily_distinct_sketches(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    lgk: int = 12,
) -> DataFrame:
    """One mergeable HyperLogLog sketch per day over ``key_col`` —
    the pre-aggregation store behind every at-scale distinct-count
    dashboard: a day of raw events collapses to a ~2^lgk-byte binary
    that can answer "distinct keys in ANY day range" by union, without
    ever rescanning events. Persist the output (partitioned by day)
    and append new days incrementally.

    Returns (day, sketch) — sketch is the Datasketches HLL binary
    Spark's ``hll_union_agg``/``hll_sketch_estimate`` consume.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    return df.groupBy(day.alias("day")).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("sketch")
    )


def rolling_distinct_count_approx(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_days: int = 7,
    lgk: int = 12,
    out_col: str = "rolling_distinct_approx",
) -> DataFrame:
    """Approximate trailing-window distinct count via mergeable HLL
    sketches — the 100 TB path for ``rolling_distinct_count``: the
    exact variant's one unavoidable pass collapses (day, key) pairs,
    which at billions of distinct keys is itself a massive shuffle;
    this replaces it with a per-day sketch aggregate (map-side
    combinable, ~2^lgk bytes per day out) and answers every report day
    by unioning ≤ ``window_days`` sketches. Standard error ≈
    1.04/√2^lgk (~1.6% at lgk=12) — the accuracy-bound unit test pins
    it against the exact operator.

    Same explode-onto-covered-days shape as the exact variant, but the
    exploded rows are DAYS × window (thousands), not keys.
    """
    sk = daily_distinct_sketches(df, ts_col=ts_col, key_col=key_col, lgk=lgk)
    days = sk.select(F.col("day").alias("__report_day")).distinct()
    covered = sk.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), window_days - 1))
        ).alias("__report_day"),
        "sketch",
    ).join(days, "__report_day", "left_semi")
    return (
        covered.groupBy("__report_day")
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg(F.col("sketch"), F.lit(True))
            ).alias(out_col)
        )
        .select(F.col("__report_day").alias("day"), out_col)
    )


def seasonal_zscore(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    min_history: int = 3,
    threshold: float = 2.0,
) -> DataFrame:
    """Day-of-week seasonal anomaly detection — the weekly-seasonality
    complement of ``trailing_zscore``: each day's event count is
    z-scored against the OTHER days sharing its weekday, so a quiet
    Sunday is judged against Sundays and stops tripping the trend
    detector every weekend (and a spike on a normally-quiet weekday
    stands out even when the trailing week absorbs it).

    Leave-one-out baseline: the day under test is excluded from its own
    weekday's mean/std (same no-self-contamination contract as the
    trailing window). Weekdays with fewer than ``min_history`` OTHER
    observations yield NULL z. Determinism: baselines derive from the
    exact integer (n, Σx, Σx²) per weekday via the explicit
    sample-variance formula — identical doubles on every engine.

    Scale shape: the raw scan collapses to one row per day, the weekday
    model is a SEVEN-row aggregate broadcast back onto the daily table,
    and the leave-one-out algebra is a narrow projection — no window at
    all, unlike the trailing variant. Weekday indexing is pinned to
    days-since-a-known-Sunday mod 7 (0 = Sunday), not to an engine's
    dayofweek() convention.
    """
    daily = df.groupBy(
        F.date_trunc("day", F.col(ts_col)).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    dow = F.pmod(
        F.datediff(F.col("day"), F.to_date(F.lit("2024-01-07"))), F.lit(7)
    ).cast("int")
    d = daily.withColumn("dow", dow)
    model = d.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_d"),
        F.sum("n_events").alias("s_d"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("ss_d"),
    )
    x = F.col("n_events").cast("double")
    n1 = (F.col("n_d") - 1).cast("double")  # peers excluding this day
    s1 = F.col("s_d").cast("double") - x
    ss1 = F.col("ss_d").cast("double") - x * x
    mean = s1 / n1
    var = (ss1 - s1 * s1 / n1) / (n1 - 1)
    # guard on var, not std: sqrt of the -1e-12 a zero-variance weekday
    # can round to is NaN here but an ERROR on engines that replay this
    z = F.when(
        (n1 >= min_history) & (var > 0),
        F.round((x - mean) / F.sqrt(var), 6),
    )
    return (
        d.join(F.broadcast(model), "dow")
        .select(
            "day",
            F.col("dow"),
            F.col("n_events"),
            n1.cast("int").alias("n_peers"),
            z.alias("z_score"),
            F.coalesce(F.abs(z) > threshold, F.lit(False)).alias(
                "is_anomaly"
            ),
        )
    )
