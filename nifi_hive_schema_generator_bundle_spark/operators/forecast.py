"""Forecast backtesting over grouped daily series: a dyadic-weight EWMA
one-step-ahead forecaster evaluated walk-forward — "how predictable is
this stream, per group" — the monitoring readout that decides whether a
volume anomaly detector can be trusted before it pages anyone.

Forecaster: for day t of a group's observed-day sequence, predict from
the previous ``window`` observations with weights 2^(window-1) ... 2^0
(newest heaviest — a truncated EWMA with alpha = 1/2). The weighted sum
is kept as an INTEGER NUMERATOR over the constant denominator
(2^window - 1); the walk-forward absolute error likewise:

    err_num(t) = | (2^window - 1) * actual(t) - sum_k w_k * actual(t-k) |

Determinism ledger: counts are integers, weights are integer literals,
so numerators are exact int64 (counts up to ~4e14 fit under the x255
headroom); the per-group report quantizes MAE as
``10^6 * sum(err_num) // ((2^window - 1) * n_forecasts)`` in integer
``div`` arithmetic — bit-equal to the DuckDB twin, no float anywhere.

Scale shape: one shuffle to (group, day) counts, one window per group
ordered by day (state = ``window`` lags), one final group-by — the
day-count table is |groups| x |days|, dimension-bounded regardless of
input rows. Forecasts are defined over each group's OBSERVED-day
sequence (gap days are skipped, not zero-filled — documented contract;
zero-fill is a one-line calendar left-join away and changes no
machinery).

Reference parity note: no analytics in the reference bundle; SURVEY.md
§2 extension surface (stream-volume monitoring at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 10**6


def ewma_backtest(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    window: int = 8,
) -> DataFrame:
    """Per-group walk-forward EWMA backtest report.

    Returns one row per group: ``n_days, n_forecasts, mae_ppm`` where
    mae_ppm = 10^6 * mean absolute error of the dyadic-EWMA one-step
    forecast over the group's observed-day daily counts."""
    daily = df.groupBy(
        F.col(group_col).alias("g"), F.to_date(ts_col).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    return backtest_from_daily(daily, window=window)


def backtest_from_daily(daily: DataFrame, window: int = 8) -> DataFrame:
    """The backtest over an already-built (g, day, cnt) daily-count
    frame — shared by the batch path above and the streaming
    count-store path (`streaming/forecast_stream`), whose additive
    store merge reproduces this exact frame."""
    den = (1 << window) - 1
    w = Window.partitionBy("g").orderBy("day")
    lagged = daily
    num = F.lit(0).cast("long")
    have_all = F.lit(True)
    for k in range(1, window + 1):
        lag_k = F.lag("cnt", k).over(w)
        lagged = lagged.withColumn(f"l{k}", lag_k)
    for k in range(1, window + 1):
        num = num + F.coalesce(F.col(f"l{k}"), F.lit(0)) * (1 << (window - k))
        have_all = have_all & F.col(f"l{k}").isNotNull()
    scored = lagged.select(
        "g",
        "cnt",
        have_all.alias("ok"),
        F.abs(F.lit(den) * F.col("cnt") - num).alias("err_num"),
    )
    return (
        scored.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(F.when(F.col("ok"), 1).otherwise(0))
            .cast("long")
            .alias("n_forecasts"),
            F.sum(F.when(F.col("ok"), F.col("err_num")).otherwise(0))
            .cast("long")
            .alias("err_sum"),
        )
        .filter(F.col("n_forecasts") > 0)
        .select(
            F.col("g"),
            "n_days",
            "n_forecasts",
            # int64 headroom: err_sum*10^6 < 2^63 holds while
            # mean-daily-count * 255 * n_days < 9.2e12 (~3.6e6/day over
            # 10^4 days); beyond that, swap the numerator to DECIMAL(38,0).
            F.expr(f"{PPM} * err_sum div ({den} * n_forecasts)").alias(
                "mae_ppm"
            ),
        )
    )
