"""Feature cleanup: null imputation and outlier winsorization.

The standard pre-training feature-cleanup step: replace missing numerics
with their group mean (or any column with its group mode) so downstream
math never sees NULL, while a ``was_null`` flag preserves the
missingness signal for the model.

Scale shape: statistics are GROUP-sized, never data-sized. One partial
aggregation per call computes every column's sum/count (or per-column
value counts for mode), the resulting |groups|-row table joins back
broadcast, and the fill itself is a narrow ``coalesce`` projection — the
fact table is scanned twice and shuffled zero times (AQE broadcasts the
stats side; with millions of groups it degrades to one ordinary
equi-join shuffle, which is the floor for any group-keyed fill).

Cross-engine determinism: means accumulate in DECIMAL(30,6) (exact,
order-independent), and only the final fill value goes through one
float division + round(6) — both IEEE-deterministic — so the DuckDB
oracle replays fills bit-for-bit. Mode ties break to the smallest
value, making the choice deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["impute_mean", "impute_mode", "winsorize"]

_DEC = "decimal(30,6)"


def _mean_fill(s_col: str, n_col: str):
    return F.when(
        F.col(n_col) > 0, F.round(F.col(s_col).cast("double") / F.col(n_col), 6)
    )


def impute_mean(
    df: DataFrame,
    cols: list[str],
    *,
    group_cols: list[str] | None = None,
    flag_suffix: str = "_was_null",
) -> DataFrame:
    """Fill nulls in numeric ``cols`` with the per-group mean (global
    mean when ``group_cols`` is None or a group is entirely null), and
    add a boolean ``<col>_was_null`` flag per column. One aggregation
    pass covers every column; all-null columns everywhere stay null."""
    gcols = list(group_cols or [])
    aggs = []
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(_DEC)).alias(f"__s_{c}"))
        aggs.append(F.count(c).alias(f"__n_{c}"))
    glob = df.agg(*aggs)
    gfills = glob.select(
        *[_mean_fill(f"__s_{c}", f"__n_{c}").alias(f"__gfill_{c}") for c in cols]
    )
    out = df.join(F.broadcast(gfills))
    if gcols:
        stats = df.groupBy(*gcols).agg(*aggs)
        fills = stats.select(
            *gcols,
            *[_mean_fill(f"__s_{c}", f"__n_{c}").alias(f"__fill_{c}") for c in cols],
        )
        out = out.join(F.broadcast(fills), gcols, "left")
    for c in cols:
        fill = F.col(f"__gfill_{c}")
        if gcols:
            fill = F.coalesce(F.col(f"__fill_{c}"), fill)
        out = out.withColumn(c + flag_suffix, F.col(c).isNull()).withColumn(
            c, F.coalesce(F.col(c), fill)
        )
    drop = [f"__gfill_{c}" for c in cols] + (
        [f"__fill_{c}" for c in cols] if gcols else []
    )
    return out.drop(*drop)


def impute_mode(
    df: DataFrame,
    col: str,
    *,
    group_cols: list[str] | None = None,
    flag_suffix: str = "_was_null",
) -> DataFrame:
    """Fill nulls in ``col`` with the most frequent non-null value of
    its group (smallest-value tiebreak; global mode for all-null
    groups), plus a ``<col>_was_null`` flag. Works for any orderable
    type — the categorical sibling of ``impute_mean``."""
    gcols = list(group_cols or [])
    nn = df.filter(F.col(col).isNotNull())
    counts = nn.groupBy(*gcols, col).agg(F.count("*").alias("__cnt"))
    w = Window.partitionBy(*gcols).orderBy(
        F.col("__cnt").desc(), F.col(col).asc()
    )
    modes = (
        counts.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(*gcols, F.col(col).alias("__mode"))
    )
    gmode = (
        counts.groupBy(col)
        .agg(F.sum("__cnt").alias("__cnt"))
        .orderBy(F.col("__cnt").desc(), F.col(col).asc())
        .limit(1)
        .select(F.col(col).alias("__gmode"))
    )
    # left join on TRUE, not a cross join: with an all-null column the
    # mode frame is EMPTY and a cross join would erase every row; the
    # 1-row-broadcast nested-loop left join keeps them (col stays null).
    out = df.join(F.broadcast(gmode), F.lit(True), "left")
    fill = F.col("__gmode")
    if gcols:
        out = out.join(F.broadcast(modes), gcols, "left")
        fill = F.coalesce(F.col("__mode"), fill)
    out = out.withColumn(col + flag_suffix, F.col(col).isNull()).withColumn(
        col, F.coalesce(F.col(col), fill)
    )
    return out.drop("__gmode", *(["__mode"] if gcols else []))


def winsorize(
    df: DataFrame,
    cols: list[str],
    *,
    group_cols: list[str] | None = None,
    lower_p: float = 0.05,
    upper_p: float = 0.95,
    flag_suffix: str = "_clipped",
) -> DataFrame:
    """Percentile winsorization — clamp each numeric column to its
    per-group [lower_p, upper_p] DISCRETE quantiles (the standard
    outlier-capping step before normalization/featurization), plus a
    boolean ``<col>_clipped`` flag per column. Nulls pass through
    unclamped (compose with ``impute_mean`` for full cleanup).

    The bound is the order statistic at rank ceil(p·n) (clamped to
    [1, n]) — an actual data value, not an interpolation, so any SQL
    engine replays it exactly (interpolating quantiles differ in
    last-ulp arithmetic across engines; order statistics cannot).

    Scale shape: one per-group window (rank + count ride a single
    Exchange+Sort per column) filtered down to a |groups|-row bounds
    table that joins back broadcast; the clamp itself is a narrow
    projection. For fixed known bounds skip this and use least/greatest
    directly."""
    if not 0 <= lower_p <= upper_p <= 1:
        raise ValueError("need 0 <= lower_p <= upper_p <= 1")
    gcols = list(group_cols or [])
    out = df
    for c in cols:
        nn = df.filter(F.col(c).isNotNull()).select(*gcols, c)
        w = Window.partitionBy(*gcols).orderBy(c)
        wn = Window.partitionBy(*gcols)
        ranked = nn.select(
            *gcols,
            F.col(c),
            F.row_number().over(w).alias("__rk"),
            F.count(F.lit(1)).over(wn).alias("__n"),
        )
        lo_rk = F.greatest(F.lit(1), F.ceil(F.lit(lower_p) * F.col("__n")))
        hi_rk = F.least(F.col("__n"), F.ceil(F.lit(upper_p) * F.col("__n")))
        bounds = (
            ranked.withColumn("__lo_rk", lo_rk)
            .withColumn("__hi_rk", hi_rk)
            .filter(
                (F.col("__rk") == F.col("__lo_rk"))
                | (F.col("__rk") == F.col("__hi_rk"))
            )
            .groupBy(*gcols)
            .agg(
                F.min(
                    F.when(F.col("__rk") == F.col("__lo_rk"), F.col(c))
                ).alias(f"__lo_{c}"),
                F.max(
                    F.when(F.col("__rk") == F.col("__hi_rk"), F.col(c))
                ).alias(f"__hi_{c}"),
            )
        )
        if gcols:
            out = out.join(F.broadcast(bounds), gcols, "left")
        else:
            out = out.join(F.broadcast(bounds), F.lit(True), "left")
        clamped = F.least(
            F.greatest(F.col(c), F.col(f"__lo_{c}")), F.col(f"__hi_{c}")
        )
        out = (
            out.withColumn(
                c + flag_suffix,
                F.col(c).isNotNull() & (clamped != F.col(c)),
            )
            .withColumn(c, F.when(F.col(c).isNotNull(), clamped))
            .drop(f"__lo_{c}", f"__hi_{c}")
        )
    return out
