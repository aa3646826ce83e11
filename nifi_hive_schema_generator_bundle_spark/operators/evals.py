"""Model-evaluation metrics over sampled-generation tables.

The training loop's other half: given a table of per-problem generation
samples (n samples per problem, a correctness bit each — the HumanEval/
MBPP layout), estimate pass@k with the unbiased estimator
``1 − C(n−c, k)/C(n, k)`` (the expected probability that at least one
of k samples drawn without replacement from the n is correct), and
score majority-vote (self-consistency) accuracy.

Spark shape: everything is ONE groupBy on the problem key (map-side
combinable count/sum), then narrow arithmetic. The binomial ratio is
computed as a falling-factorial product ``Π_{i<k} (n−c−i)/(n−i)`` via a
JVM ``aggregate`` fold over ``sequence(0, k−1)`` — exact for any n (no
``factorial()``'s n ≤ 20 ceiling, no lgamma rounding), k terms per row,
no UDF, no second shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "pass_at_k",
    "majority_vote_accuracy",
    "calibration_error",
    "fleiss_kappa",
    "krippendorff_alpha",
    "fit_power_law",
    "rank_correlation",
    "bootstrap_mean_ci",
    "bootstrap_diff_ci",
    "classification_report",
    "chi_square_independence",
    "mann_whitney_u",
    "cuped_adjust",
    "isotonic_fit",
    "isotonic_apply",
]


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    *,
    z_crit: float = 1.96,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) — the nonparametric "is A
    stochastically larger than B", robust to the heavy-tailed score
    distributions where the t-test assumptions die. Returns ONE row:
    (n_a, n_b, u, z, significant): ``U = R_A − n_A(n_A+1)/2`` from A's
    rank sum in the POOLED sample (ties share average ranks), ``z`` the
    normal approximation with the standard tie-corrected variance
    ``n_A n_B/12 · (N+1 − Σ(t³−t)/(N(N−1)))``, ``significant`` =
    |z| > ``z_crit`` (NULL when a group is empty or the variance is 0 —
    every value tied). z > 0 means A ranks higher.

    Scale shape — the Spearman machinery: one pooled rank window + a
    (value)-keyed tie aggregate joined back, then single-row moment
    aggregates; no pairwise comparisons (the O(n_A·n_B) definition
    never materializes)."""
    pts = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isin(group_a, group_b)
    ).select(
        F.col(value_col).cast("double").alias("__x"),
        F.col(group_col).alias("__g"),
    )
    w = Window.orderBy(F.col("__x"))
    rn = pts.withColumn("__rn", F.row_number().over(w))
    avg = rn.groupBy("__x").agg(
        F.avg("__rn").alias("__rank"), F.count(F.lit(1)).alias("__t")
    )
    ranked = rn.join(avg, "__x")
    stats = ranked.agg(
        F.sum((F.col("__g") == group_a).cast("long")).alias("n_a"),
        F.sum((F.col("__g") == group_b).cast("long")).alias("n_b"),
        F.sum(
            F.when(F.col("__g") == group_a, F.col("__rank"))
        ).alias("__ra"),
    )
    ties = avg.agg(
        F.sum(F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")).alias(
            "__tsum"
        )
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = na + nb
    u = F.col("__ra") - na * (na + 1) / 2
    var = (
        na * nb / 12.0
        * ((n + 1) - F.col("__tsum") / (n * (n - 1)))
    )
    z = F.when(var > 0, (u - na * nb / 2) / F.sqrt(var))
    return (
        stats.join(F.broadcast(ties))
        .select(
            "n_a",
            "n_b",
            F.when((na > 0) & (nb > 0), F.round(u, 6)).alias("u"),
            F.when((na > 0) & (nb > 0), F.round(z, 6)).alias("z"),
            F.when(
                (na > 0) & (nb > 0) & z.isNotNull(),
                F.abs(z) > z_crit,
            ).alias("significant"),
        )
    )

# Upper-tail 95% critical values of χ²(dof), dof = 1..30 (standard table;
# literals so the significance flag replays on any engine with no CDF)
_CHI2_CRIT_95 = (
    3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067, 15.507, 16.919,
    18.307, 19.675, 21.026, 22.362, 23.685, 24.996, 26.296, 27.587,
    28.869, 30.144, 31.410, 32.671, 33.924, 35.172, 36.415, 37.652,
    38.885, 40.113, 41.337, 42.557, 43.773,
)


def chi_square_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Pearson χ² test of independence between two categorical columns
    — "does quality verdict depend on source", "does language predict
    the dedup outcome". Returns ONE row: (n, n_rows, n_cols, dof, chi2,
    critical_95, significant) with ``chi2 = Σ (observed − expected)² /
    expected`` over the contingency table and ``significant`` = chi2 >
    the 95% critical value (a literal table for dof ≤ 30; larger tables
    get NULL critical/flag — bring your own threshold). Cells that
    never co-occur contribute through their expected counts, as the
    statistic requires.

    Scale shape: one (row, col) partial count, two marginal
    re-aggregations of that tiny table, a marginal×marginal join to
    enumerate ALL cells (bounded by category-pair count, never data),
    and a 1-row total broadcast. NULL categories are excluded."""
    pts = df.filter(
        F.col(row_col).isNotNull() & F.col(col_col).isNotNull()
    ).select(F.col(row_col).alias("__r"), F.col(col_col).alias("__c"))
    obs = pts.groupBy("__r", "__c").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    rm = obs.groupBy("__r").agg(F.sum("o").alias("nr"))
    cm = obs.groupBy("__c").agg(F.sum("o").alias("nc"))
    tot = obs.agg(F.sum("o").alias("t"))  # 1-row broadcast
    cells = (
        rm.join(cm)  # all (row, col) cells, zero-observed included
        .join(obs, ["__r", "__c"], "left")
        .join(F.broadcast(tot))
        .select(
            (F.col("nr") * F.col("nc") / F.col("t")).alias("e"),
            F.coalesce("o", F.lit(0.0)).alias("o"),
        )
    )
    stat = cells.agg(
        F.round(
            F.sum((F.col("o") - F.col("e")) ** 2 / F.col("e")), 6
        ).alias("chi2")
    )
    dims = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("__r").alias("n_rows"),
        F.countDistinct("__c").alias("n_cols"),
    )
    crit = F.lit(None).cast("double")
    dof_c = (F.col("n_rows") - 1) * (F.col("n_cols") - 1)
    for d, v in enumerate(_CHI2_CRIT_95, start=1):
        crit = F.when(dof_c == d, F.lit(v)).otherwise(crit)
    return (
        dims.join(F.broadcast(stat))
        .withColumn("dof", dof_c.cast("long"))
        .withColumn("critical_95", crit)
        .withColumn(
            "significant",
            F.when(
                F.col("critical_95").isNotNull(),
                F.col("chi2") > F.col("critical_95"),
            ),
        )
        .select(
            "n", "n_rows", "n_cols", "dof", "chi2",
            "critical_95", "significant",
        )
    )


def classification_report(
    df: DataFrame,
    gold_col: str = "gold",
    pred_col: str = "pred",
) -> DataFrame:
    """Per-class precision/recall/F1 from a (gold, pred) table — the
    standard scorecard for any classifier in the pipeline (language ID,
    quality gates, license detection). One row per class appearing in
    EITHER column: (label, n_gold, n_pred, tp, precision, recall, f1),
    6dp, NULL where undefined (no predictions → no precision, no gold →
    no recall, both → no F1; F1 is also NULL when p + r = 0).

    Three map-side-combinable aggregates over label keys (tp from the
    gold = pred diagonal, marginals from each column) joined outer on
    the tiny label dimension — the data-sized scan never shuffles more
    than its distinct labels."""
    tp = (
        df.filter(F.col(gold_col) == F.col(pred_col))
        .groupBy(F.col(gold_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    n_gold = df.groupBy(F.col(gold_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_gold")
    )
    n_pred = df.groupBy(F.col(pred_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    j = (
        n_gold.join(n_pred, "label", "full_outer")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("n_gold", F.lit(0)).alias("n_gold"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    p = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred"))
    r = F.when(F.col("n_gold") > 0, F.col("tp") / F.col("n_gold"))
    f1 = F.when(p + r > 0, 2 * p * r / (p + r))
    return j.select(
        "label",
        "n_gold",
        "n_pred",
        "tp",
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )

def _order_stat_ci(ordered: DataFrame, col: str, alpha: float) -> DataFrame:
    """1-row (ci_lo, ci_hi): the ⌈α/2·R⌉-th and ⌈(1−α/2)·R⌉-th smallest
    of R surviving replicas (``ordered`` carries ``__r`` row numbers) —
    discrete order statistics, scaled to however many replicas survived
    the zero-weight drop, computed without a driver round-trip."""
    total = F.max("__r").over(Window.partitionBy(F.lit(1)))
    lo = F.greatest(F.lit(1).cast("long"), F.ceil(F.lit(alpha / 2) * total))
    hi = F.least(total.cast("long"), F.ceil(F.lit(1 - alpha / 2) * total))
    return (
        ordered.withColumn("__lo", lo)
        .withColumn("__hi", hi)
        .agg(
            F.round(
                F.min(F.when(F.col("__r") == F.col("__lo"), F.col(col))), 6
            ).alias("ci_lo"),
            F.round(
                F.min(F.when(F.col("__r") == F.col("__hi"), F.col(col))), 6
            ).alias("ci_hi"),
        )
    )


# Poisson(1) CDF thresholds for k = 0..7 (k=8+ mass ~1e-5 folds into 7):
# the md5-uniform u maps to a weight by inverse CDF — deterministic,
# engine-portable bootstrap weights without any RNG state
_POIS1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
)


def _poisson_replicas(pts: DataFrame, n_boot: int, seed: str) -> DataFrame:
    """Explode ``pts`` (which carries a ``__k`` string key) into
    ``n_boot`` row-replicas with deterministic Poisson(1) weights —
    adds columns (b, __w). The replica-b uniform for key k is lane
    ``b % 4`` of ``md5(seed|b//4|k)``: an md5 digest is 32 hex chars,
    so FOUR 8-char (2³²-resolution) draws ride every hash and the
    hash stage — the dominant cost of the whole bootstrap, measured
    2.4× end-to-end on a 1 M × 32 replicate grid — runs n_boot/4
    times per row instead of n_boot. The digest is MATERIALIZED as a
    column between the two explodes; deriving lanes inside one HOF
    would re-inline the md5 per lane (the SCALE.md O(len²) trap).
    DuckDB replays the identical draw: ``substring(md5(seed || '|' ||
    (b // 4) || '|' || k), 1 + 8 * (b % 4), 8)``.

    The narrow (value, key) projection is fanned to the session's
    parallelism BEFORE the explode+md5 chain (the `cms_build` pattern,
    guide §2.5 input parallelism): the hash stage is compute-bound and
    inherits the scan's split count — a compact single-split parquet
    events table ran the whole 32-replica grid on one core (measured
    2.9 s vs 0.55 s fanned at sf0.1). A no-op when the input is already
    well-split (the at-scale case); the weights are key-derived, every
    downstream consumer aggregates, and the engine-twin contract is
    layout-independent, so placement does not affect results."""
    from ..functions.partitioning import ensure_min_partitions

    pts = ensure_min_partitions(pts)
    n_groups = (n_boot + 3) // 4
    grp = F.explode(F.sequence(F.lit(0), F.lit(n_groups - 1))).alias("__gq")
    st = pts.select("*", grp).withColumn(
        "__h",
        F.md5(
            F.concat(
                F.lit(seed), F.lit("|"), F.col("__gq").cast("string"),
                F.lit("|"), F.col("__k"),
            )
        ),
    )
    lane = F.explode(
        F.sequence(
            F.lit(0),
            F.least(F.lit(3), F.lit(n_boot - 1) - F.col("__gq") * 4),
        )
    ).alias("__lane")
    st = st.select("*", lane)
    u = (
        F.conv(
            F.col("__h").substr(F.lit(1) + F.col("__lane") * 8, F.lit(8)),
            16, 10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    w = F.lit(7)
    for kk in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(u < _POIS1_CDF[kk], F.lit(kk)).otherwise(w)
    return (
        st.withColumn("b", F.col("__gq") * 4 + F.col("__lane"))
        .withColumn("__w", w)
        .drop("__gq", "__h", "__lane")
    )


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    *,
    n_boot: int = 64,
    seed: str = "",
    id_col: str | None = None,
    alpha: float = 0.05,
) -> DataFrame:
    """Deterministic Poisson-bootstrap confidence interval for the mean
    of ``value_col`` — the resampling-free bootstrap production systems
    use at scale: replica b gives every row a Poisson(1) weight derived
    from an md5 lane draw (``_poisson_replicas`` — four 2³²-resolution
    uniforms per digest) by inverse CDF (no RNG state, identical on
    any layout, engine-replayable), the replica mean is the weighted
    mean, and the CI is taken from the replica distribution. Returns
    ONE row: (n, mean, ci_lo, ci_hi, n_boot).

    The interval is DISCRETE order statistics of the replica means —
    the ⌈α/2·B⌉-th and ⌈(1−α/2)·B⌉-th smallest (the winsorize
    precedent) — not an interpolated percentile, so two engines agree
    exactly. NULL values are dropped; an empty input returns an empty
    frame.

    Scale shape: one explode to B row-replicas feeds a B-group
    partial aggregate (map-side combined to ≤ B rows per partition —
    the shuffle carries B×partitions rows regardless of data volume),
    then the B-row replica table sorts trivially. ``id_col`` defaults
    to the value column itself (fine when values are near-unique; pass
    a real id for heavily-repeated values so rows draw independent
    weights)."""
    if n_boot < 2:
        raise ValueError("n_boot must be >= 2")
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    key = id_col or value_col
    pts = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("__x"),
        F.col(key).cast("string").alias("__k"),
    )
    reps = (
        _poisson_replicas(pts, n_boot, seed)
        .groupBy("b")
        .agg(
            # a replica can draw weight 0 everywhere on tiny inputs —
            # NULL (dropped) instead of an ANSI divide-by-zero
            F.when(
                F.sum("__w") > 0,
                F.sum(F.col("__w") * F.col("__x")) / F.sum("__w"),
            ).alias("__m")
        )
        .filter(F.col("__m").isNotNull())
    )
    ordered = reps.select(
        "__m",
        F.row_number().over(Window.orderBy(F.col("__m").asc(), F.col("b"))).alias(
            "__r"
        ),
    )
    stats = pts.agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("__x"), 6).alias("mean")
    )
    ci = _order_stat_ci(ordered, "__m", alpha)
    return (
        stats.join(F.broadcast(ci))
        .withColumn("n_boot", F.lit(n_boot))
        .filter(F.col("n") > 0)
    )


def rank_correlation(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Spearman rank correlation between two numeric columns — the
    monotonic-association check behind "does this quality signal track
    that one" (compression ratio vs perplexity, heuristic score vs
    classifier score). Tie-aware: tied values share their AVERAGE rank
    (the textbook treatment), then ρ is the Pearson correlation of the
    rank columns via population moments. Returns one row per group:
    (group…, n, spearman_rho), ρ rounded to 6; NULL when either column
    is constant (zero rank variance). Rows with a NULL in either column
    are dropped.

    Scale shape: two window sorts (one per column, partitioned by the
    group) produce row numbers; the average-rank-per-tie is a (group,
    value)-keyed aggregate joined back — all shuffles on narrow keys —
    and the final ρ is one moments aggregate. No O(n²) pair scan
    (Kendall's τ is deliberately absent: its exact pair counting
    doesn't distribute without a merge-sort pass)."""
    pts = df.filter(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).select(*group_cols, F.col(col_a).alias("__a"), F.col(col_b).alias("__b"))

    def avg_ranks(frame: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy(
            *[F.col(g) for g in group_cols] if group_cols else [F.lit(1)]
        ).orderBy(F.col(col))
        rn = frame.withColumn("__rn", F.row_number().over(w))
        avg = rn.groupBy(*group_cols, col).agg(
            F.avg("__rn").alias(out)
        )
        return frame.join(avg, [*group_cols, col])

    ranked = avg_ranks(avg_ranks(pts, "__a", "__ra"), "__b", "__rb")
    g = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.var_pop("__ra").alias("__va"),
        F.var_pop("__rb").alias("__vb"),
        F.covar_pop("__ra", "__rb").alias("__cab"),
    )
    rho = F.when(
        (F.col("__va") > 0) & (F.col("__vb") > 0),
        F.col("__cab") / F.sqrt(F.col("__va") * F.col("__vb")),
    )
    return g.select(*group_cols, "n", F.round(rho, 6).alias("spearman_rho"))


def bootstrap_diff_ci(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    *,
    n_boot: int = 64,
    seed: str = "",
    id_col: str | None = None,
    alpha: float = 0.05,
) -> DataFrame:
    """Two-sample bootstrap: CI for ``mean(A) − mean(B)`` — the A/B
    analysis behind "is model A's score actually higher". Same
    deterministic Poisson-weight machinery as ``bootstrap_mean_ci``
    (md5 lane draws, layout/engine-portable), each replica
    resamples BOTH groups independently (the id feeds the hash, so a
    row's weight doesn't depend on its group), and the interval is
    discrete order statistics of the replica differences. Returns ONE
    row: (n_a, n_b, mean_a, mean_b, diff, ci_lo, ci_hi, significant) —
    ``significant`` = the CI excludes 0.

    Same scale shape as the one-sample form: one explode to B
    row-replicas, a (b, group) partial aggregate (≤ 2B rows out), a
    tiny pivot + sort."""
    if n_boot < 2:
        raise ValueError("n_boot must be >= 2")
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    key = id_col or value_col
    pts = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isin(group_a, group_b)
    ).select(
        F.col(value_col).cast("double").alias("__x"),
        F.col(group_col).alias("__g"),
        F.col(key).cast("string").alias("__k"),
    )
    reps = (
        _poisson_replicas(pts, n_boot, seed)
        .groupBy("b", "__g")
        .agg(
            F.when(
                F.sum("__w") > 0,
                F.sum(F.col("__w") * F.col("__x")) / F.sum("__w"),
            ).alias("__m")
        )
    )
    diffs = (
        reps.groupBy("b")
        .agg(
            (
                F.min(F.when(F.col("__g") == group_a, F.col("__m")))
                - F.min(F.when(F.col("__g") == group_b, F.col("__m")))
            ).alias("__d")
        )
        .filter(F.col("__d").isNotNull())  # replica emptied a group: drop
    )
    ordered = diffs.select(
        "__d",
        F.row_number().over(
            Window.orderBy(F.col("__d").asc(), F.col("b"))
        ).alias("__r"),
    )
    ci = _order_stat_ci(ordered, "__d", alpha)
    stats = pts.agg(
        F.sum((F.col("__g") == group_a).cast("long")).alias("n_a"),
        F.sum((F.col("__g") == group_b).cast("long")).alias("n_b"),
        F.round(
            F.avg(F.when(F.col("__g") == group_a, F.col("__x"))), 6
        ).alias("mean_a"),
        F.round(
            F.avg(F.when(F.col("__g") == group_b, F.col("__x"))), 6
        ).alias("mean_b"),
    )
    return (
        stats.join(F.broadcast(ci))
        .select(
            "n_a",
            "n_b",
            "mean_a",
            "mean_b",
            F.round(F.col("mean_a") - F.col("mean_b"), 6).alias("diff"),
            "ci_lo",
            "ci_hi",
            ((F.col("ci_lo") > 0) | (F.col("ci_hi") < 0)).alias(
                "significant"
            ),
        )
    )


def fit_power_law(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Scaling-law fit: OLS on (ln x, ln y), i.e. ``y ≈ e^intercept ·
    x^slope`` — the log-log regression behind compute/data scaling
    curves (loss vs tokens, quality vs corpus size). Returns one row
    per group: (group…, n, slope, intercept, r2), all rounded to 6.
    Rows with x ≤ 0, y ≤ 0, or NULLs are dropped (no log domain); a
    group left with < 2 points or zero x-variance returns NULL slope.

    One map-side-combinable aggregation — population covariance/
    variance/correlation closed forms; nothing shuffles but the
    per-group moment tuples."""
    lx = F.log(F.col(x_col).cast("double"))
    ly = F.log(F.col(y_col).cast("double"))
    pts = df.filter(
        (F.col(x_col) > 0) & (F.col(y_col) > 0)
    ).select(*group_cols, lx.alias("lx"), ly.alias("ly"))
    g = pts.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.var_pop("lx").alias("__vx"),
        F.var_pop("ly").alias("__vy"),
        F.covar_pop("lx", "ly").alias("__cxy"),
        F.avg("lx").alias("__mx"),
        F.avg("ly").alias("__my"),
    )
    # moments first, derivations guarded: ANSI mode makes a bare x/0
    # raise, and a zero-variance group should read as NULL, not crash
    slope = F.when(F.col("__vx") > 0, F.col("__cxy") / F.col("__vx"))
    r2 = F.when(
        (F.col("__vx") > 0) & (F.col("__vy") > 0),
        (F.col("__cxy") * F.col("__cxy")) / (F.col("__vx") * F.col("__vy")),
    )
    return g.select(
        *group_cols,
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(F.col("__my") - slope * F.col("__mx"), 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def pass_at_k(
    df: DataFrame,
    problem_col: str = "problem_id",
    correct_col: str = "correct",
    ks: tuple[int, ...] = (1, 10),
) -> DataFrame:
    """Unbiased pass@k per problem, long format: (problem, n_samples,
    n_correct, k, pass_at_k). ``correct_col`` is boolean or 0/1.

    Rows where k > n_samples get NULL (the estimator is undefined —
    you can't draw k from n); c > n−k short-circuits to exactly 1.0
    (every k-subset contains a correct sample) before the product,
    which would otherwise hit a zero term."""
    if not ks or any(k < 1 for k in ks):
        raise ValueError("ks must be >= 1")
    g = df.groupBy(problem_col).agg(
        F.count("*").alias("n_samples"),
        F.sum(F.col(correct_col).cast("int")).alias("n_correct"),
    )
    out = g.select(
        problem_col,
        "n_samples",
        "n_correct",
        F.explode(F.array(*[F.lit(int(k)) for k in ks])).alias("k"),
    )
    n, c, k = F.col("n_samples"), F.col("n_correct"), F.col("k")
    # Π_{i=0}^{k-1} (n-c-i)/(n-i) == C(n-c,k)/C(n,k), term-by-term exact
    prod = F.aggregate(
        F.sequence(F.lit(0), k - 1),
        F.lit(1.0),
        lambda acc, i: acc * (n - c - i) / (n - i),
    )
    return out.withColumn(
        "pass_at_k",
        F.when(k > n, F.lit(None).cast("double"))
        .when(c > n - k, F.lit(1.0))
        .otherwise(F.round(1.0 - prod, 6)),
    )


def calibration_error(
    df: DataFrame,
    confidence_col: str = "confidence",
    correct_col: str = "correct",
    *,
    n_bins: int = 10,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Reliability diagram + expected calibration error: confidences in
    [0, 1] bucket into ``n_bins`` equal-width bins (bin b = [b/n, (b+1)/n),
    confidence 1.0 folded into the last bin); per bin the mean
    confidence, empirical accuracy, and count; plus ``ece`` — the
    count-weighted Σ |accuracy − confidence| — repeated on every row
    (one value per group). ``group_cols`` yields one diagram per group
    (per model, per task).

    Returns (group…, bin, bin_count, avg_confidence, accuracy, ece),
    empty bins absent. One map-side-combinable groupBy on
    (group, bin) — the shuffle carries ≤ groups×n_bins rows — then a
    tiny window over that aggregate for the ECE total. Confidences
    outside [0, 1] raise at first action (an ANSI-mode-independent
    guard would silently misbin them)."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    conf = F.col(confidence_col)
    bin_c = F.least(
        (conf * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    guard = F.when(
        (conf >= 0.0) & (conf <= 1.0), bin_c
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"{confidence_col} outside [0, 1]: "),
                conf.cast("string"),
            )
        )
    )
    keys = [*group_cols, "bin"]
    per_bin = (
        df.withColumn("bin", guard)
        .groupBy(*keys)
        .agg(
            F.count("*").alias("bin_count"),
            F.round(F.avg(conf), 6).alias("avg_confidence"),
            F.round(F.avg(F.col(correct_col).cast("double")), 6).alias(
                "accuracy"
            ),
        )
    )
    w = Window.partitionBy(*[F.col(g) for g in group_cols]) if group_cols \
        else Window.partitionBy(F.lit(1))
    total = F.sum("bin_count").over(w)
    ece = F.sum(
        F.abs(F.col("accuracy") - F.col("avg_confidence"))
        * F.col("bin_count")
    ).over(w)
    return per_bin.withColumn("ece", F.round(ece / total, 6))


def fleiss_kappa(
    df: DataFrame,
    item_col: str = "item_id",
    category_col: str = "category",
) -> DataFrame:
    """Fleiss' kappa — chance-corrected inter-annotator agreement over
    a ratings table (one row per rating; the rater identity doesn't
    enter the statistic). The generalized form tolerates varying
    ratings-per-item: per item ``P_i = (Σ_k n_ik² − n_i)/(n_i(n_i−1))``,
    observed agreement ``P̄ = mean_i P_i``, chance agreement
    ``P_e = Σ_k p_k²`` with ``p_k`` the category shares over all kept
    ratings, ``κ = (P̄ − P_e)/(1 − P_e)``. Items with a single rating
    carry no pairwise-agreement information and are dropped entirely
    (from P̄ AND p_k — the statistic stays self-consistent).

    Returns ONE row: (n_items, n_ratings, p_bar, p_e, kappa); kappa is
    NULL when P_e = 1 (every kept rating in one category — agreement is
    vacuous, 0/0). Two map-side-combinable aggregations — (item,
    category) counts, then item rollups — plus two 1-row scalar
    broadcasts; nothing scales past the distinct (item, category)
    pairs."""
    counts = df.groupBy(item_col, category_col).agg(
        F.count(F.lit(1)).alias("n_ik")
    )
    items = (
        counts.groupBy(item_col)
        .agg(
            F.sum("n_ik").alias("n_i"),
            F.sum(F.col("n_ik") * F.col("n_ik")).alias("sq"),
        )
        .filter(F.col("n_i") >= 2)
    )
    kept = counts.join(items.select(item_col), item_col, "left_semi")
    p_bar = items.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_i").alias("n_ratings"),
        F.avg(
            (F.col("sq") - F.col("n_i"))
            / (F.col("n_i") * (F.col("n_i") - 1))
        ).alias("p_bar"),
    )
    total = F.sum("nk").over(Window.partitionBy(F.lit(1)))
    p_e = (
        kept.groupBy(category_col)
        .agg(F.sum("n_ik").alias("nk"))
        .select((F.col("nk") / total).alias("pk"))
        .agg(F.sum(F.col("pk") * F.col("pk")).alias("p_e"))
    )
    return p_bar.join(F.broadcast(p_e)).select(
        "n_items",
        "n_ratings",
        F.round("p_bar", 6).alias("p_bar"),
        F.round("p_e", 6).alias("p_e"),
        F.when(
            F.col("p_e") < 1.0,
            F.round((F.col("p_bar") - F.col("p_e")) / (1.0 - F.col("p_e")), 6),
        ).alias("kappa"),
    )


def krippendorff_alpha(
    df: DataFrame,
    item_col: str = "item_id",
    category_col: str = "category",
) -> DataFrame:
    """Krippendorff's alpha (nominal metric) — the agreement
    coefficient built for MISSING data: unlike Fleiss' κ it needs no
    fixed rater panel, weighting every item by the rating pairs it
    actually has, so it is the right statistic for crowdsourced /
    partially-overlapping annotation (the common RLHF labeling shape).

    From the coincidence-matrix formulation, everything reduces to
    closed-form aggregates over (item, category) counts n_uc with
    m_u = Σ_c n_uc, over items with m_u ≥ 2:

        agree   = Σ_u Σ_c n_uc(n_uc − 1)/(m_u − 1)   (Σ_c o_cc)
        n       = Σ_u m_u                             (total coincidences)
        n_c     = Σ_u n_uc                            (category marginals)
        D_o     = n − agree
        D_e     = (n² − Σ_c n_c²)/(n − 1)
        alpha   = 1 − D_o/D_e

    Returns ONE row: (n_items, n_ratings, d_o, d_e, alpha); alpha is
    NULL when D_e = 0 (all kept ratings in a single category —
    agreement is vacuous). Same scale shape as ``fleiss_kappa``: two
    map-side-combinable aggregations plus 1-row scalar broadcasts,
    nothing scales past the distinct (item, category) pairs.
    """
    counts = df.groupBy(item_col, category_col).agg(
        F.count(F.lit(1)).alias("n_uc")
    )
    items = (
        counts.groupBy(item_col)
        .agg(
            F.sum("n_uc").alias("m_u"),
            F.sum(F.col("n_uc") * (F.col("n_uc") - 1)).alias("pairs"),
        )
        .filter(F.col("m_u") >= 2)
    )
    kept = counts.join(items.select(item_col), item_col, "left_semi")
    obs = items.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("m_u").alias("n_ratings"),
        F.sum(F.col("pairs") / (F.col("m_u") - 1)).alias("agree"),
    )
    marg = (
        kept.groupBy(category_col)
        .agg(F.sum("n_uc").alias("n_c"))
        .agg(F.sum(F.col("n_c") * F.col("n_c")).alias("sq_marg"))
    )
    # doubles for the D_e algebra: n² on a 100 TB rating table can
    # overflow a long (n ≳ 3·10⁹); the oracle does the same 1.0· lift
    n = F.col("n_ratings").cast("double")
    d_o = n - F.col("agree")
    d_e = (n * n - F.col("sq_marg")) / (n - 1)
    return (
        obs.join(F.broadcast(marg))
        .filter(F.col("n_ratings") >= 2)
        .select(
            F.col("n_items").cast("long").alias("n_items"),
            F.col("n_ratings").cast("long").alias("n_ratings"),
            F.round(d_o, 6).alias("d_o"),
            F.round(d_e, 6).alias("d_e"),
            F.when(d_e > 0, F.round(F.lit(1.0) - d_o / d_e, 6)).alias(
                "alpha"
            ),
        )
    )


def majority_vote_accuracy(
    df: DataFrame,
    problem_col: str = "problem_id",
    answer_col: str = "answer",
    gold_col: str = "gold",
) -> DataFrame:
    """Self-consistency scoring: per problem, the modal sampled answer
    (ties broken by smallest answer value — deterministic across runs,
    layouts, and engines) compared against the gold answer. Returns
    (problem, vote_answer, n_votes, n_samples, is_correct).

    ``gold_col`` must be constant within a problem (it rides the
    aggregates via ``min``). Two map-side-combinable aggregations —
    (problem, answer) counts, then a struct-max argmax per problem —
    no window sort, no answer arrays."""
    counts = df.groupBy(problem_col, answer_col).agg(
        F.count("*").alias("n_votes"), F.min(gold_col).alias("__gold")
    )
    # a single max(struct(votes, answer)) would tiebreak to the LARGEST
    # answer; smallest-answer ties need max-votes first, then a min over
    # the winners — two partial aggs + one equi-join on the problem key
    w = counts.groupBy(problem_col).agg(
        F.max("n_votes").alias("__top"),
        F.sum("n_votes").alias("n_samples"),
        F.min("__gold").alias("__g"),
    )
    return (
        counts.join(w, problem_col)
        .filter(F.col("n_votes") == F.col("__top"))
        .groupBy(problem_col)
        .agg(
            F.min(answer_col).alias("vote_answer"),
            F.min("n_votes").alias("n_votes"),
            F.min("n_samples").alias("n_samples"),
            F.min("__g").alias("__g"),
        )
        .select(
            problem_col,
            "vote_answer",
            "n_votes",
            "n_samples",
            (F.col("vote_answer") == F.col("__g")).alias("is_correct"),
        )
    )


def cuped_adjust(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    arm_col: str,
    *,
    decimals: int = 6,
) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013): per experiment arm,
    compare the raw metric against ``y − θ·(x − x̄)`` where ``x`` is a
    pre-experiment covariate and ``θ = cov(x, y)/var(x)`` is fit on the
    POOLED units (arm-agnostic, so the adjustment is unbiased under
    randomized assignment). The workhorse of modern A/B platforms:
    same point estimates in expectation, substantially tighter
    confidence intervals when x predicts y.

    Returns one row per arm: (arm, n, mean_raw, var_raw, mean_adj,
    var_adj, theta), variances sample (n−1), everything rounded to
    ``decimals``. Rows with NULL metric, covariate, or arm are dropped.
    θ with zero covariate variance degrades to 0 (no adjustment).

    Spark shape: one pooled moments aggregate (1 row, broadcast back as
    a scalar) + one per-arm aggregate over moment sums — two map-side-
    combinable shuffles total, nothing wider than the unit table's
    (arm, doubles) rows."""
    pts = df.select(
        F.col(arm_col).alias("arm"),
        F.col(metric_col).cast("double").alias("y"),
        F.col(covariate_col).cast("double").alias("x"),
    ).na.drop()
    pooled = pts.agg(
        F.covar_pop("x", "y").alias("__cxy"),
        F.var_pop("x").alias("__vx"),
        F.avg("x").alias("__mx"),
    ).select(
        F.when(
            F.col("__vx") > 0, F.col("__cxy") / F.col("__vx")
        ).otherwise(F.lit(0.0)).alias("__theta"),
        "__mx",
    )
    adj = pts.join(F.broadcast(pooled)).withColumn(
        "y_adj",
        F.col("y") - F.col("__theta") * (F.col("x") - F.col("__mx")),
    )
    return (
        adj.groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("y"), decimals).alias("mean_raw"),
            F.round(F.var_samp("y"), decimals).alias("var_raw"),
            F.round(F.avg("y_adj"), decimals).alias("mean_adj"),
            F.round(F.var_samp("y_adj"), decimals).alias("var_adj"),
            F.round(F.first("__theta"), decimals).alias("theta"),
        )
        .orderBy("arm")
    )


def isotonic_fit(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    bins: int = 1000,
) -> dict:
    """Isotonic calibration fit: the non-parametric, monotonicity-
    constrained mapping score → P(label=1) (pool-adjacent-violators),
    the standard post-hoc calibrator when Platt's sigmoid is too rigid.

    Distributed shape: scores (clamped to [0,1]) quantize onto a fixed
    ``bins``-point grid and ONE map-side-combinable aggregate reduces
    the corpus to ≤ bins+1 (weight, mean-label) rows; PAV runs on the
    driver over that bounded table (the ≤100 K quantizer-fit
    contract) — exact for the binned problem at any corpus size.
    Returns {"bins": n, "values": [n+1 floats]} — the right-continuous
    step function; grid points left of the first observation inherit
    the first block, gaps inherit the block to their left."""
    b = F.least(
        F.floor(
            F.greatest(F.least(F.col(score_col), F.lit(1.0)), F.lit(0.0))
            * bins
        ).cast("int"),
        F.lit(bins),
    )
    rows = (
        df.select(b.alias("__b"), F.col(label_col).cast("double").alias("__y"))
        .na.drop()
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("w"), F.sum("__y").alias("sy"))
        .orderBy("__b")
        .collect()
    )
    if not rows:
        raise ValueError("isotonic_fit: no (score, label) rows")
    # weighted PAV: pool adjacent blocks while the mean sequence violates
    # non-decreasing order. Blocks carry (weight, label-SUM), not running
    # means: each block's mean is then ONE division of the exact sums —
    # for integer-valued labels (0/1 correctness) that makes the fitted
    # values exact rationals, bit-replayable by the SQL max-min closed
    # form (fitted_i = max_{j<=i} min_{k>=i} avg[j..k]); an incremental
    # (w1·m1+w2·m2)/(w1+w2) pooled mean walks a different float path.
    blocks: list[list[float]] = []  # [start_bin, weight, label_sum]
    for r in rows:
        blocks.append([float(r["__b"]), float(r["w"]), float(r["sy"])])
        while (
            len(blocks) >= 2
            and blocks[-2][2] / blocks[-2][1] >= blocks[-1][2] / blocks[-1][1]
        ):
            _s2, w2, y2 = blocks.pop()
            blocks[-1][1] += w2
            blocks[-1][2] += y2
    values = [0.0] * (bins + 1)
    cur = blocks[0][2] / blocks[0][1]
    bi = 0
    for start, w, sy in blocks:
        while bi < start:
            values[bi] = cur
            bi += 1
        cur = sy / w
    while bi <= bins:
        values[bi] = cur
        bi += 1
    return {"bins": bins, "values": values}


def isotonic_apply(
    df: DataFrame,
    score_col: str,
    model: dict,
    *,
    out_col: str = "calibrated",
) -> DataFrame:
    """Apply an ``isotonic_fit`` model: the step function rides the
    plan as ONE literal array and each row does an ``element_at``
    gather on its grid index — pure narrow JVM, no join, no shuffle,
    no Python (the PQ-ADC gather shape)."""
    bins = model["bins"]
    idx = F.least(
        F.floor(
            F.greatest(F.least(F.col(score_col), F.lit(1.0)), F.lit(0.0))
            * bins
        ).cast("int"),
        F.lit(bins),
    )
    table = F.array(*[F.lit(v) for v in model["values"]])
    return df.withColumn(out_col, F.element_at(table, idx + 1))


def did_readout(
    df: DataFrame,
    treat_col: str,
    post_col: str,
    outcome_q_col: str,
) -> DataFrame:
    """Difference-in-differences: the 2x2 (treatment x period) causal
    readout — DiD = (treat_post - treat_pre) - (ctrl_post - ctrl_pre)
    — which nets out both the group baseline gap and the common time
    trend that a naive post-period comparison confounds (the CUPED
    sibling for natural experiments / staged rollouts).

    ``outcome_q_col`` must already be an integer-quantized outcome
    (e.g. floor(value * 10^6)): cell sums are then exact and order-
    independent, cell means are integer `div`, and the whole report is
    bit-equal cross-engine. One scan, one 1-row conditional aggregate
    (map-side combinable), so the readout costs a single reduction at
    any scale.

    Returns ONE row: per-cell n and mean (ppm), and did_ppm.
    """
    # accept int 0/1 as well as boolean flags: `&`/`~` on int columns
    # are BITWISE and F.when rejects the non-boolean result, so cast
    # first (the roc_auc label convention)
    t = F.col(treat_col).cast("boolean")
    p = F.col(post_col).cast("boolean")
    cells = {
        "tp": t & p, "tq": t & ~p, "cp": ~t & p, "cq": ~t & ~p,
    }
    aggs = []
    for key, cond in cells.items():
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n_{key}")
        )
        aggs.append(
            F.sum(F.when(cond, F.col(outcome_q_col)).otherwise(0))
            .cast("long")
            .alias(f"s_{key}")
        )
    mean = lambda k: f"s_{k} div n_{k}"  # noqa: E731
    return df.agg(*aggs).selectExpr(
        "n_tp AS n_treat_post", "n_tq AS n_treat_pre",
        "n_cp AS n_ctrl_post", "n_cq AS n_ctrl_pre",
        f"{mean('tp')} AS mean_treat_post_ppm",
        f"{mean('tq')} AS mean_treat_pre_ppm",
        f"{mean('cp')} AS mean_ctrl_post_ppm",
        f"{mean('cq')} AS mean_ctrl_pre_ppm",
        f"({mean('tp')} - {mean('tq')}) - ({mean('cp')} - {mean('cq')})"
        " AS did_ppm",
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    tiebreak: str,
) -> DataFrame:
    """Exact ROC-AUC of a score against a boolean label via the
    rank-sum identity (completes the eval battery next to ECE /
    calibration / classification_report / Mann-Whitney, whose U
    statistic this is a normalization of):

        AUC = (sum of positive AVERAGE ranks − n_pos(n_pos+1)/2)
              / (n_pos · n_neg)

    Ties in the score get the textbook average rank, computed WITHOUT
    floats: the average rank of a tied block is (first + last)/2, a
    half-integer, so the rank sum is carried DOUBLED
    (rsum2 = min_rank + max_rank per row) and the half cancels into
    the denominator — exact integer `div` end to end, both engines
    agree bit-for-bit:

        auc_ppm = (rsum2 − n_pos(n_pos+1)) · 10^6 div (2 · n_pos · n_neg)

    Scale: one global rank (at 100 TB swap the row_number window for
    functions/partitioning.distributed_rank — the ordering is the only
    global stage; the tie-block min/max windows shuffle on the score
    key) + a 1-row conditional aggregate. Output ONE row:
    n_pos, n_neg, auc_ppm.
    """
    from pyspark.sql import Window

    ranked = (
        df.select(
            F.col(score_col).alias("__s"),
            F.col(label_col).cast("boolean").alias("__y"),
            F.col(tiebreak).alias("__tb"),
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.orderBy(F.col("__s").asc(), F.col("__tb").asc())
            ),
        )
        .withColumn(
            "__r2",  # doubled average rank of the score's tied block
            F.min("__rn").over(Window.partitionBy("__s"))
            + F.max("__rn").over(Window.partitionBy("__s")),
        )
    )
    return ranked.agg(
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).cast("long").alias("np"),
        F.sum(F.when(~F.col("__y"), 1).otherwise(0)).cast("long").alias("nn"),
        F.sum(F.when(F.col("__y"), F.col("__r2")).otherwise(0))
        .cast("long")
        .alias("rsum2"),
    ).selectExpr(
        "np AS n_pos",
        "nn AS n_neg",
        "(rsum2 - np * (np + 1)) * 1000000 div (2 * np * nn) AS auc_ppm",
    )
