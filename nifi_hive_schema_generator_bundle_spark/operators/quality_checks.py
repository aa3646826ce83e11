"""Data-quality constraint checking — the Deequ/dbt-tests layer: declare
expectations (not-null, uniqueness, accepted values, ranges, referential
integrity), get a per-rule pass/fail report with the violation metric.

Production pipelines gate every table promotion on a report like this;
at 100 TB the design constraint is that the WHOLE rule suite costs one
scan: every column rule compiles to a conditional aggregate over the
same pass (sum of CASEs — map-side combinable), uniqueness rides the
same aggregate as exact count-distincts, and only referential integrity
needs a second input (a key-projected anti-join count, never wide rows).

The report is a tiny (one row per rule) DataFrame — union it across
tables, write it next to the data, alert on ``passed = false``.

Reference scope: the NiFi bundle's only validation is JSON
well-formedness routing (`HiveSchemaGenerator.scala:77-95`); this is
the table-level generalization the SURVEY §2 extension mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "quality_report",
    "ref_integrity_violations",
    "partition_completeness",
    "schema_contract_violations",
    "k_anonymity_report",
    "l_diversity_report",
    "split_leakage_report",
    "dp_noisy_counts",
    "curation_audit",
    "k_anonymize_ladder",
]


def quality_report(
    df: DataFrame,
    *,
    not_null: list[str] | None = None,
    unique: list[str] | None = None,
    accepted_values: dict[str, list] | None = None,
    ranges: dict[str, tuple] | None = None,
) -> DataFrame:
    """Evaluate declarative column constraints in ONE aggregate pass.

    Returns (rule, column, violations, n_rows, passed) — one row per
    declared rule, ``violations`` the exact offending-row count
    (``unique``: rows beyond the first per duplicated value; NULLs are
    exempt from accepted_values/range checks — declare ``not_null``
    separately, like SQL constraints compose).
    """
    not_null = not_null or []
    unique = unique or []
    accepted_values = accepted_values or {}
    ranges = ranges or {}

    aggs = [F.count(F.lit(1)).alias("__n")]
    rules: list[tuple[str, str, str]] = []  # (rule, column, agg alias)
    for c in not_null:
        a = f"__nn_{c}"
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(a))
        rules.append(("not_null", c, a))
    for c in unique:
        a = f"__uq_{c}"
        # duplicates = non-null rows beyond the first per value
        aggs.append(
            (
                F.sum(F.col(c).isNotNull().cast("long"))
                - F.count_distinct(F.col(c))
            ).alias(a)
        )
        rules.append(("unique", c, a))
    for c, vals in accepted_values.items():
        a = f"__av_{c}"
        arr = F.array(*[F.lit(v) for v in vals])
        aggs.append(
            F.sum(
                (F.col(c).isNotNull() & ~F.array_contains(arr, F.col(c))).cast(
                    "long"
                )
            ).alias(a)
        )
        rules.append(("accepted_values", c, a))
    for c, (lo, hi) in ranges.items():
        a = f"__rg_{c}"
        aggs.append(
            F.sum(
                (
                    F.col(c).isNotNull()
                    & ((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi)))
                ).cast("long")
            ).alias(a)
        )
        rules.append(("range", c, a))
    if not rules:
        raise ValueError("declare at least one constraint")

    row = df.agg(*aggs)
    out = None
    for rule, col, alias in rules:
        r = row.select(
            F.lit(rule).alias("rule"),
            F.lit(col).alias("column"),
            F.col(alias).cast("long").alias("violations"),
            F.col("__n").cast("long").alias("n_rows"),
            (F.col(alias) == 0).alias("passed"),
        )
        out = r if out is None else out.unionByName(r)
    return out


def ref_integrity_violations(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
) -> DataFrame:
    """Referential-integrity rule: count child rows whose non-null key
    has no match in the parent. Key-projected LEFT ANTI join — only
    the two key columns move, the parent side deduplicates to distinct
    keys first (broadcast-eligible for dimension-sized parents).
    Same (rule, column, violations, n_rows, passed) contract as
    ``quality_report`` so reports union cleanly.
    """
    keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    n = child.count()
    bad = (
        child.select(child_key)
        .filter(F.col(child_key).isNotNull())
        .join(keys, child_key, "left_anti")
        .count()
    )
    return child.sparkSession.createDataFrame(
        [("ref_integrity", child_key, bad, n, bad == 0)],
        "rule string, column string, violations long, n_rows long, passed boolean",
    )


def partition_completeness(
    df: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Completeness/freshness rule for time-partitioned data: find
    calendar days with NO rows between the table's min and max day —
    the "did yesterday's load actually land" monitor. One collapse to
    distinct days, one 2-row min/max, one anti-join of the generated
    calendar against the observed days — never touches row bodies.

    Returns (missing_day, prev_present_day) ordered — empty means
    complete. Gaps at the edges are invisible by construction (the
    range is defined by the data); pair with an external expected
    watermark for end-of-range freshness.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    days = df.select(day.alias("day")).distinct()
    rng = days.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    calendar = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
    )
    missing = calendar.join(days, "day", "left_anti")
    from pyspark.sql import Window

    # previous present day for each gap: a small join against the
    # observed-days table (both sides are day-counts, not data)
    w = Window.orderBy("day")
    prev = days.select(
        "day", F.lead("day").over(w).alias("next_day")
    ).filter(F.col("next_day").isNotNull())
    return (
        missing.alias("m")
        .join(
            prev.alias("p"),
            (F.col("m.day") > F.col("p.day"))
            & (F.col("m.day") < F.col("p.next_day")),
        )
        .select(
            F.col("m.day").alias("missing_day"),
            F.col("p.day").alias("prev_present_day"),
        )
        .orderBy("missing_day")
    )


def schema_contract_violations(
    df: DataFrame,
    expected: dict[str, str],
    *,
    allow_extra: bool = True,
) -> list[str]:
    """Driver-side schema contract: verify the DataFrame carries every
    expected column with the expected Spark simpleString type. Returns
    a list of human-readable violations (empty = contract holds) —
    the promotion gate calls this before any data-level rule runs,
    because a silently retyped column invalidates every downstream
    assumption. ``allow_extra=False`` also rejects unexpected columns
    (strict producer contracts)."""
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems = []
    for name, typ in expected.items():
        if name not in actual:
            problems.append(f"missing column {name} ({typ})")
        elif actual[name] != typ:
            problems.append(f"column {name}: expected {typ}, got {actual[name]}")
    if not allow_extra:
        for name in actual:
            if name not in expected:
                problems.append(f"unexpected column {name} ({actual[name]})")
    return problems


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """K-anonymity audit over a set of quasi-identifier columns — the
    re-identification check privacy reviews run before a structured
    table ships with training data: every combination of
    quasi-identifier values must be shared by at least ``k`` rows
    (Sweeney 2002). Rows in smaller equivalence classes are
    re-identifiable by joining those columns against outside data.

    Returns a one-row report: (k, n_rows, n_classes, n_risky_classes,
    n_risky_rows, min_class_size, anonymous) where a "class" is one
    distinct quasi-identifier combination, risky = class size < ``k``,
    and ``anonymous`` is true iff no class is risky. NULL
    quasi-identifier values form their own classes (NULL-safe
    grouping), matching how an attacker would treat missing values as
    a distinguishing signal.

    One scan + one aggregation: the class sizes are a
    ``groupBy(quasi_cols).count()`` (map-side combinable; cardinality
    bounded by distinct combinations, not rows) reduced to the 1-row
    audit — the same single-pass discipline as ``quality_report``.
    Skew is the attacker's problem, not ours: a whale class is by
    definition anonymous.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    classes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("__n")
    )
    risky = F.col("__n") < k
    return classes.agg(
        F.lit(k).alias("k"),
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(risky.cast("long")).cast("long").alias("n_risky_classes"),
        F.sum(F.when(risky, F.col("__n")).otherwise(0))
        .cast("long")
        .alias("n_risky_rows"),
        F.min("__n").cast("long").alias("min_class_size"),
        (F.max(risky.cast("int")) == 0).alias("anonymous"),
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,  # noqa: E741 - the literature's name for the parameter
) -> DataFrame:
    """L-diversity audit — k-anonymity's necessary complement
    (Machanavajjhala et al. 2007): an equivalence class can be large
    (k-anonymous) yet still leak if every member shares the same
    SENSITIVE value, so each quasi-identifier class must contain at
    least ``l`` distinct sensitive values (distinct l-diversity, the
    auditable base form).

    Returns a one-row report: (l, n_rows, n_classes, n_risky_classes,
    n_risky_rows, min_diversity, diverse) where risky = class with
    < ``l`` distinct non-NULL sensitive values and ``diverse`` is true
    iff no class is risky. NULL sensitive values don't count toward
    diversity (an attacker learns "missing", which is itself one
    value — counted separately would overstate protection).

    Same single-pass shape as ``k_anonymity_report``: one
    groupBy(quasi_cols) with a count + count_distinct, reduced to the
    1-row audit; cardinality bounded by distinct combinations.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if l < 1:
        raise ValueError("l must be >= 1")
    classes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("__n"),
        F.countDistinct(sensitive_col).alias("__d"),
    )
    risky = F.col("__d") < l
    return classes.agg(
        F.lit(l).alias("l"),
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(risky.cast("long")).cast("long").alias("n_risky_classes"),
        F.sum(F.when(risky, F.col("__n")).otherwise(0))
        .cast("long")
        .alias("n_risky_rows"),
        F.min("__d").cast("long").alias("min_diversity"),
        (F.max(risky.cast("int")) == 0).alias("diverse"),
    )


def split_leakage_report(
    df: DataFrame,
    *,
    split_col: str = "split",
    content_col: str = "text",
    holdout_value: str = "holdout",
) -> DataFrame:
    """Exact-content leakage audit across a train/holdout boundary: the
    fingerprints whose content appears on BOTH sides of the split. A
    keyed split (``sampling.hash_split``) guarantees duplicate KEYS
    co-locate, but the same text riding different keys still straddles
    the boundary — the self-contamination that silently inflates eval
    scores. This is decontamination turned inward, on one corpus's own
    split column.

    Output: one row per leaked fingerprint — (fingerprint, n_train,
    n_holdout), n_train counting every non-``holdout_value`` row.
    Empty result = clean split.

    Scale shape: one (16-byte md5, split) projection into a map-side-
    combined count aggregate, then a having filter — document bodies
    never shuffle, identical profile to ``exact_dedup``.
    """
    is_holdout = F.col(split_col) == holdout_value
    return (
        df.select(
            F.md5(F.col(content_col)).alias("fingerprint"), F.col(split_col)
        )
        .groupBy("fingerprint")
        .agg(
            F.sum(F.when(is_holdout, 0).otherwise(1))
            .cast("long")
            .alias("n_train"),
            F.sum(F.when(is_holdout, 1).otherwise(0))
            .cast("long")
            .alias("n_holdout"),
        )
        .filter((F.col("n_train") > 0) & (F.col("n_holdout") > 0))
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    *,
    epsilon: float = 1.0,
    sensitivity: int = 1,
    seed: str = "dp",
) -> DataFrame:
    """Differentially-private count release (the Laplace mechanism,
    Dwork et al. 2006): per-group counts plus Laplace(sensitivity/ε)
    noise — the standard way a curation pipeline publishes composition
    statistics (per-language counts, per-source counts) about a corpus
    containing user data without revealing any single record's
    presence. ``sensitivity`` is how many rows one individual can
    contribute (1 for one-row-per-person tables; set it to the
    contribution bound the pipeline enforces upstream).

    The noise is DERIVED from md5 of the group value and ``seed``
    (inverse-CDF over a uniform built as ``(h32 + 0.5) / 2^32`` — never
    exactly 0, ½, or 1, so ``ln`` stays finite): the same release is
    bit-for-bit reproducible across runs, partition layouts, and
    engines (the DuckDB oracle replays it), and a FIXED seed never
    re-randomizes — re-publishing with the same seed costs no extra
    privacy budget, while each NEW seed spends another ε (the caller
    owns that ledger, as with any DP system). True-random noise is one
    ``F.rand()`` swap away; the hashed form is the testable default.

    Returns one row per group: (*group_cols, noisy_count, epsilon) —
    deliberately WITHOUT the true count (publishing both would defeat
    the mechanism; tests recompute truth separately). Noisy counts can
    be negative or fractional — standard for Laplace release;
    post-process with clamp/round if the consumer needs naturals.
    Cost: one map-side-combinable count aggregate, |groups| rows, plus
    a narrow projection; NULL group values form their own groups the
    same way ``k_anonymity_report`` treats them.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if epsilon <= 0:
        raise ValueError("epsilon must be > 0")
    if sensitivity < 1:
        raise ValueError("sensitivity must be >= 1")
    b = float(sensitivity) / float(epsilon)
    key = F.concat_ws(
        "\x1f",
        F.lit(seed),
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
            for c in group_cols
        ],
    )
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    x = u - F.lit(0.5)
    noise = (
        -F.lit(b)
        * F.signum(x)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(x))
    )
    return (
        df.groupBy(*[F.col(c) for c in group_cols])
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            *group_cols,
            F.round(F.col("__n") + noise, 6).alias("noisy_count"),
            F.lit(float(epsilon)).alias("epsilon"),
        )
    )


def curation_audit(
    df: DataFrame,
    stages: list[tuple[str, Column]],
) -> DataFrame:
    """Single-scan provenance accounting for an ordered filter chain:
    every row is labeled with the FIRST stage whose keep-predicate it
    fails (rows passing all stages count as survivors), and the report
    derives each stage's funnel numbers from the one label histogram —
    (stage_idx, stage, n_in, n_removed, n_out) in declared order.

    This is the audit a training-data curation run owes its consumers
    ("where did 38 % of the corpus go?") — and the design point is that
    it costs ONE scan + a |stages|-row aggregate no matter how many
    stages: naive per-stage recounting scans the corpus once per stage
    (k scans) and double-counts rows that fail several predicates,
    first-fail labeling does neither. Predicates must be deterministic
    column expressions over the row (the Deequ-style contract above);
    NULL predicate results count as failures (SQL three-valued logic
    never silently keeps a row).

    Reference scope: the bundle's success/failure routing
    (HiveSchemaGenerator.scala:96-102) is the 1-stage special case;
    this is the k-stage generalization with funnel accounting.
    """
    if not stages:
        raise ValueError("curation_audit needs at least one stage")
    label = None
    for name, pred in reversed(stages):
        fail = ~F.coalesce(pred, F.lit(False))
        label = F.when(fail, F.lit(name)).otherwise(
            F.lit("__kept__") if label is None else label
        )
    hist = df.groupBy(label.alias("stage")).agg(
        F.count(F.lit(1)).alias("n_removed")
    )
    order = df.sparkSession.createDataFrame(
        [(i, name) for i, name in enumerate(s for s, _ in stages)],
        "stage_idx int, stage string",
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy("stage_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = hist.agg(F.sum("n_removed").alias("__total"))
    report = (
        order.join(hist, "stage", "left")
        .withColumn("n_removed", F.coalesce("n_removed", F.lit(0)))
        .join(F.broadcast(total))
        .withColumn("__cum", F.sum("n_removed").over(w))
        .select(
            "stage_idx",
            "stage",
            (F.col("__total") - F.col("__cum") + F.col("n_removed")).alias(
                "n_in"
            ),
            "n_removed",
            (F.col("__total") - F.col("__cum")).alias("n_out"),
        )
    )
    return report.orderBy("stage_idx")


def k_anonymize_ladder(
    df: DataFrame,
    group_cols: list[str],
    numeric_col: str,
    k: int = 10,
    max_j: int = 20,
) -> DataFrame:
    """Minimal-generalization k-anonymity ENFORCEMENT (the mutation
    counterpart to ``k_anonymity_report``): find the smallest
    power-of-two band width 2^j for ``numeric_col`` such that every
    (group_cols…, floor(value / 2^j)) equivalence class holds >= ``k``
    rows, and report the chosen generalization.

    Monotone ladder: width-2^(j+1) boundaries are a SUBSET of the
    width-2^j boundaries, so doubling the width only MERGES classes —
    min class size is non-decreasing in j, and "smallest feasible j"
    is well-defined (generalize no more than necessary, the
    Samarati/Sweeney minimal-generalization principle restricted to a
    single-attribute ladder).

    Single scan, no iteration: the ladder is evaluated for ALL j in
    one pass by exploding each row into (j, band(j)) pairs (a
    (max_j+1)-way narrow fan-out — no join, no BNLJ) and aggregating
    (j, class) counts; the per-j min/count reduction is
    dimension-bounded. floor() on the IEEE double quotient is
    bit-identical cross-engine (verified incl. negatives).

    Returns ONE row: (k, j_star, width, n_classes, min_class_size,
    max_class_size), or zero rows if no j <= max_j is feasible (the
    caller must then generalize the group columns too).

    ``numeric_col`` must be NON-NEGATIVE (shift by the schema floor
    first): a negative value's floor-band is forever separate from
    band 0 — floor(-x / w) <= -1 for every width — so mixed-sign input
    has no fully-collapsed rung and the ladder may be infeasible even
    at max_j.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    js = F.explode(F.array(*[F.lit(j) for j in range(max_j + 1)])).alias("j")
    banded = df.select(*group_cols, F.col(numeric_col).alias("__v")).select(
        *group_cols, "__v", js
    )
    classes = banded.groupBy(
        "j",
        *group_cols,
        F.floor(F.col("__v") / F.expr("shiftleft(1, j)")).alias("__band"),
    ).agg(F.count(F.lit(1)).alias("__n"))
    per_j = classes.groupBy("j").agg(
        F.min("__n").cast("long").alias("min_class_size"),
        F.max("__n").cast("long").alias("max_class_size"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
    )
    w = Window.orderBy("j")
    return (
        per_j.filter(F.col("min_class_size") >= k)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.lit(k).alias("k"),
            F.col("j").alias("j_star"),
            F.expr("shiftleft(1, j)").cast("long").alias("width"),
            "n_classes",
            "min_class_size",
            "max_class_size",
        )
    )
