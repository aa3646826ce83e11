"""Dataset profiling: the per-column data-quality report every ingest
pipeline runs before trusting a new drop.

One wide aggregation computes every column's stats in a single scan —
n, nulls, distincts, min/max (rendered as strings so heterogeneous
column types stack into one long-format frame). The exact distinct
count is the oracle-checkable default at test scale; at 100 TB pass
``approx=True`` to swap in the HLL sketch (same report shape, constant
memory), which is why the report schema keeps the column name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "profile",
    "value_histogram",
    "dataset_fingerprint",
    "dataset_overlap_report",
    "concentration_report",
    "benford_report",
    "BENFORD_PPM",
]


def profile(
    df: DataFrame, cols: list[str] | None = None, *, approx: bool = False
) -> DataFrame:
    """Long-format profile: (column, n, n_null, n_distinct, min_s, max_s).

    All columns' statistics come out of ONE aggregate (a single scan +
    a 1-row shuffle) and are unpivoted driver-side from that scalar row
    — profiling never becomes per-column jobs."""
    cols = cols or df.columns
    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            distinct(c).alias(f"__dist_{c}"),
            F.min(F.col(c).cast("string")).alias(f"__min_{c}"),
            F.max(F.col(c).cast("string")).alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = [
        (
            c,
            row["__n"],
            row[f"__null_{c}"],
            row[f"__dist_{c}"],
            row[f"__min_{c}"],
            row[f"__max_{c}"],
        )
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        out,
        "column string, n bigint, n_null bigint, n_distinct bigint, "
        "min_s string, max_s string",
    )


def value_histogram(
    df: DataFrame,
    col: str,
    *,
    bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column — the profiling
    primitive behind data-quality dashboards and drift monitors
    (compare this week's histogram to last week's): one 1-row min/max
    aggregate (skipped when ``lo``/``hi`` are pinned, which drift
    comparisons should do so bucket edges stay fixed), then one
    narrow bucket projection + count — two scans, no sort, no sampling,
    exact counts at any scale.

    NULLs are excluded; values outside a pinned range clamp into the
    first/last bucket (so a pinned range still covers strays). Returns
    (bucket, bucket_lo, n) for non-empty buckets.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    c = F.col(col)
    if lo is None or hi is None:
        row = df.agg(
            F.min(c.cast("double")).alias("lo"), F.max(c.cast("double")).alias("hi")
        ).collect()[0]
        lo = row["lo"] if lo is None else lo
        hi = row["hi"] if hi is None else hi
    if lo is None or hi is None or not (hi > lo):
        raise ValueError(f"need a non-degenerate range, got [{lo}, {hi}]")
    w = (float(hi) - float(lo)) / bins
    bucket = F.least(
        F.lit(bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((c.cast("double") - F.lit(float(lo))) / F.lit(w)).cast("int"),
        ),
    )
    return (
        df.filter(c.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            F.round(F.lit(float(lo)) + F.col("bucket") * F.lit(w), 6).alias(
                "bucket_lo"
            ),
            "n",
        )
    )


def dataset_fingerprint(
    df: DataFrame,
    cols: list[str] | None = None,
    group_by: str | None = None,
) -> DataFrame:
    """Order- and partitioning-invariant content fingerprint of a table
    — the replica-equality probe a migration or backup-restore check
    needs at 100 TB: equal (n_rows, xor_hash, sum_hash) across two
    tables means the same MULTISET of rows with overwhelming
    probability, and computing it never shuffles data (one map-side
    aggregate reduced to a single row; xor and sum are commutative, so
    row order and partition layout cannot change the answer).

    Each row hashes to 60 bits of its md5 over the selected columns'
    string forms (NULL → a sentinel distinct from any value, unit-safe
    separator between columns); xor catches any differing row pair, the
    additive sum (folded mod 2^60 so it stays an exact BIGINT in every
    engine) catches the classic xor blind spot (a row repeated twice
    xors to zero). Engine-portable by construction — DuckDB replays it
    exactly (the oracle's proof).

    ``group_by``: per-group fingerprints instead of one global row — the
    100 TB diff protocol: fingerprint both replicas grouped by the
    partition column, join on the key, and only the partitions whose
    triples differ need row-level recomparison. The grouped form
    shuffles only (key, 3 numbers) per partial — never data. The group
    key itself is excluded from the hash (so replicas keyed by
    different spellings still compare group-wise); per-group triples
    therefore fold back to the GLOBAL fingerprint only when the global
    call also excludes it from ``cols``.
    """
    cols = list(df.columns) if cols is None else list(cols)
    if group_by is not None:
        cols = [c for c in cols if c != group_by]
    if not cols:
        raise ValueError("need at least one column")
    row = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols
        ],
    )
    h = F.conv(F.substring(F.md5(row), 1, 15), 16, 10).cast("long")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr("bit_xor(__h)").alias("xor_fingerprint"),
        (F.sum(F.col("__h").cast("decimal(38,0)")) % F.lit(2**60))
        .cast("long")
        .alias("sum_fingerprint"),
    ]
    if group_by is None:
        return df.select(h.alias("__h")).agg(*aggs)
    return (
        df.select(F.col(group_by), h.alias("__h"))
        .groupBy(group_by)
        .agg(*aggs)
    )


def concentration_report(
    df: DataFrame,
    group_col: str,
    *,
    weight_col: str | None = None,
    n_bands: int = 10,
) -> DataFrame:
    """Corpus concentration over a grouping key — the "what fraction of
    the data comes from the top N% of domains/users/sources" diagnostic
    every curation report publishes (heavy domain concentration is the
    standard argument for per-domain caps, and the Gini coefficient is
    its one-number summary).

    Groups are ranked by weight (row count, or ``sum(weight_col)``)
    descending, ties broken by the group value ascending so the order —
    and therefore every number here — is a pure function of the data.
    Output, one row per occupied band (``band`` = which
    ``n_bands``-quantile of the GROUP ranking, 1 = heaviest):
    (band, n_groups, band_share, cum_share, gini) with shares rounded
    to 6 decimals and the discrete-population Gini repeated on every
    row (computed from the same ranking:
    ``2*sum(i_asc*w)/(n*W) - (n+1)/n``).

    Scale shape: the corpus collapses to one row per group first
    (shuffle payload = |groups| count rows), and the global
    rank/cumulative-sum over those rows is an exact DISTRIBUTED prefix
    sum — range-repartition by (weight desc, group), per-partition
    window, plus per-partition offsets folded in via a broadcast of the
    |partitions|-row offset table — deliberately NOT a single global
    window, so 100 M registrable domains don't serialize through one
    task. (The offset table's own cumulative sum is a single-partition
    window over |partitions| rows — the same bounded-scalar exemption
    as the 1001-row histogram in ``token_budget_select``.) The grand
    totals ride a 1-row broadcast (scalar cross-join pattern).
    """
    from pyspark.sql import Window

    if n_bands < 1:
        raise ValueError("n_bands must be >= 1")
    w_expr = (
        F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    ).cast("double")
    gw = (
        df.groupBy(F.col(group_col).alias("__grp"))
        .agg(w_expr.alias("__w"))
    )
    nparts = max(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")), 1
    )
    part = gw.repartitionByRange(
        nparts, F.col("__w").desc(), F.col("__grp").asc()
    ).withColumn("__pid", F.spark_partition_id())
    per = part.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__c"), F.sum("__w").alias("__s")
    )
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per.select(
        "__pid",
        F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__coff"),
        F.coalesce(F.sum("__s").over(w_off), F.lit(0.0)).alias("__woff"),
    )
    wp = Window.partitionBy("__pid").orderBy(
        F.col("__w").desc(), F.col("__grp").asc()
    )
    ranked = part.join(F.broadcast(offsets), "__pid").select(
        "__grp",
        "__w",
        (F.row_number().over(wp) + F.col("__coff")).alias("__rank"),
        (
            F.sum("__w").over(wp.rowsBetween(Window.unboundedPreceding, 0))
            + F.col("__woff")
        ).alias("__cum"),
    )
    totals = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum("__w").alias("__tw"),
        F.sum(F.col("__rank") * F.col("__w")).alias("__rw"),
    )
    banded = ranked.crossJoin(F.broadcast(totals))
    band = F.ceil(F.col("__rank") * F.lit(float(n_bands)) / F.col("__n"))
    gini = F.round(
        F.lit(2.0)
        * ((F.col("__n") + 1) * F.col("__tw") - F.col("__rw"))
        / (F.col("__n") * F.col("__tw"))
        - (F.col("__n") + 1) / F.col("__n"),
        6,
    )
    return (
        banded.groupBy(band.cast("int").alias("band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.round(F.sum("__w") / F.first("__tw"), 6).alias("band_share"),
            F.round(F.max("__cum") / F.first("__tw"), 6).alias("cum_share"),
            F.first(gini).alias("gini"),
        )
        .orderBy("band")
    )


def dataset_overlap_report(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise content-overlap matrix between corpus slices — the
    governance report dataset papers publish before mixing sources
    (and the first question when a new drop arrives: how much of it is
    already in the corpus?). Content identity is the exact-dedup key
    (md5 of lowercase whitespace-normalized text); for every unordered
    slice pair (a < b) the report carries each side's distinct-content
    count, the intersection size, and the content Jaccard
    |∩| / |∪|. Zero-overlap pairs are reported explicitly (jaccard 0),
    not dropped — absence of overlap is the finding.

    Scale shape: the corpus collapses to distinct (slice, 16-byte
    fingerprint) rows in one partial-fold aggregate — bodies never
    shuffle; the intersection self-join is keyed on the fingerprint
    (hash-partitioned, no skew beyond true content popularity); the
    |slices|²-row pair frame is driver-trivial and built by a
    broadcast cross of the |slices|-row size table."""
    from ..functions.textfns import normalize_ws

    fp = F.md5(normalize_ws(F.lower(F.col(text_col))))
    fps = df.select(
        F.col(group_col).alias("g"), fp.alias("fp")
    ).distinct()
    sizes = fps.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        fps.alias("a")
        .join(fps.alias("b"), F.col("a.fp") == F.col("b.fp"))
        .filter(F.col("a.g") < F.col("b.g"))
        .groupBy(
            F.col("a.g").alias("group_a"), F.col("b.g").alias("group_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    pairs = (
        sizes.alias("sa")
        .select(F.col("g").alias("group_a"), F.col("n").alias("n_a"))
        .join(
            F.broadcast(
                sizes.alias("sb").select(
                    F.col("g").alias("group_b"), F.col("n").alias("n_b")
                )
            ),
            F.col("group_a") < F.col("group_b"),
        )
    )
    return (
        pairs.join(inter, ["group_a", "group_b"], "left")
        .select(
            "group_a",
            "group_b",
            "n_a",
            "n_b",
            F.coalesce(F.col("n_common"), F.lit(0)).alias("n_common"),
            F.round(
                F.coalesce(F.col("n_common"), F.lit(0))
                / (F.col("n_a") + F.col("n_b")
                   - F.coalesce(F.col("n_common"), F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )


# Benford expected first-digit frequencies, log10(1 + 1/d) in integer
# ppm. LITERALS, not in-engine log10: the whole audit stays in exact
# integer arithmetic so the DuckDB twin (which carries the same nine
# constants) hashes bit-for-bit.
BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_report(df: DataFrame, col: str) -> DataFrame:
    """First-significant-digit audit of a positive numeric column vs
    Benford's law — the classic fabricated-data / unit-mixing forensic
    check a curation pipeline runs on money and count columns.

    The first digit comes from the INTEGER part via string head (both
    engines render BIGINT identically; no log10, no float): rows with
    floor(value) < 1 are excluded. Output: one row per digit 1-9 with
    the observed count, observed ppm (n_d * 10^6 // n), the Benford
    expectation in ppm (literal), and the signed deviation — all exact
    integers. Scale: one scan + a 9-row aggregate; map-side combinable.
    """
    digits = df.select(
        F.substring(
            F.floor(F.col(col)).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    ).filter(F.floor(F.col(col)) >= 1)
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs")
    )
    # max(total, 1): zero eligible rows must yield an all-zero report
    # (every n_obs is 0, so the ppm columns are 0 either way), not a
    # divide-by-zero — the hypothesis differential test pinned this.
    total = max(digits.count(), 1)
    expected = digits.sparkSession.createDataFrame(
        sorted(BENFORD_PPM.items()), "digit int, expected_ppm long"
    )
    return (
        expected.join(counts, "digit", "left")
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_obs"),
            F.expr(f"coalesce(n_obs, 0) * 1000000 div {total}L").alias(
                "obs_ppm"
            ),
            "expected_ppm",
            (
                F.expr(f"coalesce(n_obs, 0) * 1000000 div {total}L")
                - F.col("expected_ppm")
            ).alias("dev_ppm"),
        )
        .orderBy("digit")
    )
