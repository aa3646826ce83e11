"""Deterministic content-hash sampling and dataset splitting.

Training-data pipelines need splits that are (a) stable across runs and
cluster layouts — a document must land in the same split tomorrow, on any
partitioning — and (b) computable without a shuffle or a stored
assignment table. ``df.sample``/``TABLESAMPLE`` give neither (seeded
per-partition RNG changes with the partition layout). Hashing a stable
key does: the assignment is a pure narrow projection, embarrassingly
parallel at any scale, and every engine that agrees on md5 agrees on the
split (which is what lets the DuckDB oracle replay it bit-for-bit).

md5 rather than Spark's ``hash``/``xxhash64`` precisely because the
latter are engine-private; the first hex nibble gives 16 even buckets,
enough resolution for the holdout fractions these pipelines use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "hash_fraction",
    "hash_split",
    "hash_sample",
    "stratified_hash_sample",
    "mixture_sample",
    "temperature_sample",
    "exact_stratified_sample",
    "weighted_sample",
    "shuffle_shards",
    "epoch_upsample",
]

_NIBBLES = "0123456789abcdef"


def hash_bucket(key: Column | str) -> Column:
    """0-15 bucket from the first md5 nibble of the key's string form."""
    key = F.col(key) if isinstance(key, str) else key
    nib = F.substring(F.md5(key.cast("string")), 1, 1)
    # position in the hex alphabet; instr is 1-based
    return F.instr(F.lit(_NIBBLES), nib) - 1


def hash_fraction(key: Column | str) -> Column:
    """Uniform double in [0, 1) from the first 8 md5 hex chars of the
    key's string form — the fine-grained sibling of ``hash_bucket`` for
    arbitrary keep rates. 2³² resolution; engine-portable (DuckDB:
    ``CAST(concat('0x', substring(md5(k), 1, 8)) AS BIGINT) /
    4294967296.0`` replays it bit-for-bit)."""
    key = F.col(key) if isinstance(key, str) else key
    v = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    return v / F.lit(4294967296.0)


def hash_split(
    df: DataFrame,
    key: str,
    *,
    holdout_sixteenths: int = 2,
    split_col: str = "split",
) -> DataFrame:
    """Tag each row 'holdout' or 'train' by content hash of ``key``.

    ``holdout_sixteenths``/16 of rows (in expectation) become holdout;
    2/16 = 12.5% is the default. Deterministic per key value: duplicate
    keys always co-locate in one split (no train/test leakage)."""
    if not 0 <= holdout_sixteenths <= 16:
        raise ValueError("holdout_sixteenths must be in [0, 16]")
    return df.withColumn(
        split_col,
        F.when(
            hash_bucket(key) < holdout_sixteenths, F.lit("holdout")
        ).otherwise(F.lit("train")),
    )


def hash_sample(df: DataFrame, key: str, *, sixteenths: int = 1) -> DataFrame:
    """Keep a deterministic ~``sixteenths``/16 fraction of rows by key
    hash. Unlike ``df.sample`` this survives re-runs, repartitioning,
    and engine changes unchanged — the contract a reproducible eval
    subset needs."""
    if not 0 <= sixteenths <= 16:
        raise ValueError("sixteenths must be in [0, 16]")
    return df.filter(hash_bucket(key) < sixteenths)


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    sixteenths: dict[str, int],
    *,
    default_sixteenths: int = 16,
) -> DataFrame:
    """Per-stratum deterministic downsampling (e.g. rebalance a corpus
    dominated by one language: keep 4/16 of 'en', all of the rest).

    Same md5-bucket mechanics as ``hash_sample`` — stable across runs
    and engines — with the keep-threshold chosen per stratum value.
    Still a pure narrow filter: no shuffle, no per-stratum pass; one
    scan handles every stratum."""
    for v in list(sixteenths.values()) + [default_sixteenths]:
        if not 0 <= v <= 16:
            raise ValueError("sixteenths values must be in [0, 16]")
    thr = F.lit(default_sixteenths)
    for value, k in sorted(sixteenths.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(k)).otherwise(thr)
    return df.filter(hash_bucket(key) < thr)


def epoch_upsample(
    df: DataFrame,
    strata_col: str,
    factors: dict[str, float],
    *,
    key: str,
    copy_col: str = "copy_no",
) -> DataFrame:
    """Fractional repeat-factor sampling — the UPsampling complement to
    ``mixture_sample``'s downsampling: every row of stratum ``g`` is
    emitted ``floor(f_g)`` times plus one extra copy with probability
    ``frac(f_g)``, so a factor of 2.3 averages 2.3 epochs of that
    stratum (the standard high-quality-source repeat knob: "3.5 epochs
    of wikipedia, 0.4 of crawl"). Factors < 1 degenerate to plain
    hash-rate downsampling; strata absent from ``factors`` get factor 0
    (dropped). Output repeats the input row with ``copy_col`` =
    0..n_copies-1 so downstream shuffling/packing can treat copies as
    distinct documents.

    The extra-copy coin is the deterministic content hash
    (``hash_fraction`` over key + a fixed salt), so results are stable
    across runs, partitionings, and engines; expected totals are exact,
    realized counts binomial (same contract as ``mixture_sample``).

    Scale shape: one narrow projection computing n_copies, one explode
    whose row growth IS the requested output volume — no shuffle, no
    window, no driver collect; the |strata|-row factor table rides a
    map literal.
    """
    if any(f < 0 for f in factors.values()):
        raise ValueError("factors must be >= 0")
    fmap = F.create_map(
        *[F.lit(x) for kv in sorted(factors.items()) for x in kv]
    )
    f = F.coalesce(
        fmap[F.col(strata_col).cast("string")].cast("double"), F.lit(0.0)
    )
    base = F.floor(f).cast("int")
    extra = (
        hash_fraction(F.concat(F.col(key).cast("string"), F.lit(":epoch")))
        < (f - F.floor(f))
    ).cast("int")
    n_copies = base + extra
    copies = F.when(
        n_copies > 0, F.sequence(F.lit(0), n_copies - 1)
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn(copy_col, F.explode(copies))


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    targets: dict[str, float],
    *,
    key: str,
) -> DataFrame:
    """Downsample ``df`` so the kept rows follow the ``targets`` mixture
    proportions — the domain/language-reweighting step every LLM
    training-data pipeline runs (e.g. cap web crawl at 60%, keep code at
    20%...). Strata absent from ``targets`` are dropped. A target
    stratum with NO rows in ``df`` makes the request infeasible — no
    keep-set can contain it at its target share — and the result is
    EMPTY rather than a silently re-normalized mixture (the stratum
    enters the feasibility min with count 0, collapsing the cap to 0).

    The feasible total is maximized: N = min over strata of
    (count_g / target_g), then each stratum keeps rows at rate
    N·target_g/count_g by deterministic content hash (``hash_fraction``),
    so the result is stable across runs, partitionings, and engines.
    Kept counts are binomial around N·target_g (±√N-ish), not exact —
    exactness would need a per-stratum global sort; the hash filter needs
    none.

    Scale shape: one column-pruned scan for the per-stratum counts (a
    |strata|-row aggregate), then one narrow filtered scan joined to the
    |strata|-row rate table (AQE broadcasts it). Document bodies never
    shuffle; there is no window, no global sort, no driver collect.
    """
    if not targets:
        raise ValueError("targets must be non-empty")
    total_w = sum(targets.values())
    if total_w <= 0:
        raise ValueError("target weights must sum > 0")
    norm = {k: v / total_w for k, v in targets.items()}

    weights = F.create_map(
        *[F.lit(x) for kv in sorted(norm.items()) for x in kv]
    )
    # right-join the observed counts onto the full target list so a
    # target stratum with zero rows still contributes a (count=0) row:
    # it then drives the feasibility min to 0 and the output is empty —
    # an explicit infeasibility signal instead of a wrong mixture.
    target_rows = (
        df.sparkSession.createDataFrame(
            [(k,) for k in sorted(norm)], [strata_col]
        )
    )
    counts = (
        df.filter(F.col(strata_col).isin(*norm))
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .join(target_rows, strata_col, "right")
        .select(
            strata_col,
            F.coalesce(F.col("__n"), F.lit(0)).alias("__n"),
            weights[F.col(strata_col)].alias("__t"),
        )
    )
    # N = floor(min(count_g / t_g)); a missing stratum's 0/t_g = 0
    # collapses the cap (see docstring).
    feasible = counts.agg(
        F.floor(F.min(F.col("__n") / F.col("__t"))).alias("__cap")
    )
    # a zero-count stratum would divide by zero (ANSI); its keep rate is
    # definitionally 0 — and with cap 0, every other rate is 0 too
    rates = counts.crossJoin(feasible).select(
        strata_col,
        F.when(
            F.col("__n") > 0,
            F.least(
                F.lit(1.0), F.col("__cap") * F.col("__t") / F.col("__n")
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("__rate"),
    )
    return (
        df.join(rates, strata_col)
        .filter(hash_fraction(key) < F.col("__rate"))
        .drop("__rate")
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    *,
    alpha: float = 0.5,
    key: str,
) -> DataFrame:
    """Temperature-based mixture rebalancing — the multilingual
    alpha-sampling rule (mC4/XLM-R style): target share of stratum g is
    p_g ∝ count_g^alpha, so alpha=1 keeps the natural distribution,
    alpha=0 forces uniform, and 0<alpha<1 boosts rare strata
    (downsampling-only: head strata are cut toward the tempered mix;
    the feasible total is maximized exactly like ``mixture_sample``).

    Unlike ``mixture_sample`` the targets come from the DATA, so the
    whole computation stays distributed: a |strata|-row count table,
    tempered weights, a 1-row weight total + feasibility cap riding the
    plan as scalar broadcasts, then the same deterministic
    ``hash_fraction`` keep filter. No driver collect, bodies never
    shuffle.

    Cross-engine determinism: alpha=0.5 uses sqrt (correctly-rounded
    IEEE in every engine, so a SQL oracle replays the rates
    bit-for-bit); other alphas go through pow(), whose last-ulp
    behavior is libm-specific — fine in production, but exact
    cross-engine replays should stick to 0.5 (or 0 / 1).
    The weight total accumulates in DECIMAL(38,15) quantized steps so
    float summation order can never perturb the shares."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    if alpha == 0.5:
        wt = F.sqrt(F.col("__n"))
    elif alpha == 0:
        wt = F.lit(1.0)
    elif alpha == 1:
        wt = F.col("__n").cast("double")
    else:
        wt = F.pow(F.col("__n"), F.lit(float(alpha)))
    w = counts.select(strata_col, "__n", wt.alias("__wt"))
    total = w.agg(
        F.sum(F.col("__wt").cast("decimal(38,15)"))
        .cast("double")
        .alias("__tw")
    )
    t = w.crossJoin(F.broadcast(total)).select(
        strata_col, "__n", (F.col("__wt") / F.col("__tw")).alias("__p")
    )
    cap = t.agg(F.floor(F.min(F.col("__n") / F.col("__p"))).alias("__cap"))
    rates = t.crossJoin(F.broadcast(cap)).select(
        strata_col,
        F.least(
            F.lit(1.0), F.col("__cap") * F.col("__p") / F.col("__n")
        ).alias("__rate"),
    )
    return (
        df.join(rates, strata_col)
        .filter(hash_fraction(key) < F.col("__rate"))
        .drop("__rate")
    )


def exact_stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    *,
    key: str,
) -> DataFrame:
    """Exactly ``min(n_per_stratum, stratum_size)`` rows per stratum,
    chosen deterministically by md5 order of the key — the exact-count
    sibling of ``mixture_sample`` (which trades exactness for a pure
    narrow filter). Use this when the contract is "exactly N eval docs
    per language"; use the rate-based samplers when N is large and ±√N
    is acceptable.

    Scale shape: one shuffle partitioned by stratum for the per-stratum
    rank. Rank-within-stratum is the unavoidable cost of exactness —
    and the skew warning is real: a stratum's rows land on one reducer,
    so this is for strata that individually fit an executor (eval-set
    curation, per-language caps up to ~10⁷ rows), not for ranking a
    whole corpus. ``Window.partitionBy`` raises no error on overflow —
    size your strata.
    """
    if n_per_stratum < 0:
        raise ValueError("n_per_stratum must be >= 0")
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(key).cast("string")), F.col(key)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    *,
    weight_col: str,
    key: str,
    score_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — exactly
    ``min(n, eligible_rows)`` rows, where a row's inclusion probability
    is proportional to its weight (Efraimidis & Spirakis 2006: draw
    u ~ Uniform(0,1), keep the top-n by u^(1/w)). The standard
    quality-weighted selection step: "sample 10 M training docs,
    preferring high quality-score ones" — smoother than a hard
    ``token_budget_select`` threshold, exact-count unlike
    ``mixture_sample``'s rate filter.

    Determinism: u is the content hash ``hash_fraction(key)`` (md5, as
    everywhere in this module), so the sample is stable across runs,
    partitionings, and engines — DuckDB replays it bit-for-bit with
    ``pow(CAST(concat('0x', substring(md5(k),1,8)) AS BIGINT) /
    4294967296.0, 1.0/w)``. Rows with NULL or non-positive weight are
    excluded (they'd have inclusion probability 0). Ties (identical
    (es_key, key) pairs) break on the key's md5, making the cut
    deterministic even for duplicate keys.

    Scale shape: the selection key is one narrow projection; the top-n
    is ``orderBy(...).limit(n)``, which Spark plans as
    TakeOrderedAndProject — a per-partition top-n heap followed by an
    n-row merge on the driver side of the exchange, NOT a global sort.
    Cost is one pass over the data + n rows moved; fine for the n up to
    ~10⁷ this is meant for. No window, no skew surface (nothing groups).
    """
    if n < 0:
        raise ValueError("n must be >= 0")
    u = hash_fraction(F.col(key))
    w = F.col(weight_col).cast("double")
    es_key = F.when(w > 0, F.pow(u, F.lit(1.0) / w))
    out = (
        df.withColumn("__es", es_key)
        .filter(F.col("__es").isNotNull())
        .orderBy(
            F.col("__es").desc(),
            F.md5(F.col(key).cast("string")),
        )
        .limit(n)
    )
    if score_col is None:
        return out.drop("__es")
    return out.withColumnRenamed("__es", score_col)


def shuffle_shards(
    df: DataFrame,
    key: str,
    *,
    n_shards: int,
    seed: str = "",
    shard_col: str = "shard",
    pos_col: str = "shard_pos",
) -> DataFrame:
    """Deterministic corpus shuffle + sharding — the last step before
    training: assign every row to one of ``n_shards`` shards and give
    it a position within the shard, both derived from the md5 of
    (seed, key) so the "random" order is reproducible, resumable, and
    independent of partition layout (the property a dataloader needs;
    ``rand()`` reshuffles on every retry/backfill). Different ``seed``
    values give independent epoch orders over the same corpus.

    Plan shape: shard = hash bucket (narrow), position = row_number
    within the shard partition ordered by the hash — one shuffle on
    the shard key, each shard sorts independently; NO global sort.
    Writers then ``partitionBy(shard_col)`` (or repartition on it) so
    each output file is one shard in final order. Shard sizes are
    hash-uniform (±O(√(n/shards)) skew).
    """
    from pyspark.sql import Window

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    k = F.concat(F.lit(seed), F.col(key).cast("string"))
    h = F.md5(k)
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    w = Window.partitionBy(shard_col).orderBy(F.col("__h"), F.col(key))
    return (
        df.withColumn("__h", h)
        .withColumn(shard_col, shard)
        .withColumn(pos_col, F.row_number().over(w))
        .drop("__h")
    )
