"""Portable distinct-count sketches: HyperLogLog and KMV (theta).

Spark ships a Datasketches HLL (`hll_sketch_agg`, used by
`functions/timeseries.rolling_distinct_count_approx`) whose binary
state no other engine can replay — fine for monitoring, useless for a
hash-verified correctness gate. These are the PORTABLE complements:
every hash is md5 (the `functions/sampling.hash_fraction` convention),
every register/order statistic is an exact integer, and every float in
the estimate is either a driver-computed literal shared verbatim with
the SQL twin or the result of ONE IEEE operation on exact inputs — so
DuckDB replays the sketch bit-for-bit and the estimates value-hash.

Why both sketches:

* **HLL** (Flajolet et al. 2007): fixed 2^p registers per group, the
  smallest state per counted set — the per-group / per-day distinct
  monitor. Registers merge by MAX, which is EXACT (no float anywhere
  in the state), so per-day register tables roll up to per-month ones
  with zero accuracy loss — the property the gate entry exercises by
  building daily registers and max-merging them.
* **KMV / theta** (Beyer et al. 2007; Dasgupta et al. 2016 for the
  theta framing): the k smallest distinct hash values per group. Costs
  more state than HLL (k longs vs 2^p bytes) but supports SET ALGEBRA:
  union/intersection estimates between groups from the sketches alone
  — the "how much do these two corpora overlap" question dedup
  pipelines ask before paying for an exact join.

Determinism ledger (what makes the estimates hash-safe cross-engine):

- register index / rho: pure integer+string ops on md5 hex — exact.
- HLL denominator: Σ 2^(CAP−rho) summed as DECIMAL(38,0)/HUGEINT —
  exact integers, order-independent (the `operators/pca.py`
  discipline). 2^(CAP−rho) itself is a power of two, exact in double
  before the cast.
- HLL estimate: one literal ÷ one exact-decimal-cast-to-double — a
  single IEEE division, bit-equal everywhere. The small-range linear
  counting branch ``m·ln(m/V)`` never computes ``ln`` in-engine: V is
  an integer in [1, m], so the m possible results ride as a literal
  lookup table computed once on the driver and indexed exactly.
- KMV hashes: first 13 md5 hex chars = 52 bits < 2^53, so the
  long → double cast in the estimate is EXACT, and the estimate is
  again one literal ÷ one exact double.

Scale shape: both builds are map-side-combinable aggregations whose
output is capped per group (2^p rows / k rows) no matter how many rows
flow in — the "reduce 100 TB to driver-holdable state" contract shared
with `sketches.cms_build`. The pair-overlap stage fans sketches out by
group PAIR — quadratic in the number of GROUPS (event types, sources:
dimension-bounded by nature), never in rows.

Reference parity note: the reference bundle (CreateHQL.scala) has no
sketches; this is the engine's LLM-data-pipeline extension surface
(SURVEY.md §2 extensions — corpus telemetry at 100 TB).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_registers",
    "hll_merge",
    "hll_estimate",
    "hll_linear_counting_table",
    "kmv_sketch",
    "kmv_estimate",
    "kmv_pair_overlap",
    "HLL_RHO_CAP",
    "KMV_HASH_BITS",
]

# rho is clamped here so 2^(CAP - rho) stays a long-width power of two
# and the per-register denominator terms sum exactly in DECIMAL(38,0).
# The truncation error (2^-64 per register) is ~12 orders of magnitude
# below the sketch's own stddev at p=8.
HLL_RHO_CAP = 64

# 13 md5 hex chars = 52 bits: the largest hash width whose long → double
# cast is exact (2^52 < 2^53), keeping the KMV estimate a single IEEE
# division over exactly-represented operands.
KMV_HASH_BITS = 52


def _hll_rho(tail: Column, tail_hex_len: int) -> Column:
    """Position of the first 1-bit (1-based) in the hex-string bit
    tail — pure string ops, identical in any engine: 4 bits per
    leading '0' char, plus the first nonzero char's leading zeros via
    a 15-way CASE, clamped to HLL_RHO_CAP."""
    stripped = F.regexp_replace(tail, "^0+", "")
    nz = F.length(stripped)
    first = F.substring(stripped, 1, 1)
    clz4 = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = F.when(nz == 0, F.lit(4 * tail_hex_len + 1)).otherwise(
        (F.lit(tail_hex_len) - nz) * 4 + clz4 + 1
    )
    return F.least(rho, F.lit(HLL_RHO_CAP))


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    *,
    p: int = 8,
) -> DataFrame:
    """(group…, register, rho) — the 2^p HLL registers of each group's
    key set (absent registers are implicit zeros; `hll_estimate`
    accounts for them). ``p`` must be a multiple of 4 so the register
    index is a whole hex prefix. One groupBy(group, register) MAX —
    map-side combinable, ≤ 2^p rows per group out of any row count."""
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError("p must be a multiple of 4 in [4, 16]")
    reg_hex = p // 4
    tail_len = 32 - reg_hex
    h = F.md5(F.col(key_col).cast("string"))
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(
            *group_cols,
            F.conv(F.substring(h, 1, reg_hex), 16, 10)
            .cast("int")
            .alias("register"),
            _hll_rho(F.substring(h, reg_hex + 1, tail_len), tail_len).alias(
                "rho"
            ),
        )
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*tables: DataFrame) -> DataFrame:
    """Register-wise MAX of register tables built with the same ``p``
    and grouping — EXACT (integer max is associative/commutative), so
    ``registers(a ∪ b) == hll_merge(registers(a), registers(b))``
    holds with equality, not approximately: sketch slices by day/shard
    and roll up without accuracy loss."""
    if not tables:
        raise ValueError("hll_merge needs at least one register table")
    u = tables[0]
    for t in tables[1:]:
        u = u.unionByName(t)
    keys = [c for c in u.columns if c != "rho"]
    return u.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_linear_counting_table(p: int = 8) -> list[float]:
    """``m·ln(m/V)`` for V = 1..m, computed ONCE on the driver — the
    literal table both the engine and its SQL twin index instead of
    ever calling ``ln`` in-engine (cross-engine libm is not
    bit-reproducible; a shared literal is)."""
    m = 1 << p
    return [m * math.log(m / v) for v in range(1, m + 1)]


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    *,
    p: int = 8,
) -> DataFrame:
    """(group…, est_distinct) from a register table. The raw estimate
    ``α_m·m² / Σ 2^-rho`` is evaluated as LITERAL ÷ exact-decimal — one
    IEEE division — with the Flajolet small-range correction
    ``m·ln(m/V)`` (V = zero registers) taken from the driver-side
    literal table when E ≤ 2.5m. Bit-equal in any engine replaying the
    same integers."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    numerator = alpha * m * m * 2.0**HLL_RHO_CAP
    two_cap_dec = F.lit(str(1 << HLL_RHO_CAP)).cast("decimal(38,0)")
    lc = F.array(*[F.lit(x) for x in hll_linear_counting_table(p)])
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__nreg"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(HLL_RHO_CAP) - F.col("rho")).cast(
                "decimal(38,0)"
            )
        ).alias("__den0"),
    )
    v = F.lit(m) - F.col("__nreg")
    den = (
        F.col("__den0") + v.cast("decimal(38,0)") * two_cap_dec
    ).cast("double")
    e_raw = F.lit(numerator) / den
    est = F.when(
        (v > 0) & (e_raw <= F.lit(2.5 * m)),
        F.element_at(lc, F.greatest(v, F.lit(1)).cast("int")),
    ).otherwise(e_raw)
    return agg.select(*group_cols, est.alias("est_distinct"))


def _kmv_hash(key: Column) -> Column:
    """52-bit md5-prefix hash as a long — exactly double-representable."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 13), 16, 10).cast(
        "long"
    )


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    *,
    k: int = 64,
) -> DataFrame:
    """(group…, h, rn) — each group's k smallest DISTINCT 52-bit key
    hashes, rank-numbered 1..k. Distinct-then-window: the distinct is
    map-side combinable on (group, h); the window is per-group over at
    most the distinct-hash count, and nothing wider than (group, long)
    ever shuffles. Groups with < k distinct keys keep them all — the
    sketch is exact there and the estimators detect it by count."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError("k must be >= 2")
    hashed = (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, _kmv_hash(F.col(key_col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def kmv_estimate(
    sketch: DataFrame,
    group_cols: list[str],
    *,
    k: int = 64,
) -> DataFrame:
    """(group…, est_distinct): ``(k−1)·2^52 / h_k`` when the sketch is
    saturated (the classic KMV estimator — h_k is the k-th order
    statistic), the exact distinct-hash count when not. Both operands
    of the division are exact doubles, so the estimate is bit-portable."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__cnt"), F.max("h").alias("__hk")
    )
    est = F.when(F.col("__cnt") < k, F.col("__cnt").cast("double")).otherwise(
        F.lit(float((k - 1) * (1 << KMV_HASH_BITS)))
        / F.col("__hk").cast("double")
    )
    return agg.select(*group_cols, est.alias("est_distinct"))


def kmv_pair_overlap(
    sketch: DataFrame,
    group_col: str,
    *,
    k: int = 64,
) -> DataFrame:
    """(group_a, group_b, est_union, est_inter) for every unordered
    group pair, from the sketches ALONE (theta-sketch set algebra):

    * merged = k smallest distinct hashes of S_a ∪ S_b; if fewer than
      k exist both sketches were exact → counts are exact.
    * saturated: θ = k-th smallest of merged. Every corpus hash < θ is
      present in whichever side owns it (θ ≤ both sides' own k-th), so
      ``est_union = (k−1)·2^52/θ`` and
      ``est_inter = |S_a ∩ S_b ∩ [0,θ)| · 2^52/θ``.

    Fan-out is per group PAIR (dimension-bounded), each pair carrying
    ≤ 2k (long, long) rows — nothing scales with corpus rows."""
    from pyspark.sql import Window

    ga, gb = "group_a", "group_b"
    gs = sketch.select(F.col(group_col).alias("g")).distinct()
    pairs = (
        gs.select(F.col("g").alias(ga))
        .join(gs.select(F.col("g").alias(gb)), F.col(ga) < F.col(gb))
    )
    sa = sketch.select(F.col(group_col).alias(ga), "h")
    sb = sketch.select(F.col(group_col).alias(gb), F.col("h").alias("hb"))
    merged = (
        pairs.join(sa, ga)
        .select(ga, gb, "h")
        .unionByName(
            pairs.join(sb, gb).select(ga, gb, F.col("hb").alias("h"))
        )
        .distinct()
    )
    w = Window.partitionBy(ga, gb).orderBy("h")
    ranked = merged.withColumn("rn", F.row_number().over(w))
    stats = ranked.groupBy(ga, gb).agg(
        F.count(F.lit(1)).alias("__mk"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("__theta"),
    )
    common = (
        sa.join(sb.withColumnRenamed("hb", "h"), "h")
        .join(pairs, [ga, gb], "semi")
        .select(ga, gb, "h")
    )
    cstats = (
        common.join(
            stats.select(ga, gb, "__theta"), [ga, gb], "left"
        )
        .groupBy(ga, gb)
        .agg(
            F.count(F.lit(1)).alias("__common"),
            F.sum(
                (
                    F.col("__theta").isNotNull()
                    & (F.col("h") < F.col("__theta"))
                ).cast("long")
            ).alias("__below"),
        )
    )
    unit = float(1 << KMV_HASH_BITS)
    joined = stats.join(cstats, [ga, gb], "left").select(
        ga,
        gb,
        "__mk",
        "__theta",
        F.coalesce("__common", F.lit(0)).alias("__common"),
        F.coalesce("__below", F.lit(0)).alias("__below"),
    )
    saturated = F.col("__mk") >= k
    est_union = F.when(
        ~saturated, F.col("__mk").cast("double")
    ).otherwise(F.lit((k - 1) * unit) / F.col("__theta").cast("double"))
    est_inter = F.when(
        ~saturated, F.col("__common").cast("double")
    ).otherwise(
        F.col("__below").cast("double")
        * (F.lit(unit) / F.col("__theta").cast("double"))
    )
    return joined.select(
        ga,
        gb,
        est_union.alias("est_union"),
        est_inter.alias("est_inter"),
    )
