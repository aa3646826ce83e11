"""Margin-based bitext (parallel-pair) mining over embedding columns.

The standard recipe for mining aligned sentence/document pairs from two
unaligned multilingual corpora (Artetxe & Schwenk 2019, "Margin-based
Parallel Corpus Mining with Multilingual Sentence Embeddings"; the
LASER/CCMatrix construction): raw cosine is a bad threshold because hub
vectors are close to everything, so each candidate pair (x, y) is scored
by the RATIO MARGIN

    margin(x, y) = cos(x, y) / ( mean_{z in NN_k(x)} cos(x, z)/2
                               + mean_{w in NN_k(y)} cos(w, y)/2 )

— the pair's similarity relative to what each side's neighborhood
considers normal. Pairs are kept at ``margin ≥ threshold`` and
optionally restricted to mutual best matches (the high-precision mode
used for training-corpus construction).

Spark shape: the gate entry runs the EXACT form — every source
partition scored against the driver-collected target matrix in one
Arrow stage (vectorized integer-quantized products; the target side of
this path was always driver-materialized, previously as a broadcast
cross whose per-pair interpreted HOF fold was the measured bottleneck),
then two row_number windows (per-src and per-tgt top-k) — the right
plan for the ≤10⁵-row per-language-pair samples where thresholds are
tuned. At corpus scale the all-pairs stage is replaced by ANN candidate
generation (``candidates=``: any (src_id, tgt_id) frame, e.g.
`similarity.ivf_topk` output per direction); margin scoring stays a
pure-JVM equi-join pipeline and the mutual-best filter is unchanged —
exact rescoring over candidates, the FAISS-mine pattern.

Hash-determinism (the exact-integer discipline from `operators/pca`):
dot products are folds of ``floor((x·y)·1e8)`` int64 terms (scale
cancels in the cosine, so cos is one IEEE expression over exact ints);
per-neighborhood cosine sums are quantized to 1e-9 ints before
averaging (float sums of the top-k would be association-order-dependent
across engines). Every ranking carries an id tiebreak. A SQL engine
replaying the same expressions is bit-equal.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "quantized_cosine",
    "bitext_margin_scores",
    "mine_bitext_pairs",
    "rademacher_planes",
    "lsh_band_buckets",
    "lsh_bitext_candidates",
    "candidate_neighborhood_stats",
]

_DOT_SCALE = 8  # floor((x·y)·1e8) per element — exact int64 terms
_COS_SCALE = 9  # floor(cos·1e9) before neighborhood sums

# Exact-path guard (VERDICT r8 #6): the exact/sample path materializes
# the TARGET side on the driver (as the broadcast cross it replaced
# always did). The contract is the ≤10⁵-row per-language-pair sample
# mode; this cap turns a corpus-sized target from a silent driver OOM
# into an immediate, actionable error. 250k rows × 64 dims ≈ 130 MB —
# comfortably inside any driver that could have built the old
# broadcast relation.
_EXACT_TARGET_ROW_CAP = 250_000


def _qdot(a: Column, b: Column) -> Column:
    """Exact-integer quantized dot product: Σ floor((aᵢ·bᵢ)·1e8) as
    long — order-independent, bit-equal across engines (single IEEE
    multiply chain per term, integer sum)."""
    q = F.lit(float(10**_DOT_SCALE))
    terms = F.zip_with(
        a, b, lambda x, y: F.floor((x.cast("double") * y.cast("double")) * q).cast("long")
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, t: acc + t)


def quantized_cosine(a: Column, b: Column) -> Column:
    """cos(a, b) from quantized integer dots: qd/sqrt(qa·qb). The 1e8
    scale cancels between numerator and denominator, so the value is the
    true cosine up to 1e-8-level quantization — and bit-equal in any
    engine replaying the same integer-then-IEEE expression."""
    qd = _qdot(a, b).cast("double")
    qa = _qdot(a, a).cast("double")
    qb = _qdot(b, b).cast("double")
    return qd / F.sqrt(qa * qb)


def _exact_arrow_scores(
    src: DataFrame,
    tgt: DataFrame,
    *,
    id_col: str,
    vec_col: str,
) -> DataFrame | None:
    """All-pairs (src_id, tgt_id, cos double) via ONE Arrow stage.

    The exact/sample path's previous shape — broadcast cross join + a
    per-pair `zip_with`+`aggregate` fold — spent its time in the
    interpreted HOF (Spark never codegens higher-order functions;
    measured r8 at sf0.1: 8.4 s of the 11.1 s warm scoring stage for
    the 1 M-pair cross, and a 64-term `element_at` unroll was 4× WORSE
    — codegen collapse). Instead the target side is collected to a
    driver numpy matrix — the SAME memory class as the broadcast the
    cross join already required, this path is the ≤10⁵-row
    threshold-tuning sample mode by contract — and each source
    partition scores its rows against the matrix with vectorized
    floor((aᵢ·bᵢ)·1e8) int64 sums (guide §4.2: batch native compute
    inside Arrow; §8: score against a broadcast matrix). Emits 24-byte
    (id, id, cos) rows; vector payloads never enter a JVM pair row.

    Bit-equality with the SQL expression form: numpy performs the same
    IEEE multiply → floor → int64 sum → double divide / sqrt chain,
    term order preserved (pinned by tests against the SQL candidates
    path). Rows whose vector is NULL, off-dimension, or carries a
    NULL/non-finite ELEMENT get NULL cos — whole-NULL vectors and NULL
    elements are exactly the fold's semantics (a NULL term folds the
    sum to NULL); NaN/±Inf elements, which the integer-quantization
    contract already excludes (floor(±Inf·1e8) has no exact int64), are
    routed to the same NULL rather than engine-specific double→long
    cast garbage (ADVICE r8 #1). Returns None when the TARGET side is
    empty, ragged, or has NULL vectors or any NULL/non-finite element;
    callers fall back to the bit-equal SQL form (the corpus contract
    expects uniform finite dims, so this is the degenerate-input escape
    hatch, not a real mode).

    Raises when the target side exceeds ``_EXACT_TARGET_ROW_CAP``
    (VERDICT r8 #6): the collect is bounded by a ``limit(cap+1)``
    probe, so an oversized target costs one bounded job and a clear
    "pass candidates=" error instead of a driver OOM."""
    import numpy as np

    t_rows = (
        tgt.select(F.col(id_col), F.col(vec_col))
        .limit(_EXACT_TARGET_ROW_CAP + 1)
        .collect()
    )
    if len(t_rows) > _EXACT_TARGET_ROW_CAP:
        raise ValueError(
            f"bitext exact path: target side exceeds "
            f"{_EXACT_TARGET_ROW_CAP} rows — the exact/sample mode "
            "materializes the target on the driver and is meant for "
            "threshold-tuning samples. Pass candidates= (e.g. "
            "lsh_bitext_candidates output) for corpus-scale mining."
        )
    if not t_rows:
        return None
    t_vecs = [r[1] for r in t_rows]
    if any(v is None for v in t_vecs):
        return None
    dims = {len(v) for v in t_vecs}
    if len(dims) != 1 or 0 in dims:
        return None
    dim = dims.pop()
    qscale = float(10**_DOT_SCALE)
    # None elements become NaN in the float64 conversion; one finite
    # check catches NULL, NaN and ±Inf elements alike. Degenerate
    # target → SQL fallback (NULL elements fold cos to NULL there).
    T = np.array(t_vecs, dtype=np.float64)
    if not np.isfinite(T).all():
        return None
    tids = np.array([r[0] for r in t_rows])
    # per-target norms once, cast to double BEFORE the product — the SQL
    # form multiplies sn.double * tn.double, never int64*int64
    qb = (
        np.floor((T * T) * qscale).astype(np.int64).sum(axis=1).astype(np.float64)
    )
    nt = len(tids)
    id_type = src.schema[id_col].dataType.simpleString()
    out_schema = f"src_id {id_type}, tgt_id {id_type}, cos double"

    def score(batches):
        import pandas as pd

        # bound the (block × nt × dim) float64 product temp to ~64 MB
        block = max(1, (64 * 1024 * 1024) // (nt * dim * 8))
        for pdf in batches:
            ids = pdf.iloc[:, 0].to_numpy()
            vecs = pdf.iloc[:, 1].to_numpy()
            for i0 in range(0, len(ids), block):
                sub = vecs[i0 : i0 + block]
                shape_ok = [v is not None and len(v) == dim for v in sub]
                if all(shape_ok):
                    A = np.array(list(sub), dtype=np.float64)
                else:
                    A = np.array(
                        [
                            list(v) if g else [0.0] * dim
                            for v, g in zip(sub, shape_ok)
                        ],
                        dtype=np.float64,
                    )
                # element-level guard (ADVICE r8 #1): a NULL element
                # arrives as NaN after the float64 conversion and would
                # otherwise flow through floor().astype(int64) as
                # garbage; route the whole row to NULL cos (the fold's
                # NULL-element semantics; non-finite elements are
                # outside the quantization contract — see docstring)
                good = np.array(shape_ok) & np.isfinite(A).all(axis=1)
                if not good.all():
                    A[~good] = 0.0
                qd = (
                    np.floor((A[:, None, :] * T[None, :, :]) * qscale)
                    .astype(np.int64)
                    .sum(axis=2)
                    .astype(np.float64)
                )
                qa = (
                    np.floor((A * A) * qscale)
                    .astype(np.int64)
                    .sum(axis=1)
                    .astype(np.float64)
                )
                cos = (qd / np.sqrt(qa[:, None] * qb[None, :])).reshape(-1)
                out = {
                    "src_id": np.repeat(ids[i0 : i0 + block], nt),
                    "tgt_id": np.tile(tids, len(sub)),
                }
                if good.all():
                    out["cos"] = cos
                else:
                    # NULL/ragged/non-finite source vectors score NULL
                    # on every pair (zip_with+aggregate over a null
                    # side folds to NULL)
                    vals = cos.astype(object)
                    vals[np.repeat(~good, nt)] = None
                    out["cos"] = pd.array(vals, dtype="Float64")
                yield pd.DataFrame(out)

    return src.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        score, schema=out_schema
    )


def bitext_margin_scores(
    src: DataFrame,
    tgt: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(src_id, tgt_id, cos, margin) for every scored pair.

    ``candidates``: optional (src_id, tgt_id) frame restricting which
    pairs are scored AND which pairs define each side's neighborhood
    (the ANN-mining contract: neighborhoods are the retrieved top-k).
    Without it, all pairs are scored — the exact/sample path; the
    k-nearest neighborhoods are then true nearest neighbors.

    Scale: the exact path scores every source partition against the
    driver-collected target matrix in one Arrow stage (the sample-scale
    threshold-tuning mode — the target side was always
    driver-materialized here, previously as a broadcast cross); the
    candidates path is a pure-JVM equi-join pipeline. The neighborhood
    aggregates shuffle (id, long) pairs only; windows are per-id top-k
    with id tiebreaks. Pass ``candidates`` beyond sample scale.

    EAGER-COLLECT NOTE (ADVICE r8 #3): without ``candidates``, BUILDING
    this DataFrame runs one bounded Spark job — the target side is
    collected (capped at ``_EXACT_TARGET_ROW_CAP`` rows, above which
    this raises with a "pass candidates=" message) and snapshotted at
    construction time, a deliberate departure from DataFrame laziness.
    If the target's underlying data changes between construction and
    action, the scores reflect the construction-time snapshot.
    Explain-only tooling over the exact path pays that one job."""

    def _sql_scored(pairs: DataFrame) -> DataFrame:
        cos = _qdot(F.col("__sv"), F.col("__tv")).cast("double") / F.sqrt(
            F.col("__sn").cast("double") * F.col("__tn").cast("double")
        )
        return pairs.select("src_id", "tgt_id", cos.alias("cos"))

    def _norms(df: DataFrame, side: str) -> DataFrame:
        # norms once per row, not once per pair (3× fewer folds)
        return df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(vec_col).alias(f"__{side[0]}v"),
            _qdot(F.col(vec_col), F.col(vec_col)).alias(f"__{side[0]}n"),
        )

    if candidates is None:
        scored = _exact_arrow_scores(src, tgt, id_col=id_col, vec_col=vec_col)
        if scored is None:  # degenerate target side: bit-equal SQL form
            scored = _sql_scored(
                _norms(src, "src").crossJoin(F.broadcast(_norms(tgt, "tgt")))
            )
    else:
        # The candidates path is the PRODUCTION (100 TB) path: both sides
        # are full corpora, so neither may carry a broadcast hint — the
        # target join is a plain equi-join on tgt_id (shuffle is bounded
        # by the candidate volume, which LSH banding caps per bucket) and
        # AQE is free to pick broadcast at sample scale on its own.
        scored = _sql_scored(
            candidates.select("src_id", "tgt_id")
            .join(_norms(src, "src"), "src_id")
            .join(_norms(tgt, "tgt"), "tgt_id")
        )
    qcos = F.floor(F.col("cos") * F.lit(float(10**_COS_SCALE))).cast("long")
    wf = Window.partitionBy("src_id").orderBy(
        F.col("cos").desc(), F.col("tgt_id").asc()
    )
    wb = Window.partitionBy("tgt_id").orderBy(
        F.col("cos").desc(), F.col("src_id").asc()
    )
    # neighborhood denominators: exact-int sums of the top-k quantized
    # cosines per side (float top-k sums differ by association order
    # across engines; integer sums don't). They ride UNORDERED window
    # aggregates over the SAME partitions the rank windows establish —
    # r8 restructure: the previous filter+groupBy+join-back form made
    # `ranked` a 3-consumer frame (output + both sums), and Spark has
    # no subtree sharing, so the entire scoring lineage (exact path:
    # the Arrow all-pairs stage; ANN path: the candidate equi-join
    # pipeline) executed THREE times per query (guide §1.2 "don't
    # compute things twice", §2.4 two ops keyed the same way share one
    # exchange). Same int64 sums, same counts, same divisions —
    # bit-equal rows; plan goes 3 subtree executions + 2 joins + 2
    # aggregates → 1 execution, 2 exchanges total.
    wsrc = Window.partitionBy("src_id")
    wtgt = Window.partitionBy("tgt_id")
    topf = F.when(F.col("__rf") <= k, F.col("__qc"))
    topb = F.when(F.col("__rb") <= k, F.col("__qc"))
    # counts must tally top-k ROWS (the old filter+count(lit(1)) form),
    # not non-null qcos — count a literal gated on the rank alone
    inf_ = F.when(F.col("__rf") <= k, F.lit(1))
    inb_ = F.when(F.col("__rb") <= k, F.lit(1))
    ranked = (
        scored.select(
            "src_id",
            "tgt_id",
            "cos",
            qcos.alias("__qc"),
            F.row_number().over(wf).alias("__rf"),
        )
        .select(
            "*",
            F.sum(topf).over(wsrc).alias("__fs"),
            F.count(inf_).over(wsrc).alias("__fn"),
        )
        .select("*", F.row_number().over(wb).alias("__rb"))
        .select(
            "*",
            F.sum(topb).over(wtgt).alias("__bs"),
            F.count(inb_).over(wtgt).alias("__bn"),
        )
    )
    unit = F.lit(float(10**_COS_SCALE))
    denom = (
        F.col("__fs").cast("double") / (F.col("__fn") * unit)
        + F.col("__bs").cast("double") / (F.col("__bn") * unit)
    ) / F.lit(2.0)
    return ranked.select(
        "src_id",
        "tgt_id",
        "cos",
        (F.col("cos") / denom).alias("margin"),
        F.col("__rf").alias("fwd_rank"),
        F.col("__rb").alias("bwd_rank"),
    )


def rademacher_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[int]]:
    """Deterministic ±1 hyperplane literals from md5 — Rademacher
    components preserve the cosine-LSH collision guarantee (Charikar
    2002) at one sign per cell. Pinned driver-side (data-independent) so
    the SAME literal planes can ride a Spark expression, a DuckDB oracle
    replay, and every executor without broadcasting random state."""
    return [
        [
            1 if hashlib.md5(f"{seed}:{p}:{i}".encode()).digest()[0] < 128 else -1
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_band_buckets(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    planes: list[list[int]],
    band_bits: int = 4,
    quant_scale: int = 6,
) -> DataFrame:
    """(id, band, bucket) rows: hyperplane sign bits over pinned ±1
    ``planes`` (see ``rademacher_planes``), packed ``band_bits`` per
    band — the classic banded-LSH pigeonhole (a pair whose sketches
    agree on ANY band becomes a candidate).

    Exact-integer projections (the `operators/pca` discipline): each
    component quantizes once to ``floor(v·10^quant_scale)`` int64 and
    the per-plane projection is an integer sum of ±qᵢ — bit-equal in
    any engine, no IEEE association-order hazard. Scale: a narrow
    per-row JVM fold; output fans out rows × n_bands only."""
    n_bands, rem = divmod(len(planes), band_bits)
    if rem:
        raise ValueError("len(planes) must be a multiple of band_bits")
    # materialize the quantized vector ONCE per row — inlining the
    # transform expression into every per-plane aggregate would repeat
    # the 64-wide floor/cast chain n_planes times per row
    quantized = df.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(
                x.cast("double") * F.lit(float(10**quant_scale))
            ).cast("long"),
        ).alias("__qv"),
    )
    bits = []
    for s in planes:
        sl = F.array(*[F.lit(v) for v in s])
        proj = F.aggregate(
            F.zip_with(F.col("__qv"), sl, lambda a, b: a * b.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)))
    bands = []
    for b in range(n_bands):
        val = F.lit(0)
        for j in range(band_bits):
            val = val + bits[b * band_bits + j] * F.lit(2**j)
        bands.append(F.struct(F.lit(b).alias("band"), val.alias("bucket")))
    return quantized.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("__bb")
    ).select(
        id_col,
        F.col("__bb.band").alias("band"),
        F.col("__bb.bucket").alias("bucket"),
    )


def lsh_bitext_candidates(
    src: DataFrame,
    tgt: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    band_bits: int = 4,
    seed: int = 42,
    quant_scale: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """ANN candidate pairs for ``mine_bitext_pairs(candidates=)``:
    distinct (src_id, tgt_id) sharing at least one LSH band bucket —
    the banded pigeonhole that replaces the all-pairs cross at corpus
    scale. Shuffle is (band, bucket)-partitioned on both sides, so the
    join is an equi-join whose volume is Σ_bucket |src_b|·|tgt_b|, not
    |src|·|tgt|; AQE handles hot buckets. Deterministic end to end
    (pinned planes + integer projections), so an oracle can replay the
    exact candidate set. Pass ``dim`` when known to skip the one-row
    probe job that otherwise derives it.

    Sizing at scale: with FIXED band width the reduction is a constant
    factor (per-bucket occupancy ~n/2^band_bits grows with the corpus,
    so the pair term is quadratic-with-a-small-constant). Grow
    ``band_bits`` (and ``n_planes`` = bands × band_bits) with corpus
    size so occupancy stays bounded — 16-20 bits per band at real
    corpus scale, the ``minhash_lsh_pairs`` banding discipline; recall
    per band falls as bits grow, so add bands to compensate (bands ≈
    1/p^bits for target match probability p — Charikar's cos-angle
    collision bound gives p per bit).

    Second sizing constraint (measured, scripts/bitext_band_sweep.py):
    the downstream margin score needs NEIGHBORHOODS, not just the true
    pair — its denominators average each side's top-k candidate
    cosines, so when banding is so selective that ids retrieve ≲k
    candidates the denominator degenerates to the pair's own cosine,
    margin → 1.0, and true pairs fail the >1 threshold even though
    they were retrieved (at 2 bands × 16 bits the planted-pair sweep
    measured candidate recall 0.52 but mined recall 0.10 for exactly
    this reason). Size bands so expected per-id candidate count stays
    comfortably above k — ``candidate_neighborhood_stats`` measures
    exactly this; 8×8 on the 0.975-cosine fixture gave 99.7% mined
    recall at 3.6% of all-pairs volume."""
    if dim is None:
        first = src.select(F.size(vec_col).alias("n")).limit(1).collect()
        dim = int(first[0]["n"]) if first else 0
    planes = rademacher_planes(n_planes, dim, seed)
    sb = lsh_band_buckets(
        src, id_col=id_col, vec_col=vec_col, planes=planes,
        band_bits=band_bits, quant_scale=quant_scale,
    ).withColumnRenamed(id_col, "src_id")
    tb = lsh_band_buckets(
        tgt, id_col=id_col, vec_col=vec_col, planes=planes,
        band_bits=band_bits, quant_scale=quant_scale,
    ).withColumnRenamed(id_col, "tgt_id")
    return sb.join(tb, ["band", "bucket"]).select("src_id", "tgt_id").distinct()


def mine_bitext_pairs(
    src: DataFrame,
    tgt: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    threshold: float = 1.0,
    mutual_best: bool = True,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Mined pairs: margin ≥ threshold, optionally mutual best
    (fwd_rank = bwd_rank = 1 — each side is the other's nearest). The
    production corpus-construction mode; relax ``mutual_best`` for the
    recall-oriented max-margin variant."""
    scored = bitext_margin_scores(
        src, tgt, id_col=id_col, vec_col=vec_col, k=k, candidates=candidates
    )
    out = scored.filter(F.col("margin") >= threshold)
    if mutual_best:
        out = out.filter((F.col("fwd_rank") == 1) & (F.col("bwd_rank") == 1))
    return out.select("src_id", "tgt_id", "cos", "margin")


def candidate_neighborhood_stats(
    candidates: DataFrame,
    *,
    k: int = 4,
    src: DataFrame | None = None,
    tgt: DataFrame | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """One-row banding health check for an ANN candidate set — run this
    BEFORE a full mining pass (the measure-don't-guess instrument for
    the second sizing constraint in ``lsh_bitext_candidates``): margin
    scoring degenerates for any id retrieving fewer than ``k``
    candidates (its top-k denominator collapses to the pair's own
    cosine, margin → 1.0, and true pairs fail the >1 threshold even
    when retrieved). Returns (n_pairs, n_src, n_tgt, avg_per_src,
    min_per_src, starved_src_ppm, starved_tgt_ppm) where starved_*_ppm
    is the integer parts-per-million of that side's ids with < ``k``
    candidates. Healthy banding: starved ppm near zero and avg_per_src
    comfortably above ``k``; fix by adding bands (recall, occupancy)
    before widening bits.

    Pass the CORPUS frames as ``src``/``tgt`` (id column ``id_col``)
    whenever they are at hand: ids that retrieved ZERO candidates —
    the worst banding failure this instrument exists to catch — do not
    appear in ``candidates`` at all, so without the corpus frames they
    are invisible and starvation is systematically UNDER-reported
    (ADVICE r7 #2: a banding so selective that half the corpus
    retrieves nothing would still read starved_ppm ≈ 0). With the
    frames, each side's id universe left-joins the per-id counts and
    zero-candidate ids count as starved (and drive ``min_per_src`` to
    0). Cost: two count-aggregations over the candidate pairs —
    (id, count) shuffles only — plus, per corpus frame passed, one
    distinct over its id column."""
    src_counts = candidates.groupBy("src_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    tgt_counts = candidates.groupBy("tgt_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    if src is not None:
        universe = src.select(F.col(id_col).alias("src_id")).distinct()
        src_counts = universe.join(src_counts, "src_id", "left").select(
            "src_id", F.coalesce(F.col("c"), F.lit(0)).alias("c")
        )
    if tgt is not None:
        universe = tgt.select(F.col(id_col).alias("tgt_id")).distinct()
        tgt_counts = universe.join(tgt_counts, "tgt_id", "left").select(
            "tgt_id", F.coalesce(F.col("c"), F.lit(0)).alias("c")
        )
    # coalesce everything: an EMPTY candidate set is the unhealthiest
    # banding there is and must read as fully starved (ppm 10^6, zero
    # counts), never as NULLs a health-check script would misread
    s = src_counts.agg(
        F.count(F.lit(1)).alias("n_src"),
        F.coalesce(F.sum("c"), F.lit(0)).alias("n_pairs"),
        F.coalesce(F.min("c"), F.lit(0)).alias("min_per_src"),
        F.coalesce(
            F.sum(F.when(F.col("c") < k, 1).otherwise(0)), F.lit(0)
        ).alias("starved"),
    )
    t = tgt_counts.agg(
        F.count(F.lit(1)).alias("n_tgt"),
        F.coalesce(
            F.sum(F.when(F.col("c") < k, 1).otherwise(0)), F.lit(0)
        ).alias("starved_t"),
    )
    ppm = 1_000_000
    return s.crossJoin(t).select(
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("n_src").cast("long").alias("n_src"),
        F.col("n_tgt").cast("long").alias("n_tgt"),
        F.round(
            F.col("n_pairs") / F.greatest(F.col("n_src"), F.lit(1)), 2
        ).alias("avg_per_src"),
        F.col("min_per_src").cast("long").alias("min_per_src"),
        F.when(F.col("n_src") > 0, F.expr(f"starved * {ppm} div n_src"))
        .otherwise(F.lit(ppm))
        .cast("long")
        .alias("starved_src_ppm"),
        F.when(F.col("n_tgt") > 0, F.expr(f"starved_t * {ppm} div n_tgt"))
        .otherwise(F.lit(ppm))
        .cast("long")
        .alias("starved_tgt_ppm"),
    )
