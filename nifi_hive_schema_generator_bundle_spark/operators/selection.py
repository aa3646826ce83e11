"""Quality-ranked corpus selection under a token budget.

"Give me the best N-billion tokens" is the curation step between scoring
and training: rank documents by a quality signal, keep the best until the
token budget is spent. A literal implementation is a global sort + running
sum — a total order over the corpus, which at 100 TB is the one thing to
avoid. This operator quantizes the score into fixed buckets instead:

1. one narrow scan scores every doc (quality ∈ [0,1], token count);
2. a ≤1001-row aggregate sums tokens per score bucket
   (``floor(quality·1000)``);
3. a window over that tiny bucket table (not the data) finds the lowest
   bucket whose cumulative token count still fits the budget;
4. one filtered scan keeps docs in full buckets above the threshold.

No global sort, no per-row window, no driver collect of data rows. The
budget is met to within one bucket's tokens (under-fill, never over-fill);
tighter granularity = more buckets, same plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import quality_score
from ..functions.textfns import whitespace_tokens

__all__ = ["token_budget_select", "per_group_cap", "dsir_importance_weights", "dsir_sample", "perplexity_buckets"]


def token_budget_select(
    df: DataFrame,
    budget: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1000,
) -> DataFrame:
    """Select highest-quality docs whose total whitespace-token count
    fits ``budget``, at score-bucket granularity (see module docstring).

    Returns (id, n_tokens, quality, bucket) for the kept docs. Docs in
    the partially-affordable boundary bucket are excluded — the result
    under-fills by at most that one bucket's tokens, keeping the plan
    free of any global sort.
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    scored = quality_score(df, text_col).select(
        F.col(id_col),
        F.size(whitespace_tokens(F.col(text_col))).alias("n_tokens"),
        F.col("quality"),
        F.floor(F.col("quality") * n_buckets).cast("long").alias("bucket"),
    )
    per_bucket = scored.groupBy("bucket").agg(
        F.sum("n_tokens").alias("__bucket_tokens")
    )
    # cumulative tokens from the best bucket down — a window over the
    # ≤(n_buckets+1)-row aggregate, NOT over the data
    w = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_bucket.withColumn("__cum", F.sum("__bucket_tokens").over(w))
    threshold = cum.filter(F.col("__cum") <= budget).agg(
        F.min("bucket").alias("__thr")
    )
    # empty kept set → __thr NULL → `bucket >= NULL` is NULL → all filtered
    return (
        scored.join(F.broadcast(threshold))
        .filter(F.col("bucket") >= F.col("__thr"))
        .drop("__thr")
    )


def per_group_cap(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    cap: int,
    *,
    rank_col: str = "group_rank",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, best-first — the per-domain
    document cap every web-corpus pipeline applies (Common-Crawl-style
    source balancing: no single site may contribute more than N pages,
    and the N kept are the best by the ordering, e.g. quality desc with
    an id tiebreak).

    ``order_cols`` are Column expressions (or names) defining
    best-first order within the group; make them total (append the id)
    for deterministic output. Returns the surviving rows plus
    ``rank_col`` (1-based rank within the group).

    Plan shape: one window (rank + filter) partitioned by the group
    key — a single shuffle on the group key with the filter applied
    stream-side during the sorted scan, no join, no second pass.
    Group skew = key skew: a whale domain sorts within one partition;
    AQE skew handling and the salting tools in
    ``functions/partitioning`` apply when a single domain outweighs an
    executor.
    """
    w = Window.partitionBy(group_col).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order_cols]
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= cap)
    )


def dsir_importance_weights(
    df: DataFrame,
    target: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by how much its hashed-bigram distribution looks like a
    target domain relative to the raw corpus. The published recipe —
    hash n-gram features into a fixed bucket count, fit bag-of-buckets
    unigram models over target and raw, weight = log p_target(doc) -
    log p_raw(doc) — selects raw documents that resemble the target
    (e.g. "give me the web pages that read like Wikipedia").

    ``target`` is a boolean Column over ``df``'s rows defining the
    in-corpus target slice; the raw (denominator) distribution is the
    whole input. Smoothing is add-``alpha`` over ``n_buckets`` buckets,
    so every bucket has non-zero mass under both models and the weight
    is always finite.

    Output: (id_col, n_bigrams, dsir_weight) — one row per input doc;
    dsir_weight = round(Σ_g [ln p_t(bucket(g)) - ln p_s(bucket(g))], 6)
    over the doc's bigrams g, NULL (n_bigrams = 0) for docs with < 2
    tokens. Feed it to ``functions/sampling.hash_fraction``-style keep
    rules or ``token_budget_select`` for the actual resampling step.

    Bucketing is the portable md5 recipe shared with the sampling
    module (first 8 md5 hex chars of "prev cur" mod ``n_buckets``), so
    any engine that agrees on md5 reproduces the weights bit-for-bit —
    Spark's hash()/xxhash64 are engine-private.

    Scale shape: the bigram explode feeds a (doc, bucket) partial-count
    aggregation (map-side combine collapses Zipf-head buckets to one
    row per doc); both model tables are a ≤ ``n_buckets``-row aggregate
    of that frame, broadcast back with their 1-row totals for the
    per-doc weighted sum. Document bodies never shuffle; nothing about
    the plan changes at 100 TB except the (doc, bucket) shuffle volume,
    which is bounded by docs × min(bigrams, n_buckets) longs.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (zero breaks smoothing)")
    toks = df.select(
        F.col(id_col),
        target.cast("boolean").alias("__t"),
        whitespace_tokens(F.lower(F.col(text_col))).alias("__toks"),
    )
    n = F.size("__toks")
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("__toks"), i),
                F.element_at(F.col("__toks"), i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("g")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    doc_b = (
        toks.select(F.col(id_col), "__t", F.explode(grams).alias("g"))
        .select(id_col, "__t", bucket.alias("b"))
        .groupBy(id_col, "__t", "b")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    model = doc_b.groupBy("b").agg(
        F.sum("k").alias("cs"),
        F.sum(F.when(F.col("__t"), F.col("k")).otherwise(0)).alias("ct"),
    )
    totals = model.agg(
        F.sum("cs").alias("ns"), F.sum("ct").alias("nt")
    )
    smooth = F.lit(float(alpha) * n_buckets)
    llr = F.log(
        (F.col("ct") + F.lit(float(alpha)))
        / (F.col("nt").cast("double") + smooth)
    ) - F.log(
        (F.col("cs") + F.lit(float(alpha)))
        / (F.col("ns").cast("double") + smooth)
    )
    scored = (
        doc_b.join(F.broadcast(model.join(F.broadcast(totals))), "b")
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.round(F.sum(F.col("k") * llr), 6).alias("dsir_weight"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias(
                "n_bigrams"
            ),
            F.col("dsir_weight"),
        )
    )


def dsir_sample(
    df: DataFrame,
    target: Column,
    n_keep: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    alpha: float = 1.0,
    hist_buckets: int = 1000,
) -> DataFrame:
    """The DSIR selection step: resample ~``n_keep`` raw documents with
    probability ∝ their importance weight, via the Gumbel-top-k trick
    the paper uses — score = log-weight + Gumbel noise, keep the k
    best. Composes ``dsir_importance_weights`` with a deterministic
    Gumbel draw (``-ln(-ln(u))``, u = the portable md5 fraction of the
    doc id — reproducible across runs, engines, and partitionings; no
    RNG state anywhere).

    The top-k itself reuses the ``token_budget_select`` discipline: no
    global sort. Scores quantize into ``hist_buckets`` equi-width bins
    between the observed (min, max) — a two-row broadcast — a
    cumulative window walks the ≤(hist_buckets+1)-row bin table from
    the top, and one filtered scan keeps the full bins that fit. Like
    ``token_budget_select`` this under-fills by at most the boundary
    bin (and keeps nothing if the single top bin already exceeds
    ``n_keep``); tighter ``hist_buckets`` = finer fill, same plan.

    Docs with NULL weights (< 2 tokens) never qualify. Output: (id,
    n_bigrams, dsir_weight, gumbel_score, score_bucket) for kept docs.
    """
    if n_keep < 0:
        raise ValueError("n_keep must be >= 0")
    if hist_buckets < 1:
        raise ValueError("hist_buckets must be >= 1")
    from ..functions.sampling import hash_fraction

    w = dsir_importance_weights(
        df,
        target,
        text_col=text_col,
        id_col=id_col,
        n_buckets=n_buckets,
        alpha=alpha,
    ).filter(F.col("dsir_weight").isNotNull())
    u = hash_fraction(F.col(id_col))
    scored = w.withColumn(
        "gumbel_score",
        F.round(F.col("dsir_weight") + -F.log(-F.log(u)), 6),
    )
    bounds = scored.agg(
        F.min("gumbel_score").alias("__lo"), F.max("gumbel_score").alias("__hi")
    )
    span = F.col("__hi") - F.col("__lo")
    bucket = F.when(span > 0, F.floor(
        (F.col("gumbel_score") - F.col("__lo")) / span * hist_buckets
    ).cast("long")).otherwise(F.lit(0))
    binned = scored.join(F.broadcast(bounds)).withColumn(
        "score_bucket", bucket
    )
    per_bin = binned.groupBy("score_bucket").agg(
        F.count(F.lit(1)).alias("__bin_n")
    )
    win = Window.orderBy(F.col("score_bucket").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_bin.withColumn("__cum", F.sum("__bin_n").over(win))
    thr = cum.filter(F.col("__cum") <= n_keep).agg(
        F.min("score_bucket").alias("__thr")
    )
    return (
        binned.join(F.broadcast(thr))
        .filter(F.col("score_bucket") >= F.col("__thr"))
        .select(
            id_col, "n_bigrams", "dsir_weight", "gumbel_score", "score_bucket"
        )
    )


def perplexity_buckets(
    df: DataFrame,
    score_col: str,
    *,
    group_col: str = "lang",
    id_col: str = "doc_id",
    labels: tuple = ("head", "middle", "tail"),
    higher_is_better: bool = True,
    bucket_col: str = "bucket",
) -> DataFrame:
    """CCNet-style quality banding: within each group (language, in the
    paper), rank documents by LM score and split into equal-count
    ``labels`` bands — head/middle/tail — so downstream sampling can
    take all of head, some of middle, and drop tail per language
    without a global quality threshold that low-resource languages
    would fail wholesale.

    ``higher_is_better=True`` fits mean-logprob scores (this engine's
    ``unigram_logprob_score``); pass False for raw perplexity. Ties
    break on ``id_col`` so the banding is deterministic and
    oracle-replayable. Returns ``df`` plus ``bucket_col``.

    Scale shape: one window (ntile) per group — a single shuffle on
    ``group_col``; band sizes per group differ by at most one row by
    ntile's contract. Skewed groups (one language dominating the
    corpus) are the same skew the scoring aggregate already handled.
    """
    if len(labels) < 2:
        raise ValueError("need at least 2 bucket labels")
    ordered = (
        F.col(score_col).desc() if higher_is_better else F.col(score_col).asc()
    )
    w = Window.partitionBy(group_col).orderBy(ordered, F.col(id_col))
    lab = F.array(*[F.lit(x) for x in labels])
    return df.withColumn(
        bucket_col, F.element_at(lab, F.ntile(len(labels)).over(w))
    )
