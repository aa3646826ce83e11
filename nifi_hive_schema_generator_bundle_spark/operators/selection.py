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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import quality_score
from ..functions.textfns import whitespace_tokens

__all__ = ["token_budget_select", "per_group_cap"]


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
