"""Linear text-classifier scoring — the fastText/CCNet-style quality
gate every production pretraining pipeline runs between the cheap
heuristics (``operators/text.quality_score``) and expensive model-based
filtering.

The model is a bag-of-words linear classifier: per-token weights, mean
pooling, sigmoid.  Training happens offline (fastText, scikit-learn, a
logistic regression on labeled docs); this operator is the *serving*
path — score 100 TB of documents with a broadcast weight table and one
scan, no Python.

Two physical strategies, same semantics:

* ``how="map"`` (default) — the weight table becomes a literal
  ``MAP<STRING, DECIMAL>`` folded over the token array with
  ``F.aggregate``.  Fully narrow: zero shuffle, zero joins, one
  whole-stage-codegen projection per row.  Right for vocabularies up to
  a few thousand entries (codegen'd literal maps; beyond that the
  generated method blows past JIT limits).
* ``how="join"`` — explode tokens, broadcast-hash-join the weight
  DataFrame, re-aggregate per document.  One shuffle on the document
  id, weight table broadcast once per executor.  Right for real
  vocabularies (fastText ships 2M buckets): the map literal can't hold
  them, the broadcast can.

Weights are accumulated in DECIMAL (exact, order-independent) so the
score is bit-stable across partitionings — the same discipline as
``functions/timeseries.time_decay_sum``; only the final sigmoid runs in
double.

Reference scope: the NiFi bundle has no classifier surface
(`HiveSchemaGenerator.scala` routes on JSON validity only); this is part
of the LLM-data-pipeline extension mandated by SURVEY §2.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.partitioning import ensure_min_partitions
from ..functions.textfns import whitespace_tokens

__all__ = ["linear_text_score"]

_WDEC = "decimal(10,4)"
_ACC = "decimal(28,4)"


def _quantize(w: float) -> Decimal:
    """Model weights quantized to 4 decimals — exact in DECIMAL, exact
    in the DuckDB oracle, and far finer than linear-classifier weights
    are meaningful."""
    return Decimal(str(round(float(w), 4)))


def linear_text_score(
    df: DataFrame,
    weights: dict[str, float],
    *,
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "quality_prob",
    how: str = "map",
) -> DataFrame:
    """Score every document with a linear bag-of-words classifier.

    ``score = sigmoid(bias + mean_token_weight)`` where tokens are the
    whitespace tokens of the lowercased text, a token absent from
    ``weights`` contributes 0, and a document with no tokens scores
    ``sigmoid(bias)``.  Output: the input columns plus ``n_tokens``,
    ``weight_sum`` (exact decimal) and ``score_col`` (double, rounded
    to 6 decimals — the cross-engine float-comparison grain).
    """
    if how not in ("map", "join"):
        raise ValueError(f"how must be 'map' or 'join', got {how!r}")
    df = ensure_min_partitions(df)
    # materialize the token array BEFORE any higher-order function uses
    # it: an inlined split() inside a lambda re-evaluates per element
    # (the O(len^2) trap measured at 41x on cdc_chunks — SCALE.md)
    toks = df.withColumn("__toks", whitespace_tokens(F.lower(F.col(text_col))))
    n_tok = F.size(F.col("__toks"))

    if how == "map":
        pairs: list = []
        for token, w in sorted(weights.items()):
            pairs.append(F.lit(token))
            pairs.append(F.lit(_quantize(w)).cast(_WDEC))
        wmap = F.create_map(*pairs)
        zero = F.lit(Decimal(0)).cast(_ACC)
        wsum = F.aggregate(
            F.col("__toks"),
            zero,
            # re-cast each step: decimal addition widens the type and
            # F.aggregate requires merge(acc) to keep the zero's type
            lambda acc, t: (
                acc
                + F.coalesce(F.element_at(wmap, t), F.lit(Decimal(0)).cast(_WDEC))
            ).cast(_ACC),
        )
        scored = toks.withColumn("__wsum", wsum)
    else:
        wdf = F.broadcast(
            toks.sparkSession.createDataFrame(
                [(t, _quantize(w)) for t, w in sorted(weights.items())],
                f"__token string, __w {_WDEC}",
            )
        )
        # hits-only aggregation: misses contribute 0 by construction,
        # so the inner join keeps the shuffle to matched tokens
        hits = (
            toks.select(F.col(id_col), F.explode(F.col("__toks")).alias("__token"))
            .join(wdf, "__token")
            .groupBy(id_col)
            .agg(F.sum("__w").cast(_ACC).alias("__wsum"))
        )
        scored = toks.join(hits, id_col, "left").withColumn(
            "__wsum", F.coalesce(F.col("__wsum"), F.lit(Decimal(0)).cast(_ACC))
        )

    mean = F.when(n_tok > 0, F.col("__wsum").cast("double") / n_tok).otherwise(
        F.lit(0.0)
    )
    logit = F.lit(float(bias)) + mean
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
    return scored.select(
        *df.columns,
        n_tok.alias("n_tokens"),
        F.col("__wsum").alias("weight_sum"),
        prob.alias(score_col),
    )
