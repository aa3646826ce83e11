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

__all__ = ["linear_text_score", "fit_linear_classifier"]

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


def fit_linear_classifier(
    df: DataFrame,
    label_col: str,
    *,
    text_col: str = "text",
    vocab: list[str] | None = None,
    vocab_size: int = 2000,
    lr: float = 1.0,
    iters: int = 20,
    l2: float = 0.0,
) -> dict:
    """Train the bag-of-words logistic classifier ``linear_text_score``
    serves — in-engine, so the labeled-docs → quality-gate loop never
    leaves Spark (the CCNet/fastText recipe: fit on "good corpus vs
    crawl" labels, then score everything).

    Model: ``p = sigmoid(bias + mean_token_weight)`` — exactly the
    serving equation. Training is full-batch gradient descent on
    logistic loss: per iteration one narrow scan computes every doc's
    margin from the current weights (literal-map fold, zero shuffle),
    and one token-keyed aggregation reduces the per-doc errors to a
    ``|vocab|+1``-row gradient (map-side combine; the +1 is the bias,
    riding the same shuffle as a sentinel token). Nothing larger than
    the vocabulary ever reaches the driver.

    Determinism: weights are quantized to 6 decimals after every
    update, and gradient contributions accumulate in DECIMAL — the fit
    is bit-identical across partitionings and cluster sizes (same
    discipline as the serving path's weight_sum). ``vocab`` defaults to
    the ``vocab_size`` most-document-frequent tokens (ties broken by
    token), collected once — driver-bounded like the IVF quantizer
    sample. The literal-map strategy caps practical vocabularies at a
    few thousand entries (codegen limit, documented on the serving
    path); pass a larger model to ``linear_text_score(how="join")``
    only for serving.

    Returns ``{"weights": {token: w}, "bias": b, "n_docs": N,
    "log_loss": final mean loss}`` — feed ``weights``/``bias`` straight
    to ``linear_text_score``.

    Labels: ``label_col`` is boolean-castable; rows with NULL labels
    are excluded from the fit.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if lr <= 0:
        raise ValueError("lr must be > 0")
    if l2 < 0:
        raise ValueError("l2 must be >= 0")
    if vocab is not None and len(vocab) == 0:
        raise ValueError("vocab must be non-empty when given")

    _BIAS = "\x00bias"  # NUL-prefixed: can't collide with a whitespace token
    _GDEC = "decimal(30,12)"

    # fan single-split inputs out BEFORE caching: every iteration scans
    # the cached frame, so a 1-partition cache serializes the whole fit
    # (measured 28 s -> ~4 s warm at sf0.1, 6 iterations)
    base = (
        ensure_min_partitions(df.filter(F.col(label_col).isNotNull()))
        .select(
            F.col(label_col).cast("boolean").cast("int").cast("double").alias("__y"),
            whitespace_tokens(F.lower(F.col(text_col))).alias("__toks"),
        )
        .withColumn("__n", F.size("__toks"))
        .cache()
    )
    try:
        n_docs = base.count()
        if n_docs == 0:
            raise ValueError("no labeled rows to fit on")
        if vocab is None:
            vocab = [
                r["t"]
                for r in (
                    base.select(
                        F.explode(F.array_distinct("__toks")).alias("t")
                    )
                    .groupBy("t")
                    .agg(F.count(F.lit(1)).alias("c"))
                    .orderBy(F.col("c").desc(), F.col("t"))
                    .limit(vocab_size)
                    .collect()
                )
            ]
            if not vocab:
                raise ValueError("corpus has no tokens to build a vocabulary")

        weights = {t: 0.0 for t in vocab}
        bias = 0.0

        def _margin_and_err():
            pairs: list = []
            for t in sorted(weights):
                pairs.append(F.lit(t))
                pairs.append(F.lit(weights[t]))
            wmap = F.create_map(*pairs)
            fold = F.aggregate(
                F.col("__toks"),
                F.lit(0.0),
                lambda acc, t: acc + F.coalesce(wmap[t], F.lit(0.0)),
            )
            margin = F.lit(bias) + F.when(
                F.col("__n") > 0, fold / F.col("__n")
            ).otherwise(F.lit(0.0))
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
            return wmap, p, p - F.col("__y")

        for _ in range(iters):
            wmap, _p, err = _margin_and_err()
            # one row per in-vocab token occurrence (x = 1/n, mean
            # pooling) plus a per-doc bias sentinel (x = 1); DECIMAL
            # contributions make the token-keyed sum order-independent
            contrib = F.concat(
                F.filter(
                    F.transform(
                        F.col("__toks"),
                        lambda t: F.struct(
                            t.alias("t"),
                            F.when(F.col("__n") > 0, err / F.col("__n"))
                            .otherwise(F.lit(0.0))
                            .alias("g"),
                        ),
                    ),
                    lambda s: wmap[s["t"]].isNotNull(),
                ),
                F.array(
                    F.struct(F.lit(_BIAS).alias("t"), err.alias("g"))
                ),
            )
            grad_rows = (
                base.select(F.explode(contrib).alias("c"))
                .groupBy(F.col("c.t").alias("t"))
                .agg(F.sum(F.col("c.g").cast(_GDEC)).alias("g"))
                .collect()
            )
            grads = {r["t"]: float(r["g"]) for r in grad_rows}
            decay = 1.0 - lr * l2
            for t in weights:
                weights[t] = round(
                    weights[t] * decay - lr * grads.get(t, 0.0) / n_docs, 6
                )
            bias = round(bias - lr * grads.get(_BIAS, 0.0) / n_docs, 6)

        _wmap, p, _err = _margin_and_err()
        eps = F.lit(1e-12)
        loss_row = base.agg(
            F.avg(
                -(
                    F.col("__y") * F.log(p + eps)
                    + (F.lit(1.0) - F.col("__y")) * F.log(F.lit(1.0) - p + eps)
                )
            ).alias("loss")
        ).collect()[0]
        return {
            "weights": weights,
            "bias": bias,
            "n_docs": n_docs,
            "log_loss": float(loss_row["loss"]),
        }
    finally:
        base.unpersist()
