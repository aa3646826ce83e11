"""Text-analysis operators for training-data pipelines.

All metrics are single-pass, shuffle-free column expressions (narrow
transformations) — at 100 TB each of these is exactly one scan with
whole-stage codegen, no Python. Language ID is the only operator with a
small broadcast (the stopword profiles, a few KB literal map).

Operators:
* ``token_stats``       — whitespace + BPE-ish token counts, char counts
* ``quality_score``     — length / punctuation / stopword / repetition
  heuristics → [0,1] score (C4/Gopher-style cheap filters)
* ``language_id``       — stopword-profile n-gram-free heuristic argmax
* ``fingerprint``       — md5 of whitespace-normalized lowercase text
  (exact-dup key) + a 64-bit rolling-style hash
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.partitioning import ensure_min_partitions
from ..functions.textfns import bpe_ish_tokens, normalize_ws, whitespace_tokens

__all__ = [
    "token_stats",
    "quality_score",
    "language_id",
    "fingerprint",
    "STOPWORD_PROFILES",
    "tfidf_top_terms",
    "hashed_tf_vectors",
    "ngram_repetition",
    "unigram_logprob_score",
    "bigram_logprob_score",
    "collocations",
    "bm25_scores",
    "ngram_novelty",
    "split_sentences",
    "sentence_dedup",
    "readability_stats",
    "blocklist_filter",
    "tokenizer_fertility",
    "SENTENCE_RE",
    "license_detect",
    "LICENSE_PHRASES",
    "gopher_quality_flags",
    "GOPHER_THRESHOLDS",
    "gopher_repetition_flags",
    "GOPHER_REPETITION_THRESHOLDS",
    "c4_line_filter",
    "build_text_index",
    "text_index_search",
    "corpus_top_ngrams",
]

# Tiny per-language stopword profiles for the heuristic language scorer.
# Real pipelines plug in fastText/CLD3 via mapInPandas; the heuristic is the
# dependency-free deterministic default.
STOPWORD_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "para", "con", "que"],
}

_PUNCT_RE = r"[^\w\s]"


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token/char counts. One narrow projection."""
    df = ensure_min_partitions(df)
    t = F.col(text_col)
    return df.select(
        "*",
        F.length(t).alias("char_count"),
        F.size(whitespace_tokens(t)).alias("ws_token_count"),
        F.size(bpe_ish_tokens(t)).alias("bpe_token_count"),
    )


def _stopword_hits(tokens: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda tok: F.array_contains(arr, tok)))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Cheap quality heuristics → component columns + combined score.

    Components (each in [0,1], higher = better):
    * ``len_score``   — saturating length ratio (≥200 chars → 1.0)
    * ``punct_score`` — 1 − punctuation-character ratio
    * ``stop_score``  — saturating English-stopword token ratio (≥ 10% → 1)
    * ``rep_score``   — distinct-token / token ratio (repetition penalty)
    """
    df = ensure_min_partitions(df)
    t = F.col(text_col)
    toks = whitespace_tokens(F.lower(t))
    n_tok = F.size(toks)
    n_chars = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[\w\s]", ""))
    stop_hits = _stopword_hits(toks, STOPWORD_PROFILES["en"])
    len_score = F.least(F.lit(1.0), n_chars / F.lit(200.0))
    punct_score = F.when(n_chars > 0, 1.0 - punct / n_chars).otherwise(F.lit(0.0))
    stop_score = F.when(
        n_tok > 0, F.least(F.lit(1.0), (stop_hits / n_tok) / F.lit(0.10))
    ).otherwise(F.lit(0.0))
    rep_score = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)) / n_tok
    ).otherwise(F.lit(0.0))
    return df.select(
        "*",
        F.round(len_score, 6).alias("len_score"),
        F.round(punct_score, 6).alias("punct_score"),
        F.round(stop_score, 6).alias("stop_score"),
        F.round(rep_score, 6).alias("rep_score"),
        F.round(
            (len_score + punct_score + stop_score + rep_score) / 4.0, 6
        ).alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Predict language as argmax of per-language stopword hit counts.

    Ties break lexicographically ('und' ties → first language code in
    sorted order); zero hits everywhere → 'und' (undetermined). The
    profile arrays are expression literals — effectively a broadcast of a
    few KB, no shuffle, no UDF.
    """
    df = ensure_min_partitions(df)
    toks = whitespace_tokens(F.lower(F.col(text_col)))
    scores = [
        _stopword_hits(toks, STOPWORD_PROFILES[lang]).alias(f"hits_{lang}")
        for lang in sorted(STOPWORD_PROFILES)
    ]
    scored = df.select("*", *scores)
    langs = sorted(STOPWORD_PROFILES)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return scored.withColumn("pred_lang", pred)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints:

    * ``fp_md5``  — md5 hex of lowercase whitespace-normalized text; the
      canonical exact-dup key (oracle-replicable in any SQL engine)
    * ``fp_hash64`` — xxhash64 of the same normalization; cheap 8-byte
      join/cluster key at scale
    """
    df = ensure_min_partitions(df)
    norm = normalize_ws(F.lower(F.col(text_col)))
    return df.select(
        "*",
        F.md5(norm).alias("fp_md5"),
        F.xxhash64(norm).alias("fp_hash64"),
    )


def ngram_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Gopher/MassiveText-style repetition signals: for each n in ``ns``,
    the occurrence count of the document's most frequent word n-gram and
    the fraction of all its n-grams that most-frequent one accounts for.
    High fractions flag boilerplate/looped text that per-token
    distinct-ratio checks (``quality_score.rep_score``) miss.

    Plan shape: n-grams are POSITIONAL (not distinct — frequency is the
    signal), counted per (doc, gram) with map-side partial aggregation,
    then folded to one row per doc. Shuffle keys are (id, narrow string)
    — document bodies never shuffle, and both aggregations partial-fold,
    so the shape holds at corpus scale."""
    df = ensure_min_partitions(df)  # interpreted n-gram HOF must not serialize on one split
    # materialize the token array as a real column: an expression
    # referenced inside a HOF lambda re-evaluates per element, so the
    # inlined tokenizer would re-split the document at every gram
    # position (the O(n²) trap measured in cdc_chunk_documents)
    tokd = df.select(
        F.col(id_col),
        whitespace_tokens(F.lower(F.col(text_col))).alias("__toks"),
    )
    toks = F.col("__toks")
    out = df.select(id_col).distinct()
    for n in ns:
        grams = tokd.select(
            F.col(id_col),
            F.explode(
                F.when(F.size(toks) < n, F.array()).otherwise(
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - n + 1),
                        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
                    )
                )
            ).alias("gram"),
        )
        per_doc = (
            grams.groupBy(id_col, "gram")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy(id_col)
            .agg(
                F.sum("cnt").alias(f"n_{n}grams"),
                F.max("cnt").alias(f"top_{n}gram_n"),
            )
            .select(
                id_col,
                f"n_{n}grams",
                f"top_{n}gram_n",
                F.round(
                    F.col(f"top_{n}gram_n") / F.col(f"n_{n}grams"), 6
                ).alias(f"top_{n}gram_frac"),
            )
        )
        # left join: docs shorter than n tokens have no n-grams -> NULLs
        out = out.join(per_doc, id_col, "left")
    return out


def hashed_tf_vectors(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    dim: int = 64,
    normalize: bool = True,
) -> DataFrame:
    """Feature-hashed (hashing-trick) term-frequency vectors: each token
    lands in bucket ``md5(token) mod dim``; the vector is the bucket
    count profile, optionally L2-normalized — a model-free text
    embedding that feeds the ANN / clustering / semantic-dedup
    operators directly when no learned encoder is available, and the
    standard fixed-width featurization for linear classifiers at scale
    (no vocabulary table to build, ship, or look up).

    md5-bucketed (not Spark ``hash``) so the mapping is engine-portable
    — a DuckDB oracle replays every bucket exactly; determinism does
    not depend on partitioning. Empty/token-free docs yield the zero
    vector (normalize leaves it zero rather than dividing by 0).

    Scale shape: explode → (doc, bucket) count partial agg → one
    ``map_from_entries`` densify per doc — the shuffle carries (id,
    int, count) triples capped at ``dim`` per doc, never text. The
    dense array materializes once per document row.
    """
    if dim < 1:
        raise ValueError("dim must be >= 1")
    d = ensure_min_partitions(df)
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10)
        .cast("long") % dim
    ).cast("int")
    counts = (
        d.select(
            F.col(id_col).alias("doc_id"),
            F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("tok"),
        )
        .select("doc_id", bucket.alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("b", "c"))).alias("m"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("m"), i.cast("int")), F.lit(0)
        ).cast("double"),
    )
    vecs = d.select(F.col(id_col).alias("doc_id")).join(
        counts, "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce(
            dense, F.array_repeat(F.lit(0.0), dim)
        ).alias("tf_vec"),
    )
    if not normalize:
        return vecs
    norm = F.sqrt(
        F.aggregate("tf_vec", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    unit = F.when(
        norm > 0.0, F.transform("tf_vec", lambda x: F.round(x / norm, 6))
    ).otherwise(F.col("tf_vec"))
    return vecs.select("doc_id", unit.alias("tf_vec"))


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    tf = term count within the doc; idf = ln(N / df_t) over the corpus
    (natural log, no smoothing — SQL-replicable). Plan: explode tokens →
    (doc, term) counts (map-side partials) → term doc-frequencies (second
    small agg) → broadcast-join idf back → window top-k. The only
    corpus-wide state is the (term, df) table, which is vocabulary-sized,
    not corpus-sized. Ties break lexicographically for determinism.
    """
    from pyspark.sql import Window

    d = ensure_min_partitions(df)
    toks = d.select(
        F.col(id_col).alias("doc_id"),
        F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # corpus size rides the plan as a 1-row broadcast cross join — no
    # eager collect(), the operator stays lazy and single-pipeline
    n_docs = d.select(F.countDistinct(id_col).alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df_t"))
    # the (term, df_t) join deliberately carries NO broadcast hint: the
    # vocabulary is corpus-dependent (10^8 rows at 100 TB — a forced
    # broadcast OOMs), so AQE picks broadcast-vs-shuffle from the real
    # size at runtime; only the 1-row n_docs is always broadcast
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df_t"))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", F.round("tfidf", 6).alias("tfidf"), "rnk")
    )


def unigram_logprob_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc mean unigram log-probability under the corpus' own
    unigram distribution — the cheap distributional stand-in for
    LM-perplexity quality filtering (docs full of corpus-rare tokens
    score low; natural prose scores high). Real pipelines swap in a
    trained LM via mapInPandas; this is the dependency-free default
    with identical plumbing.

    Output: (id, n_tokens, lm_score) where lm_score =
    round(avg(ln(count(tok)/total_tokens)), 6).

    Scale shape: explode → (doc, token) partial-count agg, so the
    vocabulary join sees each document's DISTINCT tokens (Zipf-head
    tokens like 'the' collapse from one row per occurrence to one row
    per document — the deskewed form; measured ~2× over the
    per-occurrence join at 10× sf0.1). The per-doc mean is the
    count-weighted sum Σ k·ln p / Σ k — identical to the
    per-occurrence average. The frequency join deliberately carries NO
    broadcast hint (same lesson as TF-IDF: vocabulary size is
    corpus-dependent); AQE picks the strategy. The 1-row grand total
    rides the plan as a broadcast scalar.
    """
    df = ensure_min_partitions(df)
    toks = df.select(
        F.col(id_col), F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("tok")
    )
    doc_tok = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("k"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("s"))
    logp = F.log(F.col("c").cast("double") / F.col("s").cast("double"))
    return (
        doc_tok.join(freq, "tok")
        .join(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("n_tokens"),
            F.round(
                F.sum(F.col("k") * logp) / F.sum("k"), 6
            ).alias("lm_score"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 score of every document against a bag of query terms —
    the lexical-retrieval ranking primitive (the exact-scoring
    counterpart to the ANN family's vector search).

    idf(t) = ln(1 + (N - df_t + 0.5)/(df_t + 0.5)); the doc score sums
    idf(t)·tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl)) over matched terms.
    Only docs matching ≥ 1 term appear.

    Scale shape: the token explode is pre-filtered to the query terms
    (a literal array — the filter reaches the generator, so the shuffle
    carries only query-term hits, not the corpus vocabulary), then
    (doc, term) partial-count aggs; doc length comes from a narrow
    projection joined by id. N/avgdl and the |q|-row df table are 1-row/
    tiny broadcasts. No global sort, bodies never shuffle.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = F.array(*[F.lit(t.lower()) for t in query_terms])
    toks = whitespace_tokens(F.lower(F.col(text_col)))
    lengths = ensure_min_partitions(df).select(
        F.col(id_col), F.size(toks).alias("dl")
    )
    stats = lengths.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    hits = ensure_min_partitions(df).select(
        F.col(id_col),
        F.explode(F.filter(toks, lambda t: F.array_contains(terms, t))).alias("term"),
    )
    tf = hits.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(lengths, id_col)
        .join(F.broadcast(stats))
        .select(
            F.col(id_col),
            (idf * F.col("tf") * F.lit(k1 + 1.0) / denom).alias("part"),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("part"), 6).alias("bm25"))
    )


def collocations(
    df: DataFrame,
    *,
    min_count: int = 5,
    top_k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information — the
    corpus-analysis report for multiword expressions ("new york",
    "machine learning"): token pairs that co-occur far above chance.

    Tokens are ``whitespace_tokens(lower(text))`` (the module's shared
    convention); PMI treats the corpus bigram list as the event space:
    ``pmi = ln(c2 · B / (c1_prev · c1_cur))`` with ``B`` the total
    bigram count and the marginals summed from the bigram table itself
    (so the distribution is self-consistent and Σp = 1). Pairs with
    ``c2 < min_count`` are dropped BEFORE ranking — raw PMI is maximal
    for hapax pairs, so unfiltered output is noise by construction.

    Returns exactly ``top_k`` rows (fewer if the corpus is small):
    (prev, cur, c2, pmi, rnk), ranked by (pmi desc, prev, cur) on the
    6dp-rounded PMI — the rounding is part of the contract so ranks are
    reproducible across engines and layouts.

    Scale shape: per-doc (prev, cur) partial counts collapse Zipf-head
    bigrams map-side; marginals re-aggregate the bigram table (never
    the corpus); the 1-row total rides as a broadcast scalar; the
    top-k is TakeOrdered (no global sort shuffle), and the final rank
    window runs over ≤ top_k rows."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    df = ensure_min_partitions(df)
    toks = df.select(
        whitespace_tokens(F.lower(F.col(text_col))).alias("__toks")
    )
    n = F.size("__toks")
    pair_structs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(F.col("__toks"), i).alias("prev"),
                F.element_at(F.col("__toks"), i + 1).alias("cur"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    big = (
        toks.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    prev_m = big.groupBy("prev").agg(F.sum("c2").alias("c1p"))
    cur_m = big.groupBy("cur").agg(F.sum("c2").alias("c1c"))
    total = big.agg(F.sum("c2").cast("double").alias("b"))
    pmi = F.round(
        F.log(
            F.col("c2").cast("double")
            * F.col("b")
            / (F.col("c1p").cast("double") * F.col("c1c").cast("double"))
        ),
        6,
    )
    top = (
        big.filter(F.col("c2") >= min_count)
        .join(prev_m, "prev")
        .join(cur_m, "cur")
        .join(F.broadcast(total))
        .select("prev", "cur", "c2", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "prev", "cur")
        .limit(top_k)
    )
    w = Window.orderBy(F.col("pmi").desc(), "prev", "cur")
    return top.withColumn("rnk", F.row_number().over(w))


def bigram_logprob_score(
    df: DataFrame,
    *,
    lam: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc mean INTERPOLATED bigram log-probability under the
    corpus' own n-gram statistics — the next step up from
    ``unigram_logprob_score`` toward real LM-perplexity filtering:
    word-salad documents whose tokens are individually common but never
    co-occur (the spam pattern unigram scoring is blind to) score low.

    p(cur | prev) = lam · c2(prev,cur)/c1(prev) + (1-lam) · c(cur)/T
    where c2 is the corpus bigram count, c1(prev) = Σ_cur c2(prev,cur)
    (the bigram-prev marginal, so the conditional sums to exactly 1),
    c(cur) the corpus unigram count, T total tokens. Every observed
    bigram has c2 ≥ 1, so the MLE term is never 0 and lam = 1.0
    degenerates to pure bigram MLE; the unigram backoff keeps scores
    finite under future/held-out vocabularies.

    Output: (id_col, n_bigrams, lm2_score = round(mean ln p, 6)), one
    row per input document; documents with < 2 tokens report
    n_bigrams = 0 and NULL score.

    Scale shape (same deskew discipline as the unigram scorer): the
    explode feeds a (doc, prev, cur) partial-count aggregation, so
    Zipf-head bigrams collapse to one row per document before any join;
    the corpus bigram table, its prev-marginal, and the unigram table
    derive from that same aggregate or a token count — all joins are
    AQE-decided (no hints; vocabulary sizes are corpus-dependent), the
    1-row total rides as a broadcast scalar. The per-doc mean is the
    count-weighted sum Σ k·ln p / Σ k. Document bodies never shuffle.
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    df = ensure_min_partitions(df)
    toks = df.select(
        F.col(id_col),
        whitespace_tokens(F.lower(F.col(text_col))).alias("__toks"),
    )
    n = F.size("__toks")
    pair_structs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(F.col("__toks"), i).alias("prev"),
                F.element_at(F.col("__toks"), i + 1).alias("cur"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    pairs = toks.select(
        F.col(id_col), F.explode(pair_structs).alias("p")
    ).select(id_col, F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
    doc_pair = pairs.groupBy(id_col, "prev", "cur").agg(
        F.count(F.lit(1)).alias("k")
    )
    big = doc_pair.groupBy("prev", "cur").agg(F.sum("k").alias("c2"))
    prev_marg = big.groupBy("prev").agg(F.sum("c2").alias("c1"))
    unig = toks.select(F.explode("__toks").alias("cur")).groupBy("cur").agg(
        F.count(F.lit(1)).alias("cu")
    )
    total = unig.agg(F.sum("cu").alias("t"))
    p = F.lit(lam) * F.col("c2").cast("double") / F.col("c1").cast(
        "double"
    ) + F.lit(1.0 - lam) * F.col("cu").cast("double") / F.col("t").cast(
        "double"
    )
    scored = (
        doc_pair.join(big, ["prev", "cur"])
        .join(prev_marg, "prev")
        .join(unig, "cur")
        .join(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.round(F.sum(F.col("k") * F.log(p)) / F.sum("k"), 6).alias(
                "lm2_score"
            ),
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
            F.col("lm2_score"),
        )
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty vs the rest of the corpus: the
    fraction of a document's DISTINCT word n-grams whose first corpus
    occurrence (minimum ``id_col``) is this document.  Low novelty =
    the document is mostly restatements of earlier content — the
    incremental-information filter that sits between exact dedup
    (identical docs) and span dedup (identical passages): it catches
    documents assembled from already-seen pieces that no whole-doc or
    single-span test flags.

    Plan shape: grams are hashed to 16-byte md5 BEFORE leaving the row
    (gram text never shuffles), then two narrow-key partial
    aggregations — (gram → min id) and (min id → count) — plus a
    per-doc distinct-gram count.  No gram-keyed join: a gram is novel
    for exactly the doc that is its minimum id, so the novel counts
    come straight off the first-occurrence table.  Output: (id,
    n_distinct_grams, n_novel_grams, novelty) for every input doc;
    docs with fewer than ``n`` tokens have 0 grams and NULL novelty.
    """
    df = ensure_min_partitions(df)
    tokd = df.select(
        F.col(id_col),
        whitespace_tokens(F.lower(F.col(text_col))).alias("__toks"),
    )
    toks = F.col("__toks")
    grams = tokd.select(
        F.col(id_col),
        F.explode(
            F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - n + 1),
                        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
                    )
                )
            )
        ).alias("__gram"),
    )
    per_doc = grams.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_distinct_grams")
    )
    novel = (
        grams.groupBy("__gram")
        .agg(F.min(id_col).alias("__first"))
        .groupBy(F.col("__first").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_novel_grams"))
    )
    cnt = F.coalesce(F.col("n_distinct_grams"), F.lit(0)).cast("long")
    nov = F.coalesce(F.col("n_novel_grams"), F.lit(0)).cast("long")
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .join(novel, id_col, "left")
        .select(
            F.col(id_col),
            cnt.alias("n_distinct_grams"),
            nov.alias("n_novel_grams"),
            F.when(
                cnt > 0, F.round(nov.cast("double") / cnt, 6)
            ).alias("novelty"),
        )
    )


# Sentence contract: maximal runs of non-terminator characters plus their
# trailing terminator run. Lookaround-free on purpose — it is the one
# sentence-boundary shape Java regex and RE2 express identically, so the
# DuckDB oracle replays segmentation verbatim. (Abbreviation-aware
# splitting needs a model; this is the deterministic pipeline default.)
SENTENCE_RE = r"[^.!?]+[.!?]*"


def split_sentences(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Segment documents into (id, sent_no, sentence) rows — the
    sentence-granularity sibling of paragraph_dedup's split and
    doc_token_positions' posexplode. sent_no is 0-based and contiguous
    over NON-empty trimmed segments, so downstream sentence-level dedup
    or FIM-style pair construction can rely on dense ordering.

    Scale: the match array is materialized as a real column before the
    generator runs (the documented HOF-inlining trap: per-position
    lambdas over an inline regex re-run it quadratically), so cost is
    one regex pass + row growth exactly equal to the output."""
    sents = F.filter(
        F.transform(
            F.regexp_extract_all(F.col(text_col), F.lit(SENTENCE_RE), 0),
            # explicit 1-arg lambda: passing F.trim directly would match
            # transform's 2-arg form (its optional `trim` charset param
            # absorbs the element INDEX and trims digit characters)
            lambda x: F.trim(x),
        ),
        lambda x: x != "",
    )
    return (
        df.select(id_col, sents.alias("__sents"))
        .select(id_col, F.posexplode("__sents").alias("sent_no", "sentence"))
    )


def sentence_dedup(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide sentence-level exact dedup — ``split_sentences``
    composed with the paragraph_dedup winner-election discipline at the
    finer C4 granularity: a sentence survives only at its smallest
    (id, sent_no) occurrence corpus-wide (case-insensitive md5
    fingerprint); survivors reassemble in order joined by single
    spaces. Every input document keeps its row — fully-duplicate
    documents return empty text — so corpus row counts are stable.
    Returns (id_col, text_col, n_sents, n_kept).

    Scale shape: the winner election shuffles (16-byte md5, id,
    sent_no) ONLY — sentence bodies stay out of it and rejoin by
    (id, sent_no) LEFT SEMI; reassembly is the bounded per-document
    collect_list envelope shared with paragraph_dedup."""
    from pyspark.sql import Window

    sents = split_sentences(df, id_col=id_col, text_col=text_col)
    slim = sents.select(
        F.md5(F.lower("sentence")).alias("__fp"), id_col, "sent_no"
    )
    w = Window.partitionBy("__fp").orderBy(id_col, "sent_no")
    winners = (
        slim.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(id_col, "sent_no")
    )
    kept = sents.join(winners, [id_col, "sent_no"], "left_semi")
    re = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sent_no", "sentence"))),
                lambda x: x["sentence"],
            ),
            " ",
        ).alias(text_col),
        F.count("*").alias("n_kept"),
    )
    tot = sents.groupBy(id_col).agg(F.count("*").alias("n_sents"))
    return tot.join(re, id_col, "left").select(
        id_col,
        F.coalesce(text_col, F.lit("")).alias(text_col),
        "n_sents",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
    )


def readability_stats(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Surface-level readability profile per document: sentence count,
    mean sentence length in whitespace tokens, and type-token ratio
    (distinct / total lowercased tokens) — the cheap complexity signals
    (Flesch-style pipelines start here) that complement quality_score's
    boilerplate heuristics. Returns (id, n_sents, mean_sent_tokens,
    ttr); documents with no sentences get n_sents=0 and null means.

    Determinism: token counts are integers summed exactly; the mean and
    ratio are one float division + round(6) each, so a SQL oracle
    replays them bit-for-bit. Plan: the sentence explode (row growth =
    sentence count) feeds one per-doc partial agg; TTR is a narrow
    projection on the original row — one join on the id at the end."""
    sents = split_sentences(df, id_col=id_col, text_col=text_col)
    per_sent = sents.select(
        id_col, F.size(whitespace_tokens("sentence")).alias("__tok")
    )
    agg = per_sent.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_sents"),
        F.sum("__tok").alias("__tot"),
    )
    toks = whitespace_tokens(F.lower(F.col(text_col)))
    ttr = df.select(
        id_col,
        F.size(toks).alias("__n"),
        F.size(F.array_distinct(toks)).alias("__d"),
    )
    return (
        ttr.join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_sents", F.lit(0).cast("long")).alias("n_sents"),
            F.when(
                F.col("n_sents") > 0,
                F.round(F.col("__tot").cast("double") / F.col("n_sents"), 6),
            ).alias("mean_sent_tokens"),
            F.when(
                F.col("__n") > 0,
                F.round(F.col("__d").cast("double") / F.col("__n"), 6),
            ).alias("ttr"),
        )
    )


def blocklist_filter(
    df: DataFrame,
    blocklist: list[str],
    *,
    text_col: str = "text",
    action: str = "flag",
    flag_col: str = "blocked",
    hits_col: str = "n_blocked_terms",
) -> DataFrame:
    """Token blocklist filtering — the C4 "bad words" stage: a document
    is blocked when any lowercased whitespace token matches the
    blocklist exactly. ``action='flag'`` annotates every row with a
    boolean + the count of DISTINCT blocklisted terms present;
    ``action='drop'`` returns survivors only.

    Token-exact matching on purpose (the documented C4 behavior, and
    the Scunthorpe-safe default); substring policies belong to
    ``textfns.redact``-style regex passes. The blocklist rides the plan
    as an array literal (KBs — the standard lists are hundreds of
    terms); matching is one narrow codegen'd array_intersect per row,
    no shuffle, no join."""
    if action not in ("flag", "drop"):
        raise ValueError("action must be 'flag' or 'drop'")
    if not blocklist:
        raise ValueError("blocklist must be non-empty")
    terms = F.array(*[F.lit(w.lower()) for w in sorted(set(blocklist))])
    hits = F.size(
        F.array_intersect(
            F.array_distinct(whitespace_tokens(F.lower(F.col(text_col)))),
            terms,
        )
    )
    flagged = df.withColumn(hits_col, hits).withColumn(
        flag_col, F.col(hits_col) > 0
    )
    if action == "drop":
        return flagged.filter(~F.col(flag_col)).drop(flag_col, hits_col)
    return flagged


def tokenizer_fertility(
    df: DataFrame,
    merges: list,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
) -> DataFrame:
    """Tokenizer fertility per group (per language, canonically): BPE
    tokens emitted per whitespace word — the tokenizer-quality number
    multilingual teams track, because a language with fertility 3 burns
    3× the sequence length per word and so gets a third of the
    effective context (and 3× the training cost per word) of a
    fertility-1 language under the same tokenizer.

    Output per group: (group, n_docs, n_words, n_bpe_tokens, fertility)
    with fertility = total BPE tokens / total whitespace words, rounded
    to 6dp (NULL for a group with zero words).

    Scale shape: the BPE count is ``bpe_token_stats``'s single Arrow
    stage over a pruned (id, text) projection; the word count is a
    narrow JVM expression; they meet in one doc-count-sized 3-column
    join and collapse to a |groups|-row aggregate — bodies cross the
    wire only into the Arrow stage, never through a shuffle.
    """
    from ..functions.bpe import bpe_token_stats
    from ..functions.textfns import whitespace_tokens

    bpe = bpe_token_stats(
        df.select(id_col, text_col), merges, text_col=text_col, id_col=id_col
    ).select(id_col, "n_bpe_tokens")
    words = df.select(
        F.col(id_col),
        F.col(group_col),
        F.size(whitespace_tokens(text_col)).alias("__n_words"),
    )
    tot_words = F.sum("__n_words").cast("long")
    tot_bpe = F.sum(F.coalesce(F.col("n_bpe_tokens"), F.lit(0))).cast("long")
    return (
        words.join(bpe, id_col, "left")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            tot_words.alias("n_words"),
            tot_bpe.alias("n_bpe_tokens"),
            F.round(
                F.when(
                    tot_words > 0, tot_bpe.cast("double") / tot_words
                ),
                6,
            ).alias("fertility"),
        )
    )


# Characteristic phrases, most-specific first: the NC/SA Creative-Commons
# restrictions must win over the plain CC-BY substring they contain, and
# the LGPL phrase contains "general public license" so it precedes GPL.
# Detection is case-insensitive substring containment — deliberately not
# regex, so every engine (and the DuckDB oracle) matches identically.
LICENSE_PHRASES: list[tuple[str, str, bool]] = [
    ("mit", "permission is hereby granted, free of charge", True),
    ("apache-2.0", "licensed under the apache license", True),
    ("bsd", "redistribution and use in source and binary forms", True),
    ("lgpl", "gnu lesser general public license", False),
    ("gpl", "gnu general public license", False),
    ("cc-by-nc", "creativecommons.org/licenses/by-nc", False),
    ("cc-by-sa", "creativecommons.org/licenses/by-sa", False),
    ("cc-by", "creativecommons.org/licenses/by", True),
    ("cc0", "creativecommons.org/publicdomain/zero", True),
]


def license_detect(df: DataFrame, text_col: str = "text") -> DataFrame:
    """License classification from in-document boilerplate — the
    filter The Stack / RedPajama-code run before code or scraped text
    enters a training mix: detect the license family a document
    declares, tag whether it's permissive, keep (or route) on that
    flag. Phrase table in ``LICENSE_PHRASES``; no match → ('unknown',
    false) — the conservative default a license-gated pipeline wants.

    Appends (license, permissive) to every input row. One lowercase
    projection + a short ``contains`` decision chain — all JVM
    whole-stage-codegen, zero shuffle, zero UDF; first matching phrase
    in table order wins (most-specific first, see table comment).
    """
    low = F.lower(F.col(text_col))
    lic = F.lit("unknown")
    perm = F.lit(False)
    for name, phrase, permissive in reversed(LICENSE_PHRASES):
        hit = low.contains(phrase)
        lic = F.when(hit, F.lit(name)).otherwise(lic)
        perm = F.when(hit, F.lit(permissive)).otherwise(perm)
    return df.withColumn("license", lic).withColumn("permissive", perm)


# The published Gopher thresholds (Rae et al. 2021, appendix A1.1) —
# module-level so tests and callers share one source of truth.
GOPHER_THRESHOLDS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_ratio": 0.1,
    "max_bullet_ratio": 0.9,
    "max_ellipsis_ratio": 0.3,
    "min_alpha_ratio": 0.8,
    "min_stop_words": 2,
}

_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The Gopher quality-filter rules (Rae et al. 2021 — the composite
    heuristic most later corpora, MassiveText/RefinedWeb/Dolma, started
    from): per document, the published component metrics and the single
    ``passes_gopher`` conjunction a pipeline filters on. Appended
    columns: word_count, mean_word_len, symbol_ratio (#/… per word),
    bullet_ratio + ellipsis_ratio (of lines), alpha_ratio (words with
    an ASCII letter — documented heuristic; swap per-language),
    n_stop (of the 8 published stop words), passes_gopher.

    One narrow projection: token and line arrays are materialized ONCE
    before any per-element lambda (the O(len²) HOF-inlining trap,
    SCALE.md), every metric is a JVM array fold — zero shuffle, zero
    UDF, whole-stage codegen. Thresholds in ``GOPHER_THRESHOLDS``.
    """
    t = GOPHER_THRESHOLDS
    low = F.lower(F.col(text_col))
    with_arrays = df.withColumn(
        "__toks", F.split(F.trim(low), r"\s+")
    ).withColumn("__lines", F.split(low, "\n"))
    toks, lines = F.col("__toks"), F.col("__lines")
    wc = F.size(toks)
    mean_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    ) / wc
    n_hash = (F.length(low) - F.length(F.replace(low, F.lit("#")))).cast(
        "long"
    )
    n_ell = (
        (F.length(low) - F.length(F.replace(low, F.lit("...")))) / 3
    ).cast("long")
    symbol_ratio = (n_hash + n_ell) / wc
    bullet = F.size(
        F.filter(
            lines,
            lambda l: F.ltrim(l).startswith("- ")
            | F.ltrim(l).startswith("* ")
            | F.ltrim(l).startswith("•"),
        )
    )
    ell_lines = F.size(
        F.filter(
            lines,
            lambda l: F.rtrim(l).endswith("...")
            | F.rtrim(l).endswith("…"),
        )
    )
    n_lines = F.size(lines)
    alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(_GOPHER_STOPWORDS)))
    m = {
        "word_count": wc.cast("long"),
        "mean_word_len": F.round(mean_len, 6),
        "symbol_ratio": F.round(symbol_ratio, 6),
        "bullet_ratio": F.round(bullet / n_lines, 6),
        "ellipsis_ratio": F.round(ell_lines / n_lines, 6),
        "alpha_ratio": F.round(alpha / wc, 6),
        "n_stop": n_stop.cast("long"),
    }
    passes = (
        (m["word_count"] >= t["min_words"])
        & (m["word_count"] <= t["max_words"])
        & (m["mean_word_len"] >= t["min_mean_word_len"])
        & (m["mean_word_len"] <= t["max_mean_word_len"])
        & (m["symbol_ratio"] <= t["max_symbol_ratio"])
        & (m["bullet_ratio"] <= t["max_bullet_ratio"])
        & (m["ellipsis_ratio"] <= t["max_ellipsis_ratio"])
        & (m["alpha_ratio"] >= t["min_alpha_ratio"])
        & (m["n_stop"] >= t["min_stop_words"])
    )
    out = with_arrays
    for name, col in m.items():
        out = out.withColumn(name, col)
    return out.withColumn("passes_gopher", passes).drop("__toks", "__lines")


def c4_line_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The C4 cleaning stage (Raffel et al. 2020 §2.2) — line-level
    retention plus page-level discard flags, the other canonical
    filter next to ``gopher_quality_flags`` (which only FLAGS): keep
    lines that end in terminal punctuation (. ! ? ") AND have >= 5
    words AND don't mention javascript; then flag the page — keep iff
    the retained text still has >= 3 sentences, no "lorem ipsum", and
    no '{'. (C4's fourth rule, 3-sentence-span dedup, is corpus-wide
    and lives in the dedup family: ``remove_duplicate_spans`` /
    ``sentence_dedup``.)

    Rewrites ``text_col`` to the retained lines (originals joined with
    a newline) and appends (n_lines, n_kept_lines, n_sentences,
    keep_page). One narrow projection — the line array is materialized
    once; the per-line word split is per-LINE work (linear, not the
    per-position O(len²) HOF trap); zero shuffle, zero UDF. Sentences
    are counted as terminal-punctuation occurrences in the retained
    text — the standard cheap proxy.
    """
    low_line = lambda l: F.lower(l)  # noqa: E731
    with_lines = df.withColumn("__lines", F.split(F.col(text_col), "\n"))
    lines = F.col("__lines")
    kept = F.filter(
        lines,
        lambda l: (
            F.rtrim(l).endswith(".")
            | F.rtrim(l).endswith("!")
            | F.rtrim(l).endswith("?")
            | F.rtrim(l).endswith('"')
        )
        & (F.size(F.split(F.trim(l), r"\s+")) >= 5)
        & ~low_line(l).contains("javascript"),
    )
    text_kept = F.concat_ws("\n", kept)
    n_sent = F.length(text_kept) - F.length(
        F.replace(
            F.replace(
                F.replace(text_kept, F.lit(".")), F.lit("!")
            ),
            F.lit("?"),
        )
    )
    keep = (
        (n_sent >= 3)
        & ~F.lower(text_kept).contains("lorem ipsum")
        & ~text_kept.contains("{")
    )
    return (
        with_lines.withColumn("n_lines", F.size(lines).cast("long"))
        .withColumn("n_kept_lines", F.size(kept).cast("long"))
        .withColumn(text_col, text_kept)
        .withColumn("n_sentences", n_sent.cast("long"))
        .withColumn("keep_page", keep)
        .drop("__lines")
    )


# Rae et al. 2021 Table A1 — the repetition half of the Gopher filters
# (the n-gram half lives in ``ngram_repetition``).
GOPHER_REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
}


def gopher_repetition_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The line/paragraph repetition rules of the Gopher quality filter
    (Rae et al. 2021 Table A1) — the half ``ngram_repetition`` doesn't
    cover: per document, the fraction of duplicated lines and
    paragraphs, and the fraction of characters inside those duplicates
    (occurrences after the first of each repeated unit; characters are
    counted over trimmed units, separators excluded). Output columns
    per granularity g in (line, para): ``n_{g}s``, ``dup_{g}_frac``,
    ``dup_{g}_char_frac`` — plus ``passes_repetition``, the published
    conjunction (``GOPHER_REPETITION_THRESHOLDS``); documents with no
    non-empty units pass vacuously (NULL metrics coalesced to 0).

    Scale shape: units are md5-hashed BEFORE the (doc, unit) count
    aggregate, so the shuffle carries (id, 16-byte hash, length)
    triples — document bodies never move. Both aggregates partial-fold
    map-side; lines and paragraphs each cost one such pass. Lines split
    on ``\\n``, paragraphs on ``\\n{2,}``; units are trimmed and empty
    units dropped at both granularities.
    """
    d = ensure_min_partitions(df)
    out = d.select(id_col).distinct()
    for name, sep in (("line", "\n"), ("para", "\n{2,}")):
        units = d.select(
            F.col(id_col),
            F.explode(
                F.filter(
                    F.transform(
                        F.split(F.col(text_col), sep), lambda s: F.trim(s)
                    ),
                    lambda s: s != "",
                )
            ).alias("__u"),
        ).select(
            id_col,
            F.md5(F.col("__u")).alias("__h"),
            F.length(F.col("__u")).alias("__len"),
        )
        stats = (
            units.groupBy(id_col, "__h")
            .agg(F.count(F.lit(1)).alias("cnt"), F.max("__len").alias("len"))
            .groupBy(id_col)
            .agg(
                F.sum("cnt").alias(f"n_{name}s"),
                F.sum(F.col("cnt") - 1).alias("__dup"),
                F.sum(F.col("cnt") * F.col("len")).alias("__tot_chars"),
                F.sum((F.col("cnt") - 1) * F.col("len")).alias("__dup_chars"),
            )
            .select(
                id_col,
                F.col(f"n_{name}s"),
                F.round(F.col("__dup") / F.col(f"n_{name}s"), 6).alias(
                    f"dup_{name}_frac"
                ),
                F.round(F.col("__dup_chars") / F.col("__tot_chars"), 6).alias(
                    f"dup_{name}_char_frac"
                ),
            )
        )
        out = out.join(stats, id_col, "left")
    t = GOPHER_REPETITION_THRESHOLDS
    passes = (
        (F.coalesce(F.col("dup_line_frac"), F.lit(0.0)) <= t["dup_line_frac"])
        & (F.coalesce(F.col("dup_para_frac"), F.lit(0.0)) <= t["dup_para_frac"])
        & (
            F.coalesce(F.col("dup_line_char_frac"), F.lit(0.0))
            <= t["dup_line_char_frac"]
        )
        & (
            F.coalesce(F.col("dup_para_char_frac"), F.lit(0.0))
            <= t["dup_para_char_frac"]
        )
    )
    return out.withColumn("passes_repetition", passes)


def build_text_index(
    df: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 32,
) -> None:
    """Materialize a BM25 inverted index on disk — the lexical
    counterpart to ``similarity.build_ivf_index``: ``{path}/postings``
    parquet PARTITIONED BY ``bucket`` (= first-8-hex-of-md5(term) mod
    ``buckets``) with one row per (term, doc) hit carrying (tf, dl,
    df_t), plus ``{path}/stats`` (one row: n_docs, avgdl, buckets).
    ``df_t`` and ``dl`` are DENORMALIZED onto every posting row so a
    search is join-free — it pays a bounded duplication at build time
    to never re-shuffle at query time. Build once, search many.

    Build shape: one explode → (doc, term) partial-count agg → a
    term-keyed df_t join (vocabulary-sized, AQE decides the strategy —
    NOT forced broadcast) → a doc-keyed dl join; the posting rows that
    shuffle are (term, id, counts), never bodies. Deterministic given
    (corpus, buckets): rebuilding yields the identical index."""
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    staged = ensure_min_partitions(df).select(
        F.col(id_col).alias("doc_id"),
        whitespace_tokens(F.lower(F.col(text_col))).alias("__toks"),
    )
    lengths = staged.select("doc_id", F.size("__toks").alias("dl"))
    stats = lengths.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.lit(buckets).alias("buckets"),
    )
    tf = (
        staged.select("doc_id", F.explode("__toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10)
        .cast("long") % buckets
    ).cast("int")
    postings = (
        tf.join(dfreq, "term")
        .join(lengths, "doc_id")
        .select("term", "doc_id", "tf", "df_t", "dl", bucket.alias("bucket"))
    )
    postings.write.partitionBy("bucket").mode("overwrite").parquet(
        f"{path}/postings"
    )
    stats.write.mode("overwrite").parquet(f"{path}/stats")


def _term_bucket(term: str, buckets: int) -> int:
    """Driver-side twin of the build's bucket expression (same md5)."""
    import hashlib

    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % buckets


def text_index_search(
    spark,
    path: str,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    k: int | None = None,
) -> DataFrame:
    """Search a ``build_text_index`` index: BM25 scores for every doc
    matching ≥ 1 query term — identical formula (and results) to the
    full-corpus ``bm25_scores``, but reading ONLY the partitions whose
    bucket holds a query term: the term buckets are computed
    driver-side and pushed as a STATIC ``bucket IN (…)`` partition
    filter, so at 100 TB a query reads ~|q|/buckets of the index
    instead of scanning the corpus. Join-free: df_t/dl ride each
    posting row; n_docs/avgdl come from the 1-row stats read. With
    ``k`` set, returns only the top-k docs (rank by score desc, id
    asc); otherwise every matching doc."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    st = spark.read.parquet(f"{path}/stats").collect()[0]
    n_docs, avgdl, buckets = st["n_docs"], st["avgdl"], st["buckets"]
    terms = sorted({t.lower() for t in query_terms})
    bks = sorted({_term_bucket(t, buckets) for t in terms})
    p = spark.read.parquet(f"{path}/postings").filter(
        F.col("bucket").isin(bks) & F.col("term").isin(terms)
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    scored = (
        p.select(
            "doc_id",
            (idf * F.col("tf") * F.lit(k1 + 1.0) / denom).alias("part"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), 6).alias("bm25"))
    )
    if k is None:
        return scored
    from pyspark.sql import Window

    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def corpus_top_ngrams(
    df: DataFrame,
    text_col: str = "text",
    *,
    n: int = 3,
    k: int = 20,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-wide most-frequent word n-grams — the boilerplate-mining
    report that tells a pipeline WHAT to put in its blocklists and
    span-removal rules (navigation chrome, cookie banners, license
    footers surface immediately). Per surviving gram: total occurrence
    count and the number of distinct documents containing it; grams in
    fewer than ``min_docs`` documents are dropped (a high-count
    single-doc loop is a repetition problem, not boilerplate). Ties
    break lexicographically for determinism.

    Scale shape: positional n-grams explode once (token array
    materialized first — the HOF-inlining trap), then a (doc, gram)
    partial-fold count followed by a gram-keyed (sum, doc-count)
    aggregate; the top-k is a per-partition TakeOrdered + driver merge
    of k rows, never a global sort. The gram-keyed shuffles carry
    short n-word strings and counts — bodies never move."""
    if n < 1 or k < 1:
        raise ValueError("n and k must be >= 1")
    d = ensure_min_partitions(df)
    tokd = d.select(
        F.monotonically_increasing_id().alias("__rid"),
        whitespace_tokens(F.lower(F.col(text_col))).alias("__toks"),
    )
    toks = F.col("__toks")
    grams = tokd.select(
        "__rid",
        F.explode(
            F.when(F.size(toks) < n, F.array()).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - n + 1),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
                )
            )
        ).alias("gram"),
    )
    per_doc = grams.groupBy("__rid", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    agg = (
        per_doc.groupBy("gram")
        .agg(
            F.sum("cnt").alias("n_occurrences"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )
    return agg.orderBy(
        F.col("n_occurrences").desc(), F.col("gram").asc()
    ).limit(k)
