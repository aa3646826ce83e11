"""Sequence packing — concat-and-chunk documents into fixed token-budget
training sequences.

LLM training consumes fixed-length token sequences; the standard prep
step concatenates documents (in a deterministic order) and slices the
stream every ``token_budget`` tokens, letting documents straddle sequence
boundaries. This operator computes, per document, WHERE in that stream it
lands: which sequence it starts in, at what offset, and how many
sequences it spans — the metadata a downstream tokenizer/writer needs to
materialize shards without ever re-scanning the corpus order.

Scale design: one global concatenation order would be a single window
over the whole corpus — one partition, dead at 100 TB. Instead documents
are hashed into ``n_buckets`` independent streams (deterministic md5
prefix, the same content-hash recipe as ``functions/sampling`` — layout-
and engine-independent), and each bucket packs its own sequence stream
``(bucket, seq_no)``. The window is partitioned by bucket, so the sort
parallelizes across buckets; raise ``n_buckets`` (≤ 256 here, more hex
digits if ever needed) so each bucket's token stream fits a partition.
Everything is JVM window arithmetic — no UDF, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.partitioning import ensure_min_partitions
from ..functions.textfns import whitespace_tokens

__all__ = [
    "hex_bucket",
    "pack_sequences",
    "chunk_documents",
    "cdc_chunk_documents",
    "span_corruption",
    "fim_transform",
]


def hex_bucket(key: Column | str, n_buckets: int = 16) -> Column:
    """0..n_buckets-1 from the first two md5 nibbles of the key's string
    form (content hash: stable across partitioning, cluster size, and
    engines — the duckdb oracle replays it via strpos arithmetic)."""
    if not 1 <= n_buckets <= 256:
        raise ValueError("n_buckets must be in [1, 256]")
    key = F.col(key) if isinstance(key, str) else key
    byte = F.conv(F.substring(F.md5(key.cast("string")), 1, 2), 16, 10)
    return (byte.cast("int") % n_buckets).alias("bucket")


def pack_sequences(
    df: DataFrame,
    *,
    token_budget: int = 2048,
    n_buckets: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document packing coordinates in the bucketed concat stream.

    Returns (id_col, bucket, n_tokens, seq_no, seq_offset, n_seqs):

    * ``bucket``     — which independent stream the doc concatenates into
    * ``n_tokens``   — whitespace token count (the packing currency)
    * ``seq_no``     — index of the fixed-size sequence the doc starts in
    * ``seq_offset`` — token position within that sequence
    * ``n_seqs``     — how many sequences the doc touches (0 for empty
      docs, ≥ 2 when it straddles a budget boundary)

    Docs are ordered by id within a bucket, so the layout is reproducible
    run-to-run and engine-to-engine given stable ids.
    """
    if token_budget < 1:
        raise ValueError("token_budget must be positive")
    # tokenization is an interpreted HOF below the first exchange —
    # single-split inputs must fan out or it serializes on one core
    df = ensure_min_partitions(df)
    toks = df.select(
        F.col(id_col),
        hex_bucket(F.col(id_col), n_buckets),
        F.size(whitespace_tokens(F.col(text_col))).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(F.col("n_tokens").cast("long")).over(w), F.lit(0))
    # integer DIV, not floor(x/y): float division drifts on 100 TB-scale
    # cumulative offsets (> 2^53 is unreachable, but DIV is exact and
    # matches the duckdb oracle's // by construction)
    with_off = toks.withColumn("cum_offset", offset).withColumn(
        "end_tok", F.col("cum_offset") + F.col("n_tokens") - 1
    )
    return with_off.select(
        id_col,
        "bucket",
        "n_tokens",
        F.expr(f"cum_offset DIV {token_budget}").alias("seq_no"),
        F.expr(f"cum_offset % {token_budget}").alias("seq_offset"),
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(f"end_tok DIV {token_budget}")
            - F.expr(f"cum_offset DIV {token_budget}")
            + 1
        )
        .alias("n_seqs"),
    )


def chunk_documents(
    df: DataFrame,
    *,
    chunk_tokens: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token windows, one row per chunk
    — the retrieval/embedding prep step (RAG chunking), as a pure narrow
    transform.

    Returns (id_col, chunk_idx, n_chunk_tokens, chunk_text). Chunk i
    covers tokens ``[i*step, i*step + chunk_tokens)`` with
    ``step = chunk_tokens - overlap``; the last chunk may be short; docs
    shorter than one chunk yield exactly one chunk; empty docs yield
    none. All slicing is array arithmetic inside codegen'd expressions —
    no shuffle, no UDF; the explode multiplies rows by ~n/step, which is
    the required output size, not overhead.
    """
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    df = ensure_min_partitions(df)  # fully narrow op: fan out single splits
    step = chunk_tokens - overlap
    toks = whitespace_tokens(F.col(text_col))
    n = F.size(toks)
    # 0 tokens -> 0 chunks; n <= chunk -> 1; else ceil((n-chunk)/step)+1
    n_chunks = (
        F.when(n <= chunk_tokens, F.lit(1)).otherwise(
            F.floor((n - chunk_tokens + step - 1) / step).cast("int") + 1
        )
    )
    # guard the empty case OUTSIDE sequence(): sequence(0, -1) would
    # produce a DESCENDING [0, -1] range, not an empty one
    chunks = F.when(n == 0, F.array().cast("array<array<string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.slice(toks, i * step + 1, chunk_tokens),
        )
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_toks")
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        F.size("chunk_toks").alias("n_chunk_tokens"),
        F.concat_ws(" ", "chunk_toks").alias("chunk_text"),
    )


def cdc_chunk_documents(
    df: DataFrame,
    *,
    window: int = 4,
    modulus: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking: split each document at positions where
    the rolling window hash of the last ``window`` tokens lands in
    bucket 0 of ``modulus`` — so chunk boundaries follow CONTENT, not
    offsets. Insert a paragraph at the top of a document and
    fixed-window chunks all shift (every chunk hash changes); CDC chunks
    downstream of the edit keep their exact spans, so chunk-hash dedup
    still matches them — the shift-resistant dedup unit (the LBFS/
    rsync-style boundary trick applied to token streams).

    Returns (id, chunk_idx, n_chunk_tokens, chunk_text, chunk_md5).
    Expected chunk length ≈ ``modulus`` tokens (geometric); docs shorter
    than ``window`` tokens yield one whole-doc chunk; empty docs yield
    none. The boundary hash is md5-based so any engine agreeing on md5
    replays identical chunks (the DuckDB oracle does).

    Plan shape: pure narrow array transforms (boundary positions,
    spans) + one explode whose row growth IS the output — no shuffle,
    no UDF, whole-stage codegen except the interpreted HOFs.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if modulus < 2:
        raise ValueError("modulus must be >= 2")
    # Materialize the token array as a REAL column first: expressions
    # referenced inside higher-order-function lambdas are re-evaluated
    # per element, so inlining the tokenizer would re-split the whole
    # document at every boundary position — O(n²) per doc (measured
    # 16.6 s vs 2 s at sf0.1). A column reference evaluates once per row.
    # Fan the (id, text) projection to session parallelism first (guide
    # §2.5 input parallelism): the boundary-hash chain is compute-bound
    # and inherits the scan's split count — a single-split document
    # table ran the whole md5 rolling window on one core (measured
    # 2.9 s vs 0.9 s fanned at sf0.1). No-op when the scan is already
    # well-split (the at-scale case); downstream is one output explode,
    # so the forced width has no exchange pipeline to fight (the
    # θ-join counter-case).
    from ..functions.partitioning import ensure_min_partitions

    tokd = ensure_min_partitions(
        df.select(F.col(id_col), F.col(text_col))
    ).select(
        F.col(id_col), whitespace_tokens(F.col(text_col)).alias("__toks")
    ).where(F.size("__toks") > 0)
    toks = F.col("__toks")
    n = F.size(toks)

    def bucket(i):  # md5 of the window ending at token i, as a bucket id
        gram = F.concat_ws(" ", F.slice(toks, i - window + 1, window))
        return (
            F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
            % modulus
        )

    # boundary after token i (window-aligned, never inside the first
    # window). Docs shorter than the window have no candidate positions —
    # guard BEFORE sequence(): sequence(window, n) with n < window would
    # descend into invalid slice starts.
    boundaries = F.when(
        n <= window, F.array().cast("array<int>")
    ).otherwise(
        F.filter(
            F.sequence(F.lit(window), n),
            lambda i: (bucket(i) == 0) & (i < n),  # trailing boundary is moot
        )
    )
    starts = F.concat(F.array(F.lit(1)), F.transform(boundaries, lambda b: b + 1))
    ends = F.concat(boundaries, F.array(n))
    spans = F.arrays_zip(starts.alias("s"), ends.alias("e"))
    bodies = F.transform(
        spans,
        lambda sp: F.concat_ws(
            " ", F.slice(toks, sp["s"], sp["e"] - sp["s"] + F.lit(1))
        ),
    )
    chunks = tokd.select(
        F.col(id_col),
        F.posexplode(bodies).alias("chunk_idx", "chunk_text"),
    )
    return chunks.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.size(F.split(F.col("chunk_text"), " ")).alias("n_chunk_tokens"),
        F.col("chunk_text"),
        F.md5(F.col("chunk_text")).alias("chunk_md5"),
    )


def span_corruption(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    block: int = 20,
    span: int = 3,
    seed: int = 42,
) -> DataFrame:
    """T5-style span-corruption pair generation (Raffel et al. 2020
    §3.1.4) — the (corrupted input, sentinel target) transform a
    denoising-objective pipeline applies corpus-wide — made
    deterministic and parallel by a block grid instead of sequential
    RNG span sampling: tokens partition into fixed blocks of ``block``
    tokens, and every FULL block masks exactly one contiguous
    ``span``-token run whose offset is md5-derived from (seed, id,
    block index). Corruption density is exactly ``span/block`` (the
    T5 default 3/20 = 15%) with mean span length ``span``, no RNG
    state, no order dependence — the same doc yields the same pair on
    any partitioning or engine. The trailing partial block stays
    unmasked.

    Output: id, ``n_spans`` (full blocks), ``input_text`` (masked
    spans replaced by ``<extra_id_K>``, K = block index), and
    ``target_text`` (each sentinel followed by the tokens it hides —
    the T5 target layout). Docs shorter than one block pass through
    with an empty target.

    Plan shape: one narrow codegen'd projection per document — the
    token array materializes ONCE (the O(len²) HOF-inlining trap), the
    per-block lambdas slice it, and flatten/concat assemble the pair.
    Zero shuffle, zero UDF, no explode: row count and keys never
    change."""
    if span >= block:
        raise ValueError("span must be < block")
    if block < 1 or span < 1:
        raise ValueError("block and span must be >= 1")
    width = block - span + 1
    d = ensure_min_partitions(df)
    staged = d.select(
        "*", whitespace_tokens(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
    nb = F.floor(F.size(toks) / block).cast("int")
    idx = F.sequence(F.lit(0), nb - 1)

    def off(j: Column) -> Column:
        h = F.md5(
            F.concat_ws(
                ":",
                F.lit(str(seed)),
                F.col(id_col).cast("string"),
                j.cast("string"),
            )
        )
        return (
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width
        ).cast("int")

    def sentinel(j: Column) -> Column:
        return F.concat(F.lit("<extra_id_"), j.cast("string"), F.lit(">"))

    def block_input(j: Column) -> Column:
        o = off(j)
        return F.concat(
            F.slice(toks, j * block + 1, o),
            F.array(sentinel(j)),
            F.slice(toks, j * block + o + span + 1, block - o - span),
        )

    def block_target(j: Column) -> Column:
        o = off(j)
        return F.concat(
            F.array(sentinel(j)), F.slice(toks, j * block + o + 1, span)
        )

    # Spark's sequence(0, -1) DESCENDS instead of yielding [] — guard
    # the nb == 0 case explicitly.
    empty = F.array().cast("array<int>")
    safe_idx = F.when(nb > 0, idx).otherwise(empty)
    tail = F.slice(
        toks, nb * block + 1, F.size(toks) - nb * block
    )
    input_toks = F.concat(
        F.flatten(F.transform(safe_idx, block_input)), tail
    )
    target_toks = F.flatten(F.transform(safe_idx, block_target))
    return staged.select(
        F.col(id_col),
        nb.alias("n_spans"),
        F.concat_ws(" ", input_toks).alias("input_text"),
        F.concat_ws(" ", target_toks).alias("target_text"),
    )


def fim_transform(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    fim_rate: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022 — the code-
    model data augmentation): for a deterministic ``fim_rate`` fraction
    of documents, split the token stream at two md5-derived cut points
    into (prefix, middle, suffix) and emit the PSM layout
    ``<fim_prefix> P <fim_suffix> S <fim_middle> M``; the rest pass
    through unchanged. Selection and cuts both derive from (seed, id) —
    no RNG state, the same doc transforms identically on any
    partitioning or engine (the md5-fraction keep rule shared with
    ``sampling.hash_fraction``).

    Cut points are uniform over 0..n_tokens inclusive, so empty
    prefix/middle/suffix all occur (the published transform allows
    them). Output: id, ``fim_applied``, ``output_text``. One narrow
    codegen'd projection — token array materialized once, zero
    shuffle/UDF; row count and keys unchanged."""
    if not 0.0 <= fim_rate <= 1.0:
        raise ValueError("fim_rate must be in [0, 1]")
    d = ensure_min_partitions(df)
    staged = d.select(
        "*", whitespace_tokens(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
    n = F.size(toks)

    def h(tag: str) -> Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(str(seed)),
                        F.col(id_col).cast("string"),
                        F.lit(tag),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")

    keep = (h("keep") % 1000000) < int(round(fim_rate * 1000000))
    c1 = (h("a") % (n + 1)).cast("int")
    c2 = (h("b") % (n + 1)).cast("int")
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    prefix = F.concat_ws(" ", F.slice(toks, 1, lo))
    middle = F.concat_ws(" ", F.slice(toks, lo + 1, hi - lo))
    suffix = F.concat_ws(" ", F.slice(toks, hi + 1, n - hi))
    psm = F.concat(
        F.lit("<fim_prefix> "), prefix,
        F.lit(" <fim_suffix> "), suffix,
        F.lit(" <fim_middle> "), middle,
    )
    return staged.select(
        F.col(id_col),
        keep.alias("fim_applied"),
        F.when(keep, psm).otherwise(
            F.concat_ws(" ", toks)
        ).alias("output_text"),
    )
