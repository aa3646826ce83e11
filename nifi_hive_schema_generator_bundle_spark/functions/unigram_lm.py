"""Unigram-LM subword tokenizer — training and Viterbi segmentation.

The OTHER major subword algorithm (Kudo 2018, "Subword Regularization";
the SentencePiece `--model_type=unigram` default), complementing the BPE
family in `functions/bpe.py`: instead of greedily merging pairs, fit a
unigram language model over a candidate piece inventory with EM, prune
the inventory to the target size, and segment by Viterbi (the most
probable piece sequence).

Spark shape (mirrors `bpe_train`'s contract):

* The corpus is touched ONCE — documents collapse to the (word, freq)
  vocabulary table (regexp explode + count, map-side combinable,
  bounded by distinct-word count, not corpus size).
* Seeding, EM and pruning then run over that words table only. The
  E-step is ONE Arrow ``mapInPandas`` stage per iteration: each batch
  runs forward–backward over every word's segmentation lattice against
  the broadcast piece table and emits per-piece expected-count
  partials. The M-step is a piece-keyed sum + a vocab-sized driver
  collect (the quantizer-fit control-path contract — piece tables are
  ≤ ~100 K rows no matter the corpus).
* Tokenization is one Arrow stage with per-batch word memoization —
  each DISTINCT word in a batch is segmented once.

Determinism (the exact-integer discipline): expected counts are
quantized to ``floor(e·1e6)`` int64 partials before the cross-partition
sum, so training is bit-reproducible under any partitioning; all
selections tie-break on (score DESC, piece ASC) and Viterbi prefers the
longer piece on equal score. EM inside a word uses plain float — it
never crosses a partition boundary.

Oracle note: lattice forward–backward and Viterbi are not
SQL-expressible, so the gate entries are rows-only by declared design;
correctness is pinned by hand-computed lattice tests
(tests/test_unigram_lm.py) and the cross-partitioning determinism
property.

Reference parity: the NiFi bundle (CreateHQL.scala) has no tokenizer;
this is LLM-data-pipeline extension surface (SURVEY.md §2 extensions).
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import PRETOKEN_RE

__all__ = [
    "train_unigram_vocab",
    "train_unigram_vocab_from_freqs",
    "py_word_freqs",
    "unigram_tokenize_words",
    "unigram_token_stats",
]

_COUNT_SCALE = 6  # expected counts quantized to floor(e·1e6) int64
_MAX_WORD_LEN = 48  # lattice cap: longer words truncate for TRAINING stats
_UNSEEN_PENALTY = 10.0  # fallback logp for chars outside the vocab


def _word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """(w, freq) over the corpus — the one corpus-wide pass."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(text_col, F.lit(PRETOKEN_RE.pattern), 0)
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _seed_pieces(
    words: DataFrame, *, n_multi: int, max_piece_len: int
) -> DataFrame:
    """Candidate inventory: EVERY single character (coverage guarantee)
    + the ``n_multi`` highest-scoring multi-char substrings, scored by
    the SentencePiece seeding heuristic count·len (frequent AND long
    saves the most pieces). Returns (piece, score) with deterministic
    (score DESC, piece ASC) selection."""
    w = F.col("w")
    subs = words.select(
        "freq",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.least(F.length(w), F.lit(_MAX_WORD_LEN))),
                    lambda i: F.transform(
                        F.sequence(
                            i,
                            F.least(
                                F.least(F.length(w), F.lit(_MAX_WORD_LEN)),
                                i + max_piece_len - 1,
                            ),
                        ),
                        lambda j: w.substr(i, j - i + 1),
                    ),
                )
            )
        ).alias("piece"),
    )
    counts = subs.groupBy("piece").agg(F.sum("freq").alias("cnt"))
    chars = counts.filter(F.length("piece") == 1).select(
        "piece", F.col("cnt").alias("score")
    )
    multis = (
        counts.filter(F.length("piece") >= 2)
        .select("piece", (F.col("cnt") * F.length("piece")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("piece").asc())
        .limit(n_multi)
    )
    return chars.unionByName(multis)


def _word_expected_counts(
    w: str,
    freq: int,
    lp: dict[str, float],
    max_piece_len: int,
    acc: dict[str, int],
) -> None:
    """Per-word E-step kernel: forward–backward over the segmentation
    lattice, expected counts quantized to ``floor(e·10^_COUNT_SCALE)``
    int64 contributions accumulated into ``acc``. Shared verbatim by the
    distributed Arrow stage AND the pure-Python training replay
    (``train_unigram_vocab_from_freqs``) — quantization happens PER WORD,
    so any grouping of words sums to identical integers."""
    if not w:
        return
    w = w[:_MAX_WORD_LEN]
    n = len(w)
    scale = float(10**_COUNT_SCALE)

    def logsumexp2(a: float, b: float) -> float:
        if a == -math.inf:
            return b
        if b == -math.inf:
            return a
        m = a if a > b else b
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    # forward
    alpha = [-math.inf] * (n + 1)
    alpha[0] = 0.0
    for e in range(1, n + 1):
        for s in range(max(0, e - max_piece_len), e):
            p = lp.get(w[s:e])
            if p is not None and alpha[s] != -math.inf:
                alpha[e] = logsumexp2(alpha[e], alpha[s] + p)
    z = alpha[n]
    if z == -math.inf:
        return  # word not coverable (char missing) — skip
    # backward
    beta = [-math.inf] * (n + 1)
    beta[n] = 0.0
    for s in range(n - 1, -1, -1):
        for e in range(s + 1, min(n, s + max_piece_len) + 1):
            p = lp.get(w[s:e])
            if p is not None and beta[e] != -math.inf:
                beta[s] = logsumexp2(beta[s], p + beta[e])
    for s in range(n):
        for e in range(s + 1, min(n, s + max_piece_len) + 1):
            p = lp.get(w[s:e])
            if p is None:
                continue
            if alpha[s] == -math.inf or beta[e] == -math.inf:
                continue
            ec = math.exp(alpha[s] + p + beta[e] - z) * freq
            q = int(math.floor(ec * scale))
            if q > 0:
                acc[w[s:e]] += q


def _estep_counts(
    words: DataFrame, logp: dict[str, float], max_piece_len: int
) -> dict[str, int]:
    """One EM E-step: expected piece counts over the words table,
    quantized to int64 partials inside the Arrow stage and summed
    exactly across partitions. Returns {piece: quantized_count}."""
    import pandas as pd

    spark = words.sparkSession
    bc = spark.sparkContext.broadcast(logp)

    def estep(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        lp = bc.value
        acc: dict[str, int] = defaultdict(int)
        for pdf in batches:
            for w, freq in zip(pdf["w"], pdf["freq"]):
                _word_expected_counts(w, freq, lp, max_piece_len, acc)
        if acc:
            yield pd.DataFrame(
                {"piece": list(acc.keys()), "cnt": list(acc.values())}
            )

    partials = words.select("w", "freq").mapInPandas(
        estep, "piece string, cnt long"
    )
    rows = (
        partials.groupBy("piece")
        .agg(F.sum(F.col("cnt").cast("decimal(38,0)")).alias("cnt"))
        .collect()  # vocab-sized control path
    )
    return {r.piece: int(r.cnt) for r in rows}


def _normalize(counts: dict[str, int]) -> dict[str, float]:
    total = sum(counts.values())
    if total <= 0:
        raise ValueError("EM produced no expected counts")
    lt = math.log(total)
    return {p: math.log(c) - lt for p, c in counts.items() if c > 0}


def train_unigram_vocab(
    df: DataFrame,
    *,
    vocab_size: int,
    text_col: str = "text",
    max_piece_len: int = 8,
    em_iters: int = 2,
    seed_factor: int = 4,
    shrink: float = 0.75,
) -> list[tuple[str, float]]:
    """Train a unigram-LM piece inventory of ``vocab_size`` pieces.

    Loop (the Kudo 2018 schedule, with expected-count pruning as the
    likelihood-loss approximation): seed chars + seed_factor·vocab_size
    multi-char candidates → repeat [em_iters EM rounds → drop the
    lowest-expected-count multi-char pieces, keeping
    max(vocab_size − n_chars, ⌈shrink · n_multi⌉)] until the inventory
    fits → one final EM for the reported probabilities. Single
    characters are never pruned (full coverage). Returns
    [(piece, logprob)] sorted by (logprob DESC, piece ASC); bit
    reproducible across partitionings."""
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    words = _word_freqs(df, text_col).localCheckpoint(eager=True)
    seed = _seed_pieces(
        words, n_multi=seed_factor * vocab_size, max_piece_len=max_piece_len
    ).collect()
    return _train_loop(
        lambda lp: _estep_counts(words, lp, max_piece_len),
        {r.piece: int(r.score) for r in seed},
        vocab_size=vocab_size,
        em_iters=em_iters,
        shrink=shrink,
    )


def _train_loop(
    estep,
    seed_counts: dict[str, int],
    *,
    vocab_size: int,
    em_iters: int,
    shrink: float,
) -> list[tuple[str, float]]:
    """The EM/prune schedule, shared by the distributed trainer and the
    pure-Python replay — ``estep(logp) -> {piece: quantized_count}`` is
    the only environment-specific step, so both paths are the SAME
    algorithm by construction (the oracle-twin promotion contract)."""
    logp = _normalize(seed_counts)
    chars = {p for p in logp if len(p) == 1}
    while True:
        for _ in range(max(1, em_iters)):
            counts = estep(logp)
            # characters always survive with a floor count so coverage
            # never collapses mid-training
            for c in chars:
                counts.setdefault(c, 1)
            logp = _normalize(counts)
        multis = [p for p in logp if len(p) > 1]
        budget = max(vocab_size - len(chars), 0)
        if len(multis) <= budget:
            break
        keep_n = max(budget, int(math.ceil(len(multis) * shrink)))
        if keep_n >= len(multis):
            keep_n = budget  # final cut when shrink can't make progress
        kept = sorted(
            multis, key=lambda p: (-counts.get(p, 0), p)
        )[:keep_n]
        logp = _normalize(
            {p: counts[p] for p in kept}
            | {c: counts.get(c, 1) for c in chars}
        )
        if keep_n == budget:
            break
    # one final EM over the settled inventory so reported probabilities
    # reflect the pruned vocabulary, not the pre-prune counts
    counts = estep(logp)
    for c in chars:
        counts.setdefault(c, 1)
    counts = {p: c for p, c in counts.items() if p in logp}
    logp = _normalize(counts)
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def py_word_freqs(texts) -> dict[str, int]:
    """Single-process replay of ``_word_freqs`` (exact: both are a
    PRETOKEN_RE findall + integer count)."""
    freqs: dict[str, int] = defaultdict(int)
    for t in texts:
        if t is None:
            continue
        for w in PRETOKEN_RE.findall(t):
            freqs[w] += 1
    return dict(freqs)


def _py_seed_counts(
    freqs: dict[str, int], *, n_multi: int, max_piece_len: int
) -> dict[str, int]:
    """Single-process replay of ``_seed_pieces``: substring counts over
    the (truncated) words, chars scored by count, multis by count·len,
    top ``n_multi`` multis on (score DESC, piece ASC)."""
    cnt: dict[str, int] = defaultdict(int)
    for w, f in freqs.items():
        t = w[:_MAX_WORD_LEN]
        n = len(t)
        for i in range(n):
            for j in range(i + 1, min(n, i + max_piece_len) + 1):
                cnt[t[i:j]] += f
    out = {p: c for p, c in cnt.items() if len(p) == 1}
    multis = sorted(
        ((p, c * len(p)) for p, c in cnt.items() if len(p) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:n_multi]
    out.update(multis)
    return out


def train_unigram_vocab_from_freqs(
    freqs: dict[str, int],
    *,
    vocab_size: int,
    max_piece_len: int = 8,
    em_iters: int = 2,
    seed_factor: int = 4,
    shrink: float = 0.75,
) -> list[tuple[str, float]]:
    """Pure-Python trainer over a (word → freq) table — bit-identical to
    ``train_unigram_vocab`` on the same corpus: the E-step kernel
    (``_word_expected_counts``, per-word integer quantization) and the
    EM/prune schedule (``_train_loop``) are the very same functions, and
    the distributed path's only extra step — the cross-partition
    integer sum — is order-independent. Exists so the DuckDB oracle for
    ``doc_unigram_fertility`` can pin the trained vocabulary as
    literals without a SparkSession at import time."""
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")

    def estep(logp: dict[str, float]) -> dict[str, int]:
        acc: dict[str, int] = defaultdict(int)
        for w, f in freqs.items():
            _word_expected_counts(w, f, logp, max_piece_len, acc)
        return dict(acc)

    return _train_loop(
        estep,
        _py_seed_counts(
            freqs, n_multi=seed_factor * vocab_size, max_piece_len=max_piece_len
        ),
        vocab_size=vocab_size,
        em_iters=em_iters,
        shrink=shrink,
    )


def _viterbi(w: str, lp: dict[str, float], max_piece_len: int) -> list[str]:
    """Most probable segmentation; unseen characters fall back to a
    penalized char piece so any string tokenizes. Ties prefer the
    longer final piece (smaller split point)."""
    n = len(w)
    floor = (min(lp.values()) if lp else 0.0) - _UNSEEN_PENALTY
    best = [-math.inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for e in range(1, n + 1):
        for s in range(max(0, e - max_piece_len), e):
            piece = w[s:e]
            p = lp.get(piece)
            if p is None:
                if e - s != 1:
                    continue
                p = floor  # unseen single char fallback
            cand = best[s] + p
            # strictly-greater OR equal-with-smaller-s: the s loop runs
            # ascending, so first winner has the smallest s (longest
            # piece) — only replace on strict improvement
            if cand > best[e]:
                best[e] = cand
                back[e] = s
    out: list[str] = []
    e = n
    while e > 0:
        s = back[e]
        out.append(w[s:e])
        e = s
    out.reverse()
    return out


def unigram_tokenize_words(
    df: DataFrame,
    vocab: list[tuple[str, float]] | dict[str, float],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "pieces",
    max_piece_len: int = 8,
) -> DataFrame:
    """(id, ``out_col``: array<string>) — Viterbi pieces of every word
    in document order. One Arrow stage over a column-pruned (id, text)
    projection; the piece table rides a broadcast; each DISTINCT word
    in a batch is segmented once (memo)."""
    import pandas as pd

    lp = dict(vocab)
    bc = df.sparkSession.sparkContext.broadcast(lp)
    pat = PRETOKEN_RE

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        table = bc.value
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for t in pdf[text_col]:
                if t is None:
                    out.append(None)
                    continue
                pieces: list[str] = []
                for w in pat.findall(t):
                    seg = memo.get(w)
                    if seg is None:
                        seg = _viterbi(w, table, max_piece_len)
                        memo[w] = seg
                    pieces.extend(seg)
                out.append(pieces)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: out})

    return df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, {out_col} array<string>"
    )


def unigram_token_stats(
    df: DataFrame,
    vocab: list[tuple[str, float]] | dict[str, float],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 8,
) -> DataFrame:
    """(id, n_pieces, n_words, fertility) — the tokenizer-quality
    readout (pieces per word; the `tokenizer_fertility` sibling for the
    unigram model)."""
    toks = unigram_tokenize_words(
        df,
        vocab,
        text_col=text_col,
        id_col=id_col,
        out_col="__pieces",
        max_piece_len=max_piece_len,
    )
    words = df.select(
        id_col,
        F.size(
            F.regexp_extract_all(text_col, F.lit(PRETOKEN_RE.pattern), 0)
        ).alias("n_words"),
    )
    return (
        toks.select(id_col, F.size("__pieces").alias("n_pieces"))
        .join(words, id_col)
        .select(
            id_col,
            "n_pieces",
            "n_words",
            F.when(
                F.col("n_words") > 0,
                F.col("n_pieces") / F.col("n_words"),
            ).alias("fertility"),
        )
    )
