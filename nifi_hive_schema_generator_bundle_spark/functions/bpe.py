"""Byte-pair-encoding tokenization — vocab-file-driven, Arrow-batched.

Production token budgets (sequence packing, token-budget selection,
cost estimation) are defined by a trained BPE vocabulary, not by
whitespace splitting. This module provides the standard greedy encoder:
pre-tokenize with the GPT-style regex (letter runs / digit runs /
punctuation runs), then within each pre-token repeatedly merge the
lowest-rank adjacent pair until no merge applies — exactly the
algorithm every BPE tokenizer family (GPT-2/tiktoken/SentencePiece-BPE
export) runs at inference time. The merge table is the model: load it
from a merges file (``load_merges``, one ``left right`` pair per line,
rank = line order) or build a deterministic fixture (``fixture_merges``).

Scale shape: encoding is embarrassingly parallel per document. The
Spark operator ships the merge table to executors once via a
SparkContext broadcast (a real vocab is ~50 K pairs ≈ 1 MB — never
per-task pickle freight) and runs the encoder inside one Arrow-batched
``mapInPandas`` stage: document bodies stream through Python in
columnar batches, nothing shuffles, output is one narrow row per
document. This is a declared Arrow operator (the per-token merge loop
is data-dependent iteration — not expressible in Catalyst expressions).
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PRETOKEN_RE",
    "load_merges",
    "fixture_merges",
    "bpe_encode_word",
    "bpe_encode",
    "bpe_token_stats",
    "bpe_train",
]

# letter runs | digit runs | punctuation runs — the same pre-token
# classes as operators/text.token_stats's "bpe-ish" count, so the two
# operators agree on pre-token boundaries and differ only in the merge
# step this module adds.
PRETOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")


def load_merges(path: str) -> list[tuple[str, str]]:
    """Read a merges file: one ``left right`` pair per line, rank =
    line order; blank lines and ``#``-comments skipped (the format of
    GPT-2's ``merges.txt`` minus its version header)."""
    merges: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split(" ")
            if len(parts) != 2:
                raise ValueError(f"malformed merge line: {line!r}")
            merges.append((parts[0], parts[1]))
    return merges


def fixture_merges(words: Iterable[str]) -> list[tuple[str, str]]:
    """Deterministic test vocabulary: the left-to-right prefix chain of
    each word (``t a``, ``ta b``, ``tab l`` …), words in the given
    order. Every listed word encodes to exactly one token; chain order
    matters when one word contains another chain's first pair (list the
    containing word first so its chain outranks the contained pair)."""
    merges: list[tuple[str, str]] = []
    seen = set()
    for w in words:
        for i in range(1, len(w)):
            pair = (w[:i], w[i])
            if pair not in seen:
                seen.add(pair)
                merges.append(pair)
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE over one pre-token: start from characters, repeatedly
    merge the lowest-rank adjacent pair present. O(n²) worst case per
    word — fine for natural-language word lengths; real tokenizers use
    the same loop."""
    toks = list(word)
    while len(toks) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return toks


def bpe_encode(text: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Full-text encode: pre-tokenize, then merge within each pre-token
    (merges never cross pre-token boundaries, per the standard)."""
    out: list[str] = []
    for pre in PRETOKEN_RE.findall(text):
        out.extend(bpe_encode_word(pre, ranks))
    return out


def bpe_train(
    df: DataFrame,
    *,
    n_merges: int = 50,
    text_col: str = "text",
    min_freq: int = 1,
) -> list[tuple[str, str, int]]:
    """Learn a BPE merge table from a corpus (Sennrich 2016 training
    loop): repeatedly find the most frequent adjacent symbol pair and
    merge it. Returns ``[(left, right, pair_count), …]`` in rank order
    — feed the ``(left, right)`` pairs straight into ``bpe_encode`` /
    ``bpe_token_stats``.

    Deterministic: ties break by (count DESC, left ASC, right ASC), so
    the learned table is reproducible across partitionings and runs.
    Pair statistics count every adjacent position (overlaps included),
    merge application is left-to-right non-overlapping — both exactly
    as the reference algorithm defines them.

    Scale shape — the corpus is touched ONCE: documents collapse to the
    (pretoken, freq) vocabulary table (regexp explode + count, the same
    map-side-combinable shape as a word count), which is bounded by
    distinct-pretoken count, not corpus size. Every training round then
    runs over that vocab table only: pair stats are a (left, right,
    Σfreq) partial agg with a 1-row argmax TakeOrdered collect (the
    loop-control scalar), and the merge applies as a JVM array fold —
    no Python touches the data path. The vocab table re-materializes
    per round (eager localCheckpoint, table is vocab-sized) so lineage
    stays one round deep. ``n_merges`` rounds ⇒ 2·n_merges vocab-sized
    jobs after the single corpus pass.
    """
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    w = F.col("w")
    words = (
        df.select(
            F.explode(
                F.regexp_extract_all(text_col, F.lit(PRETOKEN_RE.pattern), 0)
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_freq)
        .select(
            "freq",
            F.transform(
                F.sequence(F.lit(1), F.length(w)),
                lambda i: w.substr(i, F.lit(1)),
            ).alias("sym"),
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        sym = F.col("sym")
        pairs = words.filter(F.size(sym) >= 2).select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(sym) - 1),
                    lambda i: F.struct(
                        F.element_at(sym, i).alias("l"),
                        F.element_at(sym, i + 1).alias("r"),
                    ),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((left, right, cnt))
        # left-to-right non-overlapping merge: the fold's accumulator
        # tail tells whether the previous symbol is an UNCONSUMED left —
        # a just-merged pair ends in left+right, which only re-matches
        # if it literally equals `left` again (correct: "abab"+(ab,ab))
        merged = F.aggregate(
            sym,
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (x == F.lit(right)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(F.lit(left + right)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        words = words.select("freq", merged.alias("sym")).localCheckpoint(
            eager=True
        )
    return merges


def bpe_token_stats(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE token counts under the given merge table.

    Returns (id_col, n_pretokens, n_bpe_tokens). One Arrow-batched
    ``mapInPandas`` stage over a column-pruned (id, text) projection;
    the merge table rides a SparkContext broadcast, so each executor
    deserializes the vocab once per JVM, not once per task.
    """
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    ranks = {pair: i for i, pair in enumerate(merges)}
    bc = df.sparkSession.sparkContext.broadcast(ranks)
    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("n_pretokens", LongType(), False),
            StructField("n_bpe_tokens", LongType(), False),
        ]
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        r = bc.value
        for pdf in it:
            n_pre: list[int] = []
            n_bpe: list[int] = []
            for text in pdf[text_col]:
                pres = PRETOKEN_RE.findall(text or "")
                n_pre.append(len(pres))
                n_bpe.append(
                    sum(len(bpe_encode_word(p, r)) for p in pres)
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_pretokens": pd.Series(n_pre, dtype="int64"),
                    "n_bpe_tokens": pd.Series(n_bpe, dtype="int64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(batches, schema=out_schema)
