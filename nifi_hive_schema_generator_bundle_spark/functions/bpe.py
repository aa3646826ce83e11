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
