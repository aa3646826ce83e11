"""Instruction-tuning (SFT) data preparation: chat-template rendering
with loss-mask spans.

The standard fine-tuning pipeline stores conversations as an
``array<struct<role, content>>`` column, renders each into one training
string under a fixed template, and trains the loss only on the
assistant turns — everything else (system prompt, user turns, role
markers) is context. The renderer therefore has to return, along with
the text, the exact character spans the loss applies to; tokenizer-side
code converts char spans to token spans downstream.

Spark shape: ONE codegen'd projection per row — the render is an
``F.aggregate`` fold over the turns array carrying a
(text, spans) struct accumulator, so rendering and span arithmetic
happen in the same pass, JVM-side, with no UDF and no shuffle. Turn
counts are small (conversations, not corpora), so the fold's
quadratic-reinlining hazard (SCALE.md, the O(len²) HOF trap) does not
bite: the accumulator grows with turns, not document length.

At 100 TB: a narrow projection scales embarrassingly; the only data
movement is whatever the caller does next (packing, sharding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "render_chat",
    "rendered_chat_frame",
    "preference_pairs",
    "validate_conversations",
]

_ROLES = ("system", "user", "assistant", "tool")


def validate_conversations(
    df: DataFrame,
    turns_col: str = "turns",
) -> DataFrame:
    """Structural QA for conversation rows before rendering/training —
    the malformed-sample gate every SFT ingest needs. Appends ``valid``
    and ``violation`` (the FIRST failed rule's name, NULL when valid):

    * ``empty``          — NULL or zero-turn conversation
    * ``bad_role``       — a role outside system/user/assistant/tool
    * ``empty_content``  — a NULL or '' content
    * ``system_position``— a system turn anywhere but index 0
    * ``no_alternation`` — consecutive user/user or assistant/assistant
      turns; a tool turn resets the check (assistant → tool →
      assistant is legal, and multiple tool results may run back to
      back, as in the OpenAI messages format)

    One JVM fold over the turns array carrying (prev_role, violation) —
    no UDF, no shuffle, rule order fixed so the reported violation is
    deterministic. Route with ``df.filter('valid')`` /
    ``~valid`` exactly like the engine's JSON validity split."""
    t = F.col(turns_col)
    roles = F.array(*[F.lit(r) for r in _ROLES])

    def step(acc, x):
        # acc: struct(prev string, violation string); first rule wins
        rule = (
            F.when(
                ~F.array_contains(roles, F.coalesce(x["role"], F.lit(""))),
                F.lit("bad_role"),
            )
            .when(
                F.coalesce(x["content"], F.lit("")) == "",
                F.lit("empty_content"),
            )
            .when(
                (x["role"] == "system") & (acc["prev"] != ""),
                F.lit("system_position"),
            )
            .when(
                x["role"].isin("user", "assistant")
                & (x["role"] == acc["prev"]),
                F.lit("no_alternation"),
            )
        )
        return F.struct(
            F.coalesce(x["role"], F.lit("?")).alias("prev"),
            F.coalesce(acc["violation"], rule).alias("violation"),
        )

    init = F.struct(
        F.lit("").alias("prev"), F.lit(None).cast("string").alias("violation")
    )
    folded = F.aggregate(t, init, step)
    violation = F.when(
        t.isNull() | (F.size(t) == 0), F.lit("empty")
    ).otherwise(folded["violation"])
    return df.withColumn("violation", violation).withColumn(
        "valid", F.col("violation").isNull()
    )

_SPANS_T = "array<struct<s:int,e:int>>"


def render_chat(
    turns: Column | str,
    *,
    train_roles: tuple[str, ...] = ("assistant",),
) -> Column:
    """Render an ``array<struct<role:string, content:string>>`` column
    into a ``struct<text:string, spans:array<struct<s:int, e:int>>>``.

    Template (fixed, marker-per-turn)::

        <|role|>\\n{content}\\n   — per turn, concatenated in order

    ``spans`` holds 1-based inclusive character ranges of the CONTENT
    of every turn whose role is in ``train_roles`` (default: assistant
    turns only — the loss-mask convention). ``substring(text, s,
    e - s + 1)`` returns exactly that turn's content; markers and
    untrained turns are never inside a span. NULL/empty turn arrays
    render to empty text with no spans."""
    t = F.col(turns) if isinstance(turns, str) else turns
    roles = F.array(*[F.lit(r) for r in train_roles])

    def step(acc, x):
        # NULL-total: a NULL role/content must not poison the fold
        # (concat propagates NULL through every later turn) — malformed
        # turns are validate_conversations' job, rendering stays total
        role = F.coalesce(x["role"], F.lit(""))
        content = F.coalesce(x["content"], F.lit(""))
        header = F.concat(F.lit("<|"), role, F.lit("|>\n"))
        start = (F.length(acc["text"]) + F.length(header) + 1).cast("int")
        end = (start + F.length(content) - 1).cast("int")
        span = F.array(F.struct(start.alias("s"), end.alias("e")))
        return F.struct(
            F.concat(acc["text"], header, content, F.lit("\n")).alias(
                "text"
            ),
            F.when(
                F.array_contains(roles, role),
                F.concat(acc["spans"], span),
            )
            .otherwise(acc["spans"])
            .alias("spans"),
        )

    init = F.struct(
        F.lit("").alias("text"),
        F.expr(f"CAST(array() AS {_SPANS_T})").alias("spans"),
    )
    return F.aggregate(F.coalesce(t, F.expr("array()")), init, step)


def preference_pairs(
    df: DataFrame,
    prompt_col: str = "prompt",
    response_col: str = "response",
    score_col: str = "score",
    id_col: str = "response_id",
    *,
    margin: float = 0.0,
) -> DataFrame:
    """Preference-pair extraction for DPO/RLHF training: per prompt,
    (chosen, rejected) = the highest- and lowest-scored responses, with
    the pair emitted only when ``chosen_score − rejected_score >
    margin`` — a prompt whose candidates all tie carries no learnable
    signal and is dropped (margin 0.0 keeps any strict gap).

    Deterministic under ties: best/worst are lexicographic max/min of
    (score, id) — the same pair on every run, layout, and engine.
    Returns (prompt, chosen, rejected, chosen_score, rejected_score,
    n_responses).

    Scale shape: ONE groupBy on the prompt key whose aggregates are
    struct min/max — map-side combinable, so the shuffle carries two
    (score, id, response) structs per (partition, prompt), never the
    candidate lists; no window sort, no per-prompt arrays. A
    whale prompt with 10⁶ candidates costs the same shuffle rows as
    one with 2."""
    hi = F.max(F.struct(F.col(score_col), F.col(id_col), F.col(response_col)))
    lo = F.min(F.struct(F.col(score_col), F.col(id_col), F.col(response_col)))
    agg = df.groupBy(prompt_col).agg(
        hi.alias("__hi"), lo.alias("__lo"), F.count("*").alias("n_responses")
    )
    return (
        agg.filter(
            (F.col("n_responses") >= 2)
            & (
                F.col(f"__hi.{score_col}") - F.col(f"__lo.{score_col}")
                > F.lit(margin)
            )
        )
        .select(
            prompt_col,
            F.col(f"__hi.{response_col}").alias("chosen"),
            F.col(f"__lo.{response_col}").alias("rejected"),
            F.col(f"__hi.{score_col}").alias("chosen_score"),
            F.col(f"__lo.{score_col}").alias("rejected_score"),
            "n_responses",
        )
    )


def rendered_chat_frame(
    df: DataFrame,
    turns_col: str = "turns",
    *,
    train_roles: tuple[str, ...] = ("assistant",),
) -> DataFrame:
    """``render_chat`` exploded to one row per loss span — the flat
    training-manifest layout (conversation id columns pass through):
    ``text``, ``text_len``, ``n_spans``, ``span_idx`` (0-based),
    ``s``/``e`` (1-based inclusive char range), and ``piece`` (the
    span's content, sliced back out of the rendered text — a built-in
    self-check: piece == that turn's content by construction).
    Conversations with no trained turns keep one row with a NULL span.
    One projection + ``posexplode_outer``; row growth = span count."""
    r = render_chat(turns_col, train_roles=train_roles)
    out = df.withColumn("__r", r).drop(turns_col).select(
        "*",
        F.col("__r.text").alias("text"),
        F.length("__r.text").alias("text_len"),
        F.size("__r.spans").alias("n_spans"),
    )
    return (
        out.select(
            *[c for c in out.columns if c != "__r"],
            F.posexplode_outer("__r.spans").alias("span_idx", "__sp"),
        )
        .withColumn("s", F.col("__sp.s"))
        .withColumn("e", F.col("__sp.e"))
        .withColumn(
            "piece", F.substring("text", F.col("s"), F.col("e") - F.col("s") + 1)
        )
        .drop("__sp")
    )
