"""Text helper columns shared by the text-analysis and dedup operators.

Semantics are deliberately simple and SQL-replicable (the duckdb oracle
recomputes them), and everything stays in JVM built-ins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "normalize_ws",
    "clean_text",
    "CLEAN_CHARS_RE",
    "whitespace_tokens",
    "bpe_ish_tokens",
    "unicode_normalize",
    "BPE_ISH_TOKEN_RE",
    "REDACT_PATTERNS",
    "redact",
    "pattern_count",
    "html_to_text",
    "compression_ratio",
    "fix_mojibake",
]

# A GPT-2-style pre-tokenizer shape: word pieces, numbers, punctuation runs.
# (Real BPE merges need a vocab; this is the count-compatible approximation.)
BPE_ISH_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def normalize_ws(c: Column | str) -> Column:
    """Trim + collapse internal whitespace to single spaces."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.trim(c), r"\s+", " ")


# The C4/CCNet-style cleanup class: C0 controls (minus \t\n\r, which are
# whitespace and belong to the collapse step), DEL, and the zero-width
# family (ZWSP/ZWNJ/ZWJ/word-joiner/BOM) that survives naive scraping.
# Spelled with \x{...} escapes — the one hex-class syntax Java regex and
# RE2 share — so the duckdb oracle replays the pattern verbatim.
CLEAN_CHARS_RE = (
    r"[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}\x{7F}"
    r"\x{200B}-\x{200D}\x{2060}\x{FEFF}]"
)


def clean_text(c: Column | str) -> Column:
    """Scraped-text cleanup: strip control + zero-width characters,
    collapse whitespace runs to single spaces, then trim. Collapse runs
    BEFORE trim (unlike ``normalize_ws``) so leading/trailing tabs and
    newlines — which trim() alone leaves behind — reduce to one space
    and then vanish. One narrow projection — two regexp_replace passes,
    no shuffle, codegen'd."""
    c = F.col(c) if isinstance(c, str) else c
    stripped = F.regexp_replace(c, CLEAN_CHARS_RE, "")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


def whitespace_tokens(c: Column | str) -> Column:
    """Split on whitespace runs; empty string → empty array (not [''])."""
    c = F.col(c) if isinstance(c, str) else c
    return F.filter(F.split(normalize_ws(c), " "), lambda t: t != "")


def bpe_ish_tokens(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_extract_all(c, F.lit(BPE_ISH_TOKEN_RE), 0)


def unicode_normalize(c: Column | str, form: str = "NFC") -> Column:
    """Unicode normalization (NFC/NFKC/NFD/NFKD) — the step every
    tokenizer-bound pipeline runs before hashing or BPE, since scraped
    text mixes precomposed and combining-mark spellings that hash and
    tokenize differently while rendering identically. Spark has no
    builtin for it, so this is a declared Arrow-batched stage: one
    scalar ``pandas_udf`` over the text column (``Series.str.normalize``
    — C-level ICU-equivalent via Python's unicodedata), nulls propagate.
    Everything around it stays JVM; plan shows one ArrowEvalPython node.
    The DuckDB oracle replays NFC through its own utf8proc
    ``nfc_normalize`` — two independent implementations agreeing is the
    correctness check."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    import pandas as pd  # noqa: F401  (worker-side dependency)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s):  # type: ignore[no-untyped-def]
        return s.str.normalize(form)

    return _norm(F.col(c) if isinstance(c, str) else c)


# Scrub patterns for training-data cleaning. Kept to syntax shared by
# Java regex and RE2 (the duckdb oracle replays them verbatim): no
# backrefs, no lookaround. Order matters and is most-specific-first:
# email/url eat their own digits, phone/ipv4 must run before the bare
# number fallback or their digit groups get eaten out from under them.
REDACT_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    # NN-NNN-NNN-NNNN (the TPC-H phone shape; real pipelines add locale
    # variants — each stays one linear-scan RE2/Java alternation)
    "phone": r"\b[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
    "ip": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "number": r"[0-9]+",
}


def redact(c: Column | str, kinds: list[str] | None = None) -> Column:
    """Replace each matched pattern with its ``<KIND>`` placeholder.

    A narrow per-row projection (JVM regex, no Python, no shuffle) —
    the shape every at-scale scrubbing pass should have. Order is the
    dict order, so url runs before number and an address's digits don't
    get double-replaced."""
    c = F.col(c) if isinstance(c, str) else c
    for kind in kinds or list(REDACT_PATTERNS):
        c = F.regexp_replace(c, REDACT_PATTERNS[kind], f"<{kind.upper()}>")
    return c


def pattern_count(c: Column | str, kind: str) -> Column:
    """How many times a redaction pattern occurs (audit column for the
    scrub report)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_count(c, F.lit(REDACT_PATTERNS[kind]))


# 13-19 digits with optional single space/dash separators between groups —
# the PAN (payment-card number) candidate shape. Validation is Luhn,
# below; a bare \d{16} match alone false-positives on ids/timestamps.
CARD_CANDIDATE_RE = r"\b(?:[0-9][ -]?){12,18}[0-9]\b"


def luhn_valid(c: Column | str) -> Column:
    """True iff the digit string (separators already stripped) passes the
    Luhn mod-10 checksum — the validity gate every card-shaped digit run
    must clear before a PII audit counts it (ISO/IEC 7812; the classic
    check: double every second digit from the right, subtract 9 when the
    double exceeds 9, total ≡ 0 mod 10).

    Pure JVM fold: reverse the string, per-position digit transform via
    ``transform`` over the char array, one ``aggregate`` sum — no Python,
    no shuffle, fuses into the consuming scan. NULL/empty → false."""
    c = F.col(c) if isinstance(c, str) else c
    digits = F.split(F.reverse(c), "")
    # split('abc', '') yields ['a','b','c'] (no trailing '' in Spark 3+)
    terms = F.transform(
        digits,
        lambda ch, i: F.when(
            i % 2 == 1,
            # doubled position: 2d - 9·[2d > 9]  ==  2d mod 9 except d=9
            F.when(ch.cast("int") * 2 > 9, ch.cast("int") * 2 - 9).otherwise(
                ch.cast("int") * 2
            ),
        ).otherwise(ch.cast("int")),
    )
    total = F.aggregate(terms, F.lit(0), lambda acc, x: acc + x)
    return F.when(
        c.isNotNull() & (F.length(c) >= 13) & c.rlike("^[0-9]+$"),
        total % 10 == 0,
    ).otherwise(F.lit(False))


def card_numbers(c: Column | str, *, validated: bool = True) -> Column:
    """Array of payment-card numbers found in free text: candidate digit
    runs (13–19 digits, optional space/dash group separators) filtered
    through the Luhn checksum when ``validated`` — the difference between
    "contains 16 digits" and "contains a plausibly real card", which is
    what a PII audit must report. Returns the normalized (separator-free)
    numbers; narrow JVM projection."""
    c = F.col(c) if isinstance(c, str) else c
    cands = F.transform(
        # idx=0: the whole match (the pattern's only group is
        # non-capturing; Spark defaults idx to 1 and would throw)
        F.regexp_extract_all(c, F.lit(CARD_CANDIDATE_RE), 0),
        lambda m: F.regexp_replace(m, "[ -]", ""),
    )
    # re-check length post-normalization: the separator-tolerant regex
    # can overcount separators inside the 13-19 digit budget
    cands = F.filter(
        cands, lambda d: (F.length(d) >= 13) & (F.length(d) <= 19)
    )
    if not validated:
        return cands
    return F.filter(cands, luhn_valid)


def html_to_text(c: Column | str) -> Column:
    """HTML → visible-text extraction (the WET-file / boilerplate-strip
    stage every web-scrape pipeline runs before quality filtering).
    Chain, in order: (1) ``<script>``/``<style>`` blocks dropped WITH
    their content, (2) comments dropped, (3) ``<br>`` and block-level
    closing tags become newlines, (4) every remaining tag becomes a
    space, (5) the six ubiquitous entities decode — ``&amp;`` LAST so
    ``&amp;lt;`` yields the literal ``&lt;`` instead of double-decoding
    to ``<``, (6) space runs collapse, spaces hugging newlines vanish,
    newline runs collapse, outer whitespace strips.

    Every construct used — inline ``(?is)`` flags, lazy quantifiers,
    character classes — is shared by Java regex and RE2, and script /
    style use separate patterns because RE2 has no backreferences: a
    DuckDB oracle replays the chain verbatim. One narrow codegen'd
    projection — no shuffle, no UDF. Line structure downstream: blocks
    become lines (paragraph reconstruction is out of scope — newline
    runs collapse to one)."""
    t = F.col(c) if isinstance(c, str) else c
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(
        t,
        r"(?i)<br\s*/?>|</p\s*>|</div\s*>|</li\s*>|</h[1-6]\s*>|</tr\s*>|</title\s*>",
        "\n",
    )
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, ch in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.regexp_replace(t, r"[ \t]+", " ")
    t = F.regexp_replace(t, r" *\n *", "\n")
    t = F.regexp_replace(t, r"\n{2,}", "\n")
    return F.regexp_replace(t, r"^\s+|\s+$", "")


def fix_mojibake(c: Column | str) -> Column:
    """Repair latin-1/UTF-8 double-encoding mojibake — the classic crawl
    corruption where 'café' arrives as 'cafÃ©' because UTF-8 bytes were
    decoded as Latin-1 somewhere upstream (the core of what ftfy fixes).

    The repair is the exact inverse dance: re-encode the string as
    Latin-1 (recovering the original UTF-8 bytes) and decode as UTF-8.
    It applies ONLY when (a) the string contains a mojibake signature
    (a char in 'Â'..'ô' — the latin-1 images of UTF-8 lead bytes
    0xC2-0xF4; the gate is just a cost cut, the real protection is the
    guards), (b) the round-trip encodes losslessly, and (c) the result
    strictly shrinks (real mojibake always does: 2+ chars collapse to
    1); otherwise the input passes through untouched, so the operator
    is safe to run blanket over a corpus. Repeated application is
    idempotent on repaired text. NULLs propagate.

    Spark has no codec expression, so this is a declared Arrow-batched
    stage (same contract as ``compression_ratio``); deterministic pure
    byte math, unit-pinned against hand-corrupted fixtures."""
    import pandas as pd  # noqa: F401  (worker-side dependency)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _fix(s):  # type: ignore[no-untyped-def]
        def one(v):
            if v is None:
                return None
            if not any("Â" <= ch <= "ô" for ch in v):
                return v
            try:
                repaired = v.encode("latin-1").decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                return v
            return repaired if len(repaired) < len(v) else v

        return s.map(one)

    return _fix(F.col(c) if isinstance(c, str) else c)


def compression_ratio(c: Column | str, *, level: int = 6) -> Column:
    """zlib compression ratio (compressed bytes / raw UTF-8 bytes) — the
    redundancy signal RedPajama-v2 / Dolma publish per document: highly
    repetitive boilerplate compresses far below prose (ratio ≪ prose's
    ~0.4-0.7), and near-random strings sit near (or above) 1.0, so both
    tails flag low-quality text that token-level heuristics miss. Empty
    strings yield NULL (no bytes to compress), nulls propagate.

    Spark has no codec expression, so this is a declared Arrow-batched
    stage: one scalar ``pandas_udf`` (zlib at ``level``, C speed, one
    Python round-trip per batch); everything around it stays JVM. Pure
    byte math — deterministic on any engine/partitioning, and the unit
    tests pin it against direct ``zlib`` calls."""
    if not 0 <= level <= 9:
        raise ValueError("level must be in [0, 9]")
    import pandas as pd  # noqa: F401  (worker-side dependency)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(s):  # type: ignore[no-untyped-def]
        import zlib

        def one(v):
            if v is None:
                return None
            raw = v.encode("utf-8")
            if not raw:
                return None
            return round(len(zlib.compress(raw, level)) / len(raw), 6)

        return s.map(one)

    return _ratio(F.col(c) if isinstance(c, str) else c)
