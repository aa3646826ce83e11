"""Property / differential tests for the round-4h/4i operators: Spark
results vs brute-force pure-Python models on hypothesis-generated
inputs (small example counts — each example runs Spark jobs)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nifi_hive_schema_generator_bundle_spark.operators.packing import (
    fim_transform,
    span_corruption,
)
from nifi_hive_schema_generator_bundle_spark.operators.text import (
    gopher_repetition_flags,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORD = st.text(alphabet="abcx", min_size=1, max_size=3)


# ---------------------------------------------------------------------------
# span_corruption: token conservation + exact density, any doc length
# ---------------------------------------------------------------------------

@given(n_tokens=st.integers(0, 90), seed=st.integers(0, 5))
@settings(**_SETTINGS)
def test_span_corruption_conserves_tokens(spark, n_tokens, seed):
    toks = [f"w{i}" for i in range(n_tokens)]
    df = spark.createDataFrame(
        [(1, " ".join(toks))], "doc_id int, text string"
    )
    r = span_corruption(df, block=10, span=2, seed=seed).collect()[0]
    nb = n_tokens // 10
    assert r.n_spans == nb
    inp = r.input_text.split() if r.input_text else []
    tgt = r.target_text.split() if r.target_text else []
    sentinels = {f"<extra_id_{j}>" for j in range(nb)}
    # each sentinel appears exactly once on each side
    assert [t for t in inp if t in sentinels] == sorted(
        sentinels, key=lambda s: int(s[10:-1])
    )
    # masked token count is exactly span * full blocks
    body_tgt = [t for t in tgt if t not in sentinels]
    assert len(body_tgt) == 2 * nb
    # input body + target body == original multiset
    body_inp = [t for t in inp if t not in sentinels]
    assert Counter(body_inp) + Counter(body_tgt) == Counter(toks)


# ---------------------------------------------------------------------------
# fim_transform: token conservation + PSM structure for applied docs
# ---------------------------------------------------------------------------

@given(
    n_tokens=st.integers(0, 60),
    seed=st.integers(0, 5),
)
@settings(**_SETTINGS)
def test_fim_conserves_tokens_and_structure(spark, n_tokens, seed):
    toks = [f"w{i}" for i in range(n_tokens)]
    df = spark.createDataFrame(
        [(1, " ".join(toks))], "doc_id int, text string"
    )
    r = fim_transform(df, fim_rate=1.0, seed=seed).collect()[0]
    assert r.fim_applied
    parts = r.output_text.split()
    assert parts.count("<fim_prefix>") == 1
    assert parts.count("<fim_suffix>") == 1
    assert parts.count("<fim_middle>") == 1
    assert parts.index("<fim_prefix>") == 0
    assert parts.index("<fim_suffix>") < parts.index("<fim_middle>")
    body = [t for t in parts if not t.startswith("<fim_")]
    assert Counter(body) == Counter(toks)
    # prefix tokens keep original order and precede middle in the doc
    n = len(toks)
    c1 = int(hashlib.md5(f"{seed}:1:a".encode()).hexdigest()[:8], 16) % (n + 1)
    c2 = int(hashlib.md5(f"{seed}:1:b".encode()).hexdigest()[:8], 16) % (n + 1)
    lo, hi = min(c1, c2), max(c1, c2)
    i_s, i_m = parts.index("<fim_suffix>"), parts.index("<fim_middle>")
    assert parts[1:i_s] == toks[:lo]
    assert parts[i_s + 1:i_m] == toks[hi:]
    assert parts[i_m + 1:] == toks[lo:hi]


# ---------------------------------------------------------------------------
# gopher_repetition_flags ≡ pure-Python dup-line/para model
# ---------------------------------------------------------------------------

def _dup_model(units):
    units = [u.strip() for u in units if u.strip()]
    if not units:
        return None
    c = Counter(units)
    n = len(units)
    dup = sum(v - 1 for v in c.values())
    tot = sum(len(u) for u in units)
    dupc = sum((v - 1) * len(u) for u, v in c.items())
    return n, round(dup / n, 6), round(dupc / tot, 6)


@given(
    lines=st.lists(
        st.lists(_WORD, min_size=0, max_size=3).map(" ".join),
        min_size=0,
        max_size=8,
    ),
    para_breaks=st.sets(st.integers(1, 7)),
)
@settings(**_SETTINGS)
def test_gopher_repetition_matches_python_model(spark, lines, para_breaks):
    # assemble: single newlines inside paragraphs, doubles at breaks
    segs = []
    for i, l in enumerate(lines):
        if i:
            segs.append("\n\n" if i in para_breaks else "\n")
        segs.append(l)
    text = "".join(segs)
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    r = gopher_repetition_flags(df).collect()[0]
    lm = _dup_model(text.split("\n"))
    pm = _dup_model(re.split(r"\n{2,}", text))
    if lm is None:
        assert r.n_lines is None and r.passes_repetition
    else:
        assert (r.n_lines, r.dup_line_frac, r.dup_line_char_frac) == lm
    if pm is not None:
        assert (r.n_paras, r.dup_para_frac, r.dup_para_char_frac) == pm


# ---------------------------------------------------------------------------
# html_to_text ≡ pure-Python re model (third implementation of the chain)
# ---------------------------------------------------------------------------

_TAGS = st.sampled_from([
    "<p>", "</p>", "<div>", "</div>", "<br/>", "<span class='x'>",
    "</span>", "<li>", "</li>", "<!-- c -->",
    "<script>v=1;</script>", "<style>p{}</style>",
    "&amp;", "&lt;", "&nbsp;", "word", "two words", " ",
])


def _py_html_model(h):
    t = re.sub(r"(?is)<script[^>]*>.*?</script>", " ", h)
    t = re.sub(r"(?is)<style[^>]*>.*?</style>", " ", t)
    t = re.sub(r"(?s)<!--.*?-->", " ", t)
    t = re.sub(
        r"(?i)<br\s*/?>|</p\s*>|</div\s*>|</li\s*>|</h[1-6]\s*>|</tr\s*>|</title\s*>",
        "\n", t,
    )
    t = re.sub(r"(?s)<[^>]*>", " ", t)
    for ent, ch in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
    ):
        t = t.replace(ent, ch)
    t = re.sub(r"[ \t]+", " ", t)
    t = re.sub(r" *\n *", "\n", t)
    t = re.sub(r"\n{2,}", "\n", t)
    return re.sub(r"^\s+|\s+$", "", t)


@given(parts=st.lists(_TAGS, min_size=0, max_size=10))
@settings(**_SETTINGS)
def test_html_to_text_matches_python_model(spark, parts):
    from pyspark.sql import functions as F

    from nifi_hive_schema_generator_bundle_spark.functions.textfns import (
        html_to_text,
    )

    h = "".join(parts)
    df = spark.createDataFrame([(h,)], "h string")
    got = df.select(html_to_text("h").alias("t")).collect()[0].t
    assert got == _py_html_model(h)
