"""Property / differential tests for the round-4b operators: Spark
results vs brute-force pure-Python models on hypothesis-generated
inputs (small example counts — each example runs Spark jobs)."""

from __future__ import annotations

import datetime
import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
    shuffle_shards,
)
from nifi_hive_schema_generator_bundle_spark.functions.timeseries import (
    rolling_distinct_count,
)
from nifi_hive_schema_generator_bundle_spark.operators.cdc import scd2_build
from nifi_hive_schema_generator_bundle_spark.operators.graph import (
    label_propagation,
)
from nifi_hive_schema_generator_bundle_spark.operators.text import ngram_novelty

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# scd2_build ≡ run-length collapse of the sorted feed
# ---------------------------------------------------------------------------

@given(
    feed=st.lists(
        st.tuples(
            st.integers(0, 2),          # key
            st.sampled_from("abc"),     # attr
            st.integers(1, 9),          # day
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_scd2_matches_runlength_model(spark, feed):
    rows = [
        (str(k), a, datetime.datetime(2024, 1, d), i)
        for i, (k, a, d) in enumerate(feed)
    ]
    df = spark.createDataFrame(rows, "k string, attr string, ts timestamp, id long")
    # sort key maps the open-ended valid_to=None to datetime.max: an
    # A->B->A flip inside one timestamp yields two rows tied up to
    # valid_to, and Python can't order None against a datetime
    def row_key(t):
        return (*t[:3], t[3] or datetime.datetime.max, t[4])

    got = sorted(
        (
            (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in scd2_build(
                df, "k", ["attr"], "ts", tiebreak_col="id"
            ).collect()
        ),
        key=row_key,
    )

    expect = []
    by_key: dict = {}
    for k, a, ts, i in sorted(rows, key=lambda r: (r[0], r[2], r[3])):
        by_key.setdefault(k, []).append((a, ts))
    for k, seq in by_key.items():
        runs = []
        for a, ts in seq:
            if not runs or runs[-1][0] != a:
                runs.append((a, ts))
        for j, (a, ts) in enumerate(runs):
            nxt = runs[j + 1][1] if j + 1 < len(runs) else None
            expect.append((k, a, ts, nxt, nxt is None))
    assert got == sorted(expect, key=row_key)


# ---------------------------------------------------------------------------
# ngram_novelty ≡ set model
# ---------------------------------------------------------------------------

@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=8).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_ngram_novelty_matches_set_model(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_distinct_grams"], r["n_novel_grams"])
        for r in ngram_novelty(df, n=2).collect()
    }

    first: dict = {}
    grams_by_doc = {}
    for i, t in rows:
        toks = t.split()
        grams = {" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)}
        grams_by_doc[i] = grams
        for g in grams:
            first.setdefault(g, i)
    for i, grams in grams_by_doc.items():
        novel = sum(1 for g in grams if first[g] == i)
        assert got[i] == (len(grams), novel), (i, texts)


# ---------------------------------------------------------------------------
# rolling_distinct_count ≡ brute-force window model
# ---------------------------------------------------------------------------

@given(
    events=st.lists(
        st.tuples(st.integers(0, 5), st.integers(1, 20)),  # (user, day)
        min_size=1,
        max_size=40,
    ),
    window=st.integers(1, 9),
)
@settings(**_SETTINGS)
def test_rolling_distinct_matches_bruteforce(spark, events, window):
    rows = [(u, datetime.datetime(2024, 1, d)) for u, d in events]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["day"]: r["n"]
        for r in rolling_distinct_count(
            df, window_days=window, out_col="n"
        ).collect()
    }
    days = sorted({d for _, d in events})
    for d in days:
        users = {u for u, dd in events if d - window < dd <= d}
        assert got[datetime.date(2024, 1, d)] == len(users)
    assert len(got) == len(days)


# ---------------------------------------------------------------------------
# label_propagation ≡ synchronous min-tiebreak model
# ---------------------------------------------------------------------------

@given(
    edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1,
        max_size=20,
    ),
    iters=st.integers(1, 3),
)
@settings(**_SETTINGS)
def test_label_propagation_matches_sync_model(spark, edges, iters):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["label"]
        for r in label_propagation(df, iterations=iters).collect()
    }

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    if not und:
        assert got == {}
        return
    nbrs: dict = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    label = {n: n for n in nbrs}
    for _ in range(iters):
        new = {}
        for n in nbrs:
            votes = Counter(label[m] for m in nbrs[n])
            top = max(votes.values())
            new[n] = min(l for l, c in votes.items() if c == top)
        label = new
    assert got == label


# ---------------------------------------------------------------------------
# shuffle_shards: permutation property
# ---------------------------------------------------------------------------

@given(
    n=st.integers(1, 60),
    shards=st.integers(1, 6),
    seed=st.sampled_from(["", "e1", "e2"]),
)
@settings(**_SETTINGS)
def test_shuffle_shards_is_a_partitioned_permutation(spark, n, shards, seed):
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    rows = shuffle_shards(df, "doc_id", n_shards=shards, seed=seed).collect()
    assert len(rows) == n
    assert {r["doc_id"] for r in rows} == set(range(n))
    by_shard: dict = {}
    for r in rows:
        assert 0 <= r["shard"] < shards
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
