"""Sequence packing: hand-computed layout, boundary straddle, empty
docs, bucket determinism."""

from __future__ import annotations

import hashlib

import pytest

from nifi_hive_schema_generator_bundle_spark.operators.packing import (
    hex_bucket,
    pack_sequences,
)

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_hand_computed_single_bucket(spark):
    # token counts: 4, 5, 3, 7, 0 — budget 10, one bucket ⇒ stream is
    # deterministic by doc_id: offsets 0, 4, 9, 12, 19
    df = _docs(
        spark,
        [
            (1, "a b c d"),
            (2, "e f g h i"),
            (3, "j k l"),
            (4, "m n o p q r s"),
            (5, "   "),
        ],
    )
    got = {
        r.doc_id: (r.n_tokens, r.seq_no, r.seq_offset, r.n_seqs)
        for r in pack_sequences(df, token_budget=10, n_buckets=1).collect()
    }
    assert got[1] == (4, 0, 0, 1)
    assert got[2] == (5, 0, 4, 1)
    # doc 3 starts at offset 9, spans the 10-token boundary into seq 1
    assert got[3] == (3, 0, 9, 2)
    assert got[4] == (7, 1, 2, 1)
    # empty doc: starts where the stream is, occupies nothing
    assert got[5] == (0, 1, 9, 0)


def test_pack_totals_are_budget_consistent(spark, sf_smoke_dir):
    docs = spark.read.parquet(f"{sf_smoke_dir}/documents.parquet")
    out = pack_sequences(docs, token_budget=64, n_buckets=16).cache()
    # per bucket: last doc's end == total tokens in the bucket
    per_bucket = (
        out.groupBy("bucket")
        .agg(
            F.sum("n_tokens").alias("total"),
            F.max(
                F.col("seq_no") * 64 + F.col("seq_offset") + F.col("n_tokens")
            ).alias("stream_end"),
        )
        .collect()
    )
    assert per_bucket, "expected at least one bucket"
    for r in per_bucket:
        assert r.total == r.stream_end
    out.unpersist()


def test_hex_bucket_matches_md5_and_bounds(spark):
    df = spark.range(200).select(
        F.col("id"), hex_bucket(F.col("id"), 7).alias("b")
    )
    for r in df.collect():
        expect = int(hashlib.md5(str(r.id).encode()).hexdigest()[:2], 16) % 7
        assert r.b == expect


def test_pack_rejects_bad_params(spark):
    df = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        pack_sequences(df, token_budget=0)
    with pytest.raises(ValueError):
        pack_sequences(df, n_buckets=0)


def test_chunk_documents_hand_computed(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.packing import (
        chunk_documents,
    )

    # 10 tokens, chunk 4, overlap 1 -> step 3 -> chunks at 0,3,6 cover
    # t0..t9? ceil((10-4)/3)+1 = 3 chunks: [0:4), [3:7), [6:10)
    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    got = {(r.doc_id, r.chunk_idx): (r.n_chunk_tokens, r.chunk_text) for r in rows}
    assert got[(1, 0)] == (4, "t0 t1 t2 t3")
    assert got[(1, 1)] == (4, "t3 t4 t5 t6")
    assert got[(1, 2)] == (4, "t6 t7 t8 t9")
    # short doc: one (short) chunk; empty doc: no rows
    assert got[(2, 0)] == (2, "a b")
    assert {d for d, _ in got} == {1, 2}
    # every token index is covered by at least one chunk
    covered = set()
    for (d, i), (nt, _) in got.items():
        if d == 1:
            covered |= set(range(i * 3, i * 3 + nt))
    assert covered == set(range(10))


def test_chunk_documents_rejects_bad_params(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.packing import (
        chunk_documents,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


@pytest.mark.parametrize("n_tokens,chunk,overlap", [
    (1, 4, 1), (4, 4, 1), (5, 4, 1), (9, 4, 3), (100, 16, 0), (97, 16, 5),
])
def test_chunk_reconstruction_property(spark, n_tokens, chunk, overlap):
    """Dropping each chunk's first `overlap` tokens (except chunk 0) and
    concatenating must reproduce the original token stream exactly —
    the no-loss/no-duplication invariant for any (chunk, overlap)."""
    from nifi_hive_schema_generator_bundle_spark.operators.packing import (
        chunk_documents,
    )

    toks = [f"w{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r.chunk_idx,
    )
    step = chunk - overlap
    rebuilt = []
    for r in rows:
        ctoks = r.chunk_text.split(" ") if r.chunk_text else []
        assert len(ctoks) == r.n_chunk_tokens
        rebuilt.extend(ctoks if r.chunk_idx == 0 else ctoks[overlap:])
        # every chunk except possibly the last is exactly chunk_tokens
        if r.chunk_idx < len(rows) - 1:
            assert r.n_chunk_tokens == chunk
        # chunks start where the step schedule says
        assert ctoks == toks[r.chunk_idx * step : r.chunk_idx * step + chunk]
    assert rebuilt == toks


def test_cdc_chunks_shift_resistant_and_reconstruct(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.packing import (
        cdc_chunk_documents,
    )
    from pyspark.sql import functions as F

    base = " ".join(f"w{i % 37}tok{i % 11}" for i in range(200))
    shifted = "inserted prefix paragraph here . " + base
    df = spark.createDataFrame(
        [(0, base), (1, shifted), (2, ""), (3, "tiny doc")],
        "doc_id long, text string",
    )
    out = cdc_chunk_documents(df).cache()
    # empty docs yield nothing; short docs one whole chunk
    by_doc = {r["doc_id"]: r["n"] for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert 2 not in by_doc and by_doc[3] == 1
    # chunks reconstruct the normalized token stream exactly
    rec = (
        out.filter("doc_id=0").orderBy("chunk_idx")
        .agg(F.concat_ws(" ", F.collect_list("chunk_text"))).collect()[0][0]
    )
    assert rec == base
    # token counts partition the doc
    assert (
        out.filter("doc_id=0").agg(F.sum("n_chunk_tokens")).collect()[0][0] == 200
    )
    # the defining property: a head insertion leaves most chunk hashes intact
    h0 = {r["chunk_md5"] for r in out.filter("doc_id=0").collect()}
    h1 = {r["chunk_md5"] for r in out.filter("doc_id=1").collect()}
    assert len(h0 & h1) >= len(h0) - 2


def test_cdc_chunks_validates_params(spark):
    import pytest as _pytest

    from nifi_hive_schema_generator_bundle_spark.operators.packing import (
        cdc_chunk_documents,
    )

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        cdc_chunk_documents(df, window=0)
    with _pytest.raises(ValueError):
        cdc_chunk_documents(df, modulus=1)


class TestSpanCorruption:
    def test_hand_computed_blocks(self, spark):
        import hashlib

        from nifi_hive_schema_generator_bundle_spark.operators.packing import (
            span_corruption,
        )

        toks = [f"t{i}" for i in range(12)]  # 2 full blocks of 5 + tail 2
        df = spark.createDataFrame(
            [(7, " ".join(toks))], "doc_id int, text string"
        )
        r = span_corruption(df, block=5, span=2, seed=1).collect()[0]
        width = 5 - 2 + 1

        def off(j):
            h = hashlib.md5(f"1:7:{j}".encode()).hexdigest()[:8]
            return int(h, 16) % width

        exp_input, exp_target = [], []
        for j in (0, 1):
            o = off(j)
            blk = toks[j * 5 : (j + 1) * 5]
            exp_input += blk[:o] + [f"<extra_id_{j}>"] + blk[o + 2 :]
            exp_target += [f"<extra_id_{j}>"] + blk[o : o + 2]
        exp_input += toks[10:]
        assert r.n_spans == 2
        assert r.input_text == " ".join(exp_input)
        assert r.target_text == " ".join(exp_target)
        # masked tokens are exactly the ones missing from the input
        assert set(toks) - set(r.input_text.split()) == set(
            r.target_text.split()
        ) - {"<extra_id_0>", "<extra_id_1>"}

    def test_short_doc_passthrough_and_determinism(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.packing import (
            span_corruption,
        )

        df = spark.createDataFrame(
            [(1, "a b c"), (2, "")], "doc_id int, text string"
        )
        out = {r.doc_id: r for r in span_corruption(df, block=5).collect()}
        assert out[1].n_spans == 0 and out[1].input_text == "a b c"
        assert out[1].target_text == ""
        assert out[2].input_text == "" and out[2].n_spans == 0
        # same input -> bit-identical output across repartitionings
        big = spark.createDataFrame(
            [(i, "w " * 50) for i in range(20)], "doc_id int, text string"
        )
        a = sorted(map(tuple, span_corruption(big).collect()))
        b = sorted(map(tuple, span_corruption(big.repartition(7)).collect()))
        assert a == b

    def test_density_and_guards(self, spark):
        import pytest as _pytest

        from nifi_hive_schema_generator_bundle_spark.operators.packing import (
            span_corruption,
        )

        df = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(200)))],
            "doc_id int, text string",
        )
        r = span_corruption(df).collect()[0]  # block=20, span=3
        assert r.n_spans == 10
        masked = len(r.target_text.split()) - r.n_spans
        assert masked == 30  # exactly 15% of 200
        with _pytest.raises(ValueError):
            span_corruption(df, block=3, span=3)

    def test_no_shuffle_no_udf_plan(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.packing import (
            span_corruption,
        )

        df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
        plan = (
            span_corruption(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan and "BatchEval" not in plan


class TestFimTransform:
    def test_hand_computed_split(self, spark):
        import hashlib

        from nifi_hive_schema_generator_bundle_spark.operators.packing import (
            fim_transform,
        )

        toks = [f"t{i}" for i in range(10)]
        df = spark.createDataFrame(
            [(3, " ".join(toks))], "doc_id int, text string"
        )
        r = fim_transform(df, fim_rate=1.0, seed=9).collect()[0]

        def h(tag):
            return int(
                hashlib.md5(f"9:3:{tag}".encode()).hexdigest()[:8], 16
            )

        c1, c2 = h("a") % 11, h("b") % 11
        lo, hi = min(c1, c2), max(c1, c2)
        exp = (
            "<fim_prefix> " + " ".join(toks[:lo])
            + " <fim_suffix> " + " ".join(toks[hi:])
            + " <fim_middle> " + " ".join(toks[lo:hi])
        )
        assert r.fim_applied and r.output_text == exp
        # every original token survives exactly once
        body = [t for t in r.output_text.split() if not t.startswith("<fim_")]
        assert sorted(body) == sorted(toks)

    def test_rate_selection_and_passthrough(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.packing import (
            fim_transform,
        )

        df = spark.createDataFrame(
            [(i, "a b c d e") for i in range(200)],
            "doc_id int, text string",
        )
        out = fim_transform(df, fim_rate=0.3).collect()
        applied = sum(r.fim_applied for r in out)
        assert 40 <= applied <= 80  # ~30% of 200, md5-uniform
        for r in out:
            if not r.fim_applied:
                assert r.output_text == "a b c d e"
        none = fim_transform(df, fim_rate=0.0).collect()
        assert not any(r.fim_applied for r in none)
        # determinism across layouts
        a = sorted(map(tuple, fim_transform(df).collect()))
        b = sorted(map(tuple, fim_transform(df.repartition(7)).collect()))
        assert a == b

    def test_no_shuffle_no_udf_plan(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.packing import (
            fim_transform,
        )

        df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
        plan = (
            fim_transform(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan and "BatchEval" not in plan
