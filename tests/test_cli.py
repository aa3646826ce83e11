"""CLI surface (`python -m nifi_hive_schema_generator_bundle_spark`) driven in-process —
getOrCreate reuses the test session, so no extra JVM spins up."""

from __future__ import annotations

from nifi_hive_schema_generator_bundle_spark.__main__ import main


def _fixture(tmp_path):
    p = tmp_path / "in.ndjson"
    p.write_text(
        '{"id": 1, "tags": ["a"], "tbl": "t_one"}\n'
        '{"id": "x", "tbl": "t_one"}\n'
        "not json\n"
        '{"id": 3, "tbl": "t_two", "extra": {"k": 1}}\n'
    )
    return str(p)


def test_cli_infer(spark, tmp_path, capsys):
    rc = main(["infer", _fixture(tmp_path), "--table", "cli_t", "--location", "/x"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "CREATE EXTERNAL TABLE cli_t (" in out
    assert "`id` STRING" in out


def test_cli_route_with_quarantine(spark, tmp_path, capsys):
    q = str(tmp_path / "bad")
    rc = main(["route", _fixture(tmp_path), "--quarantine", q])
    assert rc == 0
    assert "valid=3 invalid=1" in capsys.readouterr().out
    bad = spark.read.text(q).collect()
    assert [r["value"] for r in bad] == ["not json"]


def test_cli_group(spark, tmp_path, capsys):
    rc = main(["group", _fixture(tmp_path), "--table-col", "tbl"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "CREATE EXTERNAL TABLE t_one (" in out
    assert "CREATE EXTERNAL TABLE t_two (" in out
    # the corrupt line has no routing value -> no DDL group for it
    assert "None" not in out


def test_cli_group_keeps_group_local_types(spark, tmp_path, capsys):
    """Regression: a file-wide json read would unify x across groups and
    demote t_arr's ARRAY to STRING; per-group inference on raw lines must
    not."""
    p = tmp_path / "mix.ndjson"
    p.write_text(
        '{"x": [1, 2], "tbl": "t_arr"}\n'
        '{"x": 5, "tbl": "t_scalar"}\n'
    )
    rc = main(["group", str(p), "--table-col", "tbl"])
    out = capsys.readouterr().out
    assert rc == 0
    arr_ddl = out.split("CREATE EXTERNAL TABLE t_arr (")[1].split(") ROW")[0]
    scalar_ddl = out.split("CREATE EXTERNAL TABLE t_scalar (")[1].split(") ROW")[0]
    assert "`x` ARRAY<" in arr_ddl
    assert "`x` STRING" in scalar_ddl


def test_cli_convert_roundtrip(spark, sf_smoke_dir, tmp_path):
    from nifi_hive_schema_generator_bundle_spark.__main__ import main

    src = str(tmp_path / "src")
    spark.read.parquet(f"{sf_smoke_dir}/documents.parquet").select(
        "doc_id", "lang"
    ).limit(30).write.parquet(src)
    out = str(tmp_path / "out")
    rc = main([
        "--master", "local[2]",
        "convert", src, out, "--from-fmt", "parquet", "--to-fmt", "json",
    ])
    assert rc == 0
    assert spark.read.json(out).count() == 30


def test_cli_sample_split_writes_both_partitions(spark, sf_smoke_dir, tmp_path):
    import os

    from nifi_hive_schema_generator_bundle_spark.__main__ import main

    src = str(tmp_path / "src2")
    spark.read.parquet(f"{sf_smoke_dir}/documents.parquet").select(
        "doc_id", "lang"
    ).write.parquet(src)
    out = str(tmp_path / "out2")
    rc = main([
        "--master", "local[2]",
        "sample", src, out, "--key", "doc_id", "--mode", "split",
    ])
    assert rc == 0
    parts = {d for d in os.listdir(out) if d.startswith("split=")}
    assert parts == {"split=train", "split=holdout"}


def test_cli_stream_prints_ddl_and_counts(tmp_path, capsys):
    from nifi_hive_schema_generator_bundle_spark.__main__ import main

    src = tmp_path / "ssrc"
    src.mkdir()
    (src / "b.json").write_text('{"a": 1}\n{"a": 2, "b": "x"}\nnot json\n')
    rc = main([
        "--master", "local[2]",
        "stream", str(src),
        "--table", "st", "--location", "/warehouse/st",
        "--checkpoint", str(tmp_path / "ck"),
        "--quarantine", str(tmp_path / "bad"),
        "--timeout", "120",
    ])
    assert rc == 0
    out = capsys.readouterr()
    assert "CREATE EXTERNAL TABLE st" in out.out
    assert "`a` STRING" in out.out and "`b` STRING" in out.out
    assert "good=2 bad=1" in out.err


def test_cli_stream_timeout_stops_query_and_exits_nonzero(tmp_path, capsys):
    """An availableNow drain that outruns --timeout must not be abandoned:
    the query is stopped, the partial state is flagged on stderr, the exit
    code is non-zero, and no literal 'None' DDL line is printed."""
    from nifi_hive_schema_generator_bundle_spark.__main__ import main

    src = tmp_path / "ssrc"
    src.mkdir()
    # deterministic, not load-dependent: one file per micro-batch forces
    # 40 sequential foreachBatch rounds, which cannot complete inside the
    # 1-second timeout on any machine (awaitTermination rejects <= 0, so
    # 1 is the floor)
    for i in range(40):
        (src / f"b{i}.json").write_text('{"a": %d}\n' % i)
    rc = main([
        "--master", "local[2]",
        "stream", str(src),
        "--table", "st2", "--location", "/warehouse/st2",
        "--checkpoint", str(tmp_path / "ck2"),
        "--timeout", "1",
        "--max-files-per-trigger", "1",
    ])
    assert rc == 3
    out = capsys.readouterr()
    assert "did not drain" in out.err
    assert "None" not in out.out.splitlines()


def test_cli_dedup_exact(spark, tmp_path, capsys):
    src = str(tmp_path / "docs_in")
    spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")],
        "doc_id long, text string",
    ).write.parquet(src)
    out_dir = str(tmp_path / "docs_out")
    rc = main(["dedup", src, out_dir, "--method", "exact"])
    assert rc == 0
    assert "kept 2/3 (exact)" in capsys.readouterr().err
    kept = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert kept == {1, 3}  # min id per duplicate group survives


def test_cli_dedup_minhash(spark, tmp_path, capsys):
    base = "the quick brown fox jumps over the lazy dog " * 8
    src = str(tmp_path / "near_in")
    spark.createDataFrame(
        [(1, base), (2, base + "tail"), (3, "completely different words " * 10)],
        "doc_id long, text string",
    ).write.parquet(src)
    out_dir = str(tmp_path / "near_out")
    rc = main(["dedup", src, out_dir, "--method", "minhash", "--threshold", "0.5"])
    assert rc == 0
    assert "kept 2/3 (minhash)" in capsys.readouterr().err
    kept = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert kept == {1, 3}


def test_cli_profile(spark, tmp_path, capsys):
    src = str(tmp_path / "prof_in")
    spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "id long, v string"
    ).write.parquet(src)
    rc = main(["profile", src])
    out = capsys.readouterr().out
    assert rc == 0
    assert "id  n=3  null=0  distinct=3  min=1  max=3" in out
    assert "v   n=3  null=1  distinct=2  min=a  max=c" in out


def test_cli_explain_prints_formatted_plan(spark, capsys, sf_smoke_dir):
    rc = main(["explain", "q1_pricing_summary", "--sf-dir", sf_smoke_dir])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Physical Plan" in out and "HashAggregate" in out


def test_cli_explain_unknown_query(spark, capsys):
    rc = main(["explain", "no_such_query"])
    assert rc == 2
    assert "unknown query" in capsys.readouterr().err


def test_cli_prep_full_pipeline(spark, tmp_path, capsys):
    def sent(w):
        # stopword-rich and long enough for the quality bar, with the
        # doc's unique word in every 2nd position so no 8-gram is shared
        # between docs built from different words
        stops = "the and of to a in is that for it".split()
        return (" ".join(f"{w} {s}" for s in stops) + " ") * 3

    a = sent("alpha")
    b = sent("bravo")
    c = sent("charlie")
    src = str(tmp_path / "prep_in")
    ev_dir = str(tmp_path / "prep_eval")
    spark.createDataFrame(
        [(1, a), (2, a), (3, b), (4, "!!! ??? !!!"), (5, c)],
        "doc_id long, text string",
    ).write.parquet(src)
    spark.createDataFrame(
        [(99, c)], "doc_id long, text string"
    ).write.parquet(ev_dir)
    out_dir = str(tmp_path / "prep_out")
    rc = main([
        "prep", src, out_dir, "--eval-dir", ev_dir, "--quality-min", "0.5",
    ])
    err = capsys.readouterr().err
    assert rc == 0
    assert "input: 5" in err and "quality: 4" in err
    assert "dedup: 3" in err and "decontam: 2" in err
    out = spark.read.parquet(out_dir)
    assert {r.doc_id for r in out.collect()} == {1, 3}
    assert set(out.columns) >= {"doc_id", "text", "split"}


def test_cli_compact_reduces_file_count(spark, tmp_path, capsys):
    src = str(tmp_path / "many_files")
    spark.range(2000).selectExpr("id", "id * 2 AS v").repartition(16).write.parquet(src)
    import glob
    before = len(glob.glob(f"{src}/*.parquet"))
    rc = main(["compact", src, "--target-file-mb", "64"])
    assert rc == 0
    assert "compacted" in capsys.readouterr().err
    after = len(glob.glob(f"{src}/*.parquet"))
    assert before == 16 and after < before
    assert spark.read.parquet(src).count() == 2000


def test_cli_sql_adhoc_over_tables(spark, sf_smoke_dir, capsys):
    rc = main([
        "sql",
        "SELECT r_name, count(*) AS n FROM region GROUP BY r_name ORDER BY r_name",
        "--tables-dir", sf_smoke_dir,
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "AFRICA" in out and "n" in out


def test_cli_sql_empty_dir_errors(spark, tmp_path, capsys):
    rc = main(["sql", "SELECT 1", "--tables-dir", str(tmp_path)])
    assert rc == 2
    assert "no *.parquet" in capsys.readouterr().err


def test_cli_mixture(spark, tmp_path, capsys):
    src = str(tmp_path / "mx_in")
    dst = str(tmp_path / "mx_out")
    rows = [(i, "en" if i % 2 == 0 else "fr") for i in range(400)]
    spark.createDataFrame(rows, "doc_id long, lang string").write.parquet(src)
    rc = main(
        ["mixture", src, dst, "--targets", "en=0.5,fr=0.5", "--key", "doc_id"]
    )
    err = capsys.readouterr().err
    assert rc == 0 and "kept" in err
    got = spark.read.parquet(dst)
    counts = dict(got.groupBy("lang").count().rdd.map(lambda r: (r[0], r[1])).collect())
    assert set(counts) == {"en", "fr"}
    assert abs(counts["en"] - counts["fr"]) < 100


def test_cli_select_budget(spark, tmp_path, capsys):
    src = str(tmp_path / "sel_in")
    dst = str(tmp_path / "sel_out")
    rows = [
        (i, " ".join(f"t{i}w{j % (1 + i // 2)}" for j in range(60)))
        for i in range(50)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    rc = main(["select", src, dst, "--budget", "900"])
    err = capsys.readouterr().err
    assert rc == 0 and "selected" in err
    kept = spark.read.parquet(dst).count()
    assert 0 < kept <= 15  # 60 tokens/doc, 900-token budget


def test_cli_drift_report(spark, tmp_path, capsys):
    src = str(tmp_path / "dr_in")
    rows = [
        ("a", '{"x": 1}'),
        ("b", '{"x": [1]}'),
        ("c", '{"y": 2}'),
    ]
    spark.createDataFrame(rows, "grp string, payload string").write.parquet(src)
    rc = main(["drift", src, "--json-col", "payload", "--group-col", "grp"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "retyped" in out and "absent" in out


def test_cli_spans_stats_and_remove(spark, tmp_path, capsys):
    shared = "the quick brown fox jumps over"
    src = str(tmp_path / "spans_in")
    spark.createDataFrame(
        [(1, shared + " alpha beta gamma delta epsilon"),
         (2, "zeta eta theta iota kappa " + shared)],
        "doc_id long, text string",
    ).write.parquet(src)

    out_stats = str(tmp_path / "spans_stats")
    rc = main(["spans", src, out_stats])
    assert rc == 0
    assert "duplicated-span coverage: 12/22 tokens" in capsys.readouterr().err
    stats = {r.doc_id: r.dup_tokens for r in spark.read.parquet(out_stats).collect()}
    assert stats == {1: 6, 2: 6}

    out_rm = str(tmp_path / "spans_rm")
    rc = main(["spans", src, out_rm, "--remove"])
    assert rc == 0
    assert "kept 16/22 tokens" in capsys.readouterr().err
    rows = {r.doc_id: r.text for r in spark.read.parquet(out_rm).collect()}
    assert rows[1].startswith(shared)          # first occurrence intact
    assert shared not in rows[2]               # second occurrence excised


def test_cli_wsample(spark, tmp_path, capsys):
    src = str(tmp_path / "ws_in")
    spark.createDataFrame(
        [(i, float(1 + i % 3)) for i in range(30)],
        "doc_id long, quality double",
    ).write.parquet(src)
    out_dir = str(tmp_path / "ws_out")
    rc = main(["wsample", src, out_dir, "--n", "5", "--weight-col", "quality"])
    assert rc == 0
    assert "sampled 5 rows (weight: quality)" in capsys.readouterr().err
    assert spark.read.parquet(out_dir).count() == 5


def test_cli_check_gate_semantics(spark, tmp_path, capsys):
    import json as _json

    data = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", -2.0), (3, "a", 1.0)],
        "id long, status string, v double",
    ).write.parquet(data)
    rc = main([
        "check", data,
        "--not-null", "id",
        "--unique", "id",
        "--range", "v:0:10",
        "--accepted", "status:a|b",
    ])
    out = capsys.readouterr().out
    assert rc == 1  # unique + range fail → gate exit code
    assert "FAIL  unique" in out and "FAIL  range" in out
    assert "PASS  not_null" in out and "PASS  accepted_values" in out

    clean = str(tmp_path / "clean.parquet")
    spark.createDataFrame([(1,), (2,)], "id long").write.parquet(clean)
    rc2 = main(["check", clean, "--not-null", "id", "--unique", "id"])
    assert rc2 == 0


def test_cli_check_ref_and_completeness(spark, tmp_path, capsys):
    import datetime

    child = str(tmp_path / "child.parquet")
    parent = str(tmp_path / "parent.parquet")
    spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1)), (9, datetime.datetime(2024, 1, 3))],
        "fk long, ts timestamp",
    ).write.parquet(child)
    spark.createDataFrame([(1,), (2,)], "fk long").write.parquet(parent)
    rc = main([
        "check", child,
        "--ref", f"fk:{parent}:fk",
        "--completeness", "ts",
    ])
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL  ref_integrity" in out
    assert "missing=2024-01-02" in out


def test_cli_classify_writes_scores(spark, tmp_path, capsys):
    import json as _json

    data = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "good fast text"), (2, "bad slow text")],
        "doc_id long, text string",
    ).write.parquet(data)
    model = tmp_path / "model.json"
    model.write_text(_json.dumps(
        {"bias": 0.0, "weights": {"fast": 1.0, "slow": -1.0}}
    ))
    out_path = str(tmp_path / "scored")
    rc = main(["classify", data, out_path, "--model", str(model)])
    assert rc == 0
    scored = {r["doc_id"]: r["quality_prob"] for r in spark.read.parquet(out_path).collect()}
    assert scored[1] > 0.5 > scored[2]


def test_cli_scrub_redacts_and_reports(spark, tmp_path, capsys):
    data = str(tmp_path / "pii.parquet")
    spark.createDataFrame(
        [(1, "mail a@b.co call 25-989-741-2988"), (2, "clean")],
        "doc_id long, text string",
    ).write.parquet(data)
    out_path = str(tmp_path / "scrubbed")
    rc = main(["scrub", data, out_path, "--kinds", "email,phone"])
    assert rc == 0
    rows = {r["doc_id"]: r["text"] for r in spark.read.parquet(out_path).collect()}
    assert rows[1] == "mail <EMAIL> call <PHONE>"
    assert rows[2] == "clean"
    err = capsys.readouterr().err
    assert "email=1" in err and "phone=1" in err


def test_cli_scrub_rejects_unknown_kind(spark, tmp_path):
    data = str(tmp_path / "d.parquet")
    spark.createDataFrame([(1, "x")], "doc_id long, text string").write.parquet(data)
    assert main(["scrub", data, str(tmp_path / "o"), "--kinds", "ssn"]) == 2


def test_cli_bpe_train_writes_loadable_merges(spark, tmp_path, capsys):
    from nifi_hive_schema_generator_bundle_spark.functions.bpe import load_merges

    data = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "spark spark spark"), (2, "spark batch")],
        "doc_id long, text string",
    ).write.parquet(data)
    out = tmp_path / "merges.txt"
    rc = main(["bpe-train", data, str(out), "--n-merges", "4"])
    assert rc == 0
    merges = load_merges(str(out))
    assert len(merges) == 4
    # every 'spark' pair counts 4; the (count DESC, left, right) tie-break
    # picks the lexicographically smallest — (a,r)
    assert merges[0] == ("a", "r")


def test_cli_bloomdedup_keeps_only_new(spark, tmp_path, capsys):
    old = str(tmp_path / "old.parquet")
    new = str(tmp_path / "new.parquet")
    spark.createDataFrame(
        [(1, "shared"), (2, "old only")], "doc_id long, text string"
    ).write.parquet(old)
    spark.createDataFrame(
        [(10, "shared"), (11, "brand new")], "doc_id long, text string"
    ).write.parquet(new)
    out_path = str(tmp_path / "kept")
    rc = main(["bloomdedup", new, old, out_path])
    assert rc == 0
    kept = [r["doc_id"] for r in spark.read.parquet(out_path).collect()]
    assert kept == [11]
    assert "kept 1/2" in capsys.readouterr().err


def test_cli_upsample_repeats_rows(spark, tmp_path, capsys):
    data = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, "en") for i in range(10)], "doc_id long, lang string"
    ).write.parquet(data)
    out_path = str(tmp_path / "up")
    rc = main(["upsample", data, out_path, "--factor", "en:2.0"])
    assert rc == 0
    out = spark.read.parquet(out_path)
    assert out.count() == 20
    assert sorted(r["copy_no"] for r in out.filter("doc_id = 3").collect()) == [0, 1]


def test_cli_clean_normalizes_text(spark, tmp_path, capsys):
    data = str(tmp_path / "dirty.parquet")
    spark.createDataFrame(
        [(1, "\t a\x00b  c \n"), (2, "already clean")],
        "doc_id long, text string",
    ).write.parquet(data)
    out_path = str(tmp_path / "cleaned")
    rc = main(["clean", data, out_path])
    assert rc == 0
    rows = {r["doc_id"]: r["text"] for r in spark.read.parquet(out_path).collect()}
    assert rows[1] == "ab c"
    assert rows[2] == "already clean"
    assert "1 rows changed" in capsys.readouterr().err


def test_cli_impute_mean_fills_and_reports(spark, tmp_path, capsys):
    data = str(tmp_path / "holes.parquet")
    spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, None), ("a", 3, 20.0)],
        "g string, id int, v double",
    ).write.parquet(data)
    out_path = str(tmp_path / "filled")
    rc = main(["impute", data, out_path, "--cols", "v", "--group-cols", "g"])
    assert rc == 0
    rows = {r["id"]: (r["v"], r["v_was_null"]) for r in spark.read.parquet(out_path).collect()}
    assert rows[2] == (15.0, True)
    assert rows[1] == (10.0, False)
    assert "v=1 filled" in capsys.readouterr().err


def test_cli_impute_mode_categorical(spark, tmp_path):
    data = str(tmp_path / "cat.parquet")
    spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "x"), ("a", 3, None)],
        "g string, id int, v string",
    ).write.parquet(data)
    out_path = str(tmp_path / "modefilled")
    rc = main(["impute", data, out_path, "--cols", "v", "--group-cols", "g",
               "--strategy", "mode"])
    assert rc == 0
    rows = {r["id"]: r["v"] for r in spark.read.parquet(out_path).collect()}
    assert rows[3] == "x"


def test_cli_dedup_sentence_rewrites_text(spark, tmp_path, capsys):
    data = str(tmp_path / "sd.parquet")
    spark.createDataFrame(
        [(1, "Subscribe now. Content one."), (2, "Subscribe now. Content two.")],
        "doc_id long, text string",
    ).write.parquet(data)
    out_path = str(tmp_path / "sdd")
    rc = main(["dedup", data, out_path, "--method", "sentence"])
    assert rc == 0
    rows = {r["doc_id"]: r["text"] for r in spark.read.parquet(out_path).collect()}
    assert rows[1] == "Subscribe now. Content one."
    assert rows[2] == "Content two."
    assert "kept 2/2" in capsys.readouterr().err


def test_cli_mixture_alpha_temperature(spark, tmp_path, capsys):
    data = str(tmp_path / "tmix.parquet")
    rows = [(i, "en" if i < 64 else "xx") for i in range(68)]
    spark.createDataFrame(rows, "doc_id long, lang string").write.parquet(data)
    out_path = str(tmp_path / "tempered")
    rc = main(["mixture", data, out_path, "--alpha", "0.5"])
    assert rc == 0
    got = {
        r["lang"]: r["count"]
        for r in spark.read.parquet(out_path).groupBy("lang").count().collect()
    }
    assert got["xx"] == 4 and got["en"] < 64


def test_cli_mixture_requires_exactly_one_mode(spark, tmp_path):
    data = str(tmp_path / "m.parquet")
    spark.createDataFrame([(1, "en")], "doc_id long, lang string").write.parquet(data)
    assert main(["mixture", data, str(tmp_path / "o")]) == 2
    assert main(["mixture", data, str(tmp_path / "o"),
                 "--targets", "en=1.0", "--alpha", "0.5"]) == 2


def test_cli_prep_blocklist_stage(spark, tmp_path, capsys):
    data = str(tmp_path / "bl.parquet")
    good = "the cat and the dog sat in a house near the tree today fine"
    spark.createDataFrame(
        [(1, good), (2, good + " badword")],
        "doc_id long, text string",
    ).write.parquet(data)
    bl = tmp_path / "bl.txt"
    bl.write_text("badword\n")
    out_path = str(tmp_path / "prepped")
    rc = main(["prep", data, out_path, "--blocklist", str(bl),
               "--quality-min", "0.0"])
    assert rc == 0
    kept = [r["doc_id"] for r in spark.read.parquet(out_path).collect()]
    assert kept == [1]
    assert "blocklist: 1" in capsys.readouterr().err


def test_cli_fit_classifier_then_classify_roundtrip(spark, tmp_path, capsys):
    import json

    data = str(tmp_path / "labeled.parquet")
    rows = [
        (i, "good clean prose" if i % 2 == 0 else "spam junk noise", i % 2 == 0)
        for i in range(40)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, label boolean"
    ).write.parquet(data)
    model_path = str(tmp_path / "model.json")
    rc = main([
        "fit-classifier", data, "--model", model_path,
        "--label-col", "label", "--iters", "8", "--lr", "2.0",
    ])
    assert rc == 0
    model = json.loads(open(model_path).read())
    assert model["weights"]["good"] > 0 > model["weights"]["spam"]
    assert "fit" in capsys.readouterr().err

    scored = str(tmp_path / "scored")
    rc = main(["classify", data, scored, "--model", model_path])
    assert rc == 0
    got = {r["doc_id"]: r["quality_prob"] for r in spark.read.parquet(scored).collect()}
    assert got[0] > 0.5 > got[1]


def test_cli_dsir_weights(spark, tmp_path, capsys):
    data = str(tmp_path / "docs.parquet")
    rows = [
        (i, "alpha beta gamma delta" if i % 3 == 0 else "zig zag zog zip",
         "wiki" if i % 3 == 0 else "crawl")
        for i in range(30)
    ] + [(100, "alpha beta gamma delta", "crawl"), (101, "zig zag zog zip", "crawl")]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.parquet(data)
    out = str(tmp_path / "weights")
    rc = main(["dsir", data, out, "--target", "source = 'wiki'"])
    assert rc == 0
    got = {r["doc_id"]: r["dsir_weight"] for r in spark.read.parquet(out).collect()}
    # the crawl doc written in the wiki vocabulary outscores the off-domain one
    assert got[100] > got[101]
    assert "weighted 32 docs" in capsys.readouterr().err


def test_cli_leakage_gate(spark, tmp_path, capsys):
    data = str(tmp_path / "split.parquet")
    rows = [
        (1, "dup text", "train"),
        (2, "dup text", "holdout"),
        (3, "clean a", "train"),
        (4, "clean b", "holdout"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, split string"
    ).write.parquet(data)
    rc = main(["leakage", data])
    out = capsys.readouterr().out
    assert rc == 1  # leak -> non-zero exit (gate contract)
    assert "leaked fingerprints: 1" in out
    assert "train=1  holdout=1" in out

    clean = str(tmp_path / "clean.parquet")
    spark.createDataFrame(
        [(3, "clean a", "train"), (4, "clean b", "holdout")],
        "doc_id long, text string, split string",
    ).write.parquet(clean)
    assert main(["leakage", clean]) == 0


def test_cli_urls_normalize(spark, tmp_path, capsys):
    src = str(tmp_path / "urls_in")
    spark.createDataFrame(
        [
            (1, "HTTP://WWW.Ex.COM:80/a?utm_source=x&b=2&a=1#f"),
            (2, "not a url"),
        ],
        "id long, url string",
    ).write.parquet(src)
    out_dir = str(tmp_path / "urls_out")
    rc = main([
        "urls", src, out_dir,
        "--url-col", "url", "--host-col", "host", "--domain-col", "dom",
    ])
    assert rc == 0
    rows = {r.id: r for r in spark.read.parquet(out_dir).collect()}
    assert rows[1].url == "http://www.ex.com/a?a=1&b=2"
    assert rows[1].host == "www.ex.com"
    assert rows[1].dom == "ex.com"
    assert rows[2].url == "not a url"
    assert rows[2].host == "" and rows[2].dom == ""


def test_cli_clean_unicode_form(spark, tmp_path):
    src = str(tmp_path / "uc_in")
    # decomposed e + combining acute; NFC must precompose it
    spark.createDataFrame(
        [(1, "Café  x")], "id long, text string"
    ).write.parquet(src)
    out_dir = str(tmp_path / "uc_out")
    rc = main(["clean", src, out_dir, "--unicode-form", "NFC"])
    assert rc == 0
    got = spark.read.parquet(out_dir).collect()[0].text
    assert got == "Café x"  # cleaned whitespace AND precomposed


def test_cli_htmlextract(spark, tmp_path):
    inp, out = str(tmp_path / "h_in"), str(tmp_path / "h_out")
    spark.createDataFrame(
        [
            (1, "<html><body><p>Hello &amp; goodbye.</p></body></html>"),
            (2, "<div><script>var x;</script>visible<br/>line</div>"),
        ],
        "id int, text string",
    ).write.parquet(inp)
    rc = main(["htmlextract", inp, out])
    assert rc == 0
    rows = {r.id: r.text for r in spark.read.parquet(out).collect()}
    assert rows[1] == "Hello & goodbye."
    assert rows[2] == "visible\nline"


def test_cli_shard(spark, sf_smoke_dir, tmp_path, capsys):
    rc = main([
        "shard", f"{sf_smoke_dir}/documents.parquet", str(tmp_path / "sh"),
        "--key", "doc_id", "--n-shards", "3", "--token-col", "n_chars",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    lines = [ln for ln in out.splitlines() if ln.startswith("shard=")]
    assert len(lines) == 3
    assert sum(int(ln.split("rows=")[1].split()[0]) for ln in lines) == 500


def test_cli_chatcheck(spark, tmp_path, capsys):
    import json

    src = tmp_path / "chats.jsonl"
    src.write_text("\n".join([
        json.dumps({"conversation_id": "a", "messages": [
            {"role": "user", "content": "x"},
            {"role": "assistant", "content": "y"}]}),
        "broken {",
        json.dumps({"conversation_id": "b", "messages": [
            {"role": "user", "content": "x"},
            {"role": "user", "content": "again"}]}),
    ]) + "\n")
    q = str(tmp_path / "quar")
    rc = main(["chatcheck", str(src), "--quarantine", q])
    out = capsys.readouterr().out
    assert rc == 0
    assert "good=1 bad_json=1 invalid=1" in out
    assert "violation=no_alternation n=1" in out
    import glob

    assert glob.glob(f"{q}/bad_json/part-*")
    assert glob.glob(f"{q}/invalid/part-*")


def test_cli_benford(spark, tmp_path, capsys):
    src = str(tmp_path / "v.parquet")
    spark.createDataFrame(
        [(19.5,), (150.0,), (2.0,), (0.4,)], "v double"
    ).write.parquet(src)
    rc = main(["benford", src, "v"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "digit=1 n=2" in out and "digit=9 n=0" in out


def test_cli_survival(spark, tmp_path, capsys):
    src = str(tmp_path / "o.parquet")
    spark.createDataFrame(
        [(1, "2024-01-01", 1), (1, "2024-01-04", 2), (2, "2024-01-09", 3)],
        "k long, d string, tb long",
    ).selectExpr("k", "to_timestamp(d) AS d", "tb").write.parquet(src)
    rc = main([
        "survival", src, "--key", "k", "--date-col", "d", "--tiebreak", "tb",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    # one event time (t=3): 2 at risk, 1 event -> S = 1/2
    assert "t=3" in out and "S(t)=0.500000" in out


def test_cli_kanon_feasible_and_not(spark, tmp_path, capsys):
    src = str(tmp_path / "c.parquet")
    spark.createDataFrame(
        [("g", float(v)) for v in range(8)], "g string, v double"
    ).write.parquet(src)
    rc = main(["kanon", src, "g", "v", "--k", "4"])
    out = capsys.readouterr().out
    assert rc == 0 and "width=4 (j=2)" in out
    rc = main(["kanon", src, "g", "v", "--k", "9"])
    out = capsys.readouterr().out
    assert rc == 1 and "INFEASIBLE" in out


def test_cli_forecast(spark, tmp_path, capsys):
    src = str(tmp_path / "e.parquet")
    rows = [("g", f"2024-01-{d:02d} 00:00:00") for d in range(1, 13)]
    spark.createDataFrame(rows, "g string, ts string").selectExpr(
        "g", "to_timestamp(ts) AS ts"
    ).write.parquet(src)
    rc = main(["forecast", src, "--group-col", "g", "--ts-col", "ts"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "g: days=12 forecasts=4 mae=0.000" in out
