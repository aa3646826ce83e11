"""Chat NDJSON source tests (sources/chat.py)."""

from __future__ import annotations

import json


def _write(path, lines):
    path.write_text("\n".join(lines) + "\n")


def test_three_way_routing(spark, tmp_path):
    from nifi_hive_schema_generator_bundle_spark.sources.chat import (
        read_chat_ndjson,
        split_chat_validity,
    )

    lines = [
        json.dumps({
            "conversation_id": "ok1",
            "messages": [
                {"role": "system", "content": "s"},
                {"role": "user", "content": "hi"},
                {"role": "assistant", "content": "hello"},
            ],
        }),
        json.dumps({
            "conversation_id": "struct1",
            "messages": [
                {"role": "user", "content": "hi"},
                {"role": "user", "content": "again"},
            ],
        }),
        '{"conversation_id": "broken", "messages": [',
        json.dumps({
            "conversation_id": "ok2",
            "extra_key": 42,
            "messages": [{"role": "user", "content": "solo"}],
        }),
    ]
    src = tmp_path / "chats.jsonl"
    _write(src, lines)
    df = read_chat_ndjson(spark, str(src))
    good, bad_json, invalid = split_chat_validity(df)

    good_rows = {r.conversation_id: r for r in good.collect()}
    assert set(good_rows) == {"ok1", "ok2"}          # extra keys ignored
    assert [t.role for t in good_rows["ok1"].turns] == [
        "system", "user", "assistant",
    ]
    bad = bad_json.collect()
    assert len(bad) == 1 and bad[0]._corrupt_record.startswith(
        '{"conversation_id": "broken"'
    )
    inv = {r.conversation_id: r.violation for r in invalid.collect()}
    assert inv == {"struct1": "no_alternation"}


def test_good_frame_feeds_renderer(spark, tmp_path):
    from nifi_hive_schema_generator_bundle_spark.operators.sft import (
        rendered_chat_frame,
    )
    from nifi_hive_schema_generator_bundle_spark.sources.chat import (
        read_chat_ndjson,
        split_chat_validity,
    )

    src = tmp_path / "c.jsonl"
    _write(src, [
        json.dumps({
            "conversation_id": "c1",
            "messages": [
                {"role": "user", "content": "q"},
                {"role": "assistant", "content": "the answer"},
            ],
        }),
    ])
    good, _, _ = split_chat_validity(read_chat_ndjson(spark, str(src)))
    out = rendered_chat_frame(good).collect()
    assert len(out) == 1 and out[0].piece == "the answer"
