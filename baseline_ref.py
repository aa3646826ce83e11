#!/usr/bin/env python
"""Single-threaded faithful re-implementation of the reference algorithm,
used as the BASELINE stand-in (BASELINE.md: upstream publishes no numbers).

Mirrors the reference's control flow per SURVEY §3 — whole-content
validation pass (content fully buffered, like IOUtils.toString at
HiveSchemaGenerator.scala:116), then a second line-at-a-time parse+fold
pass (CreateHQL.scala:8-21) — implemented from the SURVEY description, not
translated code. Run: ``python baseline_ref.py <ndjson-file> [table] [loc]``.

Prints one JSON line with wall seconds per phase so BENCH numbers can be
compared at the same scale factor.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from nifi_hive_schema_generator_bundle_spark.plans.lattice import (
    merge_types,
    schema_from_json_lines,
)
from nifi_hive_schema_generator_bundle_spark.plans.render import render_hive_ddl


def check_json_valid(content: str) -> bool:
    """org.json-style whole-content check: first value must be an object
    or array (multi-line NDJSON passes if line 1 parses — quirk preserved)."""
    stripped = content.lstrip()
    if not stripped or stripped[0] not in "{[":
        return False
    try:
        json.JSONDecoder().raw_decode(stripped)
        return True
    except ValueError:
        return False


def main() -> None:
    path = sys.argv[1]
    table = sys.argv[2] if len(sys.argv) > 2 else "baseline_t"
    location = sys.argv[3] if len(sys.argv) > 3 else "/warehouse/baseline_t"

    t0 = time.perf_counter()
    with open(path, "r", encoding="utf-8") as fh:
        content = fh.read()          # whole-content buffering, as reference
    valid = check_json_valid(content)
    t1 = time.perf_counter()

    ddl = None
    lines = 0
    if valid:
        def gen():
            nonlocal lines
            with open(path, "r", encoding="utf-8") as fh:   # second read
                for line in fh:
                    line = line.rstrip("\n")
                    if line:
                        lines += 1
                        yield line

        schema = schema_from_json_lines(gen())
        ddl = render_hive_ddl(schema, table, location)
    t2 = time.perf_counter()

    print(
        json.dumps(
            {
                "metric": "baseline_single_thread_wall",
                "value": round(t2 - t0, 3),
                "unit": "sec",
                "phases": {
                    "validate": round(t1 - t0, 3),
                    "infer_render": round(t2 - t1, 3),
                },
                "valid": valid,
                "lines": lines,
                "ddl_chars": len(ddl) if ddl else 0,
            }
        )
    )


if __name__ == "__main__":
    main()
