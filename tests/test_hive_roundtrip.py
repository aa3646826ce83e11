"""Execute the Hive-dialect DDL against a real Hive metastore.

The reference emits HiveQL meant for a Hive metastore
(``CreateHQL.scala:94-99``). The engine's golden tests pin the rendered
string; this module closes the loop by actually RUNNING the rendered DDL
through ``enableHiveSupport()`` + embedded derby: create the table from an
inferred schema, DESCRIBE it, write rows through it, and read them back
via ``spark.sql``.

Runs in a subprocess because the suite's shared SparkSession is
in-memory-catalog; a Hive-catalog session must own its JVM (derby locks
its metastore_db, and catalogImplementation is fixed at session start).
The hcatalog JsonSerDe jar isn't in Spark's builtin Hive, so the
executable variant uses ``STORED AS TEXTFILE`` (``stored_as`` parameter)
— same DDL shape, swap the storage clause.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

SCRIPT = textwrap.dedent(
    """
    import sys, os
    sys.path.insert(0, {repo!r})
    wh = sys.argv[1]
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master("local[2]").appName("hive-roundtrip")
        .config("spark.sql.warehouse.dir", os.path.join(wh, "wh"))
        .config("spark.driver.extraJavaOptions",
                "-Dderby.system.home=" + os.path.join(wh, "derby"))
        .enableHiveSupport()
        .getOrCreate()
    )
    assert spark.conf.get("spark.sql.catalogImplementation") == "hive"

    from nifi_hive_schema_generator_bundle_spark.operators.infer import infer_schema_df
    from nifi_hive_schema_generator_bundle_spark.plans.render import render_hive_ddl
    from nifi_hive_schema_generator_bundle_spark.session import ship_package

    ship_package(spark)  # exact inference runs mapInPandas on workers
    lines = spark.createDataFrame(
        [('{{"a": 1, "b": "x"}}',), ('{{"a": 2.5, "b.c": "y"}}',)],
        "value string",
    )
    schema = infer_schema_df(lines, "value")
    loc = os.path.join(wh, "loc")
    os.makedirs(loc, exist_ok=True)
    ddl = render_hive_ddl(
        schema, "rt_tab", loc, drop_if_exists=True, stored_as="TEXTFILE"
    )
    print("DDL:", ddl.replace(chr(10), " / "))
    for stmt in filter(None, (s.strip() for s in ddl.split(";"))):
        spark.sql(stmt)

    desc = {{r.col_name: r.data_type for r in spark.sql(
        "DESCRIBE TABLE rt_tab").collect()}}
    assert desc.get("a") == "string", desc
    assert desc.get("b") == "string", desc
    assert desc.get("b_c") == "string", desc   # sanitized [.-] -> _

    spark.sql("INSERT INTO rt_tab VALUES ('1', 'x', NULL), ('2.5', NULL, 'y')")
    back = spark.sql(
        "SELECT a, b, b_c FROM rt_tab ORDER BY a").collect()
    assert [tuple(r) for r in back] == [("1", "x", None), ("2.5", None, "y")], back

    # second run of the same DDL: the DROP TABLE IF EXISTS variant
    # re-creates cleanly, and because the table is EXTERNAL the data at
    # the location survives the drop — the re-created table reads it back
    for stmt in filter(None, (s.strip() for s in ddl.split(";"))):
        spark.sql(stmt)
    n = spark.sql("SELECT count(*) AS n FROM rt_tab").collect()[0].n
    assert n == 2, n

    # --- partition evolution (VERDICT r5 #7): a day lands on disk as a
    # hive-layout directory; the metastore only sees it after ADD
    # PARTITION (enumerated) or MSCK REPAIR (bulk discovery) ---
    from nifi_hive_schema_generator_bundle_spark.plans.render import (
        render_msck,
        render_partition_ddl,
    )

    ploc = os.path.join(wh, "ploc")
    os.makedirs(ploc, exist_ok=True)
    spark.sql(
        "CREATE EXTERNAL TABLE pt_tab (v STRING) PARTITIONED BY (day STRING) "
        "STORED AS TEXTFILE LOCATION '" + ploc + "'"
    )

    def write_day(day, rows):
        d = os.path.join(ploc, "day=" + day)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "part-0.txt"), "w") as f:
            f.write(chr(10).join(rows) + chr(10))

    write_day("2026-01-01", ["a", "b"])
    # directory exists but is invisible until registered
    assert spark.sql("SELECT count(*) AS n FROM pt_tab").collect()[0].n == 0
    add = render_partition_ddl(
        "pt_tab",
        [({{"day": "2026-01-01"}}, os.path.join(ploc, "day=2026-01-01"))],
    )
    print("ADD:", add)
    spark.sql(add.rstrip(";"))
    assert spark.sql("SELECT count(*) AS n FROM pt_tab").collect()[0].n == 2

    # a second day lands; MSCK discovers it without enumerating
    write_day("2026-01-02", ["c", "d", "e"])
    spark.sql(render_msck("pt_tab").rstrip(";"))
    got = {{r.day: r.n for r in spark.sql(
        "SELECT day, count(*) AS n FROM pt_tab GROUP BY day").collect()}}
    assert got == {{"2026-01-01": 2, "2026-01-02": 3}}, got
    # partition pruning reaches the scan: one day's filter reads one dir
    plan = spark.sql(
        "SELECT * FROM pt_tab WHERE day = '2026-01-02'"
    )._jdf.queryExecution().executedPlan().toString()
    assert "day=2026-01-02" in plan or "PartitionFilters" in plan, plan

    spark.stop()
    print("ROUNDTRIP-OK")
    """
)


def test_hive_ddl_executes_against_derby_metastore(tmp_path):
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            SCRIPT.format(
                repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            ),
            str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    if proc.returncode != 0 and "ClassNotFoundException" in proc.stderr:
        pytest.skip("container Spark build lacks Hive classes")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ROUNDTRIP-OK" in proc.stdout
