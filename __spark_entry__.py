"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The implementations live in
``nifi_hive_schema_generator_bundle_spark/plans/queries.py`` — one entry per
operator family from SURVEY.md §2 plus the LLM-data-pipeline extensions
(dedup / similarity / text analysis). Entries without an oracle are the
genuinely non-SQL-expressible ops (LSH candidate generation, approximate
ANN) and get the driver's rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _prepare(spark: SparkSession) -> None:
    """Make the engine package importable on executors regardless of which
    session the driver hands us, and pin the session timezone — the date
    renderings the oracles compare against are timezone-naive (DuckDB),
    so a non-UTC driver session would shift every date_format output."""
    from nifi_hive_schema_generator_bundle_spark.session import ship_package

    ship_package(spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: distributed reference-
    lattice schema inference over the events.props JSON column."""
    from nifi_hive_schema_generator_bundle_spark.plans.queries import QUERIES

    _prepare(spark)
    return QUERIES["infer_props_schema"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from nifi_hive_schema_generator_bundle_spark.plans.queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins of ``queries()`` (same column names)."""
    from nifi_hive_schema_generator_bundle_spark.plans.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
