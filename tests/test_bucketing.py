"""Bucketed tables pre-pay the join shuffle: same key + same bucket count
=> sort-merge join with no shuffle Exchange on either side. Auto-broadcast
is disabled inside the test — at toy scale the planner would broadcast and
bypass buckets entirely (at 100 TB neither side is broadcastable)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.catalog import write_bucketed


def _plan(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bucketed_join_has_no_shuffle(spark, sf_smoke_dir):
    orders = spark.read.parquet(f"{sf_smoke_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = spark.read.parquet(f"{sf_smoke_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "b_orders", bucket_col="o_orderkey", n_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        bucket_col="o_orderkey",
        n_buckets=8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = _plan(joined)
        assert "Bucketed: true" in plan
        # co-located buckets: sort-merge join without any shuffle
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == lineitem.count()

        # aggregation on the bucket key also skips its exchange
        agg = (
            spark.table("b_orders")
            .groupBy("o_orderkey")
            .agg(F.sum("o_totalprice"))
        )
        assert "Exchange hashpartitioning" not in _plan(agg)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
