"""Bucketed-table layout: the pay-one-shuffle-at-write-time property.

Pins the two claims write_bucketed makes for 100 TB operation:
a join of two tables bucketed on the same key/count plans with NO
Exchange on either side, and a groupBy on the bucket key needs no
shuffle — against real plans, so a bucketing regression fails here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_realtime_pipeline_spark.catalog import write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.range(0, 2000).select(
        F.col("id").alias("custkey"),
        (F.col("id") % 7).alias("o_total"),
    )
    cust = spark.range(0, 500).select(
        F.col("id").alias("custkey"),
        F.concat(F.lit("c"), F.col("id")).alias("name"),
    )
    write_bucketed(orders, "b_orders", "custkey", n_buckets=8)
    write_bucketed(cust, "b_cust", "custkey", n_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    a = spark.table("b_orders")
    b = spark.table("b_cust")
    # disable auto-broadcast so the join would otherwise shuffle
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            a.join(b, "custkey")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    plan = (
        spark.table("b_orders")
        .groupBy("custkey")
        .agg(F.sum("o_total").alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, f"groupBy on the bucket key must not shuffle:\n{plan}"


def test_bucketed_join_result_correct(spark, bucketed_tables):
    got = (
        spark.table("b_orders")
        .join(spark.table("b_cust"), "custkey")
        .agg(F.count("*"))
        .collect()[0][0]
    )
    # orders custkeys 0..1999; cust holds 0..499 → inner join keeps 500
    assert got == 500
