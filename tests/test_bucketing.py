"""Bucketed co-located joins: both sides bucketed on the join key →
the sort-merge join reads pre-partitioned buckets with NO exchange.
This is the engine's answer to the reference's 'index on SKs' (SURVEY
§4) for fact-fact joins too big to broadcast."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineer_project_spark.sources.registry import load_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    t = load_tables(spark, SF)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        t.orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        t.lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    orders, lineitem = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")  # keep plan inspectable
    try:
        joined = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # bucket layout satisfies the join's distribution: no exchange
        # feeds the join (the only exchange is the post-join aggregation)
        join_part = plan.split("SortMergeJoin")[1]
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "SelectedBucketsCount" in plan
        # and the result is right
        got = {r.o_orderpriority: r.n for r in joined.collect()}
        t = load_tables(spark, SF)
        want = {
            r.o_orderpriority: r.n
            for r in t.lineitem.join(
                t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
