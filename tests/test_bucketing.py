"""Bucketed co-located join: the orderkey shuffle must disappear."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.plans.bucketing import (
    bucketed_join_revenue,
    create_bucketed_facts,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    # disable broadcast so the join strategy question is real
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        create_bucketed_facts(spark, sf_dir, n_buckets=4)
        import re

        df = bucketed_join_revenue(spark)
        plan = _plan(df)
        assert "SortMergeJoin" in plan
        # bucketed join needs NO join-input shuffles: the only Exchanges left
        # are the aggregate and the final sort (2). The unbucketed plan has 4
        # (two join inputs + aggregate + sort).
        n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
        assert n_exchanges == 2, plan
        # and the result matches the unbucketed computation
        from kafka_connect_hdfs_spark.session import load_table

        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
            F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
        )
        want = {
            r.o_orderpriority: r.revenue
            for r in li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum(revenue).cast("double").alias("revenue"))
            .collect()
        }
        got = {r.o_orderpriority: r.revenue for r in df.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
