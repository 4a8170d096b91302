"""Streaming dedup (replay suppression) and stream-stream time-bound join."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.session import load_table
from kafka_connect_hdfs_spark.streaming.dedup_join import dedup_stream, stream_stream_join


def _replay(spark, df, path, n_files=3):
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_dedup_stream_suppresses_replays(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").limit(500).cache()
    n_distinct = ev.count()
    # simulate at-least-once delivery: every record delivered twice
    doubled = ev.union(ev)
    stream = _replay(spark, doubled, f"{tmp_path}/src")
    q = (
        dedup_stream(stream, ["event_id"], ts_col="ts", watermark_delay="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{tmp_path}/chk")
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select count(*) n, count(distinct event_id) d from dedup_out").first()
    assert got.n == got.d == n_distinct


def test_stream_stream_join_time_bound(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").limit(2000).cache()
    views = ev.filter(F.col("event_type") == "view")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_event"),
    )
    ls = _replay(spark, views, f"{tmp_path}/l")
    rs = _replay(
        spark,
        purchases.select(F.col("p_user").alias("user_id"), F.col("p_ts").alias("ts"), "p_event"),
        f"{tmp_path}/r",
    )
    # watermark wider than the dataset's full time span: nothing is "late",
    # so the batch join below is an exact oracle (a tight watermark would
    # legitimately evict cross-batch stragglers — that's the semantics, but
    # it's not what this test pins)
    joined = stream_stream_join(
        ls, rs, on="user_id", max_lag="30 minutes", watermark_delay="3650 days"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{tmp_path}/chk2")
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select count(*) n from ssj_out").first().n
    # batch oracle: same join, same bound
    expected = (
        views.alias("v")
        .join(
            purchases,
            (F.col("v.user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("v.ts") - F.expr("INTERVAL 30 minutes"))
            & (F.col("p_ts") <= F.col("v.ts") + F.expr("INTERVAL 30 minutes")),
        )
        .count()
    )
    assert got == expected
    assert expected > 0  # the bound actually matches something


def test_stream_static_enrichment_broadcasts_and_matches_batch(spark, sf_dir, tmp_path):
    from kafka_connect_hdfs_spark.streaming.dedup_join import enrich_stream

    ev = load_table(spark, sf_dir, "events").limit(1000).cache()
    dim = spark.createDataFrame(
        [("click", 1), ("view", 1), ("purchase", 5), ("signup", 3), ("error", 0)],
        "event_type string, weight int",
    )
    stream = _replay(spark, ev, f"{tmp_path}/src")
    q = (
        enrich_stream(stream, dim, on="event_type")
        .writeStream.format("memory")
        .queryName("enriched_out")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{tmp_path}/chk")
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select count(*) n, sum(weight) w from enriched_out"
    ).first()
    expected = (
        ev.join(dim, "event_type")
        .agg(F.count("*").alias("n"), F.sum("weight").alias("w"))
        .first()
    )
    assert (got.n, got.w) == (expected.n, expected.w)
    # the join must broadcast the dim side (same logical plan the
    # micro-batches execute) — the stream side never shuffles
    plan = (
        enrich_stream(ev, dim, on="event_type")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "ShuffleExchange" not in plan
